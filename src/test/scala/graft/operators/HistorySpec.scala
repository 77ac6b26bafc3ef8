package graft.operators

import java.sql.Date

import graft.SparkSpec

/** SCD-2 semantics on planted change logs: runs collapse into one interval,
  * each change opens a new version whose start closes the previous one, and
  * same-date changes resolve by the orderkey tiebreak (producing a
  * degenerate same-day interval, which must be kept — dropping it would
  * lose the attribute's audit trail).
  */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def run(rows: Seq[(Long, Long, Date, String)]) =
    History.scd2Core(
      rows.toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"))
      .orderBy("o_custkey", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getBoolean(5), r.getLong(6))).toSeq

  test("runs collapse, changes version, intervals chain, last is current") {
    val got = run(Seq(
      (100L, 1L, d("1995-01-01"), "HIGH"),
      (100L, 2L, d("1995-02-01"), "HIGH"),
      (100L, 3L, d("1995-03-01"), "LOW"),
      (100L, 4L, d("1995-04-01"), "HIGH")))
    assert(got == Seq(
      (100L, 1L, "HIGH", "1995-01-01", "1995-03-01", false, 2L),
      (100L, 2L, "LOW", "1995-03-01", "1995-04-01", false, 1L),
      (100L, 3L, "HIGH", "1995-04-01", "9999-12-31", true, 1L)))
  }

  test("same-date change: orderkey order decides, degenerate interval kept") {
    val got = run(Seq(
      (200L, 10L, d("1996-06-01"), "HIGH"),
      (200L, 11L, d("1996-06-01"), "LOW")))
    assert(got == Seq(
      (200L, 1L, "HIGH", "1996-06-01", "1996-06-01", false, 1L),
      (200L, 2L, "LOW", "1996-06-01", "9999-12-31", true, 1L)))
  }

  test("incremental merge equals a flat recompute over all orders, bit for bit") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val merged = History.incrementalAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val flat = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(o_totalprice AS DECIMAL(12,2))")).as("rev"))
      .select(col("month"), col("n"), col("rev").cast("double"),
        (col("rev").cast("double") / col("n")))
      .orderBy("month").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(merged == flat, "state ⊎ delta diverged from the flat aggregate")
    assert(merged.nonEmpty && merged.map(_._2).sum > 0)
  }

  test("monthly growth: lag math matches an independent BigDecimal computation") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val monthly = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(12,2))")).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).sortBy(_._1)
    val got = History.monthlyGrowth(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.length == monthly.length && got.length > 13)
    got.zipWithIndex.foreach { case ((m, rev, mom, yoy), i) =>
      assert(m == monthly(i)._1)
      def growth(k: Int): Option[Double] =
        if (i < k) None
        else Some(monthly(i)._2.subtract(monthly(i - k)._2).doubleValue() /
          monthly(i - k)._2.doubleValue())
      assert(mom == growth(1), s"$m mom")
      assert(yoy == growth(12), s"$m yoy")
      assert(rev == monthly(i)._2.doubleValue())
    }
  }

  test("customers never interleave; a single-order history is one current row") {
    val got = run(Seq(
      (300L, 20L, d("1997-01-01"), "MED"),
      (301L, 21L, d("1997-02-01"), "MED")))
    assert(got == Seq(
      (300L, 1L, "MED", "1997-01-01", "9999-12-31", true, 1L),
      (301L, 1L, "MED", "1997-02-01", "9999-12-31", true, 1L)))
  }

  test("cdc upsert exercises all three MERGE cases: update, insert, delete") {
    // keys: 3 (state only, untouched), 7 (state + batch U = matched update),
    // 49 (state + batch D = delete), 70 (batch only, U = insert; 70%10==0 so
    // absent from state and 70%49!=0 so not a tombstone), 33 (state only)
    val fixture = java.nio.file.Files.createTempDirectory("graft_cdc_fixture").toString
    Seq(3L, 7L, 33L, 49L, 70L)
      .map(k => (k, k * 10, "O", k * 1.5, d("1997-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$fixture/orders.parquet")
    val got = History.cdcUpsert(spark, fixture).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == Map(
      3L -> "1-URGENT",      // untouched state row survives
      7L -> "UPD-1-URGENT",  // matched key REPLACED by the batch row
      33L -> "1-URGENT",     // untouched state row survives
      70L -> "UPD-1-URGENT") // batch-only key inserted
      , s"got $got")         // 49 tombstoned away entirely
  }

  test("pit join: facts land in the state valid at their date; pre-history is NULL") {
    import org.apache.spark.sql.functions._
    val orders = Seq(
      (1L, 10L, d("1995-01-10"), "HIGH"),
      (1L, 11L, d("1995-03-01"), "LOW"),   // change
      (1L, 12L, d("1995-03-01"), "HIGH"),  // same-date flip-flop: later key wins EOD
      (1L, 13L, d("1995-06-01"), "LOW"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val lines = Seq(
      (10L, d("1995-01-05"), BigDecimal("10.00")), // BEFORE any state -> NULL
      (10L, d("1995-02-01"), BigDecimal("1.00")),  // inside HIGH
      (11L, d("1995-03-01"), BigDecimal("2.00")),  // ON the flip-flop day -> EOD HIGH
      (12L, d("1995-04-15"), BigDecimal("4.00")),  // between -> still HIGH
      (13L, d("1995-06-01"), BigDecimal("8.00")),  // ON the change day -> LOW
      (13L, d("1999-01-01"), BigDecimal("16.00"))) // long after -> LOW
      .toDF("l_orderkey", "l_shipdate", "amount")
      .withColumn("amount", col("amount").cast("decimal(12,2)"))
    val got = History.pitPriorityOf(orders, lines).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (None, 1L, 10.0),
      (Some("HIGH"), 3L, 7.0),
      (Some("LOW"), 2L, 24.0)))
  }

  test("join IVM: delta algebra equals flat rebuild; every delta term fires") {
    import org.apache.spark.sql.functions._
    def o(rows: (Long, Long)*) = rows.toDF("o_orderkey", "o_custkey")
    def l(rows: (Long, Int, String)*) = rows.toDF("l_orderkey", "l_linenumber", "a")
      .withColumn("amount", col("a").cast("decimal(12,2)")).drop("a")
    // base: orders 1,2 (cust 10, 20) with lines; delta orders: 3 (cust 30, new
    // customer) and 4 (cust 10 again); delta lines: late line for base order 1,
    // and lines for the delta orders
    val oBase = o((1L, 10L), (2L, 20L))
    val oDelta = o((3L, 30L), (4L, 10L))
    val lBase = l((1L, 1, "5.00"), (1L, 2, "7.00"), (2L, 1, "11.00"))
    val lDelta = l((1L, 3, "13.00"), (3L, 1, "17.00"), (4L, 1, "19.00"))

    val got = History.joinIvmOf(oBase, oDelta, lBase, lDelta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // flat rebuild over the unioned tables
    val flat = History.joinIvmOf(
      oBase.unionByName(oDelta), o(), lBase.unionByName(lDelta), l())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == flat, s"IVM drifted from rebuild: $got vs $flat")
    assert(got == Seq(
      (10L, 4L, 44.0),  // 5+7 base, +13 late line, +19 via delta order 4
      (20L, 1L, 11.0),
      (30L, 1L, 17.0))) // entirely from the delta x delta term
  }
}
