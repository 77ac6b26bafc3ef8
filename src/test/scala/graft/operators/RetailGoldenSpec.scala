package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden unit tests replaying the reference's exact boundary semantics
  * (SURVEY §5.2): the order-size UDF thresholds (bonus.py:51-58, rescaled
  * ×1000 to this data's order-value range: <50000 Small, <=200000 Medium,
  * else Large, null→Unknown), the native/UDF form equivalence, and the pivot
  * null-fill (q3:84).
  */
class RetailGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("categorize boundaries: 49999.99→Small, 50000→Medium, 200000→Medium, 200000.01→Large, null→Unknown") {
    val df = Seq[Option[Double]](
      None, Some(49999.99), Some(50000.0), Some(200000.0), Some(200000.01), Some(1e9))
      .toDF("v")
      .select(Retail.categorize(col("v")).as("size"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("Unknown", "Small", "Medium", "Medium", "Large", "Large"))
  }

  test("UDF form and native when/otherwise form agree on real data (U1)") {
    val native = Retail.orderSizeNative(spark, Sf0001).collect().toSeq
    val viaUdf = Retail.orderSizeUdf(spark, Sf0001).collect().toSeq
    assert(native.nonEmpty && native === viaUdf)
  }

  test("top-k unshipped revenue equals the full-sort answer and respects every filter") {
    val sf = "/root/testdata/sf0.001"
    val got = Retail.topkUnshippedRevenue(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(got.length == 10)
    // independent derivation: aggregate WITHOUT the top-k operator, sort in
    // Scala, take 10 — the heap-based TakeOrdered path must agree exactly
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") < lit(Retail.ShippingCutoff).cast("timestamp"))
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") > lit(Retail.ShippingCutoff).cast("timestamp"))
    val full = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(Retail.lineAmount).cast("double").as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("o_orderpriority"), col("revenue"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val expected = full.sortBy(t => (-t._4, t._1)).take(10)
    assert(got.toSeq == expected.toSeq)
    // and the filters really bit: the top-k is a strict subset of the pool
    assert(full.length > 10)
  }

  test("ABC classification: shares climb to exactly 1.0, classes split at the thresholds") {
    val rows = Retail.abcClassification(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    assert(rows.length > 100)
    // revenue descending, cumulative share strictly nondecreasing, ends at 1.0
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 && a._3 <= b._3 })
    assert(math.abs(rows.last._3 - 1.0) < 1e-9)
    // class boundaries follow the share exactly
    rows.foreach { case (_, _, share, cls) =>
      val expected = if (share <= 0.7) "A" else if (share <= 0.9) "B" else "C"
      assert(cls == expected, s"share $share class $cls")
    }
    // boundary: A-class revenue covers at most 70% plus one part's worth
    // (the synthetic catalog is near-uniform, so no 80/20 skew to assert —
    // the CLASS boundary, not the distribution, is the operator's contract)
    val total = rows.map(_._2).sum
    val aRev = rows.filter(_._4 == "A").map(_._2).sum
    val maxPart = rows.map(_._2).max
    assert(rows.map(_._4).toSet == Set("A", "B", "C"))
    assert(aRev / total <= 0.7 + maxPart / total + 1e-9, s"A share ${aRev / total}")
    assert(aRev / total > 0.7 - maxPart / total - 1e-9, s"A share ${aRev / total}")
  }

  test("pivot output has no nulls and total_orders sums the pivot columns (A7/P8/P10)") {
    val pivoted = Nested.customerPriorityPivot(spark, Sf0001)
    val cols = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
    val bad = pivoted.filter(
      cols.map(c => col(c).isNull).reduce(_ || _) ||
        col("total_orders") =!= cols.map(col).reduce(_ + _))
    assert(pivoted.count() > 0 && bad.count() === 0)
  }
}
