package graft.operators

import graft.SparkSpec

/** Profiling semantics on a planted frame: null counts, exact distinct
  * counts (nulls excluded), and the documented LEXICOGRAPHIC min/max over
  * the string rendering — pinned by a double column whose string order
  * differs from its numeric order.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distincts, string min/max per column") {
    val df = Seq(
      (Option(1L), Option("b"), Option(2.5)),
      (Option(1L), Option.empty[String], Option(10.0)),
      (Option(3L), Option("a"), Option.empty[Double]))
      .toDF("id", "s", "v")
    val got = Profiling.profileOf(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got.keySet == Set("id", "s", "v"))
    assert(got("id") == ((0L, 2L, "1", "3")))
    assert(got("s") == ((1L, 2L, "a", "b")))
    // "10.0" < "2.5" lexicographically — the documented string-cast semantics
    assert(got("v") == ((1L, 2L, "10.0", "2.5")))
  }

  test("corr matrix matches an independent BigInt-moment computation on real data") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        .map(v => BigInt(math.round(v * 100))))
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def corrOf(i: Int, j: Int): Double = {
      val n = BigInt(rows.length)
      val sx = rows.map(_(i)).sum; val sy = rows.map(_(j)).sum
      val sxx = rows.map(r => r(i) * r(i)).sum
      val syy = rows.map(r => r(j) * r(j)).sum
      val sxy = rows.map(r => r(i) * r(j)).sum
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    }
    val got = Profiling.corrMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 6)
    for { i <- 0 until 4; j <- i + 1 until 4 } {
      val (n, c) = got((names(i), names(j)))
      assert(n == rows.length.toLong)
      assert(math.abs(c - corrOf(i, j)) < 1e-12, s"${names(i)} vs ${names(j)}")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("corr matrix: planted exact linear relations hit ±1") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_corr_fixture").toString
    // l_extendedprice = 2·q + 3 (corr +1), l_discount = 100 − q (corr −1),
    // l_tax constant-free noise via q² (monotone, 0 < corr < 1)
    (1 to 100).map(q => (q.toDouble, 2.0 * q + 3, 100.0 - q, q.toDouble * q / 100))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Profiling.corrMatrix(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(got(("l_quantity", "l_extendedprice")) - 1.0) < 1e-12)
    assert(math.abs(got(("l_quantity", "l_discount")) + 1.0) < 1e-12)
    val qt = got(("l_quantity", "l_tax"))
    assert(qt > 0.9 && qt < 1.0, s"q vs q²/100 should be strongly but not perfectly correlated: $qt")
  }

  test("profile of an all-null column reports nulls and no values") {
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "empty")
    val got = Profiling.profileOf(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(got("empty") == ((2L, 0L, None, None)))
    assert(got("k") == ((0L, 2L, Some("1"), Some("2"))))
  }

  test("contract report: every planted violation is counted, clean rules pass") {
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft_contract_fixture").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    // 8 orders: one null key, one duplicated key (2 extra copies), one bad
    // status, one non-positive price, two outside the date window (early +
    // late), one dangling custkey, and one fully clean row
    Seq(
      (Option.empty[Long], Option(1L), "O", 10.0, Option(ts("1996-01-01")), "1-URGENT"),
      (Option(2L), Option(1L), "O", 10.0, Option(ts("1996-01-01")), "1-URGENT"),
      (Option(2L), Option(1L), "O", 10.0, Option(ts("1996-01-01")), "1-URGENT"),
      (Option(2L), Option(1L), "O", 10.0, Option(ts("1996-01-01")), "1-URGENT"),
      (Option(3L), Option(1L), "X", 10.0, Option(ts("1996-01-01")), "1-URGENT"),
      (Option(4L), Option(1L), "F", -1.0, Option(ts("1994-12-31")), "1-URGENT"),
      (Option(5L), Option(99L), "P", 10.0, Option(ts("2000-01-01")), "1-URGENT"),
      (Option(6L), Option(1L), "O", 10.0, Option(ts("1996-01-01")), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, "c1")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")

    val got = Profiling.ordersContractReport(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      "orderkey_not_null" -> ((8L, 1L, false)),
      // key 2 appears 3×: 8 rows, 5 distinct non-null keys → 3 extras
      // (the null key counts as an extra too — it IS not a distinct key)
      "orderkey_unique" -> ((8L, 3L, false)),
      "status_in_domain" -> ((8L, 1L, false)),
      "price_positive" -> ((8L, 1L, false)),
      // 1994-12-31 is early, 2000-01-01 sits ON the exclusive upper bound
      "orderdate_in_window" -> ((8L, 2L, false)),
      "custkey_references_customer" -> ((8L, 1L, false))))

    // a clean batch passes every rule
    Seq((Option(1L), Option(1L), "O", 10.0, Option(ts("1996-01-01")), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val clean = Profiling.ordersContractReport(spark, d).collect()
    assert(clean.forall(_.getBoolean(3)), "clean batch must pass all rules")
  }
}
