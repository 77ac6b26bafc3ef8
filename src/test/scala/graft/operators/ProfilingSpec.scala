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
}
