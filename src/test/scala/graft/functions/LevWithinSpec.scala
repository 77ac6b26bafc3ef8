package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** `lev_within(a, b, k)` must agree with `levenshtein(a, b) <= k` EXACTLY —
  * on ASCII (the banded byte fast path), on multi-byte unicode (the code-
  * point fallback), at every bound, in both interpreted and codegen forms.
  */
class LevWithinSpec extends SparkSpec {
  import spark.implicits._

  private def refLev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("static helper agrees with full DP on random ASCII pairs at every bound") {
    val rnd = new scala.util.Random(17)
    def str() = (0 until rnd.nextInt(12)).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString
    for (_ <- 1 to 2000) {
      val (a, b) = (str(), str())
      val d = refLev(a, b)
      for (k <- 0 to 4) {
        val got = LevWithin.within(
          UTF8String.fromString(a), UTF8String.fromString(b), k)
        assert(got == (d <= k), s"within('$a','$b',$k) = $got but distance is $d")
      }
    }
  }

  test("negative bound is false; empty and equal strings behave") {
    def w(a: String, b: String, k: Int) =
      LevWithin.within(UTF8String.fromString(a), UTF8String.fromString(b), k)
    assert(!w("a", "a", -1))
    assert(w("", "", 0) && w("abc", "abc", 0))
    assert(w("", "ab", 2) && !w("", "abc", 2))
    assert(!w("abcdefgh", "zzzzzzzz", 3))
    // huge bounds must clamp, not overflow the band arithmetic
    assert(w("ab", "ab", Int.MaxValue - 1))
    assert(w("ab", "xy", Int.MaxValue))
  }

  test("SQL form agrees with levenshtein(a,b) <= k on random unicode pairs (codegen path)") {
    val rnd = new scala.util.Random(29)
    val alphabet = "abé中😀" // 1-, 2-, 3-, and 4-byte chars
    def str() = {
      val sb = new StringBuilder
      for (_ <- 0 until rnd.nextInt(8)) {
        val c = rnd.nextInt(4)
        sb.append(c match {
          case 0 => "a"; case 1 => "é"; case 2 => "中"; case 3 => "😀"
        })
      }
      sb.toString
    }
    val pairs = (1 to 300).map(_ => (str(), str()))
    val df = pairs.toDF("a", "b")
      .withColumn("k", (monotonically_increasing_id() % 4).cast("int"))
    val rows = df.select(col("a"), col("b"), col("k"),
      expr("lev_within(a, b, k)").as("got"),
      (levenshtein(col("a"), col("b")) <= col("k")).as("want")).collect()
    rows.foreach { r =>
      assert(r.getBoolean(3) == r.getBoolean(4),
        s"lev_within('${r.getString(0)}','${r.getString(1)}',${r.getInt(2)}) " +
          s"= ${r.getBoolean(3)}, levenshtein says ${r.getBoolean(4)}")
    }
    // null propagation
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(expr("lev_within(a, b, 1)")).collect().head
    assert(n.isNullAt(0))
  }
}
