package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** jaccard_sorted (fused one-merge-pass expression) must agree BIT-IDENTICALLY
  * with the declarative `size(array_intersect)/size(array_union)` form it
  * replaces — that equivalence is what keeps the dedup oracle rows green
  * after the hot-path swap.
  */
class JaccardSortedSpec extends SparkSpec {
  import spark.implicits._

  private val declarative =
    "CAST(size(array_intersect(a, b)) AS DOUBLE) / size(array_union(a, b))"

  private def both(a: Seq[Long], b: Seq[Long]): (java.lang.Double, java.lang.Double) = {
    val r = Seq((a.toArray, b.toArray)).toDF("a", "b")
      .select(expr("jaccard_sorted(a, b)").as("fused"), expr(declarative).as("decl"))
      .head()
    (if (r.isNullAt(0)) null else r.getDouble(0),
      if (r.isNullAt(1)) null else r.getDouble(1))
  }

  test("fused merge equals the intersect/union form on hand cases") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),   // overlap 2 of 4
      (Seq(1L, 2L), Seq(3L, 4L)),           // disjoint → 0.0
      (Seq(5L, 6L, 7L), Seq(5L, 6L, 7L)),   // identical → 1.0
      (Seq.empty[Long], Seq(1L)),           // one empty → 0.0
      (Seq(1L, 1L, 2L), Seq(1L, 2L, 2L)),   // duplicates: SET semantics → 1.0
      (Seq(Long.MinValue, -1L, Long.MaxValue), Seq(Long.MinValue, 0L, Long.MaxValue)))
    cases.foreach { case (a, b) =>
      val (f, d) = both(a.sorted, b.sorted)
      assert(f != null && d != null, s"$a vs $b")
      assert(java.lang.Double.doubleToLongBits(f) ===
        java.lang.Double.doubleToLongBits(d), s"$a vs $b: fused $f decl $d")
    }
  }

  test("both-empty arrays: NULL, where the declarative ANSI division THROWS") {
    // under ANSI (Spark 4 default) the declarative form raises DIVIDE_BY_ZERO
    // on two empty sets; the fused form degrades to NULL instead — strictly
    // safer for a τ-threshold filter, and the only point where they differ
    val r = Seq((Array.empty[Long], Array.empty[Long])).toDF("a", "b")
      .select(expr("jaccard_sorted(a, b)").as("fused")).head()
    assert(r.isNullAt(0), "fused should be NULL on two empty arrays")
    val thrown = intercept[Exception] {
      Seq((Array.empty[Long], Array.empty[Long])).toDF("a", "b")
        .select(expr(declarative).as("decl")).head()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"), thrown.getMessage)
  }

  test("null array and null element surface as NULL") {
    val r = spark.range(1).select(
      expr("jaccard_sorted(CAST(NULL AS ARRAY<BIGINT>), array(1L))").as("na"),
      expr("jaccard_sorted(array(1L, CAST(NULL AS BIGINT)), array(1L))").as("ne"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("property: equals the declarative form on random sorted-distinct arrays") {
    // 30 sampled pairs in ONE Spark job (a job per ScalaCheck case is slow)
    val gen = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
    val samples = Gen.listOfN(30, Gen.zip(gen, gen)).sample.get
    val rows = samples.map { case (a, b) => (a.toArray, b.toArray) }
      .toDF("a", "b")
      .select(expr("jaccard_sorted(a, b)").as("fused"), expr(declarative).as("decl"))
      .collect()
    assert(rows.length == 30)
    rows.zip(samples).foreach { case (r, (a, b)) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"$a vs $b")
      if (!r.isNullAt(0)) {
        val (f, d) = (r.getDouble(0), r.getDouble(1))
        assert((f.isNaN && d.isNaN) ||
          java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(d),
          s"$a vs $b: fused $f decl $d")
      }
    }
  }

  test("interpreted eval path (codegen disabled) agrees too") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key, "FALLBACK")
    try {
      spark.conf.set(key, "NO_CODEGEN")
      val (f, d) = both(Seq(1L, 3L, 9L), Seq(1L, 4L, 9L, 12L))
      assert(java.lang.Double.doubleToLongBits(f) ===
        java.lang.Double.doubleToLongBits(d))
    } finally spark.conf.set(key, old)
  }
}
