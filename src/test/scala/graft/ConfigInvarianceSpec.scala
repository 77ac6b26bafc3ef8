package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism under execution-config change: every oracle-checked double
  * in this engine claims BIT-identity under any partitioning — so running
  * the riskiest queries (sorted folds, histogram rank cuts, distributed
  * prefix sums, iterated joins) with a different shuffle fan-out and AQE
  * disabled must reproduce the default-config rows exactly. This is the
  * property the DuckDB oracle cannot test (it always sees one engine's
  * output): plan-shape changes inside Spark itself must be invisible.
  */
class ConfigInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  /** The determinism-riskiest registered queries: order-sensitive double
    * folds, bucket-decomposed ranks, two-phase prefix sums, repartitioned
    * iterations.
    */
  private val risky = Seq(
    "text_perplexity_filter",  // sorted_sum fold + histogram rank cut
    "train_dsir_weights",      // sorted_sum + histRankDesc
    "lineitem_corr_matrix",    // limb-exact integer-moment crossing
    "parts_abc_classification", // two-phase distributed prefix sum
    "text_vocab_coverage",     // prefix sum over range partitioning
    "events_value_quantiles_hist", // histogram-bucket quantiles
    "events_disorder_report",  // distributed prefix max
    "dedup_cosine_lsh",        // banded candidates + exact verify
    "hybrid_rrf_fusion",       // two-arm rank fusion
    "events_ab_ztest",         // exact-int z math
    "fuzzy_radius_profile",    // memoized d=2 pair set + distance buckets
    "mm_real_ahash_dedup",     // typed decode batcher + integer hash + blocking
    "mm_real_decode")          // real PPM parse, float-rounded banded luma

  test("risky queries are bit-identical under shuffle=7 + AQE off") {
    def run(name: String): Seq[Seq[Any]] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    val defaults = risky.map(n => n -> run(n)).toMap
    val conf = spark.conf
    val (p0, aqe0) = (conf.get("spark.sql.shuffle.partitions"),
      conf.get("spark.sql.adaptive.enabled"))
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      conf.set("spark.sql.adaptive.enabled", "false")
      Scratch.clearMemo() // memoized stages must REBUILD under the new config
      risky.foreach { n =>
        assert(run(n) == defaults(n), s"$n drifted under shuffle=7/AQE-off")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", p0)
      conf.set("spark.sql.adaptive.enabled", aqe0)
      Scratch.clearMemo() // don't leak config-7 memo tables to other suites
    }
  }
}
