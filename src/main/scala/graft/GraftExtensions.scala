package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.plans.{AsOfJoinStrategy, EliminateRedundantLeftJoin, PushLeftFilterThroughAsOf}

/** Session extension installing graft's native SQL functions, wired with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the public
  * extension point, so any Spark deployment (cluster or local) picks the
  * functions up without touching internal session state.
  *
  * Functions: `vec_dot(array<float|double>, array<float|double>) -> double`
  * (codegen'd strict-left-fold dot product; see [[functions.VectorDot]]),
  * `jaccard_sorted(array<bigint>, array<bigint>) -> double` (one-merge-pass
  * set Jaccard over sorted hash arrays; see [[functions.JaccardSorted]]),
  * `kmv_distinct(hash bigint) -> double` (bounded-buffer KMV distinct-count
  * sketch; see [[functions.KmvSketchAgg]]), `kmv_sketch(hash bigint) ->
  * array<bigint>` (the sketch SET itself, for KMV union/intersection
  * algebra; see [[functions.KmvSketchSetAgg]]), the bloom pair
  * `bloom_filter_agg` / `might_contain` (Spark's own runtime-filter
  * expressions surfaced for deliberate use; see [[functions.BloomAgg]],
  * [[functions.MightContain]], [[operators.BloomJoin]]), and
  * `lev_within(string, string, int) -> boolean` (banded bounded edit
  * distance for the fuzzy-join verify hot path; see
  * [[functions.LevWithin]]).
  *
  * Plans: the native as-of join ([[plans.AsOfJoinNode]] →
  * [[plans.AsOfMergeExec]] via [[plans.AsOfJoinStrategy]]) plus its one
  * safe rewrite, [[plans.PushLeftFilterThroughAsOf]], injected into the
  * operator-optimization batch so left-side filters reach the scan; and
  * [[plans.EliminateRedundantLeftJoin]], the semantic-layer join
  * elimination Spark's own optimizer lacks (provably-dead unique-keyed
  * left joins are dropped whole).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(functions.VectorDot.description)
    ext.injectFunction(functions.JaccardSorted.description)
    ext.injectFunction(functions.SortedSumAgg.description)
    ext.injectFunction(functions.KmvSketchAgg.description)
    ext.injectFunction(functions.KmvSketchSetAgg.description)
    ext.injectFunction(functions.MightContain.description)
    ext.injectFunction(functions.BloomAgg.description)
    ext.injectFunction(functions.LevWithin.description)
    ext.injectFunction(functions.MinhashSig.description)
    ext.injectFunction(functions.SimhashSig.description)
    ext.injectFunction(functions.Adler32Fn.description)
    ext.injectFunction(functions.Ascii85Armor.description)
    ext.injectFunction(functions.JpegDcScanHex.description)
    ext.injectFunction(functions.GifPixelBlocksHex.description)
    ext.injectFunction(functions.Ahash64Sampled.description)
    ext.injectFunction(functions.Hash60Array.description)
    ext.injectFunction(functions.Md5BucketCounts.description)
    ext.injectFunction(functions.TrigramBucketCounts.description)
    ext.injectFunction(functions.Gunzip.description)
    ext.injectFunction(functions.ZstdInflate.description)
    ext.injectFunction(functions.ZstdDeflate.description)
    ext.injectFunction(functions.Lz4Inflate.description)
    ext.injectFunction(functions.Lz4Deflate.description)
    ext.injectFunction(functions.NfcNormalize.description)
    ext.injectFunction(functions.ByteStats.entropyDescription)
    ext.injectFunction(functions.ByteStats.distinctDescription)
    ext.injectPlannerStrategy(_ => new AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => new PushLeftFilterThroughAsOf)
    ext.injectOptimizerRule(_ => new EliminateRedundantLeftJoin)
  }
}
