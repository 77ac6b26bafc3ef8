package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The batched decode contract (the mapInPandas-analogue surface): results
  * must be deterministic and INDEPENDENT of batch size and partitioning —
  * the batching is an execution detail, not a semantic one.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs =
    Multimodal.media(spark, Sf0001)
      .select("doc_id", "media_type", "payload").as[MediaRow]

  test("batched decode is batch-size and partitioning invariant") {
    def run(batch: Int, parts: Int): Seq[(Long, Seq[Float])] =
      BatchedDecode.decodeFeatures(mediaDs.repartition(parts), batch)
        .collect().map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1)
    val base = run(64, 4)
    assert(base.nonEmpty)
    assert(base === run(1, 4))
    assert(base === run(7, 1))
  }

  test("stub decoder features are non-trivial and fixed-dimension") {
    val feats = BatchedDecode.decodeFeatures(mediaDs).collect()
    assert(feats.forall(_.feature.length == Multimodal.FeatureDim))
    assert(feats.exists(_.feature.exists(_ > 0f)))
  }

  test("declarative feature norms agree between media() rows and raw documents") {
    val n = Multimodal.featureExtract(spark, Sf0001)
    // every document appears exactly once with a finite norm
    assert(n.count() === graft.Tables.documents(spark, Sf0001).count())
    assert(n.filter(col("feature_norm").isNull || col("feature_norm") < 0).count() === 0)
  }
}
