package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** End-to-end composition: the per-stage operators are each oracle-checked,
  * but a trainer consumes them CHAINED — QC-filter → dedup → (split, pack,
  * negatives) over the surviving corpus. This spec runs the chain on real
  * fixture data through intermediate parquet stages (exactly how the
  * operators hand off at scale) and asserts the conservation laws that make
  * the hand-offs sound: survivors carry no duplicate fingerprints, every
  * stage sees exactly the surviving docs, the packing manifest covers them
  * exactly once, and negatives reference only corpus members.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("QC → dedup → split/pack/negatives composes with conservation at each hand-off") {
    val srcDocs = Tables.documents(spark, Sf0001)
    val total = srcDocs.count()

    // stage 1: QC gate — drop the lowest-quality tail
    val keep = TextAnalysis.qualityScore(spark, Sf0001)
      .filter(col("quality_score") >= 0.5).select("doc_id")
    // stage 2: content dedup — canonical survivors only
    val canon = Dedup.exactDedup(spark, Sf0001)
      .filter(!col("is_duplicate")).select("doc_id")
    val survivors = srcDocs.join(keep, "doc_id").join(canon, "doc_id")
    val nSurvivors = survivors.count()
    assert(nSurvivors > 0 && nSurvivors < total, "both gates must actually bite")

    // hand-off: the surviving corpus becomes the next stages' input table
    val stageDir = Files.createTempDirectory("graft_pipeline_stage").toString
    survivors.write.mode("overwrite").parquet(s"$stageDir/documents.parquet")
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet

    // stage 3a: split summary conserves the corpus
    val splitDocs = TrainPrep.stableSplit(spark, stageDir)
      .agg(sum("n_docs")).as[Long].collect().head
    assert(splitDocs === nSurvivors)

    // stage 3b: the packing manifest covers every survivor exactly once
    val packed = TrainPrep.packManifest(spark, stageDir)
      .select(explode(split(col("docs"), ",")).as("doc_id"))
      .select(col("doc_id").cast("long")).as[Long].collect()
    assert(packed.length === nSurvivors && packed.toSet === survivorIds)

    // stage 3c: negatives draw only from (and for) the surviving corpus
    val pairs = TrainPrep.negativePairs(spark, stageDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(pairs.length === nSurvivors * TrainPrep.NegativesPerAnchor)
    assert(pairs.forall { case (a, n) =>
      survivorIds.contains(a) && survivorIds.contains(n) && a != n })
  }
}
