package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.SimilaritySearch

case class Vec(vec_id: Long, embedding: Array[Float], label: Int)

/** The streaming ANN ingest must converge to its batch twin: probing new
  * vectors through AnnIngest in two micro-batches lands exactly the
  * neighbor rows the batch probe core produces on the same vectors in one
  * pass — and replaying a committed batch changes nothing.
  */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sqlCtx: SQLContext = spark.sqlContext

  /** Genuinely-new deterministic vectors (ids far above the corpus). */
  private lazy val newVecs: Seq[Vec] = (0 until 12).map { k =>
    Vec(100000L + k,
      Array.tabulate(64)(i => math.sin(i * (k + 2) + 0.5).toFloat), k % 4)
  }

  test("streamed ANN probes converge to the batch probe core and replay idempotently") {
    val outDir = Files.createTempDirectory("graft_ann_out").toString
    val ckpt = Files.createTempDirectory("graft_ann_ckpt").toString
    val (a, b) = newVecs.splitAt(newVecs.size / 2)
    val src = MemoryStream[Vec]
    val q = AnnIngest.start(src.toDF, Sf0001, outDir, ckpt)
    try {
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val landed = rows(spark.read.parquet(s"$outDir/topk").drop("batch_id"))
    val batchTwin = rows(SimilaritySearch.probeAgainst(
      SimilaritySearch.ivfIndex(spark, Sf0001, corpusOnly = false),
      newVecs.toDF()))
    assert(landed == batchTwin, "stream must converge to the batch probe")
    assert(landed.nonEmpty, "probes should find neighbors")
    // every probe got exactly K dense-ranked neighbors
    val byQ = landed.toSeq.groupBy(_.head)
    assert(byQ.keySet.size == newVecs.size)
    byQ.values.foreach(rs =>
      assert(rs.map(_(1)).toSet == (1L to SimilaritySearch.K).toSet))

    // crash replay: re-running a committed batch overwrites, never appends
    AnnIngest.batchWriter(spark, Sf0001, outDir)(a.toDF(), 0L)
    assert(rows(spark.read.parquet(s"$outDir/topk").drop("batch_id")) == landed)
  }
}
