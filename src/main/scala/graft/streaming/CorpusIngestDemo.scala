package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{CorpusQc, Dedup}

/** Runnable corpus-ingest demo: feeds the "new" documents (doc_id % 10 == 0,
  * the incrementalDedup convention) through a watched directory as arriving
  * JSON files, runs [[CorpusIngest]] over the file stream, and checks the
  * landed qc/contam/dups tables against their batch twins — then runs the
  * incremental quality-percentile stream over the same files and checks
  * its published table against the batch percentile transform.
  *
  * `runMain graft.streaming.CorpusIngestDemo [sfDir]` — prints
  * `INGEST_BATCHES=<n>`, `INGEST_OK=true`, and `PERCENTILE_OK=true` on
  * convergence.
  */
object CorpusIngestDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("4")
    import spark.implicits._

    val inDir = Files.createTempDirectory("graft_ingest_in").toString
    val outDir = Files.createTempDirectory("graft_ingest_out").toString
    val ckpt = Files.createTempDirectory("graft_ingest_ckpt").toString

    val newDocs = Tables.documents(spark, sfDir).filter(col("doc_id") % 10 === 0)
    def feed(filter: String): Unit =
      newDocs.filter(filter).write.mode("append").json(inDir)

    feed("doc_id % 20 = 0") // first tranche, then start the stream
    val docStream = spark.readStream
      .schema(newDocs.schema)
      .json(inDir)
    val q = CorpusIngest.start(docStream, sfDir, outDir, ckpt, triggerInterval = "1 second")
    q.processAllAvailable()
    feed("doc_id % 20 = 10") // second tranche while the query runs
    q.processAllAvailable()
    q.stop()
    println(s"INGEST_BATCHES=${spark.read.parquet(s"$outDir/qc").select("batch_id").distinct().count()}")

    def landed(sub: String) = spark.read.parquet(s"$outDir/$sub").drop("batch_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val ok =
      rows(landed("qc")) == rows(CorpusQc.repetitionOf(newDocs)) &&
        rows(landed("contam")) ==
          rows(CorpusQc.contaminationOf(newDocs, CorpusQc.benchShingles(spark, sfDir))) &&
        rows(landed("dups")) == rows(Dedup.probeBatch(spark, sfDir, newDocs))
    println(s"INGEST_OK=$ok")

    // the incremental percentile over the same arriving files: after the
    // last batch the published table equals the batch transform over the
    // same docs bit-for-bit
    val pctState = Files.createTempDirectory("graft_pct_state").toString
    val pctCkpt = Files.createTempDirectory("graft_pct_ckpt").toString
    val pctStream = spark.readStream.schema(newDocs.schema).json(inDir)
    val pq = CorpusIngest.startPercentile(pctStream, pctState, pctCkpt,
      triggerInterval = "1 second")
    pq.processAllAvailable()
    pq.stop()
    val pctOk = rows(spark.read.parquet(s"$pctState/percentile")) ==
      rows(graft.pipeline.TextAnalysis.qualityPercentileOf(
        graft.pipeline.TextAnalysis.qualityScoreOf(newDocs)
          .select("doc_id", "quality_score")))
    println(s"PERCENTILE_OK=$pctOk")
    spark.stop()
  }
}
