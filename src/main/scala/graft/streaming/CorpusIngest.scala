package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{CorpusQc, Dedup}

/** Streaming corpus ingestion — the LLM-data front door, end to end:
  * arriving documents are QC'd (repetition flags), checked for benchmark
  * contamination, probed for near-dups against the persisted corpus band
  * index, chunked into trainer-sized windows, and landed idempotently in
  * per-batch parquet directories.
  *
  * The four per-batch stages are the SAME batch operators the oracle
  * checks (`repetitionOf` / `contaminationOf` / `probeBatch` /
  * `TrainPrep.chunkDocsOf`) — documents
  * arrive whole, every metric is doc-local or probe-shaped, so a micro-batch
  * is just a small batch and the stream trivially converges to its batch
  * twin (CorpusIngestSpec asserts it). This is the honest architecture for
  * corpus ingest: no unbounded keyed state, no watermark gymnastics —
  * stateful machinery belongs to event streams (SensorStreams), not to
  * atomic-document pipelines.
  *
  * Exactly-once story: identical to [[SensorStreams.startDurable]] —
  * at-least-once batchId replay × per-batch-directory overwrite.
  *
  * Scale: per-batch cost ∝ batch size (signatures map-only, benchmark set
  * broadcast, corpus touched only through the bucketed band index); sizing
  * the trigger interval sizes the output files.
  */
object CorpusIngest {

  /** Streaming exact dedup at the ingest front door — the streaming twin of
    * `dedup_exact`: a document whose content fingerprint — md5 of the sorted
    * distinct token set, the IDENTICAL normalized expression the batch query
    * groups on (`Dedup.tokenSet`), so docs differing only in case,
    * whitespace, punctuation, or token order dedup the same way in both
    * pipelines — was already admitted within the watermark horizon is
    * dropped before any downstream stage pays for it.
    *
    * `dropDuplicatesWithinWatermark` is the operator that makes this safe at
    * 100 TB: fingerprint state lives only until the watermark passes its
    * event time + horizon, so state is bounded by the horizon's ingest
    * volume — where a bare streaming `dropDuplicates` would pin EVERY
    * fingerprint ever seen forever. The trade is explicit and honest: a
    * re-crawl of the same document farther apart than the horizon is
    * re-admitted (CorpusIngestSpec pins both directions) — cross-horizon
    * dedup belongs to the batch band-index probe (`probeBatch`), which this
    * stage feeds.
    */
  def dedupedStream(docStream: DataFrame, horizon: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    docStream
      .withColumn("fp", expr(s"md5(array_join(${Dedup.tokenSet}, ' '))"))
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** The per-batch stage runner + idempotent writer, exposed for replay
    * tests and for running the same stages on a static batch.
    */
  def batchWriter(spark: SparkSession, sfDir: String, outDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      CorpusQc.repetitionOf(batch)
        .write.mode("overwrite").parquet(s"$outDir/qc/batch_id=$batchId")
      CorpusQc.contaminationOf(batch, CorpusQc.benchShingles(spark, sfDir))
        .write.mode("overwrite").parquet(s"$outDir/contam/batch_id=$batchId")
      Dedup.probeBatch(spark, sfDir, batch)
        .write.mode("overwrite").parquet(s"$outDir/dups/batch_id=$batchId")
      graft.pipeline.TrainPrep.chunkDocsOf(batch)
        .write.mode("overwrite").parquet(s"$outDir/chunks/batch_id=$batchId")
    }

  def start(docStream: DataFrame, sfDir: String, outDir: String,
            checkpointDir: String, triggerInterval: String = "1 second"): StreamingQuery =
    docStream.writeStream
      .queryName("corpus_ingest")
      .outputMode("append")
      .foreachBatch(batchWriter(docStream.sparkSession, sfDir, outDir))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
}
