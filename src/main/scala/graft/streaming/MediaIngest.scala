package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{BatchedDecode, MediaRow}

/** Streaming media ingest — the multimodal front door: arriving media
  * payloads are decoded per micro-batch through the SAME batched decode
  * core the oracle-checked queries use ([[BatchedDecode.decodeFeatures]]:
  * magic-sniffed REAL PPM/BMP/WAV/Y4M parsing, stub fallback for
  * compressed formats), and the per-batch feature rows land idempotently
  * under per-batch directories.
  *
  * A micro-batch is just a small batch, so the stream trivially converges
  * to its batch twin (MediaIngestSpec asserts it on mixed real+stub
  * payloads). No keyed state, no watermark: payloads arrive whole — the
  * [[CorpusIngest]] architecture note applies verbatim.
  *
  * Exactly-once: at-least-once batchId replay × per-batch-directory
  * overwrite ([[CorpusIngest.batchWriter]] discipline).
  *
  * Scale: decode cost is per-payload map work inside the per-batch decoder
  * context — the stream decodes where the bytes arrive, and sampling/
  * featurization happen AT the decoder, so only FeatureDim floats per
  * payload ever land.
  */
object MediaIngest {

  /** Per-batch decode + idempotent writer, exposed for replay tests.
    * Lands the X127 orientation-normalized aHash NEXT TO the features
    * (null for non-image payloads), so streamed images join the dedup
    * band index directly — no batch pass re-reads the payloads.
    */
  def batchWriter(spark: SparkSession, outDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      import spark.implicits._
      BatchedDecode.decodeWithSignature(batch.as[MediaRow])
        .write.mode("overwrite").parquet(s"$outDir/features/batch_id=$batchId")
    }

  def start(mediaStream: DataFrame, outDir: String, checkpointDir: String,
            triggerInterval: String = "1 second"): StreamingQuery =
    mediaStream.writeStream
      .queryName("media_ingest")
      .outputMode("append")
      .foreachBatch(batchWriter(mediaStream.sparkSession, outDir))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
}
