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
    * (null for non-image payloads), then probes the arriving signatures
    * against the stream's landed history ([[probeHistory]]) and lands
    * the flagged near-dups — the [[CorpusIngest]] dedup-probe precedent
    * on the media path, possible in-stream because the signature lands
    * with the features (no payload re-read).
    */
  def batchWriter(spark: SparkSession, outDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      import spark.implicits._
      BatchedDecode.decodeWithSignature(batch.as[MediaRow])
        .write.mode("overwrite").parquet(s"$outDir/features/batch_id=$batchId")
      // read the landed rows back (cheap 8-byte hashes) instead of
      // decoding the payloads a second time
      val feats = spark.read.parquet(s"$outDir/features/batch_id=$batchId")
      probeHistory(spark, outDir, feats, batchId)
        .write.mode("overwrite").parquet(s"$outDir/dups/batch_id=$batchId")
    }

  /** Online image near-dup probe over the stream's OWN landed history:
    * the arriving batch's oriented aHashes band through the proven
    * `mm_ahash_dedup` blocking (4×16-bit chunk pigeonhole — hamming ≤ 3
    * guarantees ≥ 1 exact chunk; MASKED extraction, never a signed
    * modulo) against every signature EARLIER batches landed, exact
    * popcount verify on the survivors. Per-batch cost ∝ batch size ×
    * matching band buckets; history is touched only through 8-byte
    * hashes, never payloads. Replay-idempotent: batch N probes strictly
    * `batch_id < N`, so re-running a committed batch recomputes the
    * same rows ([[CorpusIngest.batchWriter]] discipline).
    */
  def probeHistory(spark: SparkSession, outDir: String,
      feats: DataFrame, batchId: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    def bands(df: DataFrame, ah: String) = df.select(col("*"),
      posexplode(expr(s"transform(sequence(0, 3), c -> shiftright($ah, c * 16) & 65535)"))
        .as(Seq("chunk_id", "chunk")))
    val arriving = bands(feats.filter(col("ahash64").isNotNull)
      .select(col("doc_id"), col("ahash64")), "ahash64")
    val history = bands(spark.read.parquet(s"$outDir/features")
      .filter(col("batch_id") < batchId && col("ahash64").isNotNull)
      .select(col("doc_id").as("dup_of"), col("ahash64").as("ah_prior")), "ah_prior")
    arriving.join(history, Seq("chunk_id", "chunk"))
      .select(col("doc_id"), col("ahash64"), col("dup_of"), col("ah_prior"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ahash64 ^ ah_prior) AS INT)"))
      .filter(col("hamming") <= 3)
      .select("doc_id", "dup_of", "hamming")
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
