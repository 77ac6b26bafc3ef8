package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.{BatchedDecode, MediaCodec, MediaRow}

/** The streaming media ingest must converge to its batch twin, and the
  * REAL decoders must run inside the stream: a PPM/WAV payload arriving in
  * a micro-batch lands the same features [[MediaCodec]] computes directly.
  */
class MediaIngestSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sqlCtx: SQLContext = spark.sqlContext

  private def ppm(seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    MediaCodec.encodePpm(MediaCodec.RasterImage(4, 4,
      Array.fill(48)(rnd.nextInt(256).toByte)))
  }

  private def wav(seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    MediaCodec.wavHeader(32) ++ Array.fill(32)(rnd.nextInt(256).toByte)
  }

  private lazy val rows: Seq[MediaRow] = Seq(
    MediaRow(1L, "image", ppm(1)),
    MediaRow(2L, "image", ppm(2)),
    MediaRow(3L, "audio", wav(3)),
    MediaRow(4L, "text", "no magic bytes here, stub path".getBytes("UTF-8")),
    MediaRow(5L, "audio", wav(5)),
    MediaRow(6L, "image", ppm(6)))

  test("streamed media decode converges to the batch core; real decoders run in-stream; replay idempotent") {
    val outDir = Files.createTempDirectory("graft_media_out").toString
    val ckpt = Files.createTempDirectory("graft_media_ckpt").toString
    val (a, b) = rows.splitAt(3)
    val src = MemoryStream[MediaRow]
    val q = MediaIngest.start(src.toDF, outDir, ckpt)
    try {
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    def landed(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = landed(spark.read.parquet(s"$outDir/features").select("doc_id", "feature"))
    val batchTwin = BatchedDecode.decodeFeatures(rows.toDS()).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(got == batchTwin, "stream must converge to the batch decode core")
    // the REAL parsers ran in-stream, not the stub
    assert(got(1L) == MediaCodec.bandedLuma(MediaCodec.decodePpm(ppm(1))).toSeq)
    assert(got(3L) == MediaCodec.bandedAmplitude(MediaCodec.decodeWav(wav(3))).toSeq)
    assert(got(4L) == (new BatchedDecode.StubDecoder)
      .decode("no magic bytes here, stub path".getBytes("UTF-8")).toSeq)

    // the dedup signature lands NEXT TO the features: images carry the
    // orientation-normalized aHash, non-images null — and the stream
    // matches the batch twin on the signature column too
    def sigs(df: DataFrame) = df.select("doc_id", "ahash64").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val gotSig = sigs(spark.read.parquet(s"$outDir/features"))
    val twinSig = BatchedDecode.decodeWithSignature(rows.toDS()).collect()
      .map(f => f.doc_id -> f.ahash64).toMap
    assert(gotSig == twinSig, "stream must converge to the batch twin on the signature")
    assert(gotSig(1L).contains(MediaCodec.orientedAhash64(ppm(1))),
      "an image payload's streamed signature IS the X127 oriented aHash")
    assert(gotSig(3L).isEmpty && gotSig(4L).isEmpty,
      "audio/stub payloads carry no image hash")

    // crash replay: re-running a committed batch overwrites, never appends
    MediaIngest.batchWriter(spark, outDir)(a.toDF(), 0L)
    assert(landed(spark.read.parquet(s"$outDir/features")
      .select("doc_id", "feature")) == got)
  }

  test("arriving images probe the stream's landed history: near-dups flag, replay idempotent") {
    val outDir = Files.createTempDirectory("graft_media_dup_out").toString
    val ckpt = Files.createTempDirectory("graft_media_dup_ckpt").toString
    val src = MemoryStream[MediaRow]
    val q = MediaIngest.start(src.toDF, outDir, ckpt)
    try {
      // batch 1: two distinct images + audio; batch 2: an exact re-landing
      // of image 1 under a new id, plus a fresh image and fresh audio
      src.addData(MediaRow(1L, "image", ppm(1)), MediaRow(2L, "image", ppm(2)),
        MediaRow(3L, "audio", wav(3)))
      q.processAllAvailable()
      src.addData(MediaRow(10L, "image", ppm(1)), MediaRow(11L, "image", ppm(40)),
        MediaRow(12L, "audio", wav(3)))
      q.processAllAvailable()
    } finally q.stop()
    def dups() = spark.read.parquet(s"$outDir/dups").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = dups()
    // the re-landed image flags against its batch-1 original at hamming 0;
    // the first batch has no history, audio carries no signature
    assert(got.contains((10L, 1L, 0)), got.toString)
    assert(!got.exists { case (a, b, _) => a <= 3L || b == 3L || b == 12L }, got.toString)
    // fresh image 40 must not collide with 1/2 (distinct random rasters)
    assert(!got.exists { case (a, _, _) => a == 11L }, got.toString)
    // crash replay: re-running committed batch 1 (batch_id 1) recomputes
    // the same dup rows — the probe reads strictly batch_id < 1
    val replayRows = Seq(MediaRow(10L, "image", ppm(1)),
      MediaRow(11L, "image", ppm(40)), MediaRow(12L, "audio", wav(3)))
    MediaIngest.batchWriter(spark, outDir)(replayRows.toDF(), 1L)
    assert(dups() == got, "replaying a committed batch must not change the dup set")
    // duplicates arriving in the SAME batch flag newer-against-older
    // through the intra-batch leg (invisible to the history probe)
    MediaIngest.batchWriter(spark, outDir)(
      Seq(MediaRow(20L, "image", ppm(7)), MediaRow(21L, "image", ppm(7))).toDF(), 2L)
    assert(dups().contains((21L, 20L, 0)), dups().toString)
  }

  test("the dup probe partition-prunes the persisted band index and never shuffles it") {
    val outDir = Files.createTempDirectory("graft_media_plan").toString
    // land two batches through the production writer so real band dirs exist
    MediaIngest.batchWriter(spark, outDir)(rows.take(3).toDF(), 0L)
    MediaIngest.batchWriter(spark, outDir)(rows.drop(3).toDF(), 1L)
    val feats = spark.read.parquet(s"$outDir/features/batch_id=1")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // kill auto-broadcast: the HINT (not fixture size) must carry the shape
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = MediaIngest.probeHistory(spark, outDir, feats, 1L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"probe must broadcast the arriving side:\n$plan")
      // the index scan prunes on BOTH partition keys: strictly-older
      // batches, and only the bkt dirs the arriving hashes touch
      assert(plan.contains("PartitionFilters") && plan.contains("batch_id") &&
        plan.contains("bkt"), s"band index scan not partition-pruned:\n$plan")
      // zero history-side shuffle: the only hash exchange is the
      // answer-sized candidate-pair distinct AFTER the join
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1, s"band index side re-shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("blobs landing in a directory stream through binaryFile into the decode core") {
    import java.nio.file.{Files, Paths}
    val blobDir = Files.createTempDirectory("graft_blob_stream")
    val outDir = Files.createTempDirectory("graft_blob_out").toString
    val ckpt = Files.createTempDirectory("graft_blob_ckpt").toString
    val q = MediaIngest.start(
      graft.pipeline.MediaFiles.readStream(spark, blobDir.toString).toDF,
      outDir, ckpt)
    try {
      // first landing wave, then a second after a micro-batch has committed
      Files.write(Paths.get(blobDir.toString, "21.ppm"), ppm(21))
      q.processAllAvailable()
      Files.write(Paths.get(blobDir.toString, "22.wav"), wav(22))
      // a REAL (Deflater-compressed, CRC'd) PNG through the same stream
      val pngPx = Array.tabulate(8 * 8 * 3)(i => (i * 7 + 23).toByte)
      val pngBytes = graft.pipeline.MediaCodecSpec.pngFile(8, 8, 2, pngPx, _ % 5)
      Files.write(Paths.get(blobDir.toString, "23.png"), pngBytes)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$outDir/features").select("doc_id", "feature")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.keySet == Set(21L, 22L, 23L))
    assert(got(21L) == MediaCodec.bandedLuma(MediaCodec.decodePpm(ppm(21))).toSeq,
      "a .ppm blob landing mid-stream must REALLY decode")
    assert(got(22L) == MediaCodec.bandedAmplitude(MediaCodec.decodeWav(wav(22))).toSeq)
    val pngPx2 = Array.tabulate(8 * 8 * 3)(i => (i * 7 + 23).toByte)
    assert(got(23L) == MediaCodec.bandedLuma(
      MediaCodec.decodePng(graft.pipeline.MediaCodecSpec.pngFile(8, 8, 2, pngPx2, _ % 5))).toSeq,
      "a .png blob must inflate and unfilter through the streaming landing path")
  }
}
