package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{CorpusQc, Dedup}

case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

/** The streaming ingest must converge to its batch twins: feeding the
  * "new" docs (doc_id % 10 == 0, the incrementalDedup convention) through
  * CorpusIngest in two micro-batches lands exactly the rows the batch
  * operators produce on the same docs in one pass — and replaying a batch
  * (crash-recovery's at-least-once path) changes nothing.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sqlCtx: SQLContext = spark.sqlContext

  private lazy val newDocs: Seq[Doc] =
    graft.Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % 10 === 0)
      .as[Doc].collect().toSeq.sortBy(_.doc_id)

  test("streamed ingest converges to the batch twins and replays idempotently") {
    val outDir = Files.createTempDirectory("graft_ingest_out").toString
    val ckpt = Files.createTempDirectory("graft_ingest_ckpt").toString
    val (a, b) = newDocs.splitAt(newDocs.size / 2)
    val src = MemoryStream[Doc]
    val q = CorpusIngest.start(src.toDF, Sf0001, outDir, ckpt)
    try {
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    def landed(sub: String) = spark.read.parquet(s"$outDir/$sub").drop("batch_id")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

    val batchDocs = newDocs.toDF()
    assert(rows(landed("qc")) == rows(CorpusQc.repetitionOf(batchDocs)))
    assert(rows(landed("contam")) ==
      rows(CorpusQc.contaminationOf(batchDocs, CorpusQc.benchShingles(spark, Sf0001))))
    val streamedDups = rows(landed("dups"))
    assert(streamedDups == rows(Dedup.probeBatch(spark, Sf0001, batchDocs)))
    // and the probe agrees with the oracle-checked incremental query
    assert(streamedDups == rows(
      Dedup.incrementalDedup(spark, Sf0001).select("new_id", "corpus_id", "jaccard")))
    assert(streamedDups.nonEmpty, "fixture should contain planted near-dups")
    assert(rows(landed("chunks")) ==
      rows(graft.pipeline.TrainPrep.chunkDocsOf(batchDocs)))
    assert(rows(landed("screens")) == rows(CorpusQc.entropyQualityOf(batchDocs)))
    assert(rows(landed("screens")).nonEmpty)
    // the classifier stage serves the static trained artifact: streamed
    // scores equal the batch operator over the same docs, and agree with
    // the oracle-checked per-corpus query on the overlap
    assert(rows(landed("model_scores")) ==
      rows(graft.pipeline.TextClassifier.scoreBatch(spark, Sf0001, batchDocs)))
    assert(rows(landed("model_scores")).nonEmpty)

    // crash replay: re-running a committed batch overwrites, never appends
    val before = (rows(landed("qc")), rows(landed("contam")),
      rows(landed("dups")), rows(landed("chunks")))
    CorpusIngest.batchWriter(spark, Sf0001, outDir)(a.toDF(), 0L)
    assert((rows(landed("qc")), rows(landed("contam")),
      rows(landed("dups")), rows(landed("chunks"))) == before)
  }

  test("incremental dataset card converges to the batch card after two micro-batches") {
    val stateDir = Files.createTempDirectory("graft_card_state").toString
    val ckpt = Files.createTempDirectory("graft_card_ckpt").toString
    // the card is over the WHOLE corpus: stream every doc in two batches
    val allDocs = graft.Tables.documents(spark, Sf0001)
      .as[Doc].collect().toSeq.sortBy(_.doc_id)
    val (a, b) = allDocs.splitAt(allDocs.size / 2)
    val src = MemoryStream[Doc]
    val q = CorpusIngest.startCard(src.toDF, Sf0001, stateDir, ckpt)
    try {
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val streamed = rows(spark.read.parquet(s"$stateDir/card"))
    val batch = rows(CorpusQc.datasetCardKmv(spark, Sf0001))
    assert(streamed == batch,
      "stream card must equal the batch card bit-for-bit after the last batch")
    assert(streamed.nonEmpty)
    // replaying a committed batch (at-least-once recovery) changes nothing
    CorpusIngest.cardStateWriter(spark, Sf0001, stateDir)(a.toDF(), 0L)
    assert(rows(spark.read.parquet(s"$stateDir/card")) == batch)
  }

  test("incremental quality percentile converges to text_quality_percentile after two micro-batches") {
    val stateDir = Files.createTempDirectory("graft_pct_state").toString
    val ckpt = Files.createTempDirectory("graft_pct_ckpt").toString
    // the percentile is over the WHOLE corpus: stream every doc in two batches
    val allDocs = graft.Tables.documents(spark, Sf0001)
      .as[Doc].collect().toSeq.sortBy(_.doc_id)
    val (a, b) = allDocs.splitAt(allDocs.size / 2)
    val src = MemoryStream[Doc]
    val q = CorpusIngest.startPercentile(src.toDF, stateDir, ckpt)
    try {
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val streamed = rows(spark.read.parquet(s"$stateDir/percentile"))
    val batch = rows(
      graft.pipeline.TextAnalysis.qualityPercentile(spark, Sf0001))
    assert(streamed == batch,
      "stream percentile must equal text_quality_percentile bit-for-bit after the last batch")
    assert(streamed.nonEmpty)
    // replaying a committed batch (at-least-once recovery) changes nothing:
    // the score partial overwrites and the readout re-ranks the same state
    CorpusIngest.percentileStateWriter(spark, stateDir)(a.toDF(), 0L)
    assert(rows(spark.read.parquet(s"$stateDir/percentile")) == batch)
  }

  test("streaming domain cap converges to the batch host-caps pass and keeps counting across batches") {
    val src = MemoryStream[Doc]
    val admittedStream = CorpusIngest.domainCappedStream(src.toDF)
    val q = admittedStream.writeStream.queryName("domain_cap")
      .outputMode("append").format("memory").start()
    val (a, b) = newDocs.splitAt(newDocs.size / 2)
    try {
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
      // replaying already-admitted docs must NOT widen the quota usage
      // beyond the cap for any domain (a live quota counts arrivals)
      src.addData(a.take(5): _*); q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.table("domain_cap")
    val perDomain = admitted.groupBy("regdom").count()
      .as[(String, Long)].collect().toMap
    assert(perDomain.values.forall(_ <= graft.pipeline.HtmlExtract.HostCap),
      s"some domain exceeded the cap: $perDomain")
    // the first two batches arrived in doc_id order, so before the replay
    // the admitted set equals the batch pass exactly
    val batchKept = graft.pipeline.HtmlExtract.hostCapsOf(newDocs.toDF())
      .select("doc_id").as[Long].collect().toSet
    val streamedFirstTwo = admitted
      .select("doc_id").as[Long].collect().toSet
      .intersect(newDocs.map(_.doc_id).toSet)
    assert(batchKept.subsetOf(streamedFirstTwo),
      "every batch-kept doc must be admitted by the stream")
    assert(perDomain.keySet.intersect(
      graft.pipeline.HtmlExtract.BlockedDomains.toSet).isEmpty,
      "blocklisted domains must never be admitted")
  }

  test("robots admission derives from PARSED payloads and converges stream-to-batch") {
    // two domains' robots.txt, exercising grammar + longest-match through
    // the streaming path: s0.com disallows /private but allows
    // /private/open (the override a flat prefix filter cannot express);
    // s1.com addresses only OtherBot, so every page of it is admitted
    val robots = Seq(
      ("s0.com", "User-agent: *\nDisallow: /private\nAllow: /private/open"),
      ("s1.com", "User-agent: OtherBot\nDisallow: /")
    ).toDF("regdom", "robots_txt")
    def doc(id: Long, host: String, path: String) =
      Doc(id, s"doc $id body", "en", s"https://$host$path", 10L)
    val docs = Seq(
      doc(1, "w1.s0.com", "/public/a"),
      doc(2, "w1.s0.com", "/private/b"),
      doc(3, "w2.s0.com", "/private/open/c"),
      doc(4, "w1.s1.com", "/private/d"),
      doc(5, "w1.s1.com", "/anything"))
    val src = MemoryStream[Doc]
    val q = CorpusIngest.robotsAdmittedStream(src.toDF, robots)
      .writeStream.queryName("robots_admit")
      .outputMode("append").format("memory").start()
    val (a, b) = docs.splitAt(2)
    try {
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("robots_admit")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == Set(1L, 3L, 4L, 5L),
      s"longest-match admission wrong through the stream: $streamed")
    // the batch twin is the SAME derived-rules chain on the same rows
    val batch = CorpusIngest.robotsAdmittedStream(docs.toDF(), robots)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, "stream and batch admission diverge")
  }

  test("sitemap frontier: streamed coverage converges to the batch audit, frontier drains wave by wave") {
    // two domains' declared inventories, parsed from REAL sitemap XML
    // through the same parseSitemaps the batch audit uses: s0.com a
    // direct urlset (3 pages), s1.com a one-level index whose child
    // lists 2 pages — so the recursion leg feeds the stream too
    def urlset(urls: String*) =
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
        urls.map(u => s"<url><loc>$u</loc></url>").mkString + "</urlset>"
    val payloads = Seq(
      ("s0.com", "https://s0.com/sitemap.xml", true,
        urlset("https://s0.com/a", "https://s0.com/b", "https://s0.com/c")),
      ("s1.com", "https://s1.com/sitemap.xml", true,
        """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
          "<sitemap><loc>https://s1.com/maps/1.xml</loc></sitemap></sitemapindex>"),
      ("s1.com", "https://s1.com/maps/1.xml", false,
        urlset("https://s1.com/x", "https://s1.com/y"))
    ).toDF("regdom", "loc", "is_root", "xml")
    val inventory = graft.pipeline.Sitemaps.parseSitemaps(payloads)

    def doc(id: Long, url: String) = Doc(id, s"doc $id body", "en", url, 10L)
    val wave1 = Seq(doc(1, "https://s0.com/a"), doc(2, "https://s0.com/nope"),
      doc(3, "https://s1.com/x"))
    val wave2 = Seq(doc(4, "https://s0.com/b"), doc(5, "https://other.com/z"))
    val stateDir = Files.createTempDirectory("graft_frontier_state").toString
    val ckpt = Files.createTempDirectory("graft_frontier_ckpt").toString

    // the marked stream: listed flags per fetched page, stream == batch
    val src = MemoryStream[Doc]
    val marked = CorpusIngest.sitemapMarkedStream(src.toDF, inventory)
      .writeStream.queryName("sitemap_marked").outputMode("append")
      .format("memory").start()
    val src2 = MemoryStream[Doc]
    val q = CorpusIngest.startSitemapFrontier(src2.toDF, inventory, stateDir, ckpt)
    def frontierUrls() = spark.read.parquet(s"$stateDir/frontier")
      .select("url").as[String].collect().toSet
    try {
      src.addData(wave1: _*); marked.processAllAvailable()
      src2.addData(wave1: _*); q.processAllAvailable()
      // after wave 1 the frontier holds exactly the listed-unfetched pages
      assert(frontierUrls() == Set("https://s0.com/b", "https://s0.com/c",
        "https://s1.com/y"))
      src.addData(wave2: _*); marked.processAllAvailable()
      src2.addData(wave2: _*); q.processAllAvailable()
    } finally { marked.stop(); q.stop() }

    val streamedMarks = spark.table("sitemap_marked")
      .select("doc_id", "listed").as[(Long, Boolean)].collect().toSet
    assert(streamedMarks == Set((1L, true), (2L, false), (3L, true),
      (4L, true), (5L, false)))
    // stream == batch: the same marking operator over the same rows
    val batchMarks = CorpusIngest.sitemapMarkedStream(
      (wave1 ++ wave2).toDF(), inventory)
      .select("doc_id", "listed").as[(Long, Boolean)].collect().toSet
    assert(streamedMarks == batchMarks)

    // the drained frontier and per-domain coverage equal the batch audit
    assert(frontierUrls() == Set("https://s0.com/c", "https://s1.com/y"))
    val cov = spark.read.parquet(s"$stateDir/coverage")
      .select("regdom", "n_listed", "n_fetched_listed", "n_frontier")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(cov == Set(("s0.com", 3L, 2L, 1L), ("s1.com", 2L, 1L, 1L)))

    // crash replay: re-running a committed batch changes nothing
    CorpusIngest.frontierStateWriter(spark, inventory, stateDir)(wave1.toDF(), 0L)
    assert(frontierUrls() == Set("https://s0.com/c", "https://s1.com/y"))
  }

  test("watermarked ingest dedup: duplicates dropped inside the horizon, state evicted past it") {
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-06-01 $hhmm:00")
    val src = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = CorpusIngest.dedupedStream(
      src.toDF.toDF("doc_id", "text", "ingest_ts"), horizon = "1 hour")
    val q = deduped.writeStream.queryName("ingest_dedup")
      .outputMode("append").format("memory").start()
    try {
      // batch 1: in-batch duplicate collapses to the first arrival
      src.addData((1L, "alpha", ts("10:00")), (2L, "beta", ts("10:00")),
        (3L, "alpha", ts("10:05")))
      q.processAllAvailable()
      // batch 2: watermark (10:05 - 1h) has not passed alpha yet -> dropped
      src.addData((4L, "alpha", ts("10:10")))
      q.processAllAvailable()
      // batch 3: a fresh doc advances the watermark to 13:00, evicting alpha
      src.addData((5L, "gamma", ts("14:00")))
      q.processAllAvailable()
      // batch 4: the same content past the horizon is re-admitted
      src.addData((6L, "alpha", ts("14:01")))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.table("ingest_dedup")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 5L, 6L),
      s"expected in-horizon dups dropped and past-horizon re-admission, got $admitted")
  }
}
