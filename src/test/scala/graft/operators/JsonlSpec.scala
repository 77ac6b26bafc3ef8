package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The compressed-JSONL front door: batch/path-walk parity over a real
  * mixed-codec bucket, the reject matrix (malformed JSON, missing text,
  * bad ids), per-codec streaming decode, and the CorpusIngest front-door
  * convergence.
  */
class JsonlSpec extends SparkSpec {

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  private def line(id: Long, text: String, lang: String = "en",
      url: String = "https://x.example/p"): String =
    s"""{"id":"$id","text":"$text","lang":"$lang","url":"$url"}"""

  private def bucket(files: (String, Array[Byte])*): String = {
    val dir = Files.createTempDirectory("graft_jsonl_bucket").toString
    files.foreach { case (name, bytes) =>
      Files.write(Paths.get(dir, name), bytes)
    }
    dir
  }

  private def binaryFiles(dir: String) =
    spark.read.format("binaryFile").load(dir)

  test("batch front door: codecs by extension, doc_id scheme, field mapping") {
    val plain = (line(1, "alpha text") + "\n" + line(2, "beta text", "de") + "\n")
      .getBytes("UTF-8")
    val gz = gzip((line(3, "gamma text") + "\n").getBytes("UTF-8"))
    val zst = graft.functions.ZstdDeflate.deflate(
      (line(4, "delta text", "fr", "https://y.example/q") + "\n").getBytes("UTF-8"))
    val lz4 = graft.functions.Lz4Deflate.deflate(
      (line(5, "epsilon text") + "\n").getBytes("UTF-8"))
    val dir = bucket("10.jsonl" -> plain, "11.jsonl.gz" -> gz,
      "12.jsonl.zst" -> zst, "13.jsonl.lz4" -> lz4)
    Files.write(Paths.get(dir, "notes.txt"), "not a drop".getBytes) // skipped
    val got = Jsonl.docsFromFiles(binaryFiles(dir))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ((10L << 24) | 0, "alpha text", "en", "https://x.example/p", 10L),
      ((10L << 24) | 1, "beta text", "de", "https://x.example/p", 9L),
      (11L << 24, "gamma text", "en", "https://x.example/p", 10L),
      (12L << 24, "delta text", "fr", "https://y.example/q", 10L),
      (13L << 24, "epsilon text", "en", "https://x.example/p", 12L)))
  }

  test("path walk == batch front door on the same mixed bucket") {
    val many = (0 until 300).map(i => line(i, s"doc number $i body")).mkString("\n") + "\n"
    val dir = bucket(
      "20.jsonl" -> many.getBytes("UTF-8"),
      "21.jsonl.gz" -> gzip(many.getBytes("UTF-8")),
      "22.jsonl.zst" -> graft.functions.ZstdDeflate.deflate(many.getBytes("UTF-8")),
      "23.jsonl.lz4" -> graft.functions.Lz4Deflate.deflate(many.getBytes("UTF-8")))
    val batch = Jsonl.docsFromFiles(binaryFiles(dir)).collect().map(_.toSeq).toSet
    val walk = Jsonl.docsFromPaths(spark, dir).collect().map(_.toSeq).toSet
    assert(batch.size == 1200 && walk == batch)
  }

  test("defaults: missing lang/url coalesce to und/unknown in both paths") {
    val bare = """{"id":"9","text":"bare minimum"}""" + "\n"
    val dir = bucket("30.jsonl" -> bare.getBytes("UTF-8"))
    for (df <- Seq(Jsonl.docsFromFiles(binaryFiles(dir)), Jsonl.docsFromPaths(spark, dir))) {
      val r = df.collect().head
      assert(r.getString(2) == "und" && r.getString(3) == "unknown")
    }
  }

  test("empty lines and a trailing newline are not documents") {
    val body = line(1, "one") + "\n\n" + line(2, "two") + "\n\n\n"
    val dir = bucket("40.jsonl" -> body.getBytes("UTF-8"))
    val ids = Jsonl.docsFromFiles(binaryFiles(dir))
      .collect().map(_.getLong(0)).sorted.toSeq
    // non-empty-line index: doc 'two' is line index 1, not 3
    assert(ids == Seq((40L << 24) | 0, (40L << 24) | 1))
    assert(Jsonl.docsFromPaths(spark, dir).count() == 2)
  }

  test("scalar coercion parity: numeric text/lang coerce to token text in BOTH paths; null text rejects") {
    // from_json renders a JSON number in a string field as its token text
    // (measured FAILFAST behavior); the Jackson walk must match exactly
    val body = ("""{"id":"1","text":123,"lang":7}""" + "\n").getBytes("UTF-8")
    val dir = bucket("70.jsonl" -> body)
    for (df <- Seq(Jsonl.docsFromFiles(binaryFiles(dir)), Jsonl.docsFromPaths(spark, dir))) {
      val r = df.collect().head
      assert(r.getString(1) == "123" && r.getString(2) == "7")
    }
    val nullText = ("""{"id":"2","text":null}""" + "\n").getBytes("UTF-8")
    val d2 = bucket("71.jsonl" -> nullText)
    intercept[Exception](Jsonl.docsFromFiles(binaryFiles(d2)).collect())
    intercept[Exception](Jsonl.docsFromPaths(spark, d2).collect())
  }

  test("reject matrix: malformed JSON and missing text throw in both paths") {
    val badJson = (line(1, "fine") + "\n" + """{"id":"2","text": not-json}""" + "\n")
      .getBytes("UTF-8")
    val noText = """{"id":"3","lang":"en"}""".getBytes("UTF-8")
    val d1 = bucket("50.jsonl" -> badJson)
    val d2 = bucket("51.jsonl" -> noText)
    intercept[Exception](Jsonl.docsFromFiles(binaryFiles(d1)).collect())
    intercept[Exception](Jsonl.docsFromFiles(binaryFiles(d2)).collect())
    intercept[Exception](Jsonl.docsFromPaths(spark, d1).collect())
    intercept[Exception](Jsonl.docsFromPaths(spark, d2).collect())
  }

  test("reject matrix: corrupt codec stream throws, truncated gz throws") {
    val good = gzip((line(1, "x") + "\n").getBytes("UTF-8"))
    val d1 = bucket("60.jsonl.gz" -> good.dropRight(5))
    val garbageZst = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte, 1, 2, 3)
    val d2 = bucket("61.jsonl.zst" -> garbageZst)
    intercept[Exception](Jsonl.docsFromFiles(binaryFiles(d1)).collect())
    intercept[Exception](Jsonl.docsFromFiles(binaryFiles(d2)).collect())
    intercept[Exception](Jsonl.docsFromPaths(spark, d1).collect())
    intercept[Exception](Jsonl.docsFromPaths(spark, d2).collect())
  }

  test("file-id slot space: a 2^39 file id rejects loudly in both paths") {
    val dir = bucket(s"${1L << 39}.jsonl" -> (line(1, "x") + "\n").getBytes("UTF-8"))
    intercept[Exception](Jsonl.docsFromFiles(binaryFiles(dir)).collect())
    intercept[Exception](Jsonl.docsFromPaths(spark, dir).collect())
  }

  test("jsonl drops stream through CorpusIngest like documents (two waves + replay-safe landing)") {
    val blobDir = Files.createTempDirectory("graft_jsonl_stream").toString
    val outDir = Files.createTempDirectory("graft_jsonl_out").toString
    val ckpt = Files.createTempDirectory("graft_jsonl_ckpt").toString
    Files.write(Paths.get(blobDir, "7.jsonl.gz"),
      gzip((line(1, "the quick brown fox document") + "\n" +
        line(2, "ein anderes dokument mit text", "de") + "\n").getBytes("UTF-8")))
    val q = graft.streaming.CorpusIngest.start(
      Jsonl.docStream(spark, blobDir), Sf0001, outDir, ckpt)
    try {
      q.processAllAvailable()
      Files.write(Paths.get(blobDir, "8.jsonl.zst"),
        graft.functions.ZstdDeflate.deflate(
          (line(3, "a zstd compressed crawl record") + "\n").getBytes("UTF-8")))
      Files.write(Paths.get(blobDir, "readme.txt"), "not a drop".getBytes)
      q.processAllAvailable()
    } finally q.stop()
    val batchDocs = Jsonl.docsFromFiles(binaryFiles(blobDir))
    assert(batchDocs.count() == 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(spark.read.parquet(s"$outDir/chunks").drop("batch_id")) ==
      rows(graft.pipeline.TrainPrep.chunkDocsOf(batchDocs)))
    assert(rows(spark.read.parquet(s"$outDir/qc").drop("batch_id")) ==
      rows(graft.pipeline.CorpusQc.repetitionOf(batchDocs)))
  }
}
