package graft.operators

import graft.SparkSpec
import graft.functions.Gunzip

/** The gzip kernel against the JDK's own writer (real dynamic-block
  * deflate, not the stored-block fixtures), header-flag variants, and the
  * WARC record walk's framing contract.
  */
class WarcSpec extends SparkSpec {

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  test("gunzip inverts GZIPOutputStream (real deflate), any size incl. empty") {
    for (n <- Seq(0, 1, 100, 70000)) {
      val data = Array.tabulate(n)(i => (i * 31 + 7).toByte)
      assert(Gunzip.gunzip(gzip(data)).toSeq == data.toSeq)
    }
  }

  test("gunzip concatenates members; members() preserves per-member boundaries") {
    val a = "first record".getBytes("US-ASCII")
    val b = "second, longer record with more bytes".getBytes("US-ASCII")
    val stream = gzip(a) ++ gzip(b)
    assert(Gunzip.gunzip(stream).toSeq == (a ++ b).toSeq)
    assert(Gunzip.members(stream).map(_.toSeq) == IndexedSeq(a.toSeq, b.toSeq))
  }

  test("gunzip honors FNAME/FEXTRA/FCOMMENT/FHCRC header fields") {
    val data = "payload".getBytes("US-ASCII")
    val plain = gzip(data)
    // splice FNAME ("x\0") + FCOMMENT ("c\0") + FEXTRA (2-byte XLEN + body)
    // after the 10-byte header and set the FLG bits (order per RFC 1952:
    // FEXTRA body first, then FNAME, then FCOMMENT)
    val flg = (plain(3) | 4 | 8 | 16).toByte
    val spliced = plain.take(3) ++ Array(flg) ++ plain.slice(4, 10) ++
      Array[Byte](3, 0, 1, 2, 3) ++ "x\u0000c\u0000".getBytes("US-ASCII") ++
      plain.drop(10)
    assert(Gunzip.gunzip(spliced).toSeq == data.toSeq)
  }

  test("gunzip rejects corruption loudly: flipped CRC, wrong ISIZE, truncation, bad magic") {
    val data = "some bytes worth checking".getBytes("US-ASCII")
    val good = gzip(data)
    val badCrc = good.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 1).toByte
    intercept[IllegalArgumentException](Gunzip.gunzip(badCrc))
    val badIsize = good.clone(); badIsize(badIsize.length - 1) = 9
    intercept[IllegalArgumentException](Gunzip.gunzip(badIsize))
    intercept[IllegalArgumentException](Gunzip.gunzip(good.dropRight(9)))
    val badMagic = good.clone(); badMagic(0) = 0x1e
    intercept[IllegalArgumentException](Gunzip.gunzip(badMagic))
  }

  test("gunzip as a SQL expression runs inside the plan on binary columns") {
    val data = "expression-side payload".getBytes("US-ASCII")
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(gzip(data))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("gz",
          org.apache.spark.sql.types.BinaryType))))
    val out = df.selectExpr("cast(gunzip(gz) as string) AS s").collect()
    assert(out.head.getString(0) == "expression-side payload")
  }

  test("crawl bucket front door: .warc/.warc.gz blobs stream through CorpusIngest like documents") {
    import java.nio.file.{Files, Paths}
    def record(typ: String, uri: String, lang: String, text: String): Array[Byte] = {
      val payload = text.getBytes("UTF-8")
      val hdr = new StringBuilder(s"WARC/1.0\r\nWARC-Type: $typ\r\n")
      if (uri.nonEmpty) hdr.append(s"WARC-Target-URI: $uri\r\n")
      if (lang.nonEmpty) hdr.append(s"WARC-Identified-Content-Language: $lang\r\n")
      hdr.append(s"Content-Length: ${payload.length}\r\n\r\n")
      hdr.toString.getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes
    }
    // file 7: gzip-per-record (the Common Crawl shape) — warcinfo + 2 responses
    val f7 = gzip(record("warcinfo", "", "", "crawler metadata")) ++
      gzip(record("response", "http://a.example/", "en", "the quick brown fox document")) ++
      gzip(record("response", "http://b.example/", "de", "ein anderes dokument mit text"))
    // file 8: plain WARC — 1 response
    val f8 = record("response", "http://c.example/", "en", "a plain uncompressed crawl record")
    val blobDir = Files.createTempDirectory("graft_warc_bucket")
    val outDir = Files.createTempDirectory("graft_warc_out").toString
    val ckpt = Files.createTempDirectory("graft_warc_ckpt").toString
    Files.write(Paths.get(blobDir.toString, "7.warc.gz"), f7)
    val q = graft.streaming.CorpusIngest.start(
      Warc.docStream(spark, blobDir.toString), Sf0001, outDir, ckpt)
    try {
      q.processAllAvailable()
      Files.write(Paths.get(blobDir.toString, "8.warc"), f8) // second wave
      Files.write(Paths.get(blobDir.toString, "readme.txt"), "not a crawl".getBytes)
      q.processAllAvailable()
    } finally q.stop()
    // the stream must land exactly what the batch twins produce on the
    // same parsed documents (warcinfo and readme.txt contribute nothing)
    val batchDocs = Warc.docsFromFiles(spark.read.format("binaryFile").load(blobDir.toString))
    assert(batchDocs.count() == 3)
    val got = batchDocs.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSeq
    assert(got == Seq(
      ((7L << 24) | 1, "en", "http://a.example/"),
      ((7L << 24) | 2, "de", "http://b.example/"),
      (8L << 24, "en", "http://c.example/")))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(spark.read.parquet(s"$outDir/chunks").drop("batch_id")) ==
      rows(graft.pipeline.TrainPrep.chunkDocsOf(batchDocs)))
    assert(rows(spark.read.parquet(s"$outDir/qc").drop("batch_id")) ==
      rows(graft.pipeline.CorpusQc.repetitionOf(batchDocs)))
  }

  test("WARC record walk: headers, Content-Length framing, separators; rejects half-files") {
    val payload1 = "0123456789".getBytes("US-ASCII")
    val payload2 = "abcdef".getBytes("US-ASCII")
    val file =
      ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 10\r\n\r\n").getBytes("US-ASCII") ++
        payload1 ++ "\r\n\r\n".getBytes ++
        ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://e/\r\nContent-Length: 6\r\n\r\n")
          .getBytes("US-ASCII") ++ payload2 ++ "\r\n\r\n".getBytes
    val rs = Warc.records(file)
    assert(rs.length == 2)
    assert(rs(0).headers("WARC-Type") == "warcinfo" && rs(0).payload.toSeq == payload1.toSeq)
    assert(rs(1).headers("WARC-Target-URI") == "http://e/" && rs(1).payload.toSeq == payload2.toSeq)
    // gzip-per-record physical shape parses identically through read()
    val gzFile = gzip(file.take(file.length - payload2.length - 4 -
      ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://e/\r\nContent-Length: 6\r\n\r\n").length)) ++
      gzip(file.drop(file.length - payload2.length - 4 -
        ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://e/\r\nContent-Length: 6\r\n\r\n").length))
    val rs2 = Warc.read(gzFile)
    assert(rs2.map(_.headers("WARC-Type")) == IndexedSeq("warcinfo", "response"))
    // rejects: truncated payload, missing separator, missing Content-Length
    intercept[IllegalArgumentException](Warc.records(file.dropRight(6)))
    intercept[IllegalArgumentException](
      Warc.records("WARC/1.0\r\nWARC-Type: x\r\n\r\n".getBytes("US-ASCII")))
    // hostile Content-Length values hit the NAMED rejects, not a wrapped
    // Int escaping to copyOfRange or a bare NumberFormatException
    val huge = intercept[IllegalArgumentException](
      Warc.records("WARC/1.0\r\nContent-Length: 2147483600\r\n\r\n".getBytes("US-ASCII")))
    assert(huge.getMessage.contains("truncated record payload"))
    val nonNum = intercept[IllegalArgumentException](
      Warc.records("WARC/1.0\r\nContent-Length: abc\r\n\r\n".getBytes("US-ASCII")))
    assert(nonNum.getMessage.contains("non-numeric Content-Length"))
  }

  test("streaming record walk equals the in-memory walk (plain + gzip-per-record)") {
    val payload = Array.tabulate(700)(i => (i * 11 + 2).toByte) // binary payload
    def rec(typ: String, p: Array[Byte]) =
      s"WARC/1.0\r\nWARC-Type: $typ\r\nContent-Length: ${p.length}\r\n\r\n"
        .getBytes("US-ASCII") ++ p ++ "\r\n\r\n".getBytes
    val r1 = rec("warcinfo", "info payload".getBytes("US-ASCII"))
    val r2 = rec("response", payload)
    val file = r1 ++ r2
    def stream(bytes: Array[Byte]) =
      Warc.readStreamRecords(new java.io.ByteArrayInputStream(bytes))
        .map(r => (r.headers("WARC-Type"), r.payload.toSeq)).toSeq
    val want = Warc.read(file).map(r => (r.headers("WARC-Type"), r.payload.toSeq))
    assert(stream(file) == want)
    assert(stream(gzip(r1) ++ gzip(r2)) == want) // per-record members, incremental
    // truncated payload and missing separator reject mid-stream
    intercept[IllegalArgumentException](stream(file.dropRight(6)))
    intercept[IllegalArgumentException](
      stream("WARC/1.0\r\nContent-Length: abc\r\n\r\n".getBytes("US-ASCII")))
  }

  test("httpSplit: status line, headers, body; charset dispatch; rejects") {
    val body = Array[Byte](72, -28, -1, 10, 1) // 0x48 0xE4 0xFF 0x0A 0x01
    val payload = ("HTTP/1.1 301 Moved Permanently\r\nLocation: http://e/\r\n" +
      "Content-Type: text/html; charset=ISO-8859-1\r\n\r\n").getBytes("US-ASCII") ++ body
    val r = Warc.httpSplit(payload)
    assert(r.status == 301)
    assert(r.headers("location") == "http://e/")
    assert(r.body.toSeq == body.toSeq)
    // charset comes from the header; decode is latin-1 = byte -> codepoint
    assert(Warc.httpCharset(r.headers) == "iso-8859-1")
    val text = new String(r.body, "ISO-8859-1")
    assert(text.map(_.toInt) == Seq(0x48, 0xE4, 0xFF, 0x0A, 0x01))
    // no charset -> the HTML5 default
    assert(Warc.httpCharset(Map("content-type" -> "text/html")) == "utf-8")
    assert(Warc.httpCharset(Map.empty) == "utf-8")
    // rejects: no status line, malformed header, unterminated headers
    intercept[IllegalArgumentException](
      Warc.httpSplit("hello world\r\n\r\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Warc.httpSplit("HTTP/1.1 200 OK\r\nbroken\r\n\r\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Warc.httpSplit("HTTP/1.1 200 OK\r\nA: b\r\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Warc.httpSplit("HTTP/1.1 abc OK\r\n\r\n".getBytes("US-ASCII")))
  }

  test("docsFromPaths: the streaming front door matches docsFromFiles row for row") {
    val spark = graft.SparkSpec.session
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_warc_paths")
    def rec(headers: String, text: String) = {
      val p = text.getBytes("UTF-8")
      s"WARC/1.0\r\n${headers}Content-Length: ${p.length}\r\n\r\n"
        .getBytes("US-ASCII") ++ p ++ "\r\n\r\n".getBytes
    }
    val f5 = rec("WARC-Type: warcinfo\r\n", "crawl info") ++
      rec("WARC-Type: response\r\nWARC-Target-URI: http://a/\r\n" +
        "WARC-Identified-Content-Language: deu\r\n", "erstes dokument 😀")
    Files.write(Paths.get(dir.toString, "5.warc"), f5)
    val f6 = rec("WARC-Type: response\r\nWARC-Target-URI: http://b/\r\n", "a gzipped doc")
    Files.write(Paths.get(dir.toString, "6.warc.gz"), gzip(f6))
    Files.write(Paths.get(dir.toString, "_SUCCESS"), Array.emptyByteArray)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val byPath = rows(Warc.docsFromPaths(spark, dir.toString))
    val byBytes = rows(Warc.docsFromFiles(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(dir.toString)))
    assert(byPath == byBytes && byPath.size == 2)
  }
}
