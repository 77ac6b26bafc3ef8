package graft.operators

import graft.SparkSpec

/** The PDF front door: writer↔extractor round-trips (raw + real
  * Deflater zlib, classic + compressed xref-stream/ObjStm layouts), the
  * object grammar (escapes, hex strings, refs, indirect /Length, /Prev
  * chains, hybrid /XRefStm precedence), the font-encoding layer
  * (/ToUnicode CMaps, named encodings, /Differences glyph-name decode,
  * Type0 rejects), /Annots URI-link extraction,
  * page-tree order, and the loud-reject matrix (encryption, unsupported
  * filters and predictors, inline images, truncations). The PDFs here
  * are built by hand or by [[Pdf.buildPdf]] — two independent layers,
  * so a writer bug cannot hide an extractor bug of the same shape.
  */
class PdfSpec extends SparkSpec {

  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Hand-rolled single-page PDF around a raw content stream — offsets
    * computed here, independently of the production writer.
    */
  private def handPdf(content: String, trailerExtra: String = "",
      streamDict: String => String = len => s"<< /Length $len >>"): Array[Byte] = {
    val sb = new StringBuilder
    val off = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = { off += sb.length; sb.append(body) }
    sb.append("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    obj(s"4 0 obj\n${streamDict(content.length.toString)}\nstream\n$content\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 5\n0000000000 65535 f \n")
    off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R$trailerExtra >>\nstartxref\n$xrefAt\n%%EOF\n")
    ascii(sb.toString)
  }

  test("writer round-trip: pages and lines survive, raw and real-Deflater zlib, " +
    "classic and compressed (ObjStm + Predictor-12 xref stream) layouts") {
    val pages = Seq(Seq("000000000007", "CAFEBABE"), Seq("000000000008", "DEAD"))
    for (flate <- Seq(false, true); xrefStream <- Seq(false, true)) {
      val pdf = Pdf.buildPdf(pages, flate, xrefStream)
      assert(Pdf.extractPages(pdf) ==
        Vector("000000000007\nCAFEBABE", "000000000008\nDEAD"),
        s"flate=$flate xrefStream=$xrefStream")
    }
  }

  test("compressed layout: 50-page order survives the ObjStm + xref-stream walk") {
    val pages = (0 until 50).map(i => Seq(s"xpage$i"))
    assert(Pdf.extractPages(Pdf.buildPdf(pages, flate = true, xrefStream = true)) ==
      (0 until 50).map(i => s"xpage$i").toVector)
  }

  test("page order follows /Kids order, 50 pages") {
    val pages = (0 until 50).map(i => Seq(s"page$i"))
    assert(Pdf.extractPages(Pdf.buildPdf(pages, flate = true)) ==
      (0 until 50).map(i => s"page$i").toVector)
  }

  test("literal-string escapes: \\( \\) \\\\ octal, line continuation, nested parens") {
    val content = """BT (a\(b\)c\\d\101\12e) Tj (nest (ok) deep) Tj ET"""
    val got = Pdf.extractText(handPdf(content))
    assert(got == "a(b)c\\dA\ne" + "nest (ok) deep")
  }

  test("hex strings: whitespace tolerated, odd length pads a trailing zero") {
    val content = "BT <4 86 99> Tj ET" // digits 48699 -> pad -> 48 69 90
    assert(Pdf.extractText(handPdf(content)) == "Hi" + 0x90.toChar)
  }

  test("TJ kerning numbers are skipped; ' and \" start new lines") {
    val content = "BT [(a) -120 (b) 33 (c)] TJ (d) ' (x) (y) (e) \" ET"
    assert(Pdf.extractText(handPdf(content)) == "abc\nd\ne")
  }

  test("UTF-16BE BOM strings decode; plain bytes are latin-1") {
    val utf16 = "\u00fe\u00ff\u0000H\u0000i" // FE FF 00 48 00 69
    val content = s"BT (${utf16}) Tj ET"
    assert(Pdf.extractText(handPdf(content)) == "Hi")
  }

  test("multiple /Contents streams concatenate in order") {
    val c1 = "BT (one) Tj"
    val c2 = "(two) Tj ET"
    val sb = new StringBuilder
    val off = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = { off += sb.length; sb.append(body) }
    sb.append("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n")
    obj(s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n")
    obj(s"5 0 obj\n<< /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 6\n0000000000 65535 f \n")
    off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    assert(Pdf.extractText(ascii(sb.toString)) == "onetwo")
  }

  test("incremental update: /Prev chain, newest xref wins") {
    // base document shows (old); an appended update replaces object 4
    val base = new String(handPdf("BT (old) Tj ET"), "ISO-8859-1")
    val baseXrefAt = base.indexOf("\nxref\n") + 1
    val c2 = "BT (new) Tj ET"
    val sb = new StringBuilder(base)
    val objAt = sb.length
    sb.append(s"4 0 obj\n<< /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n4 1\n")
    sb.append(f"$objAt%010d 00000 n \n")
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R /Prev $baseXrefAt >>\nstartxref\n$xrefAt\n%%EOF\n")
    assert(Pdf.extractText(ascii(sb.toString)) == "new")
  }

  /** One binary xref-stream row under W [1 4 2], as ISO-8859-1 chars. */
  private def xrow(t: Int, f2: Int, f3: Int): String =
    "" + t.toChar +
      ((f2 >> 24) & 0xff).toChar + ((f2 >> 16) & 0xff).toChar +
      ((f2 >> 8) & 0xff).toChar + (f2 & 0xff).toChar +
      ((f3 >> 8) & 0xff).toChar + (f3 & 0xff).toChar

  /** Hand-rolled PDF 1.5: catalog + pages in an UNFILTERED ObjStm,
    * a raw (no-filter) xref stream with a split /Index — every offset
    * computed here, independently of the production writer.
    */
  private def handXrefStreamPdf(content: String,
      objStmHeader: String = "1 0 2 34 "): Array[Byte] = {
    val sb = new StringBuilder
    val off = scala.collection.mutable.Map.empty[Int, Int]
    def obj(n: Int, body: String): Unit = {
      off(n) = sb.length; sb.append(s"$n 0 obj\n$body\nendobj\n")
    }
    sb.append("%PDF-1.5\n")
    val p1 = "<< /Type /Catalog /Pages 2 0 R >>" // 33 chars: obj 2 at rel 34
    val p2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val payload = objStmHeader + p1 + "\n" + p2 + "\n"
    obj(7, s"<< /Type /ObjStm /N 2 /First ${objStmHeader.length} " +
      s"/Length ${payload.length} >>\nstream\n$payload\nendstream")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    off(6) = sb.length
    // /Index [0 5 6 2]: subsection 0..4, then 6..7 — object 5 unused
    val data = xrow(0, 0, 0xffff) + xrow(2, 7, 0) + xrow(2, 7, 1) +
      xrow(1, off(3), 0) + xrow(1, off(4), 0) +
      xrow(1, off(6), 0) + xrow(1, off(7), 0)
    sb.append(s"6 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Index [0 5 6 2] " +
      s"/Length ${data.length} /Root 1 0 R >>\nstream\n$data\nendstream\nendobj\n")
    sb.append(s"startxref\n${off(6)}\n%%EOF\n")
    ascii(sb.toString)
  }

  test("hand-rolled xref stream: raw rows, split /Index, unfiltered ObjStm") {
    assert(Pdf.extractText(handXrefStreamPdf("BT (compressed layout) Tj ET")) ==
      "compressed layout")
  }

  test("ObjStm header disagreeing with the xref rejects by both numbers") {
    val e = intercept[IllegalArgumentException](
      Pdf.extractText(handXrefStreamPdf("BT (x) Tj ET", objStmHeader = "9 0 2 34 ")))
    assert(e.getMessage.contains("object 1 is entry 0 of stream 7, which holds object 9"),
      e.getMessage)
  }

  test("hybrid-reference file: /XRefStm entries take precedence over the classic table") {
    val sb = new StringBuilder
    val off = scala.collection.mutable.Map.empty[String, Int]
    def obj(key: String, text: String): Unit = { off(key) = sb.length; sb.append(text) }
    sb.append("%PDF-1.5\n")
    obj("1", "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2", "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3", "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    val cOld = "BT (old hybrid) Tj ET"
    val cNew = "BT (new hybrid) Tj ET"
    obj("4old", s"4 0 obj\n<< /Length ${cOld.length} >>\nstream\n$cOld\nendstream\nendobj\n")
    obj("4new", s"4 0 obj\n<< /Length ${cNew.length} >>\nstream\n$cNew\nendstream\nendobj\n")
    off("5") = sb.length
    val data = xrow(1, off("4new"), 0) // the stream maps 4 to the NEW copy
    sb.append(s"5 0 obj\n<< /Type /XRef /Size 6 /W [1 4 2] /Index [4 1] " +
      s"/Length ${data.length} /Root 1 0 R >>\nstream\n$data\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 6\n0000000000 65535 f \n")
    Seq("1", "2", "3", "4old", "5").foreach(k => sb.append(f"${off(k)}%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R /XRefStm ${off("5")} >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    assert(Pdf.extractText(ascii(sb.toString)) == "new hybrid")
  }

  test("incremental update: a freed object does not resurrect from /Prev") {
    // the newest update frees the /Contents object; the base table still
    // holds an 'n' entry for it — §7.5.4 shadowing says the free wins,
    // so the walk must NOT extract "old" from the stale offset
    val base = new String(handPdf("BT (old) Tj ET"), "ISO-8859-1")
    val baseXrefAt = base.indexOf("\nxref\n") + 1
    val sb = new StringBuilder(base)
    val xrefAt = sb.length
    sb.append("xref\n4 1\n0000000000 00001 f \n")
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R /Prev $baseXrefAt >>\nstartxref\n$xrefAt\n%%EOF\n")
    val e = intercept[IllegalArgumentException](Pdf.extractText(ascii(sb.toString)))
    assert(e.getMessage.contains("object 4 not in xref"), e.getMessage)
  }

  test("Tm-positioned lines break like Td lines") {
    val content = "BT 1 0 0 1 72 720 Tm (first) Tj 1 0 0 1 72 706 Tm (second) Tj ET"
    assert(Pdf.extractText(handPdf(content)) == "first\nsecond")
  }

  test("a >2 GiB pdf file rejects loudly by name in the path walk") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_pdf_big")
    // sparse: setLength allocates no blocks, only the metadata size
    val raf = new java.io.RandomAccessFile(
      new java.io.File(dir.toFile, "1.pdf"), "rw")
    try raf.setLength(Int.MaxValue.toLong + 8) finally raf.close()
    val e = intercept[Exception](Pdf.docsFromPaths(spark, dir.toString).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("\n")
    assert(msgs.contains("too large"), msgs)
  }

  /** Hand-rolled single-page PDF WITH font resources: object 5 is the
    * font, objects 6+ are extras (e.g. a /ToUnicode CMap stream).
    */
  private def fontPdf(fontBody: String, content: String,
      extra: Seq[String] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    val off = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = { off += sb.length; sb.append(body) }
    sb.append("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    obj(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    obj(s"5 0 obj\n$fontBody\nendobj\n")
    extra.zipWithIndex.foreach { case (body, i) => obj(s"${6 + i} 0 obj\n$body\nendobj\n") }
    val n = 5 + extra.length
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${n + 1}\n0000000000 65535 f \n")
    off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${n + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    ascii(sb.toString)
  }

  test("/ToUnicode CMap: 2-byte glyph codes decode to real text (bfchar + both bfrange forms)") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <00690021>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0041>
        |<0020> <0021> [<0058> <0059>]
        |endbfrange
        |endcmap
        |CMap currentdict /CMap defineresource pop
        |end end""".stripMargin
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Sub " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>"
    val cmapObj = s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"
    // codes: 0001 0002 (bfchar: H, i!) then 0010..0012 (A B C), 0020 0021 (X Y)
    val content = "BT /F1 12 Tf <00010002001000110012> Tj <00200021> Tj ET"
    assert(Pdf.extractText(fontPdf(font, content, Seq(cmapObj))) == "Hi!ABCXY")
  }

  test("a code absent from the /ToUnicode CMap rejects loudly, never byte salad") {
    val cmap = "1 begincodespacerange <00> <FF> endcodespacerange " +
      "1 beginbfchar <41> <0041> endbfchar endcmap"
    val font = "<< /Type /Font /Subtype /TrueType /BaseFont /BBBBBB+Sub /ToUnicode 6 0 R >>"
    val cmapObj = s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"
    assert(Pdf.extractText(fontPdf(font, "BT /F1 12 Tf (A) Tj ET", Seq(cmapObj))) == "A")
    val e = intercept[IllegalArgumentException](
      Pdf.extractText(fontPdf(font, "BT /F1 12 Tf (AB) Tj ET", Seq(cmapObj))))
    assert(e.getMessage.contains("not in the font's /ToUnicode CMap"), e.getMessage)
  }

  test("composite (Type0) font without /ToUnicode rejects — glyph indices are not text") {
    val font = "<< /Type /Font /Subtype /Type0 /BaseFont /CCCCCC+Sub /Encoding /Identity-H >>"
    val e = intercept[IllegalArgumentException](
      Pdf.extractText(fontPdf(font, "BT /F1 12 Tf <0001> Tj ET")))
    assert(e.getMessage.contains("without /ToUnicode"), e.getMessage)
  }

  test("/Differences decode through the standard glyph table; unknown names reject") {
    // the re-encoded-subset shape simple-font producers emit: overridden
    // codes decode by AGL name, untouched codes fall through to the base
    val diff = "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      "/Encoding << /Differences [65 /bullet /emdash 97 /adieresis] >> >>"
    assert(Pdf.extractText(fontPdf(diff, "BT /F1 12 Tf (AB a) Tj ET")) ==
      "\u2022\u2014 \u00E4")
    // consecutive assignment after an integer reset, ligatures included
    val lig = "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      "/Encoding << /BaseEncoding /WinAnsiEncoding " +
      "/Differences [40 /fi /fl] >> >>"
    assert(Pdf.extractText(fontPdf(lig,
      s"BT /F1 12 Tf (\\050\\051${0x93.toChar}) Tj ET")) == "\uFB01\uFB02\u201C")
    // a name outside the table (symbol/dingbat/private glyph) rejects
    val bad = "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      "/Encoding << /Differences [65 /a99] >> >>"
    val e = intercept[IllegalArgumentException](
      Pdf.extractText(fontPdf(bad, "BT /F1 12 Tf (A) Tj ET")))
    assert(e.getMessage.contains("not in the standard glyph table"), e.getMessage)
    // a name before any code rejects
    val noCode = "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      "/Encoding << /Differences [/bullet] >> >>"
    val e2 = intercept[IllegalArgumentException](
      Pdf.extractText(fontPdf(noCode, "BT /F1 12 Tf (A) Tj ET")))
    assert(e2.getMessage.contains("before any code"), e2.getMessage)
    // WinAnsi: 0x93/0x94 are the cp1252 curly quotes, not Latin-1 controls
    val win = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    val content = s"BT /F1 12 Tf (${0x93.toChar}q${0x94.toChar}) Tj ET"
    assert(Pdf.extractText(fontPdf(win, content)) == "\u201Cq\u201D")
  }

  test("Tf naming a font absent from /Resources rejects loudly") {
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val e = intercept[IllegalArgumentException](
      Pdf.extractText(fontPdf(font, "BT /F9 12 Tf (x) Tj ET")))
    assert(e.getMessage.contains("/F9"), e.getMessage)
  }

  test("/Info metadata: escapes and UTF-16 titles decode; newest trailer wins; ObjStm-resident /Info resolves") {
    // hand-rolled classic file: /Info with an escaped title and a
    // UTF-16BE author, multi-page for the page count
    val base = new String(Pdf.buildPdf(Seq(Seq("p1"), Seq("p2")), flate = false), "ISO-8859-1")
    val sb = new StringBuilder(base)
    // append an incremental update adding object 8 = /Info
    val infoBody = "8 0 obj\n<< /Title (a\\(b\\)c) " +
      "/Author (þÿ\\000H\\000i) /CreationDate (D:19990704120000) >>\nendobj\n"
    val baseXrefAt = base.indexOf("\nxref\n") + 1
    val objAt = sb.length
    sb.append(infoBody)
    val xrefAt = sb.length
    sb.append(s"xref\n8 1\n")
    sb.append(f"$objAt%010d 00000 n \n")
    sb.append(s"trailer\n<< /Size 9 /Root 1 0 R /Info 8 0 R /Prev $baseXrefAt >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    val (title, author, year, nPages) = Pdf.docMeta(ascii(sb.toString))
    assert((title, author, year, nPages) == ("a(b)c", "Hi", 1999, 2))

    // /Info living INSIDE an ObjStm (the modern layout): reuse the
    // hand-rolled xref-stream file whose ObjStm holds objects 1 and 2 —
    // point /Info at object 2 (any dict works for the resolution path,
    // but a type-2 /Info must resolve through the object stream)
    val xs = new String(handXrefStreamPdf("BT (x) Tj ET"), "ISO-8859-1")
    // the xref stream dict doubles as the trailer: give it an /Info
    val withInfo = xs.replace("/Length 49 /Root 1 0 R", "/Length 49 /Root 1 0 R /Info 1 0 R")
    // the catalog has no date: the REJECT proves the type-2 resolution ran
    val e = intercept[IllegalArgumentException](Pdf.docMeta(ascii(withInfo)))
    assert(e.getMessage.contains("/Info has no /CreationDate"), e.getMessage)

    // no /Info at all rejects by name
    val e2 = intercept[IllegalArgumentException](
      Pdf.docMeta(Pdf.buildPdf(Seq(Seq("x")), flate = false)))
    assert(e2.getMessage.contains("no /Info"), e2.getMessage)

    // malformed date prefix rejects by name
    val bad = sb.toString.replace("(D:19990704120000)", "(XX19990704120000)")
    val e3 = intercept[IllegalArgumentException](Pdf.docMeta(ascii(bad)))
    assert(e3.getMessage.contains("CreationDate"), e3.getMessage)
  }

  test("LZWDecode: hand-derived golden pins the test encoder; encoder pins the decoder") {
    // codes for "AAABBB": [Clear, 65, 258 (KwKwK), 66, 260 (KwKwK), EOD],
    // MSB-first 9-bit packing computed BY HAND from ISO 32000-1 §7.4.4
    assert(LzwTestCodec.encode("AAABBB".getBytes("US-ASCII")).toSeq ==
      Seq(0x80, 0x10, 0x60, 0x44, 0x28, 0x24, 0x04).map(_.toByte))
    // end to end: a REAL content stream LZW-coded into a page
    val content = "BT (lzw decoded text) Tj ET"
    val data = new String(LzwTestCodec.encode(content.getBytes("US-ASCII")), "ISO-8859-1")
    val pdf = handPdf(data,
      streamDict = len => s"<< /Length $len /Filter /LZWDecode >>")
    assert(Pdf.extractText(pdf) == "lzw decoded text")
  }

  test("reject matrix: every unsupported or malformed shape throws with a named reason") {
    def rejects(bytes: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Pdf.extractText(bytes))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    // not a PDF at all
    rejects(ascii("GIF89a not a pdf, padded to sixteen bytes"), "%PDF-")
    // encrypted
    rejects(handPdf("BT (x) Tj ET", trailerExtra = " /Encrypt 9 0 R"), "encrypted")
    // startxref points at a plain object — neither a table nor /Type /XRef
    val xs = new String(handPdf("BT (x) Tj ET"), "ISO-8859-1")
      .replaceAll("startxref\n[0-9]+", "startxref\n9")
    rejects(ascii(xs), "cross-reference stream")
    // unsupported filter (LZWDecode moved to supported in r17)
    rejects(handPdf("BT (x) Tj ET",
      streamDict = len => s"<< /Length $len /Filter /DCTDecode >>"), "unsupported")
    // truncated LZW: plausible bits, no EOD code
    rejects(handPdf("",
      streamDict = len => s"<< /Length $len /Filter /LZWDecode >>"), "no EOD")
    // TIFF predictor (PNG family is supported; 2 is not)
    rejects(handPdf("BT (x) Tj ET",
      streamDict = len => s"<< /Length $len /DecodeParms << /Predictor 2 >> >>"),
      "predictor 2")
    // PNG predictor whose data is not whole rows
    rejects(handPdf("BT (x) Tj ET",
      streamDict = len => s"<< /Length $len /DecodeParms << /Predictor 12 /Columns 64 >> >>"),
      "rows")
    // inline image
    rejects(handPdf("BT BI /W 1 /H 1 ID x EI ET"), "inline image")
    // corrupt flate data under a FlateDecode filter
    rejects(handPdf("not really deflate",
      streamDict = len => s"<< /Length $len /Filter /FlateDecode >>"), "FlateDecode")
    // stream length past EOF
    rejects(handPdf("BT (x) Tj ET",
      streamDict = _ => "<< /Length 99999 >>"), "past EOF")
    // unterminated literal string
    rejects(handPdf("BT (never closed Tj ET"), "unterminated")
    // missing startxref
    rejects(ascii("%PDF-1.4\njust a header and no tail at all"), "startxref")
    // truncated: stream shorter than any container
    rejects(ascii("%PDF-"), "shorter")
  }

  test("zlib and raw deflate both inflate (FlateDecode sniff)") {
    val raw = "BT (sniffed) Tj ET".getBytes("US-ASCII")
    def deflated(nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(raw); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end(); bo.toByteArray
    }
    for (nowrap <- Seq(false, true)) {
      val data = new String(deflated(nowrap), "ISO-8859-1")
      val pdf = handPdf(data,
        streamDict = len => s"<< /Length $len /Filter /FlateDecode >>")
      assert(Pdf.extractText(pdf) == "sniffed", s"nowrap=$nowrap")
    }
  }

  test("indirect /Length resolves through the xref") {
    val content = "BT (indirect) Tj ET"
    val sb = new StringBuilder
    val off = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = { off += sb.length; sb.append(body) }
    sb.append("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    obj(s"4 0 obj\n<< /Length 5 0 R >>\nstream\n$content\nendstream\nendobj\n")
    obj(s"5 0 obj\n${content.length}\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 6\n0000000000 65535 f \n")
    off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    assert(Pdf.extractText(ascii(sb.toString)) == "indirect")
  }

  test("front doors: batch scan == path walk, page-grain doc_ids, source fragments") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_pdf_bucket")
    Files.write(Paths.get(dir.toString, "7.pdf"),
      Pdf.buildPdf(Seq(Seq("alpha page"), Seq("beta page")), flate = false))
    Files.write(Paths.get(dir.toString, "8.pdf"),
      Pdf.buildPdf(Seq(Seq("gamma page")), flate = true))
    Files.write(Paths.get(dir.toString, "draft9.pdf"), "not a drop".getBytes)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val batch = rows(Pdf.docsFromFiles(
      spark.read.format("binaryFile").load(dir.toString)))
    assert(batch == Set(
      Seq((7L << 24) | 0, "alpha page", "und", "7.pdf#page=1", 10L),
      Seq((7L << 24) | 1, "beta page", "und", "7.pdf#page=2", 9L),
      Seq(8L << 24, "gamma page", "und", "8.pdf#page=1", 10L)))
    assert(rows(Pdf.docsFromPaths(spark, dir.toString)) == batch)
  }

  test("pdf drops stream through CorpusIngest like documents") {
    import java.nio.file.{Files, Paths}
    val blobDir = Files.createTempDirectory("graft_pdf_stream").toString
    val outDir = Files.createTempDirectory("graft_pdf_out").toString
    val ckpt = Files.createTempDirectory("graft_pdf_ckpt").toString
    Files.write(Paths.get(blobDir, "3.pdf"),
      Pdf.buildPdf(Seq(Seq("the quick brown fox document")), flate = true))
    val q = graft.streaming.CorpusIngest.start(
      Pdf.docStream(spark, blobDir), Sf0001, outDir, ckpt)
    try {
      q.processAllAvailable()
      Files.write(Paths.get(blobDir, "4.pdf"),
        Pdf.buildPdf(Seq(Seq("a second landed pdf drop")), flate = false))
      q.processAllAvailable()
    } finally q.stop()
    val batchDocs = Pdf.docsFromFiles(
      spark.read.format("binaryFile").load(blobDir))
    assert(batchDocs.count() == 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(spark.read.parquet(s"$outDir/chunks").drop("batch_id")) ==
      rows(graft.pipeline.TrainPrep.chunkDocsOf(batchDocs)))
  }

  test("/Annots URI links: selection, order, action dispatch, loud rejects") {
    def linkPdf(annots: Seq[String], extra: Seq[String] = Nil,
        annotsVal: String = null): Array[Byte] = {
      val sb = new StringBuilder
      val off = scala.collection.mutable.ArrayBuffer.empty[Int]
      def obj(body: String): Unit = { off += sb.length; sb.append(body) }
      sb.append("%PDF-1.4\n")
      obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
      val refs = annots.indices.map(i => s"${4 + i} 0 R").mkString(" ")
      val av = if (annotsVal != null) annotsVal else s"[$refs]"
      obj(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /Annots $av >>\nendobj\n")
      annots.zipWithIndex.foreach { case (a, i) => obj(s"${4 + i} 0 obj\n$a\nendobj\n") }
      extra.zipWithIndex.foreach { case (e, i) =>
        obj(s"${4 + annots.length + i} 0 obj\n$e\nendobj\n")
      }
      val n = 3 + annots.length + extra.length
      val xrefAt = sb.length
      sb.append(s"xref\n0 ${n + 1}\n0000000000 65535 f \n")
      off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
      sb.append(s"trailer\n<< /Size ${n + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      ascii(sb.toString)
    }
    def uris(pdf: Array[Byte]) = Pdf.docLinks(pdf).map(_._3)
    // selection: URI links in order; notes, /Dest-only, and GoTo skipped
    val mixed = linkPdf(Seq(
      "<< /Type /Annot /Subtype /Link /A << /S /URI /URI (https://a.test/1) >> >>",
      "<< /Type /Annot /Subtype /Text /Contents (a note) >>",
      "<< /Type /Annot /Subtype /Link /Dest [3 0 R /Fit] >>",
      "<< /Type /Annot /Subtype /Link /A << /S /GoTo /D [3 0 R /Fit] >> >>",
      "<< /Type /Annot /Subtype /Link /A 9 0 R >>"),
      extra = Seq("<< /S /URI /URI (https://a.test/2) >>"))
    assert(uris(mixed) == Vector("https://a.test/1", "https://a.test/2"))
    assert(Pdf.docLinks(mixed) == Vector((1, 1, "https://a.test/1"),
      (1, 2, "https://a.test/2")))
    // a page without /Annots has no links
    assert(uris(handPdf("BT (x) Tj ET")).isEmpty)
    // escaped and UTF-16 URI strings decode through the standard path
    assert(uris(linkPdf(Seq(
      """<< /Subtype /Link /A << /S /URI /URI (https://a.test/\051\050) >> >>"""))) ==
      Vector("https://a.test/)("))
    // rejects: URI action without /URI; non-string /URI; non-array /Annots
    def rejects(pdf: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Pdf.docLinks(pdf))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects(linkPdf(Seq("<< /Subtype /Link /A << /S /URI >> >>")), "without /URI")
    rejects(linkPdf(Seq("<< /Subtype /Link /A << /S /URI /URI 7 >> >>")),
      "not a string")
    rejects(linkPdf(Nil, annotsVal = "(not an array)"), "not an array")
  }

  test("ASCIIHexDecode: whitespace ignored, odd final digit pads, EOD enforced") {
    val content = "BT (ahx) Tj ET"
    val hx = content.getBytes("US-ASCII").map("%02X".format(_)).mkString
    // whitespace sprinkled through the pairs is legal
    val spaced = hx.grouped(3).mkString(" \n\t") + " >"
    assert(Pdf.extractText(handPdf(spaced,
      streamDict = len => s"<< /Length $len /Filter /ASCIIHexDecode >>")) == "ahx")
    // odd final digit behaves as if followed by 0: the trailing LF's
    // "0A" loses its 'A', pads to 0x00 — NUL is PDF whitespace, so the
    // decoded stream still parses and the text is unchanged
    val odd = "BT (q) Tj ET\n".getBytes("US-ASCII")
    val oddHx = odd.map("%02X".format(_)).mkString.dropRight(1) + ">"
    assert(Pdf.extractText(handPdf(oddHx,
      streamDict = len => s"<< /Length $len /Filter /ASCIIHexDecode >>")) == "q")
    def rejects(data: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Pdf.extractText(handPdf(data,
        streamDict = len => s"<< /Length $len /Filter /ASCIIHexDecode >>")))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects(hx, "EOD") // missing '>'
    rejects("4G>", "non-hex")
    rejects(hx + "> 41", "after the '>'")
  }

  test("ASCII85Decode: encoder mirror round-trips, z groups, partial tail, rejects") {
    def a85Pdf(data: Array[Byte], filter: String = "/ASCII85Decode"): Array[Byte] =
      handPdf(new String(data, "ISO-8859-1"),
        streamDict = len => s"<< /Length $len /Filter $filter >>")
    // an aligned all-zero group encodes as one 'z'
    assert(new String(Ascii85TestCodec.encode(Array[Byte](0, 0, 0, 0)),
      "US-ASCII") == "z~>")
    // "BT (" is 4 bytes, so the 4 raw NULs inside the literal string
    // land group-aligned and ride the z shortcut; the tail is partial
    val nuls = "\u0000\u0000\u0000\u0000"
    val content = s"BT ($nuls b85) Tj ET"
    val coded = Ascii85TestCodec.encode(content.getBytes("ISO-8859-1"))
    assert(new String(coded, "US-ASCII").contains("z"), "fixture must exercise z")
    assert(Pdf.extractText(a85Pdf(coded)) == s"$nuls b85")
    // whitespace inside groups is ignored (the 2-byte `~>` EOD marker
    // itself stays contiguous)
    val codedStr = new String(coded, "US-ASCII")
    val spaced =
      codedStr.dropRight(2).grouped(3).mkString("\n ") + codedStr.takeRight(2)
    assert(Pdf.extractText(a85Pdf(spaced.getBytes("US-ASCII"))) == s"$nuls b85")
    def rejects(data: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](
        Pdf.extractText(a85Pdf(data.getBytes("US-ASCII"))))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects("!!!!!", "EOD") // missing ~>
    rejects("!~>", "single character")
    rejects("!!z!!~>", "'z' inside a group")
    rejects("uuuuu~>", "exceeds 2^32") // 85^5-ish > 2^32
    rejects("!!v!!~>", "outside '!'..'u'")
    rejects("!!!!!~> x", "after the '~>'")
  }

  test("RunLengthDecode: literal and repeat runs decode; truncation and EOD reject") {
    def rlePdf(data: String): Array[Byte] = handPdf(data,
      streamDict = len => s"<< /Length $len /Filter /RunLengthDecode >>")
    // literal "BT (", 6x repeat 'a', literal tail, EOD
    val data = "" + 3.toChar + "BT (" + 251.toChar + "a" +
      8.toChar + "bc) Tj ET" + 128.toChar
    assert(Pdf.extractText(rlePdf(data)) == "aaaaaabc")
    def rejects(d: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Pdf.extractText(rlePdf(d)))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects("" + 9.toChar + "abc", "truncated")
    rejects("" + 0.toChar + "x", "without the EOD")
    rejects("" + 0.toChar + "x" + 128.toChar + "y", "after the EOD")
  }

  test("/Filter chains fold left to right; per-element /DecodeParms apply") {
    // [A85 Flate]: the wire shape older ASCII-armored producers emit
    val raw = "BT (chained through two filters) Tj ET".getBytes("US-ASCII")
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val bo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
    d.end()
    val a85 = Ascii85TestCodec.encode(bo.toByteArray)
    assert(Pdf.extractText(handPdf(new String(a85, "ISO-8859-1"),
      streamDict = len => s"<< /Length $len /Filter [/ASCII85Decode /FlateDecode] >>")) ==
      "chained through two filters")
    // [AHx LZW] with a parallel /DecodeParms array (null for AHx)
    val lzw = LzwTestCodec.encode("BT (hex then lzw) Tj ET".getBytes("US-ASCII"))
    val lzwHex = lzw.map("%02X".format(_)).mkString + ">"
    assert(Pdf.extractText(handPdf(lzwHex,
      streamDict = len => s"<< /Length $len /Filter [/ASCIIHexDecode /LZWDecode] " +
        "/DecodeParms [null << /EarlyChange 1 >>] >>")) == "hex then lzw")
    // /DecodeParms array length must match the chain
    val e = intercept[IllegalArgumentException](Pdf.extractText(handPdf(lzwHex,
      streamDict = len => s"<< /Length $len /Filter [/ASCIIHexDecode /LZWDecode] " +
        "/DecodeParms [null] >>")))
    assert(e.getMessage.contains("/DecodeParms length"), e.getMessage)
    // a bare parms dict beside a chain is ambiguous -> loud
    val e2 = intercept[IllegalArgumentException](Pdf.extractText(handPdf(lzwHex,
      streamDict = len => s"<< /Length $len /Filter [/ASCIIHexDecode /LZWDecode] " +
        "/DecodeParms << /EarlyChange 1 >> >>")))
    assert(e2.getMessage.contains("bare /DecodeParms"), e2.getMessage)
  }

  test("encrypted reject names the security handler and /V /R versions") {
    // indirect /Encrypt dictionary — the common producer shape
    val sb = new StringBuilder
    val off = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = { off += sb.length; sb.append(body) }
    sb.append("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    obj("4 0 obj\n<< /Length 12 >>\nstream\nBT (x) Tj ET\nendstream\nendobj\n")
    obj("5 0 obj\n<< /Filter /Standard /V 2 /R 3 /P -44 >>\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 6\n0000000000 65535 f \n")
    off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append("trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    val e = intercept[IllegalArgumentException](Pdf.extractText(ascii(sb.toString)))
    assert(e.getMessage.contains("encrypted document unsupported"), e.getMessage)
    assert(e.getMessage.contains("/Filter /Standard /V 2 /R 3"), e.getMessage)
    // direct dict in the trailer names AES-era versions the same way
    val e2 = intercept[IllegalArgumentException](Pdf.extractText(handPdf(
      "BT (x) Tj ET",
      trailerExtra = " /Encrypt << /Filter /Standard /V 5 /R 6 >>")))
    assert(e2.getMessage.contains("/V 5 /R 6"), e2.getMessage)
  }

  test("/Resources inherit from /Pages ancestors (§7.7.3.4): CMap fonts reach inheriting pages") {
    val cmap = "1 begincodespacerange <00> <FF> endcodespacerange " +
      "2 beginbfchar <41> <0068> <42> <0069> endbfchar endcmap"
    def inheritPdf(fontBody: String): Array[Byte] = {
      val sb = new StringBuilder
      val off = scala.collection.mutable.ArrayBuffer.empty[Int]
      def obj(body: String): Unit = { off += sb.length; sb.append(body) }
      sb.append("%PDF-1.4\n")
      obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      // resources live on the ROOT /Pages node; the page has none of its own
      obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
      obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
      val content = "BT /F1 12 Tf (AB) Tj ET"
      obj(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
      obj(s"5 0 obj\n$fontBody\nendobj\n")
      obj(s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
      val xrefAt = sb.length
      sb.append("xref\n0 7\n0000000000 65535 f \n")
      off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
      sb.append(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      ascii(sb.toString)
    }
    // before the inheritance walk this read Map.empty, Tf missed, and the
    // show string decoded standard as byte salad 'AB'
    assert(Pdf.extractText(inheritPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Sub " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >>")) == "hi")
    // an INHERITED Type0 font without /ToUnicode still rejects loudly
    val e = intercept[IllegalArgumentException](Pdf.extractText(inheritPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Sub " +
        "/Encoding /Identity-H >>")))
    assert(e.getMessage.contains("Type0"), e.getMessage)
  }

  test("same-baseline moves stay on one line: tx 0 Td and same-ty Tm never break") {
    // justified-text shape: each word set with a fresh same-ty matrix
    assert(Pdf.extractText(handPdf(
      "BT 1 0 0 1 72 720 Tm (Hello) Tj 1 0 0 1 120 720 Tm ( World) Tj " +
        "1 0 0 1 72 706 Tm (next) Tj ET")) == "Hello World\nnext")
    // horizontal Td repositions on the SAME baseline
    assert(Pdf.extractText(handPdf(
      "BT 72 720 Td (a) Tj 50 0 Td (b) Tj 0 -14 Td (c) Tj ET")) == "ab\nc")
    // Td offsets thread into the tracked baseline a later Tm compares to
    assert(Pdf.extractText(handPdf(
      "BT 1 0 0 1 72 720 Tm (a) Tj 0 -14 Td (b) Tj 1 0 0 1 72 706 Tm (c) Tj ET")) ==
      "a\nbc")
    // leading-relative moves reset the baseline: T* always breaks
    assert(Pdf.extractText(handPdf(
      "BT 1 0 0 1 72 720 Tm (a) Tj T* (b) Tj ET")) == "a\nb")
  }

  test("the two registry queries run end to end at sf0.001") {
    val te = Pdf.pdfTextExtract(spark, Sf0001).collect()
    assert(te.nonEmpty)
    te.foreach { r =>
      val t = r.getString(2).split("\n", -1)
      assert(t.length == 2 && t(0).length == 96 && t(1).length == 96)
      // line 2 overlaps line 1: bytes [16,48) are hex chars 32..96 of
      // line 1 and 0..64 of line 2
      assert(t(0).substring(32) == t(1).substring(0, 64))
    }
    val fi = Pdf.pdfFilesIngest(spark, Sf0001).collect()
    assert(fi.nonEmpty)
    assert(fi.map(_.getLong(0)).distinct.length == fi.length)
  }
}
