package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants for the PDF walk. PdfSpec pins known grammar
  * cases; this sweeps the space: ANY page/line structure over the
  * writer's input alphabet round-trips through [[Pdf.buildPdf]] →
  * [[Pdf.extractPages]] bit-for-bit in BOTH codec modes, ANY byte string
  * survives the literal-string escape round-trip, and text extraction is
  * invariant under content-stream whitespace/comment noise.
  */
object PdfProps extends Properties("pdf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  // the writer's contract is ASCII without parens/backslash (its callers
  // feed hex and digits); sweep that full alphabet including spaces
  private val lineChar: Gen[Char] = Gen.oneOf(
    (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z') ++ ".,:;#@!$%&*-_=+ ").toSeq)
  private val lineGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    cs <- Gen.listOfN(n, lineChar)
  } yield cs.mkString
  private val pageGen: Gen[Seq[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, lineGen))
  private val pagesGen: Gen[Seq[Seq[String]]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, pageGen))

  property("buildPdf -> extractPages round-trips any page/line structure, " +
    "all four codec x layout modes") =
    forAll(pagesGen, Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (pages, flate, xrefStream) =>
        // the text walk suppresses empty lines by design: the expected page
        // text is the non-empty lines joined (a fully-empty page reads "")
        val want = pages.map(_.filter(_.nonEmpty).mkString("\n")).toVector
        Pdf.extractPages(Pdf.buildPdf(pages, flate, xrefStream)) == want
    }

  /** Escape a byte for a PDF literal string — octal for everything the
    * grammar treats specially, so ANY byte sequence is expressible.
    */
  private def escaped(bytes: Seq[Byte]): String =
    bytes.map { b =>
      val v = b & 0xff
      if (v == '(' || v == ')' || v == '\\' || v < 0x20 || v > 0x7e)
        f"\\${v}%03o"
      else v.toChar.toString
    }.mkString

  private val bytesGen: Gen[List[Byte]] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)))

  property("octal-escaped literal strings decode to exactly the source bytes (latin-1)") =
    forAll(bytesGen) { bytes =>
      // skip the UTF-16 BOM prefix — by contract those decode as UTF-16BE
      val isBom = bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff
      val content = s"BT (${escaped(bytes)}) Tj ET".getBytes("ISO-8859-1")
      isBom || Pdf.textOf(content) == new String(bytes.toArray, "ISO-8859-1")
    }

  // --- /ToUnicode CMap sweep: random code->text maps decode exactly ---

  private val cmapDstGen: Gen[String] = for {
    n <- Gen.choose(1, 2)
    cs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.choose(0x20, 0x7e), 1 -> Gen.choose(0xa1, 0x2ff)))
  } yield cs.map(_.toChar).mkString

  private val cmapGen: Gen[(Int, Map[Int, String])] = for {
    codeLen <- Gen.oneOf(1, 2)
    n <- Gen.choose(1, 16)
    codes <- Gen.listOfN(n, Gen.choose(0, if (codeLen == 1) 255 else 65535))
    dsts <- Gen.listOfN(n, cmapDstGen)
  } yield (codeLen, codes.zip(dsts).toMap)

  private def hexCode(codeLen: Int, c: Int): String =
    if (codeLen == 1) f"$c%02X" else f"$c%04X"

  /** Independent CMap emitter + one-page PDF around it: font /F1 carries
    * the /ToUnicode stream; the content shows every code once, sorted.
    */
  private def cmapPdf(codeLen: Int, m: Map[Int, String]): (Array[Byte], String) = {
    val lo = "00" * codeLen
    val hi = "FF" * codeLen
    val bfchars = m.toSeq.sortBy(_._1).map { case (c, s) =>
      val dst = s.getBytes("UTF-16BE").map("%02X".format(_)).mkString
      s"<${hexCode(codeLen, c)}> <$dst>"
    }.mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |begincmap
         |1 begincodespacerange
         |<$lo> <$hi>
         |endcodespacerange
         |${m.size} beginbfchar
         |$bfchars
         |endbfchar
         |endcmap end""".stripMargin
    val shown = m.keys.toSeq.sorted
    val content = s"BT /F1 12 Tf <${shown.map(hexCode(codeLen, _)).mkString}> Tj ET"
    val want = shown.map(m).mkString
    val sb = new StringBuilder
    val off = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = { off += sb.length; sb.append(body) }
    sb.append("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    obj(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    obj("5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+P " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n")
    obj(s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 7\n0000000000 65535 f \n")
    off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    (sb.toString.getBytes("ISO-8859-1"), want)
  }

  property("any /ToUnicode bfchar map (1- and 2-byte codes) decodes exactly") =
    forAll(cmapGen) { case (codeLen, m) =>
      val (pdf, want) = cmapPdf(codeLen, m)
      Pdf.extractText(pdf) == want
    }

  // LZW mirror: random payloads large enough to cross the 9->10->11 bit
  // width boundaries (each distinct pair adds a table entry), through a
  // real page whose content stream is LZW-coded
  private val lzwPayloadGen: Gen[Array[Byte]] = for {
    n <- Gen.oneOf(Gen.choose(0, 64), Gen.choose(800, 3000))
    bs <- Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte))
  } yield bs.toArray

  property("LZW encoder -> production decoder round-trips across width boundaries") =
    forAll(lzwPayloadGen) { payload =>
      // show the payload as an octal-escaped literal string so the decoded
      // content stream is valid and carries every byte
      val content = s"BT (${escaped(payload.toSeq)}) Tj ET".getBytes("ISO-8859-1")
      val coded = LzwTestCodec.encode(content)
      val sb = new StringBuilder
      val off = scala.collection.mutable.ArrayBuffer.empty[Int]
      def obj(body: String): Unit = { off += sb.length; sb.append(body) }
      sb.append("%PDF-1.4\n")
      obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
      obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
      obj(s"4 0 obj\n<< /Length ${coded.length} /Filter /LZWDecode >>\nstream\n" +
        new String(coded, "ISO-8859-1") + "\nendstream\nendobj\n")
      val xrefAt = sb.length
      sb.append("xref\n0 5\n0000000000 65535 f \n")
      off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
      sb.append(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      val isBom = payload.length >= 2 &&
        (payload(0) & 0xff) == 0xfe && (payload(1) & 0xff) == 0xff
      isBom || Pdf.extractText(sb.toString.getBytes("ISO-8859-1")) ==
        new String(payload, "ISO-8859-1")
    }

  property("text extraction is invariant under whitespace and comment noise") =
    forAll(pageGen, Gen.choose(0, 3)) { (lines, pad) =>
      val clean = lines.zipWithIndex.map { case (l, i) =>
        (if (i > 0) "0 -14 Td " else "") + s"($l) Tj"
      }.mkString("BT /F1 12 Tf 72 720 Td ", " ", " ET")
      // same token stream, noise OUTSIDE the string literals only
      val noisy = lines.zipWithIndex.map { case (l, i) =>
        (if (i > 0) "0\t -14\n Td\n% positioning noise\n" else "") +
          s"($l)\n% comment between operand and operator\n${"\t" * pad}Tj"
      }.mkString("BT\r\n/F1 12 Tf\n72  720\tTd\n", "\n \t", "\n%tail\nET\n")
      Pdf.textOf(noisy.getBytes("ISO-8859-1")) ==
        Pdf.textOf(clean.getBytes("ISO-8859-1"))
    }
}
