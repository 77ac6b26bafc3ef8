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

  /** One bfrange: (lo, span, Left(base interval dst) | Right(array of
    * span dsts)) — the §9.10.3 destination-ARRAY form beside the
    * increment-the-last-unit interval form. Range codes live in the
    * upper half of the code space, bfchar codes in the lower, so the
    * two sections never have to agree on overlap order.
    */
  private def rangeGen(max: Int): Gen[(Int, Int, Either[String, List[String]])] = for {
    span <- Gen.choose(1, 8)
    lo <- Gen.choose(max / 2 + 1, max - span + 1)
    dst <- Gen.oneOf(
      cmapDstGen.map(Left(_)),
      Gen.listOfN(span, cmapDstGen).map(Right(_)))
  } yield (lo, span, dst)

  private val cmapGen: Gen[(Int, Map[Int, String], List[(Int, Int, Either[String, List[String]])])] = for {
    codeLen <- Gen.oneOf(1, 2)
    max = if (codeLen == 1) 255 else 65535
    n <- Gen.choose(1, 16)
    codes <- Gen.listOfN(n, Gen.choose(0, max / 2))
    dsts <- Gen.listOfN(n, cmapDstGen)
    nr <- Gen.choose(0, 3)
    ranges <- Gen.listOfN(nr, rangeGen(max))
  } yield (codeLen, codes.zip(dsts).toMap, ranges)

  private def hexCode(codeLen: Int, c: Int): String =
    if (codeLen == 1) f"$c%02X" else f"$c%04X"

  private def utf16Hex(s: String): String =
    s.getBytes("UTF-16BE").map("%02X".format(_)).mkString

  /** The spec's interval semantics: the run increments the LAST UTF-16
    * code unit of the base destination only.
    */
  private def bumpLast(base: String, k: Int): String = {
    val chars = base.toCharArray
    chars(chars.length - 1) = (chars(chars.length - 1) + k).toChar
    new String(chars)
  }

  /** Independent CMap emitter + one-page PDF around it: font /F1 carries
    * the /ToUnicode stream; the content shows every code once, sorted.
    * Ranges emit in BOTH destination forms (interval and array).
    */
  private def cmapPdf(codeLen: Int, bfchar: Map[Int, String],
      ranges: List[(Int, Int, Either[String, List[String]])]): (Array[Byte], String) = {
    val loC = "00" * codeLen
    val hiC = "FF" * codeLen
    val bfchars = bfchar.toSeq.sortBy(_._1).map { case (c, s) =>
      s"<${hexCode(codeLen, c)}> <${utf16Hex(s)}>"
    }.mkString("\n")
    val bfranges = ranges.map { case (lo, span, dst) =>
      val pre = s"<${hexCode(codeLen, lo)}> <${hexCode(codeLen, lo + span - 1)}>"
      dst match {
        case Left(base) => s"$pre <${utf16Hex(base)}>"
        case Right(ds) => s"$pre [${ds.map(d => s"<${utf16Hex(d)}>").mkString(" ")}]"
      }
    }.mkString("\n")
    val rangeSection =
      if (ranges.isEmpty) ""
      else s"\n${ranges.size} beginbfrange\n$bfranges\nendbfrange"
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |begincmap
         |1 begincodespacerange
         |<$loC> <$hiC>
         |endcodespacerange
         |${bfchar.size} beginbfchar
         |$bfchars
         |endbfchar$rangeSection
         |endcmap end""".stripMargin
    // later entries override earlier ones in file order — mirror that
    val m = scala.collection.mutable.Map.empty[Int, String] ++ bfchar
    ranges.foreach { case (lo, span, dst) =>
      dst match {
        case Left(base) => (0 until span).foreach(k => m(lo + k) = bumpLast(base, k))
        case Right(ds) => ds.zipWithIndex.foreach { case (d, k) => m(lo + k) = d }
      }
    }
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

  property("any /ToUnicode bfchar + bfrange (interval AND array dst) map decodes exactly") =
    forAll(cmapGen) { case (codeLen, m, ranges) =>
      val (pdf, want) = cmapPdf(codeLen, m, ranges)
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

  /** One-page PDF around a raw content-stream body under `filter`. */
  private def filteredPdf(coded: Array[Byte], filter: String): Array[Byte] = {
    val sb = new StringBuilder
    val off = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: String): Unit = { off += sb.length; sb.append(body) }
    sb.append("%PDF-1.4\n")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    obj(s"4 0 obj\n<< /Length ${coded.length} /Filter $filter >>\nstream\n" +
      new String(coded, "ISO-8859-1") + "\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 5\n0000000000 65535 f \n")
    off.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  property("ASCII85 encoder -> production decoder round-trips; " +
    "[A85 Flate] chains fold; z-shortcut presence is immaterial") =
    forAll(lzwPayloadGen, Gen.oneOf(true, false)) { (payload, zShortcut) =>
      val content = s"BT (${escaped(payload.toSeq)}) Tj ET".getBytes("ISO-8859-1")
      val isBom = payload.length >= 2 &&
        (payload(0) & 0xff) == 0xfe && (payload(1) & 0xff) == 0xff
      val want = new String(payload, "ISO-8859-1")
      val plain = Ascii85TestCodec.encode(content, zShortcut)
      val d = new java.util.zip.Deflater()
      d.setInput(content); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end()
      val chained = Ascii85TestCodec.encode(bo.toByteArray, zShortcut)
      isBom ||
        (Pdf.extractText(filteredPdf(plain, "/ASCII85Decode")) == want &&
          Pdf.extractText(filteredPdf(chained,
            "[/ASCII85Decode /FlateDecode]")) == want)
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
