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
