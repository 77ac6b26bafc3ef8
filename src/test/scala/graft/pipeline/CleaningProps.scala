package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck invariants for the mojibake repair: the round-trip law on
  * arbitrary mixed text, and no-false-fire on naturally accented prose.
  */
object CleaningProps extends Properties("cleaning") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private def repair(texts: Seq[String]): Seq[String] =
    texts.toDF("t").select(Cleaning.repairMojibake(col("t"))).as[String].collect().toSeq

  private def mojibake(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  // ASCII words with occasional non-ASCII chars (2- and 3-byte UTF-8)
  private val mixedGen: Gen[String] = Gen.chooseNum(0, 60).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'à', 'ü', 'ñ', 'Ω', '中', '€'))).map(_.mkString)
  }

  property("repair(mojibake(s)) == s for any mixed text") =
    forAll(Gen.listOfN(8, mixedGen)) { texts =>
      repair(texts.map(mojibake)) == texts
    }

  // accented chars always followed by plain ASCII — the natural-prose shape
  // the guard must never rewrite
  private val proseGen: Gen[String] = Gen.chooseNum(1, 40).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaChar.map(_.toString),
      1 -> Gen.oneOf("é", "à", "ü", "ñ").map(_ + "t"))).map(_.mkString(" "))
  }

  property("naturally accented prose passes through untouched (no false repair)") =
    forAll(Gen.listOfN(8, proseGen)) { texts =>
      repair(texts) == texts
    }
}
