package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck cross-check of the Gopher-repetition metrics against an
  * INDEPENDENT Scala reference implementation — a third implementation
  * next to the Spark expression chain and the DuckDB oracle, on random
  * small-alphabet token streams chosen to provoke heavy duplication
  * (the regime where the coverage-union window clamps and sorted-run
  * accumulators can be wrong in mirrored ways).
  *
  * doc_id = 1 throughout (coprime to 3 and 5), so the parity page is the
  * plain 8-word reflow and the word stream equals the input tokens —
  * the reference never re-implements the plant rules, only the metrics.
  */
object GopherRepetitionProps extends Properties("gopher_repetition") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  // small alphabet + short words => many repeated n-grams
  private val tokenGen: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val docGen: Gen[List[String]] = Gen.chooseNum(10, 48).flatMap(Gen.listOfN(_, tokenGen))

  /** Reference: chars of every occurrence beyond the first. */
  private def refDupChars(xs: Seq[String]): Long =
    xs.groupBy(identity).values.map(g => (g.size - 1).toLong * g.head.length).sum

  /** Reference: heaviest n-gram char mass = max over grams of count × word chars. */
  private def refTopMass(w: Seq[String], n: Int): Long =
    if (w.size < n) 0L
    else w.sliding(n).toSeq.groupBy(identity).map { case (g, occ) =>
      occ.size.toLong * g.map(_.length).sum
    }.max

  /** Reference: word chars covered by the position-union of duplicated n-grams. */
  private def refDupCoverage(w: Seq[String], n: Int): Long = {
    if (w.size < n) return 0L
    val grams = w.sliding(n).toVector
    val counts = grams.groupBy(identity).map { case (g, o) => g -> o.size }
    val covered = Array.fill(w.size)(false)
    grams.zipWithIndex.foreach { case (g, i) =>
      if (counts(g) > 1) (i until i + n).foreach(covered(_) = true)
    }
    w.zipWithIndex.collect { case (t, j) if covered(j) => t.length.toLong }.sum
  }

  private def metrics(tokens: Seq[String]): Map[String, Any] = {
    val row = GopherRepetition.repetitionOf(
      Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")).collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  property("dup-gram coverage union equals the reference for n in 5..10") =
    forAll(docGen) { tokens =>
      val m = metrics(tokens)
      (5 to 10).forall { n =>
        m(s"dup${n}_chars") == refDupCoverage(tokens, n)
      }
    }

  property("heaviest-gram masses and line dup chars equal the reference") =
    forAll(docGen) { tokens =>
      val m = metrics(tokens)
      val lines = tokens.grouped(8).map(_.mkString(" ")).toSeq
      val paras = lines.grouped(2).map(_.mkString("\n")).toSeq
      (2 to 4).forall(n => m(s"top${n}_chars") == refTopMass(tokens, n)) &&
        m("dup_line_chars") == refDupChars(lines) &&
        m("dup_para_chars") == refDupChars(paras) &&
        m("word_chars") == tokens.map(_.length.toLong).sum
    }

  property("coverage never exceeds word chars (it is a position union)") =
    forAll(docGen) { tokens =>
      val m = metrics(tokens)
      val wc = m("word_chars").asInstanceOf[Long]
      (5 to 10).forall(n => m(s"dup${n}_chars").asInstanceOf[Long] <= wc)
    }

  property("all-distinct words zero every dup metric") =
    forAll(Gen.chooseNum(10, 40)) { n =>
      val distinct = (0 until n).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      val m = metrics(distinct)
      (5 to 10).forall(k => m(s"dup${k}_chars") == 0L) &&
        m("dup_line_occ") == 0L && m("dup_para_occ") == 0L
    }
}
