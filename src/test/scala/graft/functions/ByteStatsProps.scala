package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Invariants of the byte-histogram quality expressions. Pure kernel tests
  * (no Spark session): the static methods are exactly what both the
  * interpreted and generated code paths call.
  */
object ByteStatsProps extends Properties("byteStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val textGen: Gen[String] = Gen.chooseNum(0, 400).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '.', ',', '\n'),
      1 -> Gen.oneOf('é', 'ü', '中', '€'))).map(_.mkString)
  }

  private def em(s: String): Long = ByteStats.entropyMilli(UTF8String.fromString(s))
  private def dc(s: String): Long = ByteStats.distinctCount(UTF8String.fromString(s))

  property("entropy is bounded by [0, 8000] milli-bits/byte") =
    forAll(textGen)(s => { val e = em(s); e >= 0 && e <= 8000 })

  property("entropy is invariant under character permutation (same byte multiset)") =
    forAll(textGen, Gen.long) { (s, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(s.toList).mkString
      em(shuffled) == em(s)
    }

  property("entropy is invariant under k-fold repetition, up to quantization") =
    forAll(textGen.suchThat(_.nonEmpty), Gen.choose(2, 5)) { (s, k) =>
      // mathematically exact (counts and total both scale by k); the float
      // ladder may differ in the last ulp, so allow one milli of slack
      math.abs(em(s * k) - em(s)) <= 1
    }

  property("distinct byte count equals the reference set size; entropy 0 iff <= 1 distinct") =
    forAll(textGen) { s =>
      val ref = s.getBytes("UTF-8").toSet.size
      dc(s) == ref && (s.isEmpty || ((em(s) == 0) == (ref <= 1)))
    }
}
