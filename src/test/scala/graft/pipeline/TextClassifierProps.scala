package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck cross-check of the nearest-centroid classifier against an
  * independent Scala reference — exact rational arithmetic on the
  * reference side (BigInt cross-multiplication), so a silent overflow or
  * a flipped inequality in the engine's BIGINT formulation would surface
  * here even if the DuckDB mirror made the same mistake.
  */
object TextClassifierProps extends Properties("text_classifier") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val tokenGen: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(2, 12).flatMap { nd =>
      Gen.sequence[List[(Long, String)], (Long, String)]((1 to nd).toList.map { i =>
        Gen.chooseNum(3, 20).flatMap(Gen.listOfN(_, tokenGen))
          .map(ts => (i.toLong, ts.mkString(" ")))
      })
    }

  private def md5Bucket(tok: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) & (TextClassifier.Buckets - 1)).toInt
  }

  /** Reference verdicts: exact BigInt nearest-centroid on the same
    * parity labels and planted markers.
    */
  private def reference(docs: Seq[(Long, String)]): Map[Long, Boolean] = {
    val B = TextClassifier.Buckets
    val feats = docs.map { case (id, text) =>
      val toks = "[a-z]+".r.findAllIn(text.toLowerCase).toList ++
        (if (id % 2 == 0) List.fill(TextClassifier.MarkerCopies)(TextClassifier.Marker)
         else Nil)
      val x = Array.fill(B)(0L)
      toks.foreach(t => x(md5Bucket(t)) += 1)
      (id, if (id % 2 == 0) 1 else -1, x)
    }
    val sp = Array.fill(B)(BigInt(0)); val sn = Array.fill(B)(BigInt(0))
    feats.foreach { case (_, y, x) =>
      (0 until B).foreach(b => if (y == 1) sp(b) += x(b) else sn(b) += x(b))
    }
    val np = BigInt(feats.count(_._2 == 1)); val nn = BigInt(feats.count(_._2 == -1))
    val n2p = sp.map(v => v * v).sum; val n2n = sn.map(v => v * v).sum
    feats.map { case (id, _, x) =>
      val dp = (0 until B).map(b => BigInt(x(b)) * sp(b)).sum
      val dn = (0 until B).map(b => BigInt(x(b)) * sn(b)).sum
      id -> (nn * nn * (n2p - 2 * np * dp) < np * np * (n2n - 2 * nn * dn))
    }.toMap
  }

  property("engine verdicts equal the exact-BigInt reference on random corpora") =
    forAll(corpusGen) { docs =>
      val feats = TextClassifier.featuresOf(docs.toDF("doc_id", "text"))
      val got = TextClassifier.scoreOf(feats,
          TextClassifier.trainOf(spark, feats), TextClassifier.countsOf(feats))
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      got == reference(docs)
    }
}
