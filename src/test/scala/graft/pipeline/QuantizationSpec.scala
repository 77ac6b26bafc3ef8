package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** Quantization-report semantics on planted vectors: exact calibration
  * range, the floor(u+0.5) code assignment, the scale/2 error bound, the
  * constant-dimension (scale 0) degenerate case, and saturation counts —
  * each checked against an independent plain-Scala recomputation (every
  * planted value is exact in float, so the float→double widening adds no
  * noise and comparisons can demand bit equality).
  */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_quant_fixture").toString
    // dim 1: range [0,1] with an interior point that rounds UP;
    // dim 2: constant (scale 0); dim 3: symmetric range with x=0 exactly
    // on a half-step (err == scale/2, the worst case)
    Seq(
      (1L, Array(0.0f, 5.0f, -2.0f), 0),
      (2L, Array(1.0f, 5.0f, 0.0f), 0),
      (3L, Array(0.25f, 5.0f, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("per-dim range, codes, worst error, and saturation match an independent recomputation") {
    val vecs = Map(
      1L -> Array(0.0, 5.0, -2.0), 2L -> Array(1.0, 5.0, 0.0),
      3L -> Array(0.25, 5.0, 2.0))
    val byDim = (0 until 3).map { i =>
      val xs = vecs.values.map(_(i)).toSeq
      val (mn, mx) = (xs.min, xs.max)
      val scale = (mx - mn) / 255.0
      def q(x: Double): Long =
        if (scale > 0.0) math.min(255L, math.floor((x - mn) / scale + 0.5).toLong) else 0L
      def err(x: Double): Double = math.abs(mn + q(x).toDouble * scale - x)
      (i + 1, mn, mx, scale, xs.size.toLong, xs.map(err).max,
        xs.count(x => q(x) == 0L || q(x) == 255L).toLong)
    }

    val got = SimilaritySearch.quantizationReport(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(got == byDim, s"got ${got.mkString("; ")}")

    // the quantizer's contract: worst error never exceeds half a step
    got.foreach { case (dim, _, _, scale, _, maxErr, _) =>
      assert(maxErr <= scale / 2.0 * (1.0 + 1e-9), s"dim $dim err $maxErr > ${scale / 2}")
    }
    // the constant dimension reconstructs exactly
    assert(got.find(_._1 == 2).get._6 == 0.0)
    // dim 1 saturates at both ends (x=0 → code 0, x=1 → code 255)
    assert(got.find(_._1 == 1).get._7 == 2L)
  }
}
