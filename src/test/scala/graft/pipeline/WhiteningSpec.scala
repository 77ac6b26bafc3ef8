package graft.pipeline

import graft.SparkSpec

/** Whitening end-to-end: the Jacobi solver against hand eigenpairs, and the
  * defining property — the whitened corpus's own covariance is the identity.
  */
class WhiteningSpec extends SparkSpec {

  test("jacobi eigen recovers hand-computed eigenpairs and reconstructs A") {
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (lam, v) = Whitening.jacobiEigen(a)
    assert(lam.sorted.zip(Seq(1.0, 3.0)).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // A = V·diag(λ)·Vᵀ
    for (i <- 0 until 2; j <- 0 until 2) {
      val r = (0 until 2).map(k => v(i)(k) * lam(k) * v(j)(k)).sum
      assert(math.abs(r - a(i)(j)) < 1e-12, s"recon($i)($j)=$r")
    }
    // V orthonormal
    for (i <- 0 until 2; j <- 0 until 2) {
      val dot = (0 until 2).map(k => v(k)(i) * v(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-12)
    }
  }

  test("whitened corpus covariance is the identity") {
    val dim = Similarity.Dim
    val rows = Whitening.whiten(spark, Sf0001, dim)
      .select("wvec").collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length
    assert(n > 100)
    val mean = Array.tabulate(dim)(i => rows.map(_(i)).sum / n)
    var maxDiagErr = 0.0
    var maxOff = 0.0
    for (i <- 0 until dim; j <- i until dim) {
      val c = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      if (i == j) maxDiagErr = math.max(maxDiagErr, math.abs(c - 1.0))
      else maxOff = math.max(maxOff, math.abs(c))
    }
    assert(maxDiagErr < 1e-6, s"diagonal off identity by $maxDiagErr")
    assert(maxOff < 1e-6, s"off-diagonal correlation survives: $maxOff")
  }

  test("whitened-check ppm cells: driver algebra == per-row outer-product sum") {
    // r18 optimization guard: `emb_whitened_check` derives its cells as
    // W·Σ̂·Wᵀ on the driver instead of re-scanning the corpus and summing
    // wvec[i]·wvec[j] per row. The two summation orders must agree at the
    // ppm grain on a REAL corpus — this pins the algebraic shortcut to the
    // distributed formulation it replaced.
    val dim = Similarity.Dim
    val (n, mean, cov) = Whitening.codeMoments(spark, Sf0001, dim)
    val perRow = Whitening
      .whitenWith(Whitening.quantizedCodes(spark, Sf0001), mean,
        Whitening.whiteningMatrix(cov), dim)
      .select("wvec").collect().map(_.getSeq[Double](0).toArray)
    assert(perRow.length == n)
    val m = Array.ofDim[Double](dim, dim)
    perRow.foreach { w =>
      for (j <- 0 until dim; i <- 0 to j) m(i)(j) += w(i) * w(j)
    }
    val algebra = Whitening.secondMomentOfWhitened(cov)
    for (j <- 0 until dim; i <- 0 to j) {
      val rowPpm = math.round(m(i)(j) / n * 1e6)
      val algPpm = math.round(algebra(i)(j) * 1e6)
      assert(rowPpm == algPpm,
        s"cell ($i,$j): per-row $rowPpm ppm vs algebra $algPpm ppm")
    }
  }
}
