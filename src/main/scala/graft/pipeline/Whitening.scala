package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** ZCA whitening of the quantized embedding corpus — the decorrelation
  * transform retrieval pipelines apply before indexing (whitening is the
  * standard fix for anisotropic embedding spaces; the covariance audit that
  * motivates it is `emb_covariance_q`).
  *
  * Altitude decision, stated explicitly: the covariance matrix is d×d
  * (64×64 — KILOBYTES, corpus-size-independent), so its eigendecomposition
  * is a driver-side problem, not a distributed one. The corpus-scale work —
  * the Gramian (one [[graft.functions.GramianAgg]] pass) and the projection
  * (map-only matvec) — is distributed; factorizing a 64×64 symmetric matrix
  * on executors would be cargo-cult distribution. This is the same
  * decomposition RowMatrix.computePrincipalComponents makes (Gramian on the
  * cluster, eigen on the driver, public Spark MLlib architecture).
  *
  * The eigensolver is classical cyclic Jacobi for symmetric matrices
  * (Golub & Van Loan §8.5): rotate away the largest off-diagonal until
  * convergence. O(d³) per sweep, a few sweeps at d=64 — microseconds.
  *
  * The whitening matrix is ZCA (W = V·Λ^{-1/2}·Vᵀ), the symmetric square
  * root inverse: unlike plain PCA whitening it stays closest to the
  * original basis, so whitened dimensions remain interpretable. Eigenvalues
  * below [[EigenFloor]] are clamped — a rank-deficient (constant) dimension
  * must not explode the transform.
  */
object Whitening extends QueryModule {

  val EigenFloor = 1e-9

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix given as the
    * full square array. Returns (eigenvalues, eigenvectors as COLUMNS of
    * the returned matrix: `a ≈ V·diag(λ)·Vᵀ`).
    */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 32,
                  tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // rotation angle zeroing a(p)(q) (G&VL 8.5.2; sign(0) = +1 —
            // signum's 0 would skip the 45-degree equal-diagonal rotation)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** (n, mean, covariance) of the int8-quantized corpus — ONE distributed
    * [[graft.functions.GramianAgg]] pass; the d×d expansion from the
    * triangle happens on the driver (the deliberate, documented d²-sized
    * driver step — 33 KB at d=64).
    */
  def codeMoments(spark: SparkSession, sfDir: String, dim: Int)
      : (Long, Array[Double], Array[Array[Double]]) =
    codeMomentsOpt(spark, sfDir, dim).getOrElse(
      throw new IllegalArgumentException(
        "whitening needs a non-empty corpus (n = 0: the mean/covariance " +
          "divisions would silently emit a NaN transform)"))

  /** [[codeMoments]] that signals an EMPTY corpus as `None` instead of
    * failing — the empty-safe surface for `emb_whitened_check` (every
    * registered query must plan-and-return-empty on a fresh ingest
    * partition, EmptyInputSpec).
    */
  def codeMomentsOpt(spark: SparkSession, sfDir: String, dim: Int)
      : Option[(Long, Array[Double], Array[Array[Double]])] = {
    val qvecs = quantizedCodes(spark, sfDir)
    val gramian = udaf(new graft.functions.GramianAgg(dim))
    // the ONE deliberate driver-side head(): a single row of d(d+3)/2 longs
    val row = qvecs.agg(gramian(col("qvec")).as("r")).selectExpr("r.n", "r.s", "r.g").head()
    val n = row.getLong(0)
    if (n == 0L) return None
    val s = row.getSeq[Long](1).toArray
    val g = row.getSeq[Long](2).toArray
    val mean = s.map(_.toDouble / n)
    val cov = Array.ofDim[Double](dim, dim)
    var j = 0; var k = 0
    while (j < dim) {
      var i = 0
      while (i <= j) {
        val c = g(k).toDouble / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        i += 1; k += 1
      }
      j += 1
    }
    Some((n, mean, cov))
  }

  /** Per-vector int8 codes — [[SimilaritySearch.quantizedCodes]], the
    * memoized quantize pass shared with `emb_covariance_q` and
    * `emb_quantized_recall`.
    */
  def quantizedCodes(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.quantizedCodes(spark, sfDir)

  /** The ZCA whitening matrix `V·diag(1/sqrt(max(λ, floor)))·Vᵀ` of the
    * quantized-corpus covariance.
    */
  def whiteningMatrix(cov: Array[Array[Double]]): Array[Array[Double]] = {
    val d = cov.length
    val (lam, v) = jacobiEigen(cov)
    val inv = lam.map(l => 1.0 / math.sqrt(math.max(l, EigenFloor)))
    // W = V · diag(inv) · Vᵀ
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < d) { s += v(i)(k) * inv(k) * v(j)(k); k += 1 }
      s
    }
  }

  /** Whitened corpus: `(vec_id, label, wvec)` with
    * `wvec = W·(codes − mean)` — a map-only matvec per row (the W and mean
    * CONSTANTS ship in the closure, ~33 KB; a 4096-term Catalyst expression
    * tree per output dim is where codegen stops being the right tool, so
    * this is the documented dense-linear-algebra UDF exception).
    */
  def whiten(spark: SparkSession, sfDir: String, dim: Int): DataFrame = {
    val (_, mean, cov) = codeMoments(spark, sfDir, dim)
    whitenWith(quantizedCodes(spark, sfDir), mean, whiteningMatrix(cov), dim)
  }

  private[pipeline] def whitenWith(codes: DataFrame, mean: Array[Double],
                         w: Array[Array[Double]], dim: Int): DataFrame = {
    val matvec = udf { (qv: Seq[Long]) =>
      val centered = Array.tabulate(dim)(i => qv(i).toDouble - mean(i))
      Array.tabulate(dim) { i =>
        var s = 0.0
        var k = 0
        while (k < dim) { s += w(i)(k) * centered(k); k += 1 }
        s
      }
    }
    codes.select(col("vec_id"), col("label"), matvec(col("qvec")).as("wvec"))
  }

  /** `emb_whitened_check`: the whitening acceptance audit, oracle-checked —
    * the second-moment matrix of the WHITENED corpus, emitted as
    * parts-per-million integer cells of the upper triangle. If the ZCA
    * transform is right, `E[w·wᵀ] = W·Σ·W ≈ I` to machine precision, so the
    * expected table is pure structure — 10⁶ on the diagonal, 0 off — which
    * is exactly what the DuckDB oracle emits WITHOUT re-deriving the
    * eigenwork: the oracle states what whitening must produce (identity),
    * the Spark side proves its transform actually produces it on the real
    * corpus. Rounding at ppm is nine-plus orders above the numerical error
    * budget (Jacobi residual / λ_min ~1e-10, double-sum error ~1e-12), and
    * kills summation-order noise, the `emb_covariance_q` integerization
    * discipline.
    *
    * A quantized dimension with zero variance (constant codes) is whitened
    * to exactly 0, not 1 — its eigenvalue is [[EigenFloor]]-clamped and its
    * centered coordinate is identically zero — so the oracle gates each
    * diagonal cell on the dim's integer-exact code variance (the
    * `emb_covariance_q` vars CTE). Exact cross-dimension rank deficiency
    * (distinct dims perfectly correlated) would likewise zero an
    * eigendirection; that cannot be stated in SQL without the eigenbasis
    * and does not occur in continuous embedding data — documented
    * assumption, same one the `var_i > 0` correlation filter already makes.
    *
    * Shape (r18 optimization): the corpus-scale work is the ONE GramianAgg
    * aggregation (shared memoized codes) that produces Σ̂; the check cells
    * are then the documented driver-side d×d algebra extended by one more
    * d×d multiplication — `E[w·wᵀ] = W·Σ̂·Wᵀ` EXACTLY (each `wvec` is by
    * definition `W·(q − mean)`, so the per-row outer-product sum factors
    * algebraically through the same Σ̂ the Gramian pass computed; the two
    * double-summation orders differ only at the ~1e-12 level, nine-plus
    * orders below the ppm rounding grain — see scaladoc above and the
    * WhiteningSpec ppm-parity test). The previous formulation re-scanned
    * the corpus and exploded N·d(d+1)/2 per-cell structs through an
    * interpreted (CodegenFallback) higher-order-function chain — measured
    * at ~4.5 s/pass at sf0.1 vs ~0.1 s for the algebra, with bit-identical
    * ppm cells (guide §1.2: don't re-pay corpus passes for information the
    * first pass already holds).
    */
  def whitenedCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Similarity.Dim
    codeMomentsOpt(spark, sfDir, dim) match {
      case None =>
        // empty corpus: plan-and-return-empty (EmptyInputSpec contract)
        spark.range(0).selectExpr("CAST(id AS INT) AS dim_i",
          "CAST(id AS INT) AS dim_j", "id AS cell_ppm")
      case Some((_, _, cov)) =>
        val m = secondMomentOfWhitened(cov)
        val cells = for { j <- 0 until dim; i <- 0 to j }
          yield (i + 1, j + 1, math.round(m(i)(j) * 1e6))
        spark.createDataFrame(cells).toDF("dim_i", "dim_j", "cell_ppm")
          .orderBy("dim_i", "dim_j")
    }
  }

  /** `W·Σ̂·Wᵀ` — the second-moment matrix of the whitened corpus, derived
    * on the driver from the corpus covariance (d×d work, corpus-size
    * independent). Factored out so WhiteningSpec can pin its ppm cells
    * against the per-row outer-product summation over the real corpus.
    */
  private[pipeline] def secondMomentOfWhitened(cov: Array[Array[Double]])
      : Array[Array[Double]] = {
    val d = cov.length
    val w = whiteningMatrix(cov)
    val wc = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += w(i)(k) * cov(k)(j); k += 1 }
      s
    }
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += wc(i)(k) * w(j)(k); k += 1 }
      s
    }
  }

  private val whitenedCheckSql = {
    val d = Similarity.Dim
    // identity-by-construction, gated per-diagonal on the dim's exact
    // integer code variance (zero-variance dims whiten to 0, see scaladoc)
    s"""WITH ex AS (
          SELECT e.vec_id, g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
          FROM embeddings e
          CROSS JOIN (SELECT unnest(range(1, ${d + 1})) AS i) g
        ), rng AS (
          SELECT dim, MIN(x) AS min_v,
                 (MAX(x) - MIN(x)) / ${SimilaritySearch.QuantLevels}.0e0 AS scale
          FROM ex GROUP BY 1
        ), q AS (
          SELECT vec_id, ex.dim,
                 CASE WHEN scale > 0.0e0
                      THEN least(${SimilaritySearch.QuantLevels},
                             CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END AS q
          FROM ex JOIN rng USING (dim)
        ), nn AS (SELECT COUNT(DISTINCT vec_id) AS n FROM q),
        vars AS (
          SELECT dim,
                 CAST(SUM(q * q) AS BIGINT) * n - CAST(SUM(q) AS BIGINT) * CAST(SUM(q) AS BIGINT)
                   AS v_scaled
          FROM q, nn GROUP BY dim, n
        ), dims AS (SELECT unnest(range(1, ${d + 1})) AS dd)
        SELECT CAST(i.dd AS INT) AS dim_i, CAST(j.dd AS INT) AS dim_j,
               CAST(CASE WHEN i.dd = j.dd AND vi.v_scaled > 0 THEN 1000000
                         ELSE 0 END AS BIGINT) AS cell_ppm
        FROM dims i
        JOIN dims j ON i.dd <= j.dd
        JOIN vars vi ON vi.dim = i.dd
        CROSS JOIN nn
        WHERE nn.n > 0
        ORDER BY dim_i, dim_j"""
  }

  override def queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("emb_whitened_check" -> (whitenedCheck _))

  override def oracle: Map[String, String] =
    Map("emb_whitened_check" -> whitenedCheckSql)
}
