package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Scratch, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`vec_id bigint, embedding array<float>[64], label int`).
  *
  * Two variants of "top-k cosine neighbors for each query vector":
  *
  *   - `similarity_topk_brute`: exact brute force — the small query set is
  *     broadcast, candidate scoring is a map-side projection over the corpus
  *     (one `vec_dot` per (query, vector) pair inside WholeStageCodegen), and
  *     only the ranking shuffles. CORRECTNESS baseline; at 100 TB the
  *     per-query candidate stream is the full corpus, so this is the oracle
  *     you run on a sample, not the production path.
  *   - `similarity_topk_lsh`: the scale path — vectors get
  *     [[Similarity.NumTables]] random-hyperplane bucket ids map-side
  *     ([[Similarity.lshTableBuckets]]), and scoring joins only candidates
  *     sharing a bucket in ANY table (OR-amplified LSH): corpus/2^TableBits
  *     expected candidates per (query, table) instead of the full corpus.
  *     Recall is probabilistic (near vectors collide with high probability);
  *     the oracle mirrors the same bucket math so the result is still
  *     deterministic and hash-checkable.
  *
  * Ranking determinism: cosine doubles are bit-identical across engines
  * (strict-left-fold dot product, see [[graft.functions.VectorDot]] /
  * [[Similarity.dotDuck]]); ties broken by neighbor id.
  *
  * Requires `vec_dot`, installed by `graft.GraftExtensions`
  * (`spark.sql.extensions`).
  */
object SimilaritySearch extends QueryModule {

  /** Top-k per query. */
  val K = 10

  /** Query set: the first `NumQueries` vector ids — deterministic, and small
    * enough that broadcasting the query side is the right plan at any scale.
    */
  val NumQueries = 20

  /** LSH knobs for the SEARCH path, tuned on the fixture by the
    * `similarity_lsh_recall` query (must stay ≥ 0.9): the synthetic
    * embeddings are near-uniform (top-10 cosines ≈ 0.26–0.37 ⇒ per-plane
    * collision p ≈ 0.6), so recall needs few bits and many tables here —
    * est. 1-(1-p^2)^8 ≈ 0.97. Production embeddings cluster (p ≈ 0.8–0.9
    * for true neighbors), which is what lets k rise to 16–20 at 10⁸+ vectors
    * per the [[Similarity.TableBits]] scaling rule; re-measure recall with
    * this same query after any retune. The dedup path keeps the sharper
    * (k=4, L=2) defaults — its production targets are cosine ≥ 0.9 dups.
    */
  val SearchTableBits = 2
  val SearchNumTables = 8

  /** (vec_id, v, nrm): corpus with precomputed L2 norms, map-only. */
  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))

  private def ranked(scored: DataFrame): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id")))
        .cast("long")) // DuckDB row_number is BIGINT; match the schema exactly
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))

  private def rankTopK(scored: DataFrame): DataFrame =
    ranked(scored).orderBy("qid", "rnk")

  /** Exact top-k, memoized: the full-corpus dot-product scan is the most
    * expensive similarity stage and is consumed by `similarity_topk_brute`
    * AND both recall queries — one computation per run (order restored by
    * consumers; parquet does not preserve it).
    */
  /** The actual brute-force plan (package-visible so PlanAssertionsSpec can
    * audit it — the registered query's own plan is a scan of the memo).
    */
  private[graft] def bruteCompute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vectors(spark, sfDir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    ranked(
      e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("cosine", expr("vec_dot(qv, v)") / (col("qn") * col("nrm"))))
  }

  private[pipeline] def bruteRanked(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simbrute#$K#$NumQueries") {
      bruteCompute(spark, sfDir)
    }

  def bruteTopK(spark: SparkSession, sfDir: String): DataFrame =
    bruteRanked(spark, sfDir).orderBy("qid", "rnk")

  private[pipeline] val bruteSql =
    s"""WITH e AS (
          SELECT vec_id, embedding AS v,
                 ${Similarity.normDuck("embedding")} AS nrm
          FROM embeddings
        ), q AS (
          SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < $NumQueries
        ), p AS (
          SELECT qid, vec_id, ${Similarity.dotDuck("qv", "v")} / (qn * nrm) AS cosine
          FROM q CROSS JOIN e WHERE vec_id <> qid
        ), r AS (
          SELECT qid, vec_id, cosine,
                 row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
          FROM p
        )
        SELECT qid, rnk, vec_id AS neighbor_id, cosine
        FROM r WHERE rnk <= $K ORDER BY qid, rnk"""

  /** Corpus with per-table LSH buckets; reused as corpus tables, query side,
    * and scoring side; memoized per (sfDir, k, L) so `similarity_topk_lsh`
    * and the recall queries bucket the corpus exactly once per run
    * (see graft.Scratch.memoize).
    */
  private def lshBucketed(spark: SparkSession, sfDir: String,
                          tableBits: Int, numTables: Int): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simlsh#$tableBits#$numTables") {
      vectors(spark, sfDir)
        .withColumn("buckets", expr(Similarity.lshTableBuckets("v", tableBits, numTables)))
    }

  /** (qid, vec_id) candidate pairs of the OR-amplified LSH path; memoized —
    * consumed by `similarity_topk_lsh` and both recall queries.
    */
  private def lshCandidates(spark: SparkSession, sfDir: String,
                            tableBits: Int, numTables: Int): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simlshcand#$tableBits#$numTables") {
      val e = lshBucketed(spark, sfDir, tableBits, numTables)
      val tables = e.select(col("vec_id"),
        posexplode(col("buckets")).as(Seq("t", "bucket")))
      val qTables = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"),
          posexplode(col("buckets")).as(Seq("t", "bucket")))
      qTables.join(tables, Seq("t", "bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
    }

  /** `tableBits`/`numTables` are the per-query LSH knobs (defaults are the
    * fixture-scale constants; scaling rule on [[Similarity.TableBits]]).
    */
  def lshTopK(spark: SparkSession, sfDir: String,
              tableBits: Int = SearchTableBits,
              numTables: Int = SearchNumTables): DataFrame = {
    val e = lshBucketed(spark, sfDir, tableBits, numTables)
    val q = e.filter(col("vec_id") < NumQueries)
    val scored = lshCandidates(spark, sfDir, tableBits, numTables)
      .join(e.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(q.select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))), "qid")
      .withColumn("cosine", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
    rankTopK(scored)
  }

  private val lshSql =
    s"""WITH e AS (
          SELECT vec_id, v, nrm,
                 ${Similarity.lshTableBucketsDuck("v", SearchTableBits, SearchNumTables)} AS buckets
          FROM (SELECT vec_id, embedding AS v,
                       ${Similarity.normDuck("embedding")} AS nrm
                FROM embeddings)
        ), tb AS (
          SELECT vec_id, i AS t, buckets[i + 1] AS bucket
          FROM e, (SELECT unnest(range(0, $SearchNumTables)) AS i)
        ), q AS (
          SELECT vec_id AS qid, qv, qn FROM
            (SELECT vec_id, v AS qv, nrm AS qn FROM e) WHERE vec_id < $NumQueries
        ), cand AS (
          SELECT DISTINCT x.vec_id AS qid, y.vec_id AS vec_id
          FROM tb x JOIN tb y ON x.t = y.t AND x.bucket = y.bucket
            AND y.vec_id <> x.vec_id
          WHERE x.vec_id < $NumQueries
        ), p AS (
          SELECT c.qid, c.vec_id,
                 ${Similarity.dotDuck("q.qv", "e.v")} / (q.qn * e.nrm) AS cosine
          FROM cand c JOIN e ON c.vec_id = e.vec_id JOIN q ON c.qid = q.qid
        ), r AS (
          SELECT qid, vec_id, cosine,
                 row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
          FROM p
        )
        SELECT qid, rnk, vec_id AS neighbor_id, cosine
        FROM r WHERE rnk <= $K ORDER BY qid, rnk"""

  // ---- IVF variant (argmin-centroid coarse quantizer) ----

  /** (vec_id, v, nrm, bucket): corpus assigned to its nearest centroid's
    * Voronoi cell ([[Similarity.ivfScores]] argmin), memoized per sfDir.
    * Only the 4-byte bucket is carried per corpus vector — the score array
    * is recomputed for the tiny query side, never stored corpus-wide.
    * Package-visible: [[Dedup.semanticDedup]] blocks on the same cells, so
    * both families share one memoized assignment pass per run.
    */
  private[graft] def ivfCorpus(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simivf#${Similarity.NumCentroids}") {
      vectors(spark, sfDir)
        .withColumn("scores", expr(Similarity.ivfScores("v")))
        .withColumn("bucket",
          expr("CAST(array_position(scores, array_min(scores)) - 1 AS INT)"))
        .drop("scores")
    }

  /** (qid, bucket): each query probes its [[Similarity.NProbe]] nearest
    * cells — "all cells at distance ≤ the NProbe-th smallest", which both
    * engines resolve identically because the scores are bit-identical.
    */
  private def ivfProbes(corpus: DataFrame): DataFrame =
    corpus.filter(col("vec_id") < NumQueries)
      .withColumn("scores", expr(Similarity.ivfScores("v")))
      .withColumn("kth", expr(s"element_at(array_sort(scores), ${Similarity.NProbe})"))
      .select(col("vec_id").as("qid"),
        explode(expr(s"""filter(sequence(0, ${Similarity.NumCentroids - 1}),
                         c -> element_at(scores, c + 1) <= kth)""")).as("bucket"))

  /** (qid, vec_id) candidate pairs of the IVF path: probe cells equi-joined
    * to cell assignments — same join shape as the LSH path, different (and
    * cheaper) bucketing.
    */
  private def ivfCandidates(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark,
        s"$sfDir#simivfcand#${Similarity.NumCentroids}#${Similarity.NProbe}") {
      val corpus = ivfCorpus(spark, sfDir)
      ivfProbes(corpus).join(corpus.select("vec_id", "bucket"), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
    }

  /** `similarity_topk_ivf`: ANN via IVF coarse quantization — the same
    * map-only-assign + bucket-equi-join + candidate-scoring pipeline as
    * [[lshTopK]] with the sign-pattern bucket swapped for an
    * argmin-centroid cell, per the [[Similarity.TableBits]] scaling note.
    * At equal fixture recall (0.915 vs the ≥0.9 bar) it generates ~14%
    * fewer candidates than the LSH path (`similarity_ivf_recall` measures
    * both), and on clustered production embeddings trained centroids widen
    * that gap by an order of magnitude.
    */
  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = ivfCorpus(spark, sfDir)
    val q = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = ivfCandidates(spark, sfDir)
      .join(corpus.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("cosine", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
    rankTopK(scored)
  }

  private val ivfBaseDuck =
    s"""SELECT vec_id, embedding AS v,
               ${Similarity.normDuck("embedding")} AS nrm,
               ${Similarity.ivfScoresDuck("embedding")} AS scores
        FROM embeddings"""

  /** Standalone (qid, vec_id) IVF candidate subquery (DuckDB). */
  private val ivfCandSql =
    s"""WITH e AS ($ivfBaseDuck),
             a AS (
               SELECT vec_id,
                      CAST(list_position(scores, list_min(scores)) - 1 AS INT) AS bucket
               FROM e
             ), qp AS (
               SELECT vec_id AS qid,
                      unnest(list_filter(range(0, ${Similarity.NumCentroids}),
                        c -> scores[c + 1] <= list_sort(scores)[${Similarity.NProbe}])) AS bucket
               FROM e WHERE vec_id < $NumQueries
             )
        SELECT DISTINCT qp.qid, a.vec_id
        FROM qp JOIN a ON qp.bucket = a.bucket
        WHERE a.vec_id <> qp.qid"""

  /** Standalone (qid, vec_id) LSH candidate subquery (DuckDB), at the search
    * defaults — the comparison term in `similarity_ivf_recall`.
    */
  private val lshCandSql =
    s"""WITH e AS (
          SELECT vec_id,
                 ${Similarity.lshTableBucketsDuck("embedding", SearchTableBits, SearchNumTables)}
                   AS buckets
          FROM embeddings
        ), tb AS (
          SELECT vec_id, i AS t, buckets[i + 1] AS bucket
          FROM e, (SELECT unnest(range(0, $SearchNumTables)) AS i)
        )
        SELECT DISTINCT x.vec_id AS qid, y.vec_id AS vec_id
        FROM tb x JOIN tb y ON x.t = y.t AND x.bucket = y.bucket
          AND y.vec_id <> x.vec_id
        WHERE x.vec_id < $NumQueries"""

  private val ivfSql =
    s"""WITH e AS ($ivfBaseDuck),
             cand AS ($ivfCandSql),
             q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < $NumQueries),
             p AS (
               SELECT c.qid, c.vec_id,
                      ${Similarity.dotDuck("q.qv", "e.v")} / (q.qn * e.nrm) AS cosine
               FROM cand c JOIN e ON c.vec_id = e.vec_id JOIN q ON c.qid = q.qid
             ), r AS (
               SELECT qid, vec_id, cosine,
                      row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
               FROM p
             )
        SELECT qid, rnk, vec_id AS neighbor_id, cosine
        FROM r WHERE rnk <= $K ORDER BY qid, rnk"""

  // ---- trained-IVF variant (Lloyd-refined centroids) ----

  /** Fixed Lloyd iteration count for [[trainedCentroids]] — fixed, not
    * convergence-tested, so plan depth and the oracle's unrolled CTE chain
    * are bounded and identical.
    */
  val LloydRounds = 2

  /** (vec_id, label, v): UNIT-normalized corpus — the training/assignment
    * space. The ranking metric is cosine, so the quantizer is spherical
    * k-means: L2 argmin over unit vectors equals cosine argmax, making
    * cells align with the direction structure the search actually uses
    * (training in raw L2 space optimizes the wrong metric and measurably
    * loses recall on this fixture). Scoring keeps the raw vectors + norms;
    * `label` rides along as the stratum key for the training draw.
    */
  private[pipeline] def unitVectors(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simunit") {
      // memoized: every Lloyd round's assignment + means, the corpus
      // assignment, and the probe side all consume this frame — the norm
      // pays once per run (parquet doubles round-trip exactly, so the
      // memo cannot perturb the bit-reproducible training)
      vectors(spark, sfDir)
        .join(Tables.embeddings(spark, sfDir).select("vec_id", "label"), "vec_id")
        .select(col("vec_id"), col("label"),
          expr("transform(v, x -> CAST(x AS DOUBLE) / nrm)").as("v"))
    }

  /** Per-label quota for the TRAINING sample draw ([[trainingSample]]). */
  val TrainQuota = 25

  /** (vec_id, v): the deterministic stratified training sample — exactly
    * `min(`[[TrainQuota]]`, |label stratum|)` unit vectors per label, drawn
    * in md5(vec_id) order (the `docs_stratified_sample` pattern: the draw
    * is a pure row function, so any cluster size re-picks the SAME sample
    * and the oracle can enumerate it). This is what makes training cost
    * ∝ SAMPLE, not corpus: the rank ≤ quota filter runs as a two-phase
    * WindowGroupLimit (per-task heaps before the one label exchange), and
    * every Lloyd scan downstream reads these ≤ 10·quota rows instead of
    * the corpus — at 100 TB the quantizer trains on a bounded sample while
    * assignment (one map-only pass) still covers every vector.
    */
  private[pipeline] def trainingSample(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simtrainsample#$TrainQuota") {
      unitVectors(spark, sfDir)
        .withColumn("draw", md5(concat(lit("ivf:"), col("vec_id").cast("string"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy("label").orderBy("draw", "vec_id")))
        .filter(col("rn") <= TrainQuota)
        .select("vec_id", "v")
    }

  /** Lloyd-trained centroids: [[LloydRounds]] assign→mean rounds from the
    * seeded literals over the STRATIFIED TRAINING SAMPLE
    * ([[trainingSample]]), memoized per corpus. DETERMINISTIC in both
    * engines: the sample is a pure row function, and per-(cell, dim) means
    * use the sorted-fold sum (`sorted_sum` / `list_sort` + fold — the
    * mix_weights pattern), so the trained centroid components are
    * bit-identical doubles and every downstream assignment, probe, and
    * cosine agrees with the oracle exactly. An empty cell keeps its seed
    * centroid (deterministic, no divide-by-zero).
    *
    * r18 optimization (guide §1.2, the PQ-Lloyd altitude precedent): the
    * sample is BOUNDED (≤ 10·[[TrainQuota]] rows × 64 doubles) and the
    * trained quantizer is C·Dim = 1024 doubles of artifact, so the
    * assign→mean rounds run on the DRIVER over the collected sample —
    * the previous DataFrame formulation spent ~1.5 s/pass scheduling
    * sample-grain micro-stages (×C broadcast fan-outs, two nested
    * aggregations and a seed re-join per round) to move kilobytes. Every
    * IEEE operation order is reproduced exactly — the parsed seed
    * literals ([[Similarity.centroidComponent]] round-trips through its
    * shortest decimal rendering), vec_dot's strict left folds for ‖c‖²
    * and v·c, the (score, cid) argmin tie-break, sorted-ascending
    * member-mean folds, empty cells reverting to their SEED centroid —
    * pinned bit-for-bit against the retired DataFrame chain in
    * IvfTrainedParitySpec; the memoized (cid, cent) relation is unchanged
    * for every consumer, and only the one-time sample draw and the
    * map-only corpus assignment ([[trainedIvfCorpus]]) touch every
    * vector — the classic train-on-a-sample/ship-the-artifact split.
    */
  private def trainedCentroids(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark,
        s"$sfDir#simivftrained#${Similarity.NumCentroids}#$LloydRounds#$TrainQuota") {
      val cb = ivfLloydLocal(spark, sfDir)
      spark.createDataFrame(cb.indices.map(cid => (cid, cb(cid).toSeq)))
        .toDF("cid", "cent")
    }

  /** The driver-side spherical-k-means iteration — see [[trainedCentroids]].
    * Returns cents(cid)(d), cid 0 until [[Similarity.NumCentroids]].
    */
  private[pipeline] def ivfLloydLocal(spark: SparkSession, sfDir: String)
      : Array[Array[Double]] = {
    val dim = Similarity.Dim
    val kC = Similarity.NumCentroids
    val sample = trainingSample(spark, sfDir)
      .select("vec_id", "v").collect()
      .map(r => r.getSeq[Double](1).toArray)
    def seedCent(cid: Int): Array[Double] =
      Array.tabulate(dim)(d => Similarity.centroidComponent(cid, d))
    var cents = Array.tabulate(kC)(seedCent)
    for (_ <- 1 to LloydRounds) {
      // ‖c‖² with vec_dot's strict left fold
      val cn2 = cents.map { c =>
        var s = 0.0; var d = 0
        while (d < dim) { s += c(d) * c(d); d += 1 }
        s
      }
      val members = Array.fill(kC)(
        scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
      sample.foreach { v =>
        var bestScore = Double.NaN
        var bestCid = -1
        var cid = 0
        while (cid < kC) {
          var dot = 0.0
          var d = 0
          while (d < dim) { dot += v(d) * cents(cid)(d); d += 1 }
          val score = cn2(cid) - 2 * dot
          // min on struct(score, cid): strictly-smaller score wins, ties
          // keep the smaller cid (cid ascends, so never replace on equal)
          if (bestCid < 0 || score < bestScore) { bestScore = score; bestCid = cid }
          cid += 1
        }
        members(bestCid) += v
      }
      cents = Array.tabulate(kC) { cid =>
        val mem = members(cid)
        if (mem.isEmpty) seedCent(cid) // empty cell keeps its SEED centroid
        else Array.tabulate(dim) { d =>
          // sorted_sum: ascending sort then strict left fold, / count
          val xs = mem.map(_(d)).toArray
          java.util.Arrays.sort(xs)
          var s = 0.0; var i = 0
          while (i < xs.length) { s += xs(i); i += 1 }
          s / mem.length
        }
      }
    }
    cents
  }

  /** The trained centroids as local arrays, cid-indexed — ≤ 8 KB. */
  private[pipeline] def collectTrainedCents(spark: SparkSession, sfDir: String)
      : Array[Array[Double]] = {
    val rows = trainedCentroids(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("cid"))
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getAs[Int]("cid") == i, "trained centroid cid gap") }
    rows.map(_.getAs[Seq[Double]]("cent").toArray)
  }

  /** Map-only nearest-trained-cell assignment of `(vec_id, ..., u)` rows
    * (u = the unit vector) against a local centroid table — the same
    * L2-score argmin as the retired crossJoin/groupBy formulation
    * (‖c‖² − 2·u·c via vec_dot's strict left folds, min on (score, cid)),
    * bit-pinned in IvfTrainedParitySpec. Package-visible for the spec.
    */
  private[pipeline] def assignLocal(cb: Array[Array[Double]])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cn2 = cb.map { c =>
      var s = 0.0; var d = 0
      while (d < c.length) { s += c(d) * c(d); d += 1 }
      s
    }
    udf { (u: Seq[Double]) =>
      var bestScore = Double.NaN
      var bestCid = -1
      var cid = 0
      while (cid < cb.length) {
        val c = cb(cid)
        var dot = 0.0
        var d = 0
        while (d < c.length) { dot += u(d) * c(d); d += 1 }
        val score = cn2(cid) - 2 * dot
        if (bestCid < 0 || score < bestScore) { bestScore = score; bestCid = cid }
        cid += 1
      }
      bestCid
    }
  }

  /** (vec_id, v, nrm, bucket): corpus assigned to trained cells, memoized.
    *
    * r18 optimization (guide §2.4): assignment is MAP-ONLY — the trained
    * quantizer is collected once (1024 doubles) and shipped in the
    * assignment closure, and the unit vector is re-derived inline with
    * [[unitVectors]]' exact expression (CAST-to-double / nrm — IEEE
    * division is deterministic, so the values match the memoized unit
    * table bit-for-bit). The previous shape paid a corpus-grain ×C
    * broadcast fan-out → (vec_id) argmin exchange → corpus re-join to
    * compare each vector against 8 KB of constants.
    */
  private def trainedIvfCorpus(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark,
        s"$sfDir#simivftcorpus#${Similarity.NumCentroids}#$LloydRounds#$TrainQuota") {
      val assign = assignLocal(collectTrainedCents(spark, sfDir))
      vectors(spark, sfDir)
        .withColumn("bucket",
          assign(expr("transform(v, x -> CAST(x AS DOUBLE) / nrm)")))
    }

  /** (qid, bucket): each query's [[Similarity.NProbe]] nearest trained
    * cells by (score, cid) rank — row_number in both engines, so the probe
    * set is identical even under score ties.
    */
  private def trainedProbes(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = trainedCentroids(spark, sfDir).withColumn("n2", expr("vec_dot(cent, cent)"))
    unitVectors(spark, sfDir).filter(col("vec_id") < NumQueries)
      .crossJoin(broadcast(cents))
      .withColumn("score", col("n2") - lit(2) * expr("vec_dot(v, cent)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("score"), col("cid"))))
      .filter(col("rn") <= Similarity.NProbe)
      .select(col("vec_id").as("qid"), col("cid").as("bucket"))
  }

  private def trainedCandidates(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark,
        s"$sfDir#simivftcand#${Similarity.NumCentroids}#${Similarity.NProbe}#$LloydRounds#$TrainQuota") {
      trainedProbes(spark, sfDir)
        .join(trainedIvfCorpus(spark, sfDir).select("vec_id", "bucket"), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
    }

  /** `similarity_topk_ivf_trained`: the IVF path with Lloyd-TRAINED
    * centroids — real IVF trains its coarse quantizer; the seeded variant
    * above is the untrained baseline. Same assign/probe/score pipeline,
    * same nprobe; `similarity_ivf_recall` measures both side by side.
    *
    * Measured (this fixture, [[LloydRounds]] = 2, [[TrainQuota]] = 25 ⇒
    * 250-vector training sample, nprobe equal):
    *   - sf0.001 (500 vectors): trained recall 0.955 vs seeded 0.80 —
    *     seeds land badly in a small corpus and training repairs the cell
    *     structure outright (pinned ≥ 0.9 in TrainedIvfSpec); the
    *     half-corpus sample loses nothing vs full-corpus training (0.915);
    *   - sf0.01 (500 vectors, distinct draw): 0.920 vs 0.915 with ~6%
    *     more candidates — these embeddings are near-uniform, so training
    *     balances cells rather than aligning them with (nonexistent)
    *     clusters, and the sample-trained cells trade a few candidates
    *     for recall. Clustered production embeddings are where trained
    *     cells pull decisively ahead, per the [[Similarity.NumCentroids]]
    *     scaling note.
    */
  def trainedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = trainedIvfCorpus(spark, sfDir)
    val q = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = trainedCandidates(spark, sfDir)
      .join(corpus.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("cosine", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
    rankTopK(scored)
  }

  /** The Lloyd chain as DuckDB CTEs (`e` must already be in scope):
    * the stratified training draw `ts` (the same md5-order quota as
    * [[trainingSample]]), then seeds → (a_r assignment, c_r re-estimated
    * centroids) per round over `ts` — the same sorted-fold means, the same
    * (score, cid) argmin.
    */
  private def lloydDuckCtes: String = {
    def asgCte(name: String, centsRel: String) =
      s"""$name AS (
            SELECT vec_id, cid FROM (
              SELECT t.vec_id, c.cid,
                     row_number() OVER (PARTITION BY t.vec_id ORDER BY
                       ${Similarity.dotDuck("c.cent", "c.cent")}
                         - 2 * ${Similarity.dotDuck("t.vn", "c.cent")},
                       c.cid) AS rn
              FROM ts t CROSS JOIN $centsRel c) WHERE rn = 1
          )"""
    def centCte(asg: String, mname: String, cname: String) =
      s"""$mname AS (
            SELECT cid, d,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_sort(list(CAST(x AS DOUBLE)))), (acc, p) -> acc + p)
                     / COUNT(*) AS m
            FROM (SELECT a.cid, g.i AS d, t.vn[g.i] AS x
                  FROM $asg a JOIN ts t USING (vec_id),
                       (SELECT unnest(range(1, ${Similarity.Dim + 1})) AS i) g)
            GROUP BY cid, d
          ), $cname AS (
            SELECT s.cid, COALESCE(mm.cent, s.cent) AS cent
            FROM seeds s LEFT JOIN
              (SELECT cid, list(m ORDER BY d) AS cent FROM $mname GROUP BY cid) mm
              USING (cid)
          )"""
    val sample =
      s"""ts AS (
            SELECT vec_id, vn FROM (
              SELECT vec_id, vn,
                     row_number() OVER (PARTITION BY label
                       ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id) AS srn
              FROM e) WHERE srn <= $TrainQuota
          )"""
    val seeds =
      s"""seeds AS (
            SELECT CAST(i AS INT) AS cid, cents[i + 1] AS cent
            FROM (SELECT ${Similarity.centroidArrayDuck} AS cents),
                 (SELECT unnest(range(0, ${Similarity.NumCentroids})) AS i)
          )"""
    val rounds = (1 to LloydRounds).map { r =>
      val prev = if (r == 1) "seeds" else s"c${r - 1}"
      asgCte(s"a$r", prev) + ", " + centCte(s"a$r", s"m$r", s"c$r")
    }
    (sample +: seeds +: rounds).mkString(", ")
  }

  /** Final trained relation names in [[lloydDuckCtes]]'s chain. */
  private def trainedCentsRel = s"c$LloydRounds"

  /** Trained corpus assignment + probes + candidate CTEs, standalone-ready
    * (ends with `tcand`).
    */
  private def trainedChainDuck: String =
    s"""e AS (
          SELECT vec_id, label, embedding AS v, nrm,
                 list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS vn
          FROM (SELECT vec_id, label, embedding,
                       ${Similarity.normDuck("embedding")} AS nrm
                FROM embeddings)
        ), $lloydDuckCtes,
        af AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     ${Similarity.dotDuck("c.cent", "c.cent")}
                       - 2 * ${Similarity.dotDuck("e.vn", "c.cent")},
                     c.cid) AS rn
            FROM e CROSS JOIN $trainedCentsRel c) WHERE rn = 1
        ), qp AS (
          SELECT qid, cid FROM (
            SELECT e.vec_id AS qid, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     ${Similarity.dotDuck("c.cent", "c.cent")}
                       - 2 * ${Similarity.dotDuck("e.vn", "c.cent")},
                     c.cid) AS rn
            FROM e CROSS JOIN $trainedCentsRel c
            WHERE e.vec_id < $NumQueries) WHERE rn <= ${Similarity.NProbe}
        ), tcand AS (
          SELECT DISTINCT qp.qid, af.vec_id
          FROM qp JOIN af ON af.cid = qp.cid
          WHERE af.vec_id <> qp.qid
        )"""

  /** Standalone (qid, vec_id) trained-IVF candidate query (DuckDB). */
  private def trainedCandSql: String =
    s"WITH $trainedChainDuck SELECT qid, vec_id FROM tcand"

  private def trainedSql: String =
    s"""WITH $trainedChainDuck,
             q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e
                   WHERE vec_id < $NumQueries),
             p AS (
               SELECT c.qid, c.vec_id,
                      ${Similarity.dotDuck("q.qv", "e.v")} / (q.qn * e.nrm) AS cosine
               FROM tcand c JOIN e ON c.vec_id = e.vec_id JOIN q ON c.qid = q.qid
             ), r AS (
               SELECT qid, vec_id, cosine,
                      row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
               FROM p
             )
        SELECT qid, rnk, vec_id AS neighbor_id, cosine
        FROM r WHERE rnk <= $K ORDER BY qid, rnk"""

  /** `similarity_ivf_recall`: recall@K of the IVF path against brute force,
    * PLUS both paths' candidate counts in the same row — the "fewer
    * candidates at equal recall" comparison as one oracle-checkable fact.
    */
  def ivfRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val brute = bruteRanked(spark, sfDir).select("qid", "neighbor_id")
    val ivf = ivfTopK(spark, sfDir).select("qid", "neighbor_id")
      .withColumn("hit", lit(1L))
    val trained = trainedTopK(spark, sfDir).select("qid", "neighbor_id")
      .withColumn("hit_t", lit(1L))
    val recall = brute
      .join(ivf, Seq("qid", "neighbor_id"), "left")
      .join(trained, Seq("qid", "neighbor_id"), "left")
      .agg(
        count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"),
        sum(coalesce(col("hit_t"), lit(0L))).as("n_hit_trained"))
      .select(col("n_true"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_true")).as("recall_at_k"),
        col("n_hit_trained"),
        (col("n_hit_trained").cast("double") / col("n_true")).as("recall_at_k_trained"))
    val nIvf = ivfCandidates(spark, sfDir).agg(count(lit(1)).as("n_cand_ivf"))
    val nTrained = trainedCandidates(spark, sfDir)
      .agg(count(lit(1)).as("n_cand_ivf_trained"))
    val nLsh = lshCandidates(spark, sfDir, SearchTableBits, SearchNumTables)
      .agg(count(lit(1)).as("n_cand_lsh"))
    recall.crossJoin(nIvf).crossJoin(nTrained).crossJoin(nLsh) // 1-row each
  }

  private def ivfRecallSql =
    s"""WITH brute AS (SELECT qid, neighbor_id FROM ($bruteSql)),
             ivf AS (SELECT qid, neighbor_id FROM ($ivfSql)),
             trained AS (SELECT qid, neighbor_id FROM ($trainedSql))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN l.qid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               CAST(SUM(CASE WHEN l.qid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS recall_at_k,
               CAST(SUM(CASE WHEN t.qid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hit_trained,
               CAST(SUM(CASE WHEN t.qid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS recall_at_k_trained,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ($ivfCandSql)) AS n_cand_ivf,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ($trainedCandSql)) AS n_cand_ivf_trained,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ($lshCandSql)) AS n_cand_lsh
        FROM brute b
        LEFT JOIN ivf l ON b.qid = l.qid AND b.neighbor_id = l.neighbor_id
        LEFT JOIN trained t ON b.qid = t.qid AND b.neighbor_id = t.neighbor_id"""

  /** `similarity_lsh_recall`: recall@K of the LSH path against the exact
    * brute-force path — the measurement the [[Similarity.TableBits]] scaling
    * rule calls for. Both paths are deterministic in both engines, so the
    * recall ratio itself is oracle-checkable: (true top-k rows) left-joined
    * to (LSH top-k rows), hit fraction in one distributed aggregate. The
    * shipped defaults must keep this ≥ 0.9 on the fixture; re-run at chosen
    * (k, L) after any corpus-scale retune.
    */
  def lshRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val brute = bruteRanked(spark, sfDir).select("qid", "neighbor_id")
    val lsh = lshTopK(spark, sfDir).select("qid", "neighbor_id")
      .withColumn("hit", lit(1L))
    brute.join(lsh, Seq("qid", "neighbor_id"), "left")
      .agg(
        count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("n_true"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_true")).as("recall_at_k"))
  }

  private val lshRecallSql =
    s"""WITH brute AS (SELECT qid, neighbor_id FROM ($bruteSql)),
             lsh AS (SELECT qid, neighbor_id FROM ($lshSql))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN l.qid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               CAST(SUM(CASE WHEN l.qid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS recall_at_k
        FROM brute b LEFT JOIN lsh l
          ON b.qid = l.qid AND b.neighbor_id = l.neighbor_id"""

  /** Int8 quantization grid: 256 levels → the divisor literal "255.0e0"
    * (e-notation: DOUBLE in both engines, the bm25TermScore discipline).
    */
  val QuantLevels = 255

  /** Per-(dim, value) quantize→dequantize error — ONE shared SQL string.
    * `floor(u + 0.5)` instead of `round(u)` (the engines' round()
    * semantics differ; floor is exact on both), `least` clamps the
    * max-value edge case, and a constant dimension (scale 0) maps
    * everything to code 0 with zero error.
    */
  private val quantErrExpr =
    s"""abs(min_v
            + CAST(CASE WHEN scale > 0.0e0
                        THEN least($QuantLevels,
                               CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                        ELSE 0 END AS DOUBLE) * scale
            - x)"""

  /** `emb_quantization_report`: per-dimension int8 scalar-quantization
    * calibration over the embedding corpus — (min, max) range, the
    * 256-level scale, the worst absolute reconstruction error, and how
    * many values land on the saturated codes — the audit a pipeline runs
    * before shipping embeddings to an int8 ANN index or a quantized
    * serving tier (4× smaller vectors; the report bounds what that costs).
    *
    * Shape: the corpus is exploded ONCE into a materialized (dim, x)
    * scratch table (the list decode is paid once); pass 1 is the per-dim
    * min/max calibration (64 rows, broadcast back), pass 2 quantizes each
    * value and aggregates max error + saturation counts per dim. Two
    * passes are INHERENT to calibrated quantization (the range must exist
    * before any value quantizes); both are map-combined aggregations with
    * a 64-group shuffle.
    *
    * Determinism: float→double widening is exact; min/max/count are
    * order-independent; quantize→dequantize is a fixed per-row IEEE tree
    * ([[quantErrExpr]] — floor, not round; no transcendentals); the max
    * over per-row errors is order-independent. Every emitted double is
    * bit-identical in both engines — no ranking escape hatch needed.
    *
    * Scale: at 100 TB the exploded table is 64 rows × 12 bytes per vector
    * — linear, shuffle-light (64 groups). Calibrating min/max on the full
    * corpus is one pass; a percentile-clipped calibration (the production
    * knob when outliers stretch the range) would swap pass 1 for the
    * bounded-state histogram quantiles (`events_value_quantiles_hist`)
    * and keep pass 2 unchanged.
    */
  def quantizationReport(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = graft.Scratch.materialize(
      Tables.embeddings(spark, sfDir)
        .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select((col("pos") + 1).cast("int").as("dim"),
          col("xf").cast("double").as("x")),
      "graft_quant_ex")
    val rng = ex.groupBy("dim")
      .agg(min("x").as("min_v"), max("x").as("max_v"))
      .withColumn("scale",
        (col("max_v") - col("min_v")) / lit(QuantLevels.toDouble))
    ex.join(broadcast(rng), "dim")
      .select(col("dim"), col("min_v"), col("max_v"), col("scale"),
        expr(quantErrExpr).as("err"),
        expr(s"""CASE WHEN scale > 0.0e0
                      THEN least($QuantLevels,
                             CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END""").as("q"))
      .groupBy("dim", "min_v", "max_v", "scale")
      .agg(count(lit(1)).as("n_values"),
        max("err").as("max_abs_err"),
        sum(when(col("q") === 0 || col("q") === QuantLevels, 1L).otherwise(0L))
          .as("n_saturated"))
      .orderBy("dim")
  }

  private val quantizationReportSql =
    s"""WITH ex AS (
          SELECT g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
          FROM embeddings e
          CROSS JOIN (SELECT unnest(range(1, ${Similarity.Dim + 1})) AS i) g
        ), rng AS (
          SELECT dim, MIN(x) AS min_v, MAX(x) AS max_v,
                 (MAX(x) - MIN(x)) / 255.0e0 AS scale
          FROM ex GROUP BY 1
        ), contrib AS (
          SELECT ex.dim, min_v, max_v, scale, $quantErrExpr AS err,
                 CASE WHEN scale > 0.0e0
                      THEN least($QuantLevels,
                             CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END AS q
          FROM ex JOIN rng USING (dim)
        )
        SELECT CAST(dim AS INT) AS dim, min_v, max_v, scale,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               MAX(err) AS max_abs_err,
               CAST(SUM(CASE WHEN q = 0 OR q = $QuantLevels THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_saturated
        FROM contrib GROUP BY dim, min_v, max_v, scale
        ORDER BY dim"""

  // ---- percentile-clipped quantization calibration ----

  /** Histogram resolution for the clipped calibration's percentile pass —
    * the `events_value_quantiles_hist` machinery at embedding grain.
    */
  val ClipBuckets = 1000

  /** `emb_quantization_clipped`: the production calibration knob
    * [[quantizationReport]]'s scaladoc promises — per-dimension int8
    * calibration with the range CLIPPED to [p01, p99] instead of
    * [min, max], so a single outlier can no longer stretch a dimension's
    * scale and waste its 256 codes. Reports the clipped range, how many
    * values were clipped on each side, and the worst reconstruction error
    * against the ORIGINAL values (tails included — the honest cost of
    * clipping, which the [min, max] report by construction never shows).
    *
    * Percentiles come from the bounded-state histogram pattern
    * (`events_value_quantiles_hist`): bucket-count, cumulative pick at
    * ⌈q·n⌉, p01 takes its bucket's LOWER edge and p99 its UPPER edge so
    * the clip interval covers the picked mass. Three passes over the
    * once-materialized (dim, x) explosion — range, histogram, quantize —
    * each a map-combined aggregate with ≤ 64·[[ClipBuckets]] cells of
    * state; calibration is inherently multi-pass (a range must exist
    * before any value quantizes), and the clipped variant adds exactly one
    * histogram pass over the uncapped report's two.
    *
    * Determinism: bucket indices, picks, and edges are the proven hist
    * math; clip (`least`/`greatest`), code, and reconstruction are the
    * [[quantErrExpr]] floor tree over exact inputs; max/count aggregates
    * are order-independent. A constant dimension degenerates to
    * lo = hi = mn, scale 0, every code 0 — same convention as the uncapped
    * report.
    */
  def quantizationClipped(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = graft.Scratch.materialize(
      Tables.embeddings(spark, sfDir)
        .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select((col("pos") + 1).cast("int").as("dim"),
          col("xf").cast("double").as("x")),
      "graft_quantclip_ex")
    val stats = ex.groupBy("dim")
      .agg(min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("n"))
    val cum = ex.join(broadcast(stats), "dim")
      .withColumn("bucket", expr(
        s"""CAST(CASE WHEN mx = mn THEN 0
                 ELSE least(floor((x - mn) / (mx - mn) * $ClipBuckets),
                            ${ClipBuckets - 1}) END AS BIGINT)"""))
      .groupBy("dim", "bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("dim").orderBy("bucket")))
    val edges = cum.join(broadcast(stats), "dim")
      .groupBy("dim", "mn", "mx", "n")
      .agg(
        min(when(col("cum") >= ceil(col("n") * 0.01), col("bucket"))).as("b_lo"),
        min(when(col("cum") >= ceil(col("n") * 0.99), col("bucket"))).as("b_hi"))
      .select(col("dim"),
        expr(s"mn + b_lo * (mx - mn) / $ClipBuckets").as("lo"),
        expr(s"mn + (b_hi + 1) * (mx - mn) / $ClipBuckets").as("hi"))
      .withColumn("scale", expr(s"(hi - lo) / ${QuantLevels}.0e0"))
    ex.join(broadcast(edges), "dim")
      .select(col("dim"), col("lo"), col("hi"), col("scale"), col("x"),
        expr("least(greatest(x, lo), hi)").as("xc"))
      .withColumn("q", expr(
        s"""CASE WHEN scale > 0.0e0
                 THEN least($QuantLevels,
                        CAST(floor((xc - lo) / scale + 0.5e0) AS BIGINT))
                 ELSE 0 END"""))
      .groupBy("dim", "lo", "hi", "scale")
      .agg(count(lit(1)).as("n_values"),
        sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("x") > col("hi"), 1L).otherwise(0L)).as("n_above"),
        max(expr("abs(lo + CAST(q AS DOUBLE) * scale - x)")).as("max_abs_err"))
      .orderBy("dim")
  }

  private val quantizationClippedSql =
    s"""WITH ex AS (
          SELECT g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
          FROM embeddings e
          CROSS JOIN (SELECT unnest(range(1, ${Similarity.Dim + 1})) AS i) g
        ), s AS (
          SELECT dim, MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n FROM ex GROUP BY 1
        ), b AS (
          SELECT ex.dim,
                 CAST(CASE WHEN s.mx = s.mn THEN 0
                      ELSE least(floor((ex.x - s.mn) / (s.mx - s.mn) * $ClipBuckets),
                                 ${ClipBuckets - 1}) END AS BIGINT) AS bucket,
                 COUNT(*) AS cnt
          FROM ex JOIN s USING (dim) GROUP BY 1, 2
        ), c AS (
          SELECT dim, bucket, cnt,
                 SUM(cnt) OVER (PARTITION BY dim ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM b
        ), p AS (
          SELECT c.dim,
                 MIN(CASE WHEN cum >= ceil(s.n * 0.01) THEN bucket END) AS b_lo,
                 MIN(CASE WHEN cum >= ceil(s.n * 0.99) THEN bucket END) AS b_hi
          FROM c JOIN s USING (dim) GROUP BY 1
        ), e2 AS (
          SELECT p.dim,
                 s.mn + b_lo * (s.mx - s.mn) / $ClipBuckets AS lo,
                 s.mn + (b_hi + 1) * (s.mx - s.mn) / $ClipBuckets AS hi
          FROM p JOIN s USING (dim)
        ), e3 AS (
          SELECT dim, lo, hi, (hi - lo) / ${QuantLevels}.0e0 AS scale FROM e2
        ), contrib AS (
          SELECT ex.dim, lo, hi, scale, x,
                 least(greatest(x, lo), hi) AS xc
          FROM ex JOIN e3 USING (dim)
        ), coded AS (
          SELECT dim, lo, hi, scale, x,
                 CASE WHEN scale > 0.0e0
                      THEN least($QuantLevels,
                             CAST(floor((xc - lo) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END AS q
          FROM contrib
        )
        SELECT CAST(dim AS INT) AS dim, lo, hi, scale,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(CASE WHEN x < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
               CAST(SUM(CASE WHEN x > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               MAX(abs(lo + CAST(q AS DOUBLE) * scale - x)) AS max_abs_err
        FROM coded GROUP BY dim, lo, hi, scale
        ORDER BY dim"""

  // ---- quantized retrieval + its recall against the float baseline ----

  /** `emb_topk_quantized`: the brute-force top-k over INT8 CODES — what the
    * serving tier actually ranks with once vectors ship quantized (4×
    * smaller, integer dot products). Shape is `similarity_topk_brute` with
    * the scoring swapped: codes cast to array<double> feed the same
    * codegen'd `vec_dot` — every product ≤ 255² and every sum ≤ d·255²,
    * so all intermediates are EXACT integers in double arithmetic: the
    * cosine is deterministic under any partitioning and the DuckDB twin's
    * integer SUM reproduces it bit-for-bit (the [[covarianceQ]] recipe
    * applied to retrieval).
    */
  def quantizedTopK(spark: SparkSession, sfDir: String): DataFrame =
    quantizedRanked(spark, sfDir).orderBy("qid", "rnk")

  private def quantizedRanked(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simquant#topk#$K#$NumQueries") {
      val e = quantizedCodes(spark, sfDir)
        .select(col("vec_id"), expr("cast(qvec as array<double>)").as("qd"))
        .withColumn("nn", expr("vec_dot(qd, qd)"))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("qd").as("qqd"), col("nn").as("qnn"))
      ranked(
        e.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("cosine",
            expr("vec_dot(qqd, qd)") / (sqrt(col("qnn")) * sqrt(col("nn")))))
    }

  private val quantizedCodesDuck =
    s"""qex AS (
          SELECT e.vec_id, g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
          FROM embeddings e
          CROSS JOIN (SELECT unnest(range(1, ${Similarity.Dim + 1})) AS i) g
        ), qrng AS (
          SELECT dim, MIN(x) AS min_v, (MAX(x) - MIN(x)) / 255.0e0 AS scale
          FROM qex GROUP BY 1
        ), qc AS (
          SELECT vec_id, qex.dim,
                 CASE WHEN scale > 0.0e0
                      THEN least($QuantLevels,
                             CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END AS q
          FROM qex JOIN qrng USING (dim)
        )"""

  private val quantizedTopKSql =
    s"""WITH $quantizedCodesDuck, qnn AS (
          SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS nn FROM qc GROUP BY 1
        ), qd AS (
          SELECT a.vec_id AS qid, b.vec_id AS vec_id,
                 CAST(SUM(a.q * b.q) AS BIGINT) AS d
          FROM qc a JOIN qc b ON a.dim = b.dim
          WHERE a.vec_id < $NumQueries AND b.vec_id <> a.vec_id
          GROUP BY 1, 2
        ), qp AS (
          SELECT qd.qid, qd.vec_id,
                 CAST(qd.d AS DOUBLE)
                   / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
          FROM qd JOIN qnn na ON na.vec_id = qd.qid JOIN qnn nb ON nb.vec_id = qd.vec_id
        ), qr AS (
          SELECT qid, vec_id, cosine,
                 row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
          FROM qp
        )
        SELECT qid, rnk, vec_id AS neighbor_id, cosine
        FROM qr WHERE rnk <= $K ORDER BY qid, rnk"""

  /** `emb_quantized_recall`: what int8 quantization costs RETRIEVAL — the
    * overlap between the float-exact top-[[K]] and the code-ranked
    * top-[[K]], the go/no-go number for shipping the quantized tier (the
    * range/error report says codes are cheap; this says whether the
    * NEIGHBORS survive). Same single-row shape as `similarity_lsh_recall`.
    */
  def quantizedRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val brute = bruteRanked(spark, sfDir).select("qid", "neighbor_id")
    val quant = quantizedRanked(spark, sfDir).select("qid", "neighbor_id")
      .withColumn("hit", lit(1L))
    brute.join(quant, Seq("qid", "neighbor_id"), "left")
      .agg(
        count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("n_true"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_true")).as("recall_at_k"))
  }

  private val quantizedRecallSql =
    s"""WITH brute AS (SELECT qid, neighbor_id FROM ($bruteSql)),
             quant AS (SELECT qid, neighbor_id FROM ($quantizedTopKSql))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN l.qid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               CAST(SUM(CASE WHEN l.qid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS recall_at_k
        FROM brute b LEFT JOIN quant l
          ON b.qid = l.qid AND b.neighbor_id = l.neighbor_id"""

  // ---- per-label centroids + class separation ----

  /** `emb_label_centroids`: pairwise separation of the label classes —
    * per-label centroid of the int8-quantized codes, then the L2 distance
    * between every pair of centroids. The audit behind "are these labels
    * actually separable in embedding space?" (negative-pair mining and
    * classifier-probe pipelines read exactly this matrix first).
    *
    * Same determinism recipe as [[covarianceQ]]: quantized codes make the
    * per-(label, dim) sufficient statistics exact integers; each centroid
    * coordinate is ONE double division; the cross-dim reduction of
    * (ca−cb)² terms is `sorted_sum` (the multiset fold), so every emitted
    * double is bit-identical in the oracle.
    *
    * Shape: one explode pass → (label, dim) partial+final aggregation
    * (labels·d cells), MATERIALIZED once; the pair stage joins the
    * centroid table with itself on dim — labels²·d rows, corpus-free.
    */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("label"), (col("pos") + 1).cast("int").as("dim"),
        col("xf").cast("double").as("x"))
    val rng = ex.groupBy("dim")
      .agg(min("x").as("min_v"), max("x").as("max_v"))
      .withColumn("scale", (col("max_v") - col("min_v")) / lit(QuantLevels.toDouble))
    val cent = graft.Scratch.materialize(
      ex.join(broadcast(rng), "dim")
        .select(col("label"), col("dim"), expr(
          s"""CASE WHEN scale > 0.0e0
                   THEN least($QuantLevels,
                          CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                   ELSE 0 END""").as("q"))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum("q").as("s"))
        .withColumn("c", col("s").cast("double") / col("n")),
      "graft_centroids")
    cent.select(col("label").as("label_a"), col("dim"),
        col("n").as("n_a"), col("c").as("ca"))
      .join(cent.select(col("label").as("label_b"), col("dim"),
        col("n").as("n_b"), col("c").as("cb")), "dim")
      .filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        expr("(ca - cb) * (ca - cb)").as("term"))
      .groupBy("label_a", "label_b", "n_a", "n_b")
      .agg(expr("sorted_sum(term)").as("dist_sq"))
      .withColumn("dist", sqrt(col("dist_sq")))
      .orderBy("label_a", "label_b")
  }

  private val labelCentroidsSql =
    s"""WITH ex AS (
          SELECT e.label, g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
          FROM embeddings e
          CROSS JOIN (SELECT unnest(range(1, ${Similarity.Dim + 1})) AS i) g
        ), rng AS (
          SELECT dim, MIN(x) AS min_v,
                 (MAX(x) - MIN(x)) / 255.0e0 AS scale
          FROM ex GROUP BY 1
        ), q AS (
          SELECT label, ex.dim,
                 CASE WHEN scale > 0.0e0
                      THEN least($QuantLevels,
                             CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END AS q
          FROM ex JOIN rng USING (dim)
        ), cent AS (
          SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS s
          FROM q GROUP BY 1, 2
        ), c2 AS (
          SELECT label, dim, n, CAST(s AS DOUBLE) / n AS c FROM cent
        ), terms AS (
          SELECT a.label AS label_a, b.label AS label_b,
                 a.n AS n_a, b.n AS n_b,
                 (a.c - b.c) * (a.c - b.c) AS term
          FROM c2 a JOIN c2 b ON a.dim = b.dim AND a.label < b.label
        ), d AS (
          SELECT label_a, label_b, n_a, n_b,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(term))),
                   (a, x) -> a + x) AS dist_sq
          FROM terms GROUP BY 1, 2, 3, 4
        )
        SELECT label_a, label_b, n_a, n_b, dist_sq, sqrt(dist_sq) AS dist
        FROM d ORDER BY label_a, label_b"""

  // ---- quantized covariance / correlation matrix ----

  /** Off-diagonal pairs emitted by `emb_covariance_q` (of d·(d−1)/2). */
  val CovTopK = 100

  /** `emb_covariance_q`: top-[[CovTopK]] most-covarying dimension pairs
    * (covariance + Pearson correlation) of the int8-QUANTIZED embedding
    * corpus — the redundancy audit behind PCA/whitening and
    * quantization-aware dimension pruning: a pair with |corr| near 1 is a
    * dimension the index could drop.
    *
    * Quantizing FIRST ([[quantizationReport]]'s calibration grid, same
    * floor-based code map) is what makes a covariance matrix
    * oracle-checkable at all: the sufficient statistics (N, Σq, Σq_i·q_j)
    * become exact integers, immune to summation order, so the final
    * divisions are one fixed IEEE tree per cell in both engines. A
    * float-summed covariance could never hash-match across engines.
    *
    * Shape: pass 1 calibrates the per-dim grid (64-group aggregate);
    * pass 2 quantizes each vector against the broadcast grid array (the
    * crossJoin is the documented 1-row-side broadcast) and feeds ONE
    * [[graft.functions.GramianAgg]] — a single-pass partial+final
    * aggregation whose shuffle is one d·(d+3)/2-long buffer per
    * partition, NOT an N·d² row fan-out. Everything after the one-row
    * Gramian is d²-sized arithmetic.
    */
  /** `(vec_id, label, qvec)`: per-vector int8 codes against the
    * corpus-calibrated [min, max] grid — the quantize pass shared by
    * `emb_covariance_q`, `emb_quantized_recall`, and [[Whitening]];
    * memoized (the grid calibration + zip_with encode runs once per
    * corpus per JVM). The crossJoin is the documented 1-row-side
    * broadcast.
    */
  private[pipeline] def quantizedCodes(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#simquant#codes#$QuantLevels") {
      val ex = Tables.embeddings(spark, sfDir)
        .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select((col("pos") + 1).cast("int").as("dim"), col("xf").cast("double").as("x"))
      val grid = ex.groupBy("dim")
        .agg(min("x").as("min_v"), max("x").as("max_v"))
        .withColumn("scale", (col("max_v") - col("min_v")) / lit(QuantLevels.toDouble))
        .select(struct(col("dim"), col("min_v"), col("scale")).as("e"))
        .agg(expr("array_sort(collect_list(e))").as("grid")) // 1 row, dim-sorted
      Tables.embeddings(spark, sfDir)
        .crossJoin(broadcast(grid))
        .select(col("vec_id"), col("label"), expr(
          s"""zip_with(embedding, grid, (xf, g) ->
                CASE WHEN g.scale > 0.0e0
                     THEN least($QuantLevels,
                            CAST(floor((CAST(xf AS DOUBLE) - g.min_v) / g.scale + 0.5e0)
                                 AS BIGINT))
                     ELSE CAST(0 AS BIGINT) END)""").as("qvec"))
    }

  def covarianceQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Similarity.Dim
    val qvecs = quantizedCodes(spark, sfDir)
    val gramian = udaf(new graft.functions.GramianAgg(d))
    // 1 row: (n, s, g) — materialized so the var/cov consumers below read
    // the finished statistics instead of re-running the corpus aggregation
    val gr = graft.Scratch.materialize(
      qvecs.agg(gramian(col("qvec")).as("r")), "graft_gram")
    // triangle index (i ≤ j, 0-based) → (i, j); idx = j(j+1)/2 + i.
    // n > 0 drops the degenerate zero-buffer row a global aggregate emits
    // on an EMPTY corpus — the oracle's grouped form emits nothing there,
    // and under ANSI the n=0 divisions would throw rather than NaN
    val cells = gr.filter(col("r.n") > 0)
      .select(col("r.n").as("n"), col("r.s").as("s"),
        posexplode(col("r.g")).as(Seq("idx", "sxy")))
    val pairs = cells.sparkSession.range(0, d).select(col("id").cast("int").as("j"))
      .select(col("j"), explode(expr("sequence(0, j)")).as("i"))
      .select(col("i"), col("j"), expr("(j * (j + 1)) div 2 + i").as("idx"))
    val withDims = cells.join(broadcast(pairs), "idx")
      .select(col("n"), col("i"), col("j"), col("sxy"),
        expr("element_at(s, i + 1)").as("si"),
        expr("element_at(s, j + 1)").as("sj"))
    // cov/var as a fixed IEEE tree over exact integers — identical in DuckDB
    val moments = withDims.select(col("n"), col("i"), col("j"),
      (col("sxy").cast("double") / col("n") -
        (col("si").cast("double") / col("n")) * (col("sj").cast("double") / col("n")))
        .as("m"))
    val vars = moments.filter(col("i") === col("j"))
      .select(col("i").as("vd"), col("m").as("v"))
    moments.filter(col("i") < col("j"))
      .join(broadcast(vars).withColumnRenamed("vd", "i").withColumnRenamed("v", "var_i"), "i")
      .join(broadcast(vars).withColumnRenamed("vd", "j").withColumnRenamed("v", "var_j"), "j")
      .filter(col("var_i") > 0.0 && col("var_j") > 0.0)
      .select((col("i") + 1).cast("int").as("dim_i"), (col("j") + 1).cast("int").as("dim_j"),
        col("m").as("cov_q"),
        (col("m") / (sqrt(col("var_i")) * sqrt(col("var_j")))).as("corr_q"))
      .orderBy(abs(col("cov_q")).desc, col("dim_i"), col("dim_j"))
      .limit(CovTopK)
  }

  private val covarianceQSql =
    s"""WITH ex AS (
          SELECT e.vec_id, g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
          FROM embeddings e
          CROSS JOIN (SELECT unnest(range(1, ${Similarity.Dim + 1})) AS i) g
        ), rng AS (
          SELECT dim, MIN(x) AS min_v, MAX(x) AS max_v,
                 (MAX(x) - MIN(x)) / 255.0e0 AS scale
          FROM ex GROUP BY 1
        ), q AS (
          SELECT vec_id, ex.dim,
                 CASE WHEN scale > 0.0e0
                      THEN least($QuantLevels,
                             CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END AS q
          FROM ex JOIN rng USING (dim)
        ), nn AS (SELECT COUNT(DISTINCT vec_id) AS n FROM q),
        sums AS (
          SELECT dim, CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q * q) AS BIGINT) AS sxx
          FROM q GROUP BY 1
        ), vars AS (
          SELECT dim,
                 CAST(sxx AS DOUBLE) / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS v
          FROM sums, nn
        ), x AS (
          SELECT a.dim AS di, b.dim AS dj, CAST(SUM(a.q * b.q) AS BIGINT) AS sxy
          FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim < b.dim
          GROUP BY 1, 2
        ), c AS (
          SELECT di, dj,
                 CAST(sxy AS DOUBLE) / n
                   - (CAST(sa.s AS DOUBLE) / n) * (CAST(sb.s AS DOUBLE) / n) AS cov,
                 va.v AS var_i, vb.v AS var_j
          FROM x
          JOIN sums sa ON sa.dim = di
          JOIN sums sb ON sb.dim = dj
          JOIN vars va ON va.dim = di
          JOIN vars vb ON vb.dim = dj
          CROSS JOIN nn
        )
        SELECT CAST(di AS INT) AS dim_i, CAST(dj AS INT) AS dim_j, cov AS cov_q,
               cov / (sqrt(var_i) * sqrt(var_j)) AS corr_q
        FROM c WHERE var_i > 0.0e0 AND var_j > 0.0e0
        ORDER BY abs(cov) DESC, di, dj LIMIT $CovTopK"""

  /** `emb_snapshot_drift`: embedding-space drift between corpus snapshots
    * (the `dedup_incremental` slice convention) — per label, the L2
    * distance between the old slice's and the new slice's quantized-code
    * centroid. The encoder/crawl drift alarm for the VECTOR side of the
    * corpus, complementing `corpus_snapshot_drift`'s text-side χ²: a new
    * crawl whose per-label centroids moved means the retrieval index and
    * any centroid-trained quantizer need a rebuild.
    *
    * Same exactness architecture as `emb_label_centroids`: shared per-dim
    * quantization range (over the FULL corpus, so both snapshots share the
    * code space), exact integer (n, Σq) sufficient statistics per
    * (label, snapshot, dim), ONE division to the centroid, squared diffs
    * folded by `sorted_sum`, one final sqrt. Only labels present in BOTH
    * snapshots emit (a label absent from one has no drift to measure).
    */
  def embSnapshotDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = Tables.embeddings(spark, sfDir)
      .select(col("label"),
        when(col("vec_id") % 10 === 0, "new").otherwise("old").as("snap"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("label"), col("snap"),
        (col("pos") + 1).cast("int").as("dim"), col("xf").cast("double").as("x"))
    val rng = ex.groupBy("dim")
      .agg(min("x").as("min_v"), max("x").as("max_v"))
      .withColumn("scale", (col("max_v") - col("min_v")) / lit(QuantLevels.toDouble))
    val cent = graft.Scratch.materialize(
      ex.join(broadcast(rng), "dim")
        .select(col("label"), col("snap"), col("dim"), expr(
          s"""CASE WHEN scale > 0.0e0
                   THEN least($QuantLevels,
                          CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                   ELSE 0 END""").as("q"))
        .groupBy("label", "snap", "dim")
        .agg(count(lit(1)).as("n"), sum("q").as("s"))
        .withColumn("c", col("s").cast("double") / col("n")),
      "graft_snap_centroids")
    cent.filter(col("snap") === "old")
      .select(col("label"), col("dim"), col("n").as("n_old"), col("c").as("ca"))
      .join(cent.filter(col("snap") === "new")
        .select(col("label"), col("dim"), col("n").as("n_new"), col("c").as("cb")),
        Seq("label", "dim"))
      .select(col("label"), col("n_old"), col("n_new"),
        expr("(ca - cb) * (ca - cb)").as("term"))
      .groupBy("label", "n_old", "n_new")
      .agg(expr("sorted_sum(term)").as("dist_sq"))
      .withColumn("drift", sqrt(col("dist_sq")))
      .select("label", "n_old", "n_new", "drift")
      .orderBy("label")
  }

  private val embSnapshotDriftSql =
    s"""WITH ex AS (
          SELECT e.label,
                 CASE WHEN e.vec_id % 10 = 0 THEN 'new' ELSE 'old' END AS snap,
                 g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
          FROM embeddings e
          CROSS JOIN (SELECT unnest(range(1, ${Similarity.Dim + 1})) AS i) g
        ), rng AS (
          SELECT dim, MIN(x) AS min_v,
                 (MAX(x) - MIN(x)) / ${QuantLevels.toDouble} AS scale
          FROM ex GROUP BY 1
        ), q AS (
          SELECT label, snap, ex.dim,
                 CASE WHEN scale > 0.0e0
                      THEN least($QuantLevels,
                             CAST(floor((x - min_v) / scale + 0.5e0) AS BIGINT))
                      ELSE 0 END AS q
          FROM ex JOIN rng USING (dim)
        ), cent AS (
          SELECT label, snap, dim, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS DOUBLE) / COUNT(*) AS c
          FROM q GROUP BY 1, 2, 3
        ), terms AS (
          SELECT a.label, a.n AS n_old, b.n AS n_new,
                 (a.c - b.c) * (a.c - b.c) AS term
          FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
          WHERE a.snap = 'old' AND b.snap = 'new'
        )
        SELECT label, n_old, n_new,
               sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(term))),
                 (acc, t) -> acc + t)) AS drift
        FROM terms GROUP BY label, n_old, n_new ORDER BY label"""

  // ---- nprobe tuning sweep ----

  /** Probe counts swept by `similarity_ivf_sweep`. */
  val SweepProbes: Seq[Int] = Seq(1, 2, 4, 8, 16)

  /** (qid, bucket) probe cells at an explicit probe count. */
  private def probeCells(corpus: DataFrame, p: Int): DataFrame =
    corpus.filter(col("vec_id") < NumQueries)
      .withColumn("scores", expr(Similarity.ivfScores("v")))
      .withColumn("kth", expr(s"element_at(array_sort(scores), $p)"))
      .select(col("vec_id").as("qid"),
        explode(expr(s"""filter(sequence(0, ${Similarity.NumCentroids - 1}),
                         c -> element_at(scores, c + 1) <= kth)""")).as("bucket"))

  /** `similarity_ivf_sweep`: the nprobe TUNING CURVE — for each probe count
    * in [[SweepProbes]], the candidate volume and recall@[[K]] against the
    * memoized brute-force truth. This is the measurement loop an ANN
    * deployment actually runs when sizing nprobe: recall rises with probe
    * coverage, candidates (≈ cost) rise linearly — the elbow is the
    * operating point. One corpus assignment pass (the shared `simivf`
    * memo) feeds every sweep point; per point the work is one bucket
    * equi-join + candidate scoring, exactly the production probe path.
    */
  def ivfSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = ivfCorpus(spark, sfDir)
    val brute = bruteRanked(spark, sfDir).select("qid", "neighbor_id")
    val q = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val rows = SweepProbes.map { p =>
      val cand = probeCells(corpus, p)
        .join(corpus.select("vec_id", "bucket"), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
      val scored = cand
        .join(corpus.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
        .join(broadcast(q), "qid")
        .withColumn("cosine", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
      val top = ranked(scored).select("qid", "neighbor_id").withColumn("hit", lit(1L))
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      brute.join(top, Seq("qid", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .crossJoin(broadcast(nCand)) // 1-row side
        .select(lit(p).as("nprobe"), col("n_candidates"), col("n_true"),
          col("n_hit"),
          (col("n_hit").cast("double") / col("n_true")).as("recall_at_k"))
    }
    rows.reduce(_ unionAll _).orderBy("nprobe")
  }

  private def ivfSweepSql: String = {
    val perP = SweepProbes.map { p =>
      s"""cand$p AS (
            SELECT DISTINCT qp.qid, a.vec_id FROM (
              SELECT qid, unnest(list_filter(range(0, ${Similarity.NumCentroids}),
                       c -> scores[c + 1] <= list_sort(scores)[$p])) AS bucket
              FROM q) qp
            JOIN a ON qp.bucket = a.bucket
            WHERE a.vec_id <> qp.qid
          ), top$p AS (
            SELECT qid, vec_id AS neighbor_id FROM (
              SELECT c.qid, c.vec_id,
                     row_number() OVER (PARTITION BY c.qid ORDER BY
                       ${Similarity.dotDuck("q.qv", "a2.v")} / (q.qn * a2.nrm) DESC,
                       c.vec_id) AS rnk
              FROM cand$p c JOIN a a2 ON c.vec_id = a2.vec_id JOIN q ON c.qid = q.qid) r
            WHERE rnk <= $K
          ), row$p AS (
            SELECT $p AS nprobe,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cand$p) AS n_candidates,
                   CAST(COUNT(*) AS BIGINT) AS n_true,
                   CAST(SUM(CASE WHEN t.qid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hit,
                   CAST(SUM(CASE WHEN t.qid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*) AS recall_at_k
            FROM brute b
            LEFT JOIN top$p t ON b.qid = t.qid AND b.neighbor_id = t.neighbor_id
          )"""
    }
    val sel = SweepProbes.map(p => s"SELECT * FROM row$p").mkString(" UNION ALL ")
    s"""WITH e AS ($ivfBaseDuck),
           a AS (
             SELECT vec_id, v, nrm,
                    CAST(list_position(scores, list_min(scores)) - 1 AS INT) AS bucket
             FROM e
           ),
           q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, scores FROM e
                 WHERE vec_id < $NumQueries),
           brute AS (SELECT qid, neighbor_id FROM ($bruteSql)),
           ${perP.mkString(",\n ")}
        $sel ORDER BY nprobe"""
  }

  // ---- incremental ANN: probing a persisted bucketed cell index ----

  /** Persisted IVF cell index, BUCKETED AND SORTED by `bucket` — the
    * offline index-build lifecycle the band index and PageRank edges share
    * ([[graft.Scratch.memoizeBucketed]]): build once, then every probe join
    * reads co-located buckets with ZERO exchange on the index side.
    * `corpusOnly` selects the `vec_id % 10 != 0` slice (the
    * `dedup_incremental` fixture convention: 90 % "already-indexed corpus"
    * vs 10 % "arriving batch"); `false` indexes everything (the streaming
    * ingest front door, where arrivals are genuinely new vectors).
    */
  private[graft] def ivfIndex(spark: SparkSession, sfDir: String,
                              corpusOnly: Boolean): DataFrame =
    Scratch.memoizeBucketed(spark,
        s"$sfDir#simivfidx#${Similarity.NumCentroids}#$corpusOnly",
        "graft_ivf_idx", Seq("bucket")) {
      val base = vectors(spark, sfDir)
      val sliced = if (corpusOnly) base.filter(col("vec_id") % 10 =!= 0) else base
      sliced
        .withColumn("scores", expr(Similarity.ivfScores("v")))
        .withColumn("bucket",
          expr("CAST(array_position(scores, array_min(scores)) - 1 AS INT)"))
        .drop("scores")
    }

  /** Top-[[K]] IVF neighbors in `index` for each vector of `batch`
    * (`vec_id`, `embedding`) — the probe core shared by the
    * `similarity_probe_incremental` oracle row and the streaming ANN
    * ingest ([[graft.streaming.AnnIngest]]). Probe math is identical to
    * [[ivfTopK]]'s query side: [[Similarity.NProbe]] nearest cells, bucket
    * equi-join against the index (only the batch side shuffles into the
    * bucket layout), exact cosine on the candidates, per-qid rank.
    */
  def probeAgainst(index: DataFrame, batch: DataFrame): DataFrame = {
    val p = batch
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", expr("sqrt(vec_dot(qv, qv))"))
      .withColumn("scores", expr(Similarity.ivfScores("qv")))
      .withColumn("kth",
        expr(s"element_at(array_sort(scores), ${Similarity.NProbe})"))
      .select(col("qid"), col("qv"), col("qn"),
        explode(expr(s"""filter(sequence(0, ${Similarity.NumCentroids - 1}),
                         c -> element_at(scores, c + 1) <= kth)""")).as("bucket"))
    p.join(index, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id")))
        .cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("qid", "rnk")
  }

  /** `similarity_probe_incremental`: ANN search for NEW vectors against an
    * already-indexed corpus WITHOUT re-shuffling the corpus — the ANN twin
    * of `dedup_incremental`, and the batch core of the streaming ANN
    * ingest. At 100 TB the index build amortizes across every future
    * batch; per-batch probe cost ∝ batch × candidates, and the index side
    * of the join is exchange-free (pinned in PlanAssertionsSpec).
    */
  def probeIncremental(spark: SparkSession, sfDir: String): DataFrame =
    probeAgainst(
      ivfIndex(spark, sfDir, corpusOnly = true),
      Tables.embeddings(spark, sfDir).filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("embedding")))

  private val probeIncrementalSql =
    s"""WITH e AS ($ivfBaseDuck),
             idx AS (
               SELECT vec_id, v, nrm,
                      CAST(list_position(scores, list_min(scores)) - 1 AS INT) AS bucket
               FROM e WHERE vec_id % 10 <> 0
             ), qp AS (
               SELECT vec_id AS qid, v AS qv, nrm AS qn,
                      unnest(list_filter(range(0, ${Similarity.NumCentroids}),
                        c -> scores[c + 1] <= list_sort(scores)[${Similarity.NProbe}]))
                        AS bucket
               FROM e WHERE vec_id % 10 = 0
             ), scored AS (
               SELECT q.qid, i.vec_id,
                      ${Similarity.dotDuck("q.qv", "i.v")} / (q.qn * i.nrm) AS cosine
               FROM qp q JOIN idx i ON q.bucket = i.bucket AND i.vec_id <> q.qid
             ), r AS (
               SELECT qid, vec_id, cosine,
                      CAST(row_number() OVER (PARTITION BY qid
                             ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
               FROM scored
             )
        SELECT qid, rnk, vec_id AS neighbor_id, cosine
        FROM r WHERE rnk <= $K ORDER BY qid, rnk"""

  /** `emb_knn_label_agreement`: label-noise audit — for every vector, how
    * many of its top-[[K]] nearest neighbors (under the IVF probe path —
    * the SCALE shape, not an all-pairs leg: candidates per vector are
    * NProbe/NumCentroids of the corpus, constant-per-vector once cell
    * count tracks corpus size) carry the SAME label. Per label: vectors,
    * scored neighbor pairs, agreeing pairs, and the agreement ratio — a
    * label whose agreement sits far below the others is mislabeled or
    * incoherent (the classic kNN label-consistency detector used for
    * dataset debugging). Exact integer counts; ONE double division.
    *
    * `n_vecs` counts the FULL label roster from `embeddings` (left-joined
    * against the pair stats), so a vector that found zero candidates —
    * alone in its probed cells — still appears in its label's denominator
    * instead of silently vanishing; `agreement` is null for a label with
    * zero scored pairs.
    */
  def knnLabelAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.embeddings(spark, sfDir).select("vec_id", "label")
    val topk = probeAgainst(
      ivfIndex(spark, sfDir, corpusOnly = false),
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))
    val roster = labels.groupBy("label").agg(count(lit(1)).as("n_vecs"))
    val pairStats = topk
      .join(labels.select(col("vec_id").as("qid"), col("label")), "qid")
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nbr_label")), "neighbor_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("label") === col("nbr_label"), 1L).otherwise(0L)).as("n_agree"))
    roster.join(pairStats, Seq("label"), "left")
      .select(col("label"), col("n_vecs"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_agree"), lit(0L)).as("n_agree"))
      .withColumn("agreement", expr(
        "CASE WHEN n_pairs = 0 THEN NULL ELSE CAST(n_agree AS DOUBLE) / n_pairs END"))
      .orderBy("label")
  }

  private val knnLabelAgreementSql =
    s"""WITH e AS ($ivfBaseDuck),
             idx AS (
               SELECT vec_id, v, nrm,
                      CAST(list_position(scores, list_min(scores)) - 1 AS INT) AS bucket
               FROM e
             ), qp AS (
               SELECT vec_id AS qid,
                      unnest(list_filter(range(0, ${Similarity.NumCentroids}),
                        c -> scores[c + 1] <= list_sort(scores)[${Similarity.NProbe}]))
                        AS bucket
               FROM e
             ), scored AS (
               SELECT q.qid, i.vec_id,
                      ${Similarity.dotDuck("q2.v", "i.v")} / (q2.nrm * i.nrm) AS cosine
               FROM qp q
               JOIN idx i ON q.bucket = i.bucket AND i.vec_id <> q.qid
               JOIN e q2 ON q2.vec_id = q.qid
             ), topk AS (
               SELECT qid, vec_id FROM (
                 SELECT qid, vec_id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY cosine DESC, vec_id) AS rnk
                 FROM scored) r
               WHERE rnk <= $K
             )
        , pair_stats AS (
          SELECT la.label,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_agree
          FROM topk t
          JOIN embeddings la ON la.vec_id = t.qid
          JOIN embeddings lb ON lb.vec_id = t.vec_id
          GROUP BY la.label
        ), roster AS (
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
          FROM embeddings GROUP BY label
        )
        SELECT r.label, r.n_vecs,
               coalesce(p.n_pairs, 0) AS n_pairs,
               coalesce(p.n_agree, 0) AS n_agree,
               CASE WHEN coalesce(p.n_pairs, 0) = 0 THEN NULL
                    ELSE CAST(p.n_agree AS DOUBLE) / p.n_pairs END AS agreement
        FROM roster r LEFT JOIN pair_stats p ON r.label = p.label
        ORDER BY r.label"""

  /** Per-cell sample quota for [[clusterSample]]. */
  val ClusterSampleQuota = 8

  /** `emb_cluster_sample`: cluster-balanced diversity sampling — the
    * SemDeDup-family move a curated pre-training subset uses so one dense
    * region of embedding space cannot dominate the draw: assign the
    * corpus to the Lloyd-TRAINED cells (the memoized [[trainedIvfCorpus]]
    * artifact, shared with the trained-IVF search), then take exactly
    * [[ClusterSampleQuota]] vectors per cell in md5 order (the
    * `docs_stratified_sample` pure-row-function draw, so the oracle
    * enumerates the same sample). The quota filter runs as the two-phase
    * WindowGroupLimit — per-task heaps before the one cell exchange —
    * so at 100 TB only ~quota rows per cell per task cross the wire,
    * never the corpus.
    */
  def clusterSample(spark: SparkSession, sfDir: String): DataFrame =
    trainedIvfCorpus(spark, sfDir)
      .select(col("vec_id"), col("bucket"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("bucket").orderBy(
          md5(concat(lit("cs:"), col("vec_id").cast("string"))), col("vec_id")))
        .cast("long"))
      .filter(col("rn") <= ClusterSampleQuota)
      .select(col("bucket"), col("rn"), col("vec_id"))
      .orderBy("bucket", "rn")

  private def clusterSampleSql: String =
    s"""WITH $trainedChainDuck
        SELECT cid AS bucket, rn, vec_id FROM (
          SELECT af.cid, af.vec_id,
                 row_number() OVER (PARTITION BY af.cid ORDER BY
                   md5('cs:' || CAST(af.vec_id AS VARCHAR)), af.vec_id) AS rn
          FROM af)
        WHERE rn <= $ClusterSampleQuota
        ORDER BY bucket, rn"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_cluster_sample" -> (clusterSample _),
    "similarity_probe_incremental" -> (probeIncremental _),
    "emb_knn_label_agreement" -> (knnLabelAgreement _),
    "emb_snapshot_drift" -> (embSnapshotDrift _),
    "similarity_ivf_sweep" -> (ivfSweep _),
    "similarity_topk_brute" -> (bruteTopK _),
    "similarity_topk_lsh" -> ((s, d) => lshTopK(s, d)),
    "similarity_lsh_recall" -> (lshRecall _),
    "similarity_topk_ivf" -> (ivfTopK _),
    "similarity_topk_ivf_trained" -> (trainedTopK _),
    "similarity_ivf_recall" -> (ivfRecall _),
    "emb_quantization_report" -> (quantizationReport _),
    "emb_covariance_q" -> (covarianceQ _),
    "emb_quantization_clipped" -> (quantizationClipped _),
    "emb_label_centroids" -> (labelCentroids _),
    "emb_topk_quantized" -> (quantizedTopK _),
    "emb_quantized_recall" -> (quantizedRecall _),
  )

  override def oracle: Map[String, String] = Map(
    "emb_cluster_sample" -> clusterSampleSql,
    "similarity_probe_incremental" -> probeIncrementalSql,
    "emb_knn_label_agreement" -> knnLabelAgreementSql,
    "emb_snapshot_drift" -> embSnapshotDriftSql,
    "similarity_ivf_sweep" -> ivfSweepSql,
    "similarity_topk_brute" -> bruteSql,
    "similarity_topk_lsh" -> lshSql,
    "similarity_lsh_recall" -> lshRecallSql,
    "similarity_topk_ivf" -> ivfSql,
    "similarity_topk_ivf_trained" -> trainedSql,
    "similarity_ivf_recall" -> ivfRecallSql,
    "emb_quantization_report" -> quantizationReportSql,
    "emb_covariance_q" -> covarianceQSql,
    "emb_quantization_clipped" -> quantizationClippedSql,
    "emb_label_centroids" -> labelCentroidsSql,
    "emb_topk_quantized" -> quantizedTopKSql,
    "emb_quantized_recall" -> quantizedRecallSql,
  )
}
