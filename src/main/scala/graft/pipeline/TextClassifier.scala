package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Scratch, Tables}

/** Distributed supervised training of a nearest-centroid (Rocchio) text
  * classifier over hashed bag-of-token features — the labeled-model leg
  * of the quality-screen family: a corpus release trains exactly this
  * kind of cheap linear model on a labeled slice (the wiki-vs-crawl
  * quality classifier in the fastText / GPT-3 pipelines) and scores
  * every document with it. Rocchio / nearest-centroid is the IR-textbook
  * baseline (Manning, Raghavan, Schütze, "Introduction to Information
  * Retrieval" §14.2).
  *
  * Why nearest-centroid and not a gradient model: TRAINING IS ONE
  * AGGREGATION — per-class feature-count sums — the canonical map-reduce
  * model-fit shape (model ships to the data, only bucket-grain sums
  * cross the wire), and the whole artifact is exact BIGINTs. (Batch
  * perceptron was tried first and measured OSCILLATING on this corpus —
  * unit-step full-batch updates overshoot between the class-majority
  * states, the textbook failure mode; iterative distributed training is
  * demonstrated by the PQ/IVF Lloyd rounds instead.) The decision
  * "closer to the positive centroid" is evaluated WITHOUT division:
  * ‖x−S⁺/n⁺‖² < ‖x−S⁻/n⁻‖² cross-multiplied by n⁺²·n⁻² —
  * `n⁻²(‖S⁺‖² − 2n⁺·x·S⁺) < n⁺²(‖S⁻‖² − 2n⁻·x·S⁻)` — all-integer, so
  * training, scoring, and the verdict are bit-stable across engines
  * with no doubles anywhere. The comparison terms grow ~quartically
  * with corpus size (≈1.8e16 at sf0.1 — only ~500× BIGINT headroom),
  * so the verdict comparison itself runs in DECIMAL(38,0) (DuckDB:
  * HUGEINT) — exact to ~1e38, safe past 100 TB; the shipped model,
  * dots, and counts stay BIGINT.
  *
  * Features: token counts hashed into [[Buckets]] buckets (md5 → 60-bit
  * int, MASKED — `& 63`, never `% 64`, per the signed-modulo hazard).
  * Fixture labels, parity-built in BOTH engines: y = +1 for even doc_id,
  * and positive documents get [[MarkerCopies]] planted copies of a
  * marker token (collision-free bucket, checked against the corpus
  * vocabulary) — the "contains the reference vocabulary" signal the
  * production classifier keys on, with enough margin to be learnable
  * (measured accuracy 1.0 at sf0.1; the first-cut label, a count
  * comparison of two natural tokens, capped at 0.65 because hashing
  * folds unrelated counts into the label buckets).
  *
  * Scale design (100 TB): the feature pass is one map-side-combinable
  * (doc_id, bucket) count; training is ONE bucket-grain aggregate (≤ 64
  * rows out); scoring joins the BROADCAST model back to the feature
  * table — no corpus-side exchange beyond the feature count itself.
  */
object TextClassifier extends QueryModule {

  /** Hashed feature buckets (power of two — the hash is masked). */
  val Buckets = 64

  /** Planted marker copies per positive document (the label margin). */
  val MarkerCopies = 3
  val Marker = "relevantmarker"

  /** (doc_id, y, bucket, cnt): hashed token-count features with the
    * parity-planted label — the testable core.
    */
  private[pipeline] def featuresOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(
        s"""concat(${Dedup.rawTokens},
             IF(doc_id % 2 = 0, array_repeat('$Marker', $MarkerCopies),
                CAST(array() AS ARRAY<STRING>)))""").as("t"),
        expr("IF(doc_id % 2 = 0, 1L, -1L)").as("y"))
      .select(col("doc_id"), col("y"), explode(col("t")).as("token"))
      .withColumn("bucket", expr(
        s"cast(conv(substring(md5(token), 1, 15), 16, 10) as bigint) & ${Buckets - 1}"))
      .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("cnt"))

  private def features(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#clsfeat#$Buckets#$MarkerCopies") {
      featuresOf(Tables.documents(spark, sfDir))
    }

  /** Per-class centroid SUMS per bucket, densified to all [[Buckets]]
    * rows — the model artifact; ONE bucket-grain aggregate. The testable
    * core (also audited by PlanAssertionsSpec).
    */
  private[graft] def trainOf(spark: SparkSession, feats: DataFrame): DataFrame =
    spark.range(0L, Buckets.toLong).select(col("id").as("bucket"))
      .join(
        feats.groupBy("bucket").agg(
          sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("s_pos"),
          sum(when(col("y") === -1, col("cnt")).otherwise(0L)).as("s_neg")),
        Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("s_pos"), lit(0L)).as("s_pos"),
        coalesce(col("s_neg"), lit(0L)).as("s_neg"))

  private[graft] def weightsCompute(spark: SparkSession, sfDir: String): DataFrame =
    trainOf(spark, features(spark, sfDir))

  private def model(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#clsmodel#$Buckets#$MarkerCopies") {
      weightsCompute(spark, sfDir)
    }

  /** `text_classifier_train`: the model relation. */
  def trainQuery(spark: SparkSession, sfDir: String): DataFrame =
    model(spark, sfDir).orderBy("bucket")

  /** Class sizes of a feature relation — with the model sums, the other
    * half of the shipped artifact (serving needs the TRAINING corpus's
    * n⁺/n⁻, not the scored batch's).
    */
  private[pipeline] def countsOf(feats: DataFrame): DataFrame =
    feats.select("doc_id", "y").distinct().agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("n_neg"))

  /** The scoring core over explicit feature / model / class-size frames. */
  private[pipeline] def scoreOf(feats: DataFrame, m: DataFrame,
                                counts: DataFrame): DataFrame = {
    val stats = m.agg(
      expr("sum(s_pos * s_pos)").as("norm2_pos"),
      expr("sum(s_neg * s_neg)").as("norm2_neg"))
    feats
      .join(broadcast(m), "bucket")
      .groupBy("doc_id", "y")
      .agg(sum(col("cnt") * col("s_pos")).as("dot_pos"),
        sum(col("cnt") * col("s_neg")).as("dot_neg"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(counts))
      .withColumn("predicted_pos", expr(
        // The cross-multiplied terms grow ~quartically with corpus size
        // (n² · dot); BIGINT would wrap silently past ~sf1. Evaluate the
        // comparison in DECIMAL(38,0) — exact to 1e38, ~20 orders past
        // the sf0.1 magnitudes (DuckDB twin uses HUGEINT, exact to
        // 1.7e38); dots/model stay BIGINT.
        """cast(n_neg as decimal(38,0)) * n_neg
             * (cast(norm2_pos as decimal(38,0)) - 2 * cast(n_pos as decimal(38,0)) * dot_pos)
           < cast(n_pos as decimal(38,0)) * n_pos
             * (cast(norm2_neg as decimal(38,0)) - 2 * cast(n_neg as decimal(38,0)) * dot_neg)"""))
      .select(col("doc_id"), col("y").as("y_true"),
        col("dot_pos"), col("dot_neg"), col("predicted_pos"),
        (col("predicted_pos") === (col("y") === 1)).as("correct"))
  }

  /** `text_classifier_score`: every document against the trained model —
    * exact integer dot products, the division-free nearest-centroid
    * verdict, correctness.
    */
  def scoreQuery(spark: SparkSession, sfDir: String): DataFrame =
    scoreOf(features(spark, sfDir), model(spark, sfDir),
      countsOf(features(spark, sfDir))).orderBy("doc_id")

  /** Score an arbitrary (doc_id, text) batch against the TRAINED
    * artifact (model sums + training-corpus class sizes) — the serving
    * form the streaming ingest runs per micro-batch
    * ([[graft.streaming.CorpusIngest.batchWriter]]).
    */
  def scoreBatch(spark: SparkSession, sfDir: String, batch: DataFrame): DataFrame =
    scoreOf(featuresOf(batch), model(spark, sfDir),
      countsOf(features(spark, sfDir)))

  // ---- DuckDB mirror ----

  private def featsDuck: String =
    s"""t AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS y,
                 ${Dedup.rawTokensDuck} ||
                   (CASE WHEN doc_id % 2 = 0
                         THEN ['$Marker', '$Marker', '$Marker']
                         ELSE CAST([] AS VARCHAR[]) END) AS t
          FROM documents
        ), feats AS (
          SELECT doc_id, y,
                 CAST('0x' || substring(md5(token), 1, 15) AS BIGINT) & ${Buckets - 1} AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT doc_id, y, unnest(t) AS token FROM t)
          GROUP BY 1, 2, 3
        ), m AS (
          SELECT g.bucket,
                 CAST(COALESCE(f.s_pos, 0) AS BIGINT) AS s_pos,
                 CAST(COALESCE(f.s_neg, 0) AS BIGINT) AS s_neg
          FROM (SELECT unnest(range(0, $Buckets)) AS bucket) g
          LEFT JOIN (SELECT bucket,
                            SUM(CASE WHEN y = 1 THEN cnt ELSE 0 END) AS s_pos,
                            SUM(CASE WHEN y = -1 THEN cnt ELSE 0 END) AS s_neg
                     FROM feats GROUP BY bucket) f USING (bucket)
        )"""

  private def trainSql: String =
    s"""WITH $featsDuck
        SELECT bucket, s_pos, s_neg FROM m ORDER BY bucket"""

  private def scoreSql: String =
    s"""WITH $featsDuck, stats AS (
          SELECT CAST(SUM(s_pos * s_pos) AS BIGINT) AS norm2_pos,
                 CAST(SUM(s_neg * s_neg) AS BIGINT) AS norm2_neg
          FROM m
        ), counts AS (
          SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                 CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
          FROM t
        ), dots AS (
          SELECT f.doc_id, f.y,
                 CAST(SUM(f.cnt * m.s_pos) AS BIGINT) AS dot_pos,
                 CAST(SUM(f.cnt * m.s_neg) AS BIGINT) AS dot_neg
          FROM feats f JOIN m USING (bucket)
          GROUP BY f.doc_id, f.y
        )
        SELECT doc_id, CAST(y AS BIGINT) AS y_true, dot_pos, dot_neg,
               (CAST(n_neg AS HUGEINT) * n_neg * (CAST(norm2_pos AS HUGEINT) - 2 * CAST(n_pos AS HUGEINT) * dot_pos)
                < CAST(n_pos AS HUGEINT) * n_pos * (CAST(norm2_neg AS HUGEINT) - 2 * CAST(n_neg AS HUGEINT) * dot_neg)) AS predicted_pos,
               ((CAST(n_neg AS HUGEINT) * n_neg * (CAST(norm2_pos AS HUGEINT) - 2 * CAST(n_pos AS HUGEINT) * dot_pos)
                 < CAST(n_pos AS HUGEINT) * n_pos * (CAST(norm2_neg AS HUGEINT) - 2 * CAST(n_neg AS HUGEINT) * dot_neg)) = (y = 1)) AS correct
        FROM dots CROSS JOIN stats CROSS JOIN counts
        ORDER BY doc_id"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_classifier_train" -> (trainQuery _),
    "text_classifier_score" -> (scoreQuery _),
  )

  override def oracle: Map[String, String] = Map(
    "text_classifier_train" -> trainSql,
    "text_classifier_score" -> scoreSql,
  )
}
