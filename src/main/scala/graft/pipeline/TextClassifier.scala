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
  * HUGEINT); the shipped model, dots, and counts stay BIGINT. The
  * honest bound: exact while every cross-multiplied term stays under
  * ~1e38, i.e. roughly 1e4–1e5× the sf0.1 corpus under the measured
  * quartic growth — ample for this engine's tested scales, but NOT
  * unconditional: past it Spark's non-ANSI DECIMAL overflow yields
  * NULL (the CASE falls through to the next arm — a silent
  * misprediction) while DuckDB's HUGEINT throws, so the failure modes
  * DIVERGE rather than reject together. A corpus within sight of that
  * bound should shard training per class before trusting the verdict.
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
    // per-doc bucket histogram via the codegen'd md5_bucket_counts kernel
    // (r18, guide §2.4: the explode → per-token md5 → corpus-wide
    // groupBy(doc, y, bucket) shape paid one interpreted-md5 evaluation
    // AND one shuffled aggregation row per token; buckets are per-doc
    // local, so the kernel emits the same (bucket, cnt) rows map-only —
    // Hash60KernelSpec pins relation equality)
    docs
      .select(col("doc_id"), expr(
        s"""concat(${Dedup.rawTokens},
             IF(doc_id % 2 = 0, array_repeat('$Marker', $MarkerCopies),
                CAST(array() AS ARRAY<STRING>)))""").as("t"),
        expr("IF(doc_id % 2 = 0, 1L, -1L)").as("y"))
      .select(col("doc_id"), col("y"),
        explode(expr(s"md5_bucket_counts(t, $Buckets)")).as("bc"))
      .select(col("doc_id"), col("y"),
        col("bc.bucket").as("bucket"), col("bc.cnt").as("cnt"))

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

  // ---- multi-class twin: learned lang-id over hashed char n-grams ----

  /** Char-n-gram buckets for the multi-class model (masked, power of 2). */
  val NgramBuckets = 256

  /** The class universe (sorted — CASE-arm order is the argmin tie-break,
    * mirrored exactly in the oracle).
    */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Planted per-class marker copies (the learnable margin — the corpus
    * text is synthetic English-ish regardless of the lang label, so like
    * the binary classifier's parity labels the class signal is planted:
    * ` xq<lang>z` ×3 appended before gramming; `xq…z` trigrams cannot
    * occur in the `[a-z ]` corpus).
    */
  val LangMarkerCopies = 3

  /** fastText-shape features (Joulin et al. 2016: hashed character
    * n-grams): char 3-grams of the lowercased text + planted marker,
    * hashed into [[NgramBuckets]] masked buckets. Guarded for sub-3-char
    * inputs (Spark's descending `sequence(1, 0)` hazard).
    */
  private[graft] def ngramFeaturesOf(docs: DataFrame): DataFrame =
    // per-doc trigram bucket histogram via the codegen'd
    // trigram_bucket_counts kernel (r18, guide §2.4/§4: the previous
    // shape split the string to a char array, built each gram through an
    // interpreted lambda, md5'd per gram, and shuffled one aggregation
    // row PER GRAM through a corpus-wide groupBy — ~L interpreted evals
    // and ~L shuffled rows per document; buckets are per-doc local, so
    // the kernel emits the same (bucket, cnt) rows map-only with a
    // thread-cached digest — Hash60KernelSpec pins relation equality,
    // including the code-point gram semantics and the size<3 guard)
    docs
      .select(col("doc_id"), col("lang"), explode(expr(
        s"""trigram_bucket_counts(
              concat(lower(text), repeat(concat(' xq', lang, 'z'), $LangMarkerCopies)),
              $NgramBuckets)""")).as("bc"))
      .select(col("doc_id"), col("lang"),
        col("bc.bucket").as("bucket"), col("bc.cnt").as("cnt"))

  private def ngramFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#clsngram#$NgramBuckets#$LangMarkerCopies") {
      ngramFeaturesOf(Tables.documents(spark, sfDir))
    }

  /** Per-class centroid SUMS per bucket plus the class size — ONE
    * (lang, bucket)-grain aggregate, densified to |Langs|·[[NgramBuckets]]
    * rows; the whole multi-class model artifact.
    */
  private[graft] def multiTrainOf(spark: SparkSession, feats: DataFrame): DataFrame = {
    val langDim = spark.createDataFrame(Langs.map(Tuple1(_))).toDF("lang")
    val grid = langDim.crossJoin(
      spark.range(0L, NgramBuckets.toLong).select(col("id").as("bucket")))
    val sums = feats.groupBy("lang", "bucket").agg(sum(col("cnt")).as("s0"))
    val counts = feats.select("doc_id", "lang").distinct()
      .groupBy("lang").agg(count(lit(1)).as("n0"))
    grid.join(sums, Seq("lang", "bucket"), "left")
      .join(counts, Seq("lang"), "left")
      .select(col("lang"), col("bucket"),
        coalesce(col("s0"), lit(0L)).as("s"),
        coalesce(col("n0"), lit(0L)).as("n"))
  }

  private def multiModel(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#clsmodel_multi#$NgramBuckets#$LangMarkerCopies") {
      multiTrainOf(spark, ngramFeatures(spark, sfDir))
    }

  /** `text_classifier_multi`: the multi-class model relation. */
  def multiTrainQuery(spark: SparkSession, sfDir: String): DataFrame =
    multiModel(spark, sfDir).orderBy("lang", "bucket")

  /** `text_langid_learned`: every document scored against the multi-class
    * nearest-centroid model — the LEARNED language identifier next to the
    * X11 marker-word heuristic. Per-class squared distance compared
    * division-free and pairwise: class c beats o iff
    * `a_c·n_o² ≤ a_o·n_c²` with `a_c = n_c·(‖S_c‖² − 2·n_c·x·S_c)`…
    * rearranged to avoid any division — evaluated in DECIMAL(38,0)
    * (DuckDB: HUGEINT; the binary classifier's headroom discipline), so
    * verdicts are bit-stable. Tie-break = class order (first minimal arm
    * wins), mirroring the heuristic's CASE-arm discipline.
    */
  def multiScoreQuery(spark: SparkSession, sfDir: String): DataFrame =
    multiScoreOf(ngramFeatures(spark, sfDir), multiModel(spark, sfDir))
      .orderBy("doc_id")

  /** The multi-class scoring core over explicit feature/model frames —
    * the testable form.
    */
  private[pipeline] def multiScoreOf(feats: DataFrame, m: DataFrame): DataFrame = {
    // per-class constants: ||S_c||^2 and n_c, pivoted to one 1-row frame
    val statAggs =
      Langs.map(l => sum(when(col("lang") === l, col("s") * col("s")).otherwise(0L))
        .as(s"norm2_$l")) ++
        Langs.map(l => max(when(col("lang") === l, col("n"))).as(s"n_$l"))
    val stats = m.groupBy().agg(statAggs.head, statAggs.tail: _*)
    // per-doc per-class dots in one aggregate over the bucket join
    val byLang = Langs.map { l =>
      sum(when(col("lang_m") === l, col("cnt") * col("s")).otherwise(0L)).as(s"dot_$l")
    }
    val dots = feats
      .join(broadcast(m.withColumnRenamed("lang", "lang_m")), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(byLang.head, byLang.tail: _*)
    // a_c = norm2_c - 2 n_c dot_c (exact BIGINT-scale, lifted to DECIMAL);
    // c beats o iff a_c * n_o^2 <= a_o * n_c^2 (first minimal arm wins)
    def a(l: String) =
      s"(cast(norm2_$l as decimal(38,0)) - 2 * cast(n_$l as decimal(38,0)) * dot_$l)"
    // an empty class (n_c = 0) must be ineligible: its a_c is 0 and the
    // cross-multiplied comparison degenerates to 0 <= 0 against everyone,
    // so without the guard the FIRST empty class would always win
    val pred = Langs.foldRight("CAST(NULL AS STRING)") { (c, rest) =>
      val beatsAll = Langs.filter(_ != c)
        .map(o => s"(n_$o = 0 OR ${a(c)} * n_$o * n_$o <= ${a(o)} * n_$c * n_$c)")
        .mkString(" AND ")
      s"CASE WHEN n_$c > 0 AND $beatsAll THEN '$c' ELSE $rest END"
    }
    dots.crossJoin(broadcast(stats))
      .withColumn("lang_pred", expr(pred))
      .select(col("doc_id"), col("lang"),
        col("lang_pred"), (col("lang_pred") === col("lang")).as("correct"))
  }

  // ---- DuckDB mirror ----

  private def multiFeatsDuck: String =
    s"""mf AS (
          SELECT doc_id, lang,
                 CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) & ${NgramBuckets - 1}
                   AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (
            SELECT doc_id, lang, unnest(list_transform(
                     range(1, greatest(length(s) - 1, 1)),
                     i -> substring(s, i, 3))) AS g
            FROM (SELECT doc_id, lang,
                         lower(text) || repeat(' xq' || lang || 'z', $LangMarkerCopies) AS s
                  FROM documents)
          )
          GROUP BY 1, 2, 3
        ), mm AS (
          SELECT g.lang, g.bucket,
                 CAST(COALESCE(f.s, 0) AS BIGINT) AS s,
                 CAST(COALESCE(c.n, 0) AS BIGINT) AS n
          FROM (SELECT l.lang, b.bucket
                FROM (SELECT unnest(${Langs.map(l => s"'$l'").mkString("[", ", ", "]")}) AS lang) l,
                     (SELECT unnest(range(0, $NgramBuckets)) AS bucket) b) g
          LEFT JOIN (SELECT lang, bucket, SUM(cnt) AS s FROM mf GROUP BY 1, 2) f
            USING (lang, bucket)
          LEFT JOIN (SELECT lang, COUNT(DISTINCT doc_id) AS n FROM mf GROUP BY 1) c
            USING (lang)
        )"""

  private def multiTrainSql: String =
    s"""WITH $multiFeatsDuck
        SELECT lang, bucket, s, n FROM mm ORDER BY lang, bucket"""

  private def multiScoreSql: String = {
    def a(l: String) =
      s"(CAST(norm2_$l AS HUGEINT) - 2 * CAST(n_$l AS HUGEINT) * dot_$l)"
    // same empty-class guard as the Spark side (see multiScoreQuery)
    val pred = Langs.foldRight("CAST(NULL AS VARCHAR)") { (c, rest) =>
      val beatsAll = Langs.filter(_ != c)
        .map(o => s"(n_$o = 0 OR ${a(c)} * n_$o * n_$o <= ${a(o)} * n_$c * n_$c)")
        .mkString(" AND ")
      s"CASE WHEN n_$c > 0 AND $beatsAll THEN '$c' ELSE $rest END"
    }
    s"""WITH $multiFeatsDuck, st AS (
          SELECT ${Langs.map(l =>
            s"CAST(SUM(CASE WHEN lang = '$l' THEN s * s ELSE 0 END) AS BIGINT) AS norm2_$l, " +
            s"CAST(MAX(CASE WHEN lang = '$l' THEN n END) AS BIGINT) AS n_$l").mkString(", ")}
          FROM mm
        ), dt AS (
          SELECT f.doc_id, f.lang,
                 ${Langs.map(l =>
                   s"CAST(SUM(CASE WHEN m.lang = '$l' THEN f.cnt * m.s ELSE 0 END) AS BIGINT) AS dot_$l")
                   .mkString(", ")}
          FROM mf f JOIN mm m ON f.bucket = m.bucket
          GROUP BY f.doc_id, f.lang
        )
        SELECT doc_id, lang, $pred AS lang_pred, ($pred) = lang AS correct
        FROM dt CROSS JOIN st
        ORDER BY doc_id"""
  }

  // ---- binary-classifier DuckDB mirror ----

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
    "text_classifier_multi" -> (multiTrainQuery _),
    "text_langid_learned" -> (multiScoreQuery _),
  )

  override def oracle: Map[String, String] = Map(
    "text_classifier_train" -> trainSql,
    "text_classifier_score" -> scoreSql,
    "text_classifier_multi" -> multiTrainSql,
    "text_langid_learned" -> multiScoreSql,
  )
}
