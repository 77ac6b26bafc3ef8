package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Scratch, Tables}

/** `corpus_curated_manifest`: the END-TO-END curation pipeline as ONE
  * oracle-checked query — every stage is an operator that is already green
  * standalone, chained the way a production training-data build chains
  * them:
  *
  *   1. source gate — the `corpus_source_report` aggregate keeps sources
  *      whose bucketed mean quality clears [[SourceGate]];
  *   2. doc QC filter — the `text_quality_score` formula keeps docs with
  *      q ≥ [[DocQualityBar]];
  *   3. near-dup probe — the `dedup_minhash_lsh` pair table drops any doc
  *      whose τ ≥ 0.9 neighbor with a smaller id survived QC (the
  *      canonical-keeper rule);
  *   4. mixture — the `mix_weights`/`mix_materialize` temperature-scaled
  *      per-language oversample factors assign each survivor its copy
  *      count;
  *   5. packing — the `pack_manifest` shard-local greedy fill bins the
  *      weighted tokens and emits the trainer-facing manifest.
  *
  * What the composition PROVES (and PlanAssertionsSpec pins): the
  * memoized-scratch DAG composes — the registered query's plan reads the
  * corpus TEXT zero times. Per run, the text is scanned exactly twice
  * corpus-wide, each pass shared by every consumer: the quality-feature
  * pass ([[CorpusQc.qualityFeaturesOf]], memoized here, one map-only scan)
  * and the tokenize pass behind the memoized dedup pair table (shared with
  * all dedup queries). Every stage boundary is a memo scan, a sources- or
  * langs-sized broadcast, or a doc_id-keyed shuffle — nothing rescans raw
  * text, which is the property that keeps a 100 TB curation DAG one-pass
  * instead of once-per-stage.
  *
  * Determinism: each stage's math is the already-proven twin (quality
  * doubles, exact bucket sums, md5/hash60 draws, sorted-fold mixture
  * denominator, integer pack bins), so the composed result hash-matches
  * the oracle's CTE chain end to end.
  */
object CurationPipeline extends QueryModule {

  /** Keep sources whose `mean_quality_bucketed` clears this bar (the
    * fixture's per-source means span ~0.78–0.83, so the gate genuinely
    * drops sources at test scale).
    */
  val SourceGate = 0.79

  /** Per-doc quality bar — deliberately above [[CorpusQc.LowQuality]]: the
    * curation build keeps good docs, not merely non-junk (drops ~5–10% of
    * the fixture).
    */
  val DocQualityBar = 0.72

  /** The memoized one-scan feature table every stage reads. */
  private def feats(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#curation#features") {
      featuresCompute(spark, sfDir)
    }

  /** The actual feature plan (package-visible so PlanAssertionsSpec can
    * audit its single corpus scan — the registered query's own plan reads
    * the memo). `text` rides along inside [[CorpusQc.qualityFeaturesOf]]
    * for same-scan composers (`html_domain_scorecard`'s entropy column) but
    * is dropped BEFORE the memo write: persisting it would copy the entire
    * corpus text into the curation scratch table — at 100 TB that turns a
    * KB-per-doc feature memo into a second corpus.
    */
  private[graft] def featuresCompute(spark: SparkSession, sfDir: String): DataFrame =
    CorpusQc.qualityFeaturesOf(Tables.documents(spark, sfDir)).drop("text")

  def curatedManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val f = feats(spark, sfDir)
    // 1. source gate: sources-sized aggregate, re-enters as a broadcast
    val srcOk = f.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(expr("2 * qb + 1")).as("qnum"))
      .filter(expr(
        s"CAST(qnum AS DOUBLE) / (${2 * CorpusQc.QBuckets} * n_docs) >= $SourceGate"))
      .select("source")
    // 2. doc QC bar: map-only on the memo scan
    val qc = f.join(broadcast(srcOk), "source").filter(col("q") >= DocQualityBar)
    // 3. near-dup probe: pairs are ia < ib, so dropping every ib whose ia
    // partner survived QC keeps exactly the canonical (smallest-id) copies
    val pairs = Dedup.minhashPairs(spark, sfDir).select("ia", "ib")
    val dupIds = pairs
      .join(qc.select(col("doc_id").as("ia")), Seq("ia"), "left_semi")
      .select(col("ib").as("doc_id"))
    val keep = qc.join(dupIds, Seq("doc_id"), "left_anti")
    // 4. mixture: langs-sized aggregate + broadcast factors (mix_weights /
    // mix_materialize verbatim, over the survivors)
    val perLang = keep.groupBy("lang")
      .agg(sum("n_tokens").as("lang_tokens"))
      .withColumn("s", sqrt(col("lang_tokens").cast("double")))
    val totals = perLang.agg(
      expr("sorted_sum(s)").as("denom"), sum("lang_tokens").as("total_tokens"))
    val factors = perLang.crossJoin(totals) // 1-row totals
      .select(col("lang"),
        (col("s") / col("denom") * col("total_tokens").cast("double")
          / col("lang_tokens")).as("oversample"))
    val copies = keep.join(broadcast(factors), "lang")
      .withColumn("h",
        expr(s"${Dedup.hash60("concat('mix:', CAST(doc_id AS STRING))")} % ${CorpusQc.Mod}"))
      .withColumn("n_copies",
        (floor(col("oversample")) +
          when(col("h") < floor((col("oversample") - floor(col("oversample"))) * CorpusQc.Mod), 1)
            .otherwise(0)).cast("long"))
      .filter(col("n_copies") > 0)
    // 5. pack the weighted tokens into shard-local bins (pack_manifest)
    val w = Window.partitionBy("shard").orderBy("doc_id")
    copies
      .select(col("doc_id"),
        (col("doc_id") % TrainPrep.PackShards).as("shard"),
        (col("n_tokens") * col("n_copies")).as("w_tokens"))
      .withColumn("bin",
        floor((sum("w_tokens").over(w) - col("w_tokens")) / lit(TrainPrep.PackBudget.toDouble)))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("w_tokens").as("bin_tokens"),
        expr(
          "array_join(transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')")
          .as("docs"))
      .orderBy("shard", "bin")
  }

  private def curatedManifestSql = {
    val stop = graft.operators.TextStats.stopWords.map(w => s"'$w'").mkString(", ")
    val qb2 = 2 * CorpusQc.QBuckets
    raw"""WITH f AS (
          SELECT doc_id, source, lang, md5(text) AS fp,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
                 len(regexp_extract_all(text, '\S+')) AS n_tokens,
                 len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                     w -> w IN ($stop))) AS stop_tokens
          FROM documents
        ), r AS (
          SELECT *, 0.5 * (CAST(alpha_chars AS DOUBLE) / n_chars)
                   + 0.3 * (1.0 - CAST(stop_tokens AS DOUBLE) / n_tokens)
                   + 0.2 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS q
          FROM f WHERE n_tokens > 0 AND n_chars > 0
        ), b AS (
          SELECT *, CAST(least(greatest(floor(q * ${CorpusQc.QBuckets}), 0),
                               ${CorpusQc.QBuckets - 1}) AS BIGINT) AS qb
          FROM r
        ), src_ok AS (
          SELECT source FROM (
            SELECT source, CAST(SUM(2 * qb + 1) AS DOUBLE) / ($qb2 * COUNT(*)) AS mq
            FROM b GROUP BY 1) WHERE mq >= $SourceGate
        ), qc AS (
          SELECT b.* FROM b JOIN src_ok USING (source) WHERE q >= $DocQualityBar
        ), pairs AS (
          SELECT ia, ib FROM (${Dedup.minhashLshSql})
        ), dropped AS (
          SELECT DISTINCT p.ib AS doc_id FROM pairs p JOIN qc ON qc.doc_id = p.ia
        ), keep AS (
          SELECT * FROM qc WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        ), per_lang AS (
          SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens FROM keep GROUP BY 1
        ), s AS (
          SELECT lang, lang_tokens, sqrt(CAST(lang_tokens AS DOUBLE)) AS s FROM per_lang
        ), tot AS (
          SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_sort(list(s))), (a, x) -> a + x) AS denom,
                 CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens
          FROM s
        ), fct AS (
          SELECT lang, s / denom * total_tokens / lang_tokens AS oversample
          FROM s CROSS JOIN tot
        ), cp AS (
          SELECT k.doc_id, k.n_tokens,
                 CAST(floor(oversample) AS BIGINT)
                   + CASE WHEN ${Dedup.hash60Duck("'mix:' || CAST(doc_id AS VARCHAR)")}
                            % ${CorpusQc.Mod}
                            < floor((oversample - floor(oversample)) * ${CorpusQc.Mod})
                          THEN 1 ELSE 0 END AS n_copies
          FROM keep k JOIN fct USING (lang)
        ), packin AS (
          SELECT doc_id, doc_id % ${TrainPrep.PackShards} AS shard,
                 n_tokens * n_copies AS w_tokens
          FROM cp WHERE n_copies > 0
        ), binned AS (
          SELECT doc_id, shard, w_tokens,
                 CAST(FLOOR((SUM(w_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - w_tokens)
                            / ${TrainPrep.PackBudget.toDouble}) AS BIGINT) AS bin
          FROM packin
        )
        SELECT shard, bin, COUNT(*) AS n_docs,
               CAST(SUM(w_tokens) AS BIGINT) AS bin_tokens,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
        FROM binned GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_curated_manifest" -> (curatedManifest _),
  )

  override def oracle: Map[String, String] = Map(
    "corpus_curated_manifest" -> curatedManifestSql,
  )
}
