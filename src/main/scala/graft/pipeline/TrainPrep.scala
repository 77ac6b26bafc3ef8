package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Training-data preparation operators: deterministic dataset splitting and
  * sequence packing — the two steps between "deduped corpus" and "batches a
  * trainer can read".
  *
  * Both are oracle-checked (hash-stable math shared with DuckDB) because
  * determinism is the POINT of these operators in production: a re-run of
  * the pipeline must put every document in the same split and the same bin,
  * or training becomes irreproducible and val/test leak across runs.
  *
  * Scale (100 TB): the split is a map-only hash projection + one bounded
  * aggregate (splits × langs rows). Packing windows are partitioned by
  * shard — parallelism = number of shards (set it to a multiple of executor
  * count at scale); within a shard the greedy fill is the sequential
  * contiguity packing pipelines actually use, and no shard ever needs more
  * than its own running sum in memory.
  */
object TrainPrep extends QueryModule {

  /** Split fractions in percent: [0,90) train, [90,95) val, [95,100) test. */
  val TrainPct = 90
  val ValPct = 95

  /** `text_stable_split`: content-independent hash-stable split assignment
    * (hash60(doc_id) mod 100 against the fraction boundaries — adding
    * documents never reassigns existing ones, unlike any sample()/random
    * split), summarized as docs + tokens per (split, lang).
    */
  def stableSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        expr(s"size(${Dedup.rawTokens})").as("n_tokens"),
        expr(s"${Dedup.hash60("CAST(doc_id AS STRING)")} % 100").as("h"))
      .withColumn("split",
        when(col("h") < TrainPct, "train")
          .when(col("h") < ValPct, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("split", "lang")

  private val stableSplitSql =
    s"""WITH d AS (
          SELECT doc_id, lang,
                 len(${Dedup.rawTokensDuck}) AS n_tokens,
                 ${Dedup.hash60Duck("CAST(doc_id AS VARCHAR)")} % 100 AS h
          FROM documents)
        SELECT CASE WHEN h < $TrainPct THEN 'train'
                    WHEN h < $ValPct THEN 'val'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM d GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Token budget per packed bin and shard count for [[packSequences]]. */
  val PackBudget = 512
  val PackShards = 8

  /** `pack_sequences`: greedy contiguous packing of documents into
    * fixed-token-budget bins, shard-local: within each shard (doc_id mod
    * [[PackShards]]), docs fill bins in doc_id order and a doc belongs to
    * the bin its running total STARTS in (bins may overflow at the
    * boundary — the standard contiguity packing; the trainer truncates or
    * spans). One row per bin: docs packed, tokens, fill ratio.
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        expr(s"size(${Dedup.rawTokens})").as("n_tokens"))
      .withColumn("bin",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / lit(PackBudget.toDouble)))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .withColumn("fill_ratio", col("bin_tokens").cast("double") / PackBudget)
      .orderBy("shard", "bin")
  }

  private val packSequencesSql =
    s"""WITH d AS (
          SELECT doc_id, doc_id % $PackShards AS shard,
                 len(${Dedup.rawTokensDuck}) AS n_tokens
          FROM documents
        ), b AS (
          SELECT shard, n_tokens,
                 CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tokens)
                            / ${PackBudget.toDouble}) AS BIGINT) AS bin
          FROM d)
        SELECT shard, bin, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               CAST(SUM(n_tokens) AS DOUBLE) / $PackBudget AS fill_ratio
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""

  /** `pack_manifest`: the trainer-facing manifest — each bin's member docs
    * as an ordered CSV string (same bin assignment as [[packSequences]];
    * doc list sorted numerically before joining so both engines emit the
    * identical string). Bins hold a handful of docs, so the per-group array
    * work is bounded.
    */
  def packManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        expr(s"size(${Dedup.rawTokens})").as("n_tokens"))
      .withColumn("bin",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / lit(PackBudget.toDouble)))
      .groupBy("shard", "bin")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')")
        .as("docs"))
      .orderBy("shard", "bin")
  }

  private val packManifestSql =
    s"""WITH d AS (
          SELECT doc_id, doc_id % $PackShards AS shard,
                 len(${Dedup.rawTokensDuck}) AS n_tokens
          FROM documents
        ), b AS (
          SELECT doc_id, shard,
                 CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tokens)
                            / ${PackBudget.toDouble}) AS BIGINT) AS bin
          FROM d)
        SELECT shard, bin,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""

  /** `doc_global_index`: dense contiguous sample indices 0..N-1 in doc_id
    * order — the address space a trainer's sampler draws from. A global
    * ORDER BY + row_number window would collapse the numbering onto ONE
    * task at scale; this is the scale-correct form: range-partitioned sort,
    * then `zipWithIndex` (one lightweight per-partition count job + a
    * map-side offset add — the textbook distributed prefix sum, and one of
    * the two deliberate RDD uses in the repo). The oracle's row_number
    * twin proves the two formulations agree.
    */
  def globalIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id")).orderBy("doc_id")
      .as[Long].rdd.zipWithIndex()
      .toDF("doc_id", "idx")
      .orderBy("doc_id")
  }

  private val globalIndexSql =
    """SELECT doc_id,
              CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       FROM documents ORDER BY doc_id"""

  /** Negatives per anchor document. */
  val NegativesPerAnchor = 2

  /** `train_negative_pairs`: deterministic contrastive negative sampling —
    * every document draws [[NegativesPerAnchor]] pseudo-random OTHER
    * documents, reproducibly (same corpus → same pairs, any cluster size,
    * any partitioning). The draw is `h = md5-hash(doc_id:slot) mod (N-1)`
    * mapped around the anchor's own index (`h ≥ idx → h+1` — the textbook
    * uniform-excluding-self bijection), then resolved to a doc through the
    * dense [[globalIndex]] address space.
    *
    * Scale: the index table is materialized once (the zipWithIndex job);
    * the negative resolution is one equi-join on `idx` — shuffle keyed by
    * a dense long, no skew by construction (hash-uniform draws). A trainer
    * regenerates exactly these pairs from the manifest alone; corpora of
    * one document draw nothing (N-1 = 0 guard) instead of dividing by zero.
    */
  def negativePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val idx = graft.Scratch.materialize(globalIndex(spark, sfDir), "graft_negidx")
    val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n")).scalar()
    val slots = spark.range(1L, NegativesPerAnchor + 1L).toDF("neg_slot")
    val draws = idx.crossJoin(slots)
      .filter(nDocs > lit(1))
      .withColumn("__h",
        pmod(expr(Dedup.hash60(
          "concat(cast(doc_id AS string), ':', cast(neg_slot AS string))")),
          nDocs - lit(1)))
      .withColumn("__neg_idx", when(col("__h") >= col("idx"), col("__h") + 1).otherwise(col("__h")))
    val neg = idx.select(col("idx").as("__neg_idx"), col("doc_id").as("neg_doc_id"))
    draws.join(neg, "__neg_idx")
      .select("doc_id", "neg_slot", "neg_doc_id")
      .orderBy("doc_id", "neg_slot")
  }

  private val negativePairsSql =
    s"""WITH idx AS (
          SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
          FROM documents
        ), n AS (SELECT COUNT(*) AS n FROM documents),
        slots AS (SELECT i AS neg_slot FROM range(1, ${NegativesPerAnchor + 1}) t(i)),
        draws AS (
          SELECT doc_id, idx, neg_slot,
                 (${graft.pipeline.Dedup.hash60Duck(
                     "concat(CAST(doc_id AS VARCHAR), ':', CAST(neg_slot AS VARCHAR))")}
                  % (n.n - 1)) AS h
          FROM idx CROSS JOIN slots CROSS JOIN n WHERE n.n > 1
        ), resolved AS (
          SELECT doc_id, neg_slot,
                 CASE WHEN h >= idx THEN h + 1 ELSE h END AS neg_idx
          FROM draws
        )
        SELECT r.doc_id, r.neg_slot, i2.doc_id AS neg_doc_id
        FROM resolved r JOIN idx i2 ON i2.idx = r.neg_idx
        ORDER BY r.doc_id, r.neg_slot"""

  /** Chunk window / stride (characters) for [[chunkDocs]]. */
  val ChunkWidth = 200
  val ChunkStride = 150

  /** `docs_chunked`: overlapping fixed-window document chunking — the step
    * that turns variable-length documents into trainer-sized pieces with a
    * stride-sized overlap so no boundary context is lost. Chunk starts are
    * `0, stride, 2·stride, …` while they still index into the text; the
    * final chunk may run short, and an empty/short document still yields
    * its one (possibly short) chunk — NULL text is coalesced to `''`
    * first, so every doc_id in the input appears in the chunk manifest
    * (without the coalesce, `sequence` of a NULL length is NULL and
    * `explode` would silently drop the document). Emits offsets + per-chunk md5
    * fingerprint rather than the chunk text — the downstream contract is
    * (doc_id, chunk_id → byte range), not a second copy of the corpus.
    *
    * Scale: map-only fan-out (`sequence` + `explode`, codegen'd); a 100 TB
    * corpus chunks with ZERO shuffles — the only exchange below is the
    * presentation sort. Fan-out factor is ~len/stride, bounded per row.
    */
  def chunkDocs(spark: SparkSession, sfDir: String): DataFrame =
    chunkDocsOf(Tables.documents(spark, sfDir)).orderBy("doc_id", "chunk_id")

  /** [[chunkDocs]] core over any (doc_id, text) frame — per-doc and
    * map-only, so a streaming ingest micro-batch runs it as-is
    * ([[graft.streaming.CorpusIngest]]). Unordered.
    */
  def chunkDocsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, greatest(len - 1, 0), $ChunkStride)")).as("start"))
      .select(col("doc_id"),
        (col("start") / ChunkStride).cast("long").as("chunk_id"),
        col("start").cast("long").as("chunk_start"),
        length(expr(s"substring(text, start + 1, $ChunkWidth)")).cast("long").as("chunk_len"),
        md5(expr(s"substring(text, start + 1, $ChunkWidth)")).as("chunk_md5"))

  private val chunkDocsSql =
    s"""WITH d AS (
          SELECT doc_id, coalesce(text, '') AS text FROM documents
        ), starts AS (
          SELECT doc_id, text,
                 unnest(range(0, greatest(len(text) - 1, 0) + 1, $ChunkStride)) AS s
          FROM d)
        SELECT doc_id,
               CAST(s // $ChunkStride AS BIGINT) AS chunk_id,
               CAST(s AS BIGINT) AS chunk_start,
               CAST(len(substr(text, s + 1, $ChunkWidth)) AS BIGINT) AS chunk_len,
               md5(substr(text, s + 1, $ChunkWidth)) AS chunk_md5
        FROM starts ORDER BY doc_id, chunk_id"""

  /** Per-stratum sample quota for [[stratifiedSample]]. */
  val StratumQuota = 40

  /** `docs_stratified_sample`: deterministic stratified sampling — exactly
    * `min(`[[StratumQuota]]`, |stratum|)` documents per language, drawn in
    * md5(doc_id) order. Unlike `sample()`/`TABLESAMPLE`, the draw is a pure
    * function of the row: a re-run (or a different cluster size, or a
    * different partitioning) picks the SAME sample, and adding documents
    * only ever displaces the quota boundary — the property an eval-set
    * builder needs.
    *
    * Scale: the rank ≤ k filter on a row_number window runs as Spark's
    * two-phase WindowGroupLimit — each task keeps a k-row heap per stratum
    * before the lang exchange, so the full corpus never shuffles; only
    * ~k rows per (task, stratum) do. Strata = languages here; any
    * low-cardinality key works.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        expr("md5(concat('strat:', CAST(doc_id AS STRING)))").as("draw"))
      .withColumn("strat_rank",
        row_number().over(Window.partitionBy("lang").orderBy("draw", "doc_id")).cast("long"))
      .filter(col("strat_rank") <= StratumQuota)
      .select("lang", "doc_id", "strat_rank")
      .orderBy("lang", "strat_rank")

  private val stratifiedSampleSql =
    s"""SELECT lang, doc_id, strat_rank FROM (
          SELECT lang, doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                        ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id)
                      AS BIGINT) AS strat_rank
          FROM documents) t
        WHERE strat_rank <= $StratumQuota ORDER BY lang, strat_rank"""

  /** Sample size m for [[prioritySample]]. */
  val PrioritySampleSize = 100

  /** Exact power of two (2^52): draws stay below the double-exact bound, so
    * every u = draw / 2^52 is an exact dyadic rational in both engines.
    */
  val PriorityDrawSpace = 4503599627370496L

  /** `docs_priority_sample`: quality-WEIGHTED sampling without replacement —
    * Duffield–Lund–Thorup priority sampling. Each document draws a
    * deterministic uniform u ∈ (0, 1] (hash60 of `prio:doc_id` reduced to
    * the 2^52 grid — the [[stratifiedSample]] draw discipline, made
    * numeric), gets priority w/u with w = its `text_quality_score` double,
    * and the m highest-priority docs form the sample. Against the naive
    * top-m-by-quality cut, every positive-weight document has inclusion
    * probability min(1, w/τ) — high-quality docs are favored but the tail
    * still surfaces, which is what a training-mixture sampler needs.
    * `est_weight = max(w, τ)` (τ = the (m+1)-th priority) is the
    * Horvitz–Thompson-style per-item estimator: summing est_weight over any
    * subset of the sample unbiasedly estimates that subset's total corpus
    * weight, so downstream mixture accounting can run on the SAMPLE.
    *
    * Determinism: u is an exact dyadic rational (draw ≤ 2^52 is double-exact;
    * dividing by 2^52 only shifts the exponent), w is the oracle-green
    * quality double, so priority = w/u is ONE correctly-rounded IEEE
    * division — bit-identical in both engines; ties break on doc_id.
    *
    * Scale (100 TB): the draw and priority are map-only; the sample is one
    * TakeOrderedAndProject heap (m+1 rows per task, never a global sort),
    * materialized once; τ and the ranking then run on the (m+1)-row result
    * (the single-partition window is bounded by m+1 rows, the
    * calendar-series argument). No window or shuffle ever sees corpus-sized
    * data.
    */
  def prioritySample(spark: SparkSession, sfDir: String): DataFrame = {
    val m = PrioritySampleSize
    val pr = TextAnalysis.qualityScoreOf(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("quality_score"),
        ((pmod(expr(Dedup.hash60("concat('prio:', CAST(doc_id AS STRING))")),
            lit(PriorityDrawSpace)) + lit(1L)).cast("double")
          / lit(PriorityDrawSpace.toDouble)).as("u"))
      .withColumn("priority", col("quality_score") / col("u"))
    val top = graft.Scratch.materialize(
      pr.orderBy(col("priority").desc, col("doc_id")).limit(m + 1),
      "graft_priosample")
    val tau = top.agg(
      when(count(lit(1)) === m + 1, min("priority")).otherwise(lit(0.0)).as("tau"))
    top
      .withColumn("rk",
        row_number().over(Window.orderBy(col("priority").desc, col("doc_id"))))
      .filter(col("rk") <= m)
      .crossJoin(tau) // 1-row threshold broadcast
      .select(col("doc_id"), col("quality_score"), col("priority"),
        greatest(col("quality_score"), col("tau")).as("est_weight"))
      .orderBy(col("priority").desc, col("doc_id"))
  }

  private val prioritySampleSql = {
    val m = PrioritySampleSize
    val d = PriorityDrawSpace
    s"""WITH p AS (
          SELECT doc_id, quality_score,
                 quality_score /
                   (CAST((${Dedup.hash60Duck("'prio:' || CAST(doc_id AS VARCHAR)")}
                          % $d) + 1 AS DOUBLE) / $d.0) AS priority
          FROM (${TextAnalysis.qualityScoreSql})
        ), topm1 AS (
          SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT ${m + 1}
        ), tau AS (
          SELECT CASE WHEN (SELECT COUNT(*) FROM topm1) = ${m + 1}
                      THEN (SELECT MIN(priority) FROM topm1) ELSE 0.0 END AS tau
        )
        SELECT doc_id, quality_score, priority,
               greatest(quality_score, tau) AS est_weight
        FROM (SELECT * FROM topm1 ORDER BY priority DESC, doc_id LIMIT $m) s
        CROSS JOIN tau
        ORDER BY priority DESC, doc_id"""
  }

  /** `train_decontaminated_split`: the split assignment a release actually
    * ships — [[stableSplit]]'s hash buckets with the governance gates
    * composed in: held-out benchmark docs land in `benchmark` (they are
    * nobody's training data), benchmark-contaminated and exact-duplicate
    * docs land in `quarantine`, and only clean docs draw train/val/test.
    * Every gate is the SAME operator its standalone oracle row checks
    * (`text_contamination`, `dedup_exact`) — the `corpus_dataset_card`
    * composition discipline applied to the split itself.
    *
    * Shape: the gates are doc-grain flags joined onto the hash-bucket
    * assignment (contamination's benchmark side is broadcast; the dup
    * flag rides the fingerprint window) — one final (split, lang)
    * aggregate. Priority: benchmark > quarantine > hash bucket, so a
    * contaminated benchmark doc still counts as benchmark.
    */
  def decontaminatedSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.select(col("doc_id"), col("lang"),
      expr(s"size(${Dedup.rawTokens})").as("n_tokens"),
      expr(s"${Dedup.hash60("CAST(doc_id AS STRING)")} % 100").as("h"))
    // the gates are the MEMOIZED tables their standalone oracle rows check
    // (`text_contamination`, `dedup_exact`) — one shingle explode and one
    // fingerprint window per corpus per run, shared by every consumer
    val contam = CorpusQc.contaminationTable(spark, sfDir)
      .filter(col("contaminated")).select(col("doc_id"), lit(1).as("bad_contam"))
    val dups = Dedup.exactDedupTable(spark, sfDir)
      .filter(col("is_duplicate")).select(col("doc_id"), lit(1).as("bad_dup"))
    base
      .join(contam, Seq("doc_id"), "left")
      .join(dups, Seq("doc_id"), "left")
      .withColumn("split",
        when(col("doc_id") % CorpusQc.BenchMod === 0, "benchmark")
          .when(col("bad_contam").isNotNull || col("bad_dup").isNotNull, "quarantine")
          .when(col("h") < TrainPct, "train")
          .when(col("h") < ValPct, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("split", "lang")
  }

  private val decontaminatedSplitSql =
    s"""WITH contam AS (
          SELECT doc_id FROM (${CorpusQc.contaminationSql}) WHERE contaminated
        ), dups AS (
          SELECT doc_id FROM (${Dedup.exactDedupSql}) WHERE is_duplicate
        ), d AS (
          SELECT doc_id, lang,
                 len(${Dedup.rawTokensDuck}) AS n_tokens,
                 ${Dedup.hash60Duck("CAST(doc_id AS VARCHAR)")} % 100 AS h
          FROM documents
        ), assigned AS (
          SELECT d.lang, d.n_tokens,
                 CASE WHEN d.doc_id % ${CorpusQc.BenchMod} = 0 THEN 'benchmark'
                      WHEN c.doc_id IS NOT NULL OR x.doc_id IS NOT NULL
                        THEN 'quarantine'
                      WHEN h < $TrainPct THEN 'train'
                      WHEN h < $ValPct THEN 'val'
                      ELSE 'test' END AS split
          FROM d
          LEFT JOIN contam c ON c.doc_id = d.doc_id
          LEFT JOIN dups x ON x.doc_id = d.doc_id
        )
        SELECT split, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM assigned GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---- DSIR importance weights (data selection) ----

  /** Hashed-feature space for the DSIR unigram bag model. Fixed and
    * corpus-independent — the point of hashing: the bucket-count tables
    * are [[DsirBuckets]] rows at ANY corpus size, so both are broadcast.
    */
  val DsirBuckets = 1024

  /** Target domain: the `lang = 'en'` slice stands in for "the
    * high-quality target corpus" (in production: Wikipedia/books vs web).
    */
  val DsirTargetLang = "en"

  /** Selection budget: top 1/[[DsirSelDenom]] by importance weight. */
  val DsirSelDenom = 5

  /** Histogram resolution for the distributed rank cut. */
  val DsirHistBuckets = 1024

  /** Per-bucket log importance ratio — ONE shared SQL string parsed by both
    * engines (the `bigramLogProb` discipline): add-1-smoothed hashed-unigram
    * likelihood under the target distribution minus the raw distribution.
    * `tc` arrives pre-coalesced (a bucket never seen in the target slice
    * still gets the +1 floor).
    */
  private val dsirLogRatio =
    s"""ln((CAST(tc AS DOUBLE) + 1.0e0) / (CAST(tt AS DOUBLE) + $DsirBuckets.0e0))
      - ln((CAST(rc AS DOUBLE) + 1.0e0) / (CAST(rt AS DOUBLE) + $DsirBuckets.0e0))"""

  /** `train_dsir_weights`: Data Selection via Importance Resampling (Xie et
    * al. 2023, public) — rank every document by how much more likely its
    * hashed-unigram bag is under the target domain's unigram model than
    * under the raw corpus's, and select the top 1/[[DsirSelDenom]]. The
    * deterministic skeleton of DSIR: the paper's Gumbel-top-k draw is
    * replaced by the exact rank cut so the selection is reproducible and
    * hash-checkable (a seeded Gumbel draw is a one-line re-addition on the
    * ranked table).
    *
    * Shape (100 TB): ONE corpus-scale shuffle builds the (doc, bucket,
    * multiplicity) table (memoized); both model tables collapse to
    * [[DsirBuckets]] rows (hashing bounds state — the reason DSIR scales
    * where a full-vocab LM does not) and are BROADCAST back; scoring is a
    * map-side join + one doc_id fold. The rank and the selection flag are
    * computed distributed via [[TextAnalysis.histRankDesc]] — no
    * single-partition window. Emission is the rank + exact integers, never
    * the raw log-weight ([[TextAnalysis.perplexityFilter]] discipline:
    * engine `ln`s differ in the last ulp; ranking is safe because adjacent
    * gaps dwarf ulp noise, and byte-identical docs tie exactly, breaking
    * by doc_id). Per-doc fold is `sorted_sum` with exact-integer
    * multiplicities — order-independent.
    */
  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val docb = graft.Scratch.memoize(spark, s"$sfDir#dsir#docb") {
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), explode(expr(Dedup.rawTokens)).as("w"))
        .select(col("doc_id"), col("lang"),
          expr(s"${Dedup.hash60("w")} % $DsirBuckets").as("b"))
        .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("m"))
    }
    val tcnt = docb.filter(col("lang") === DsirTargetLang)
      .groupBy("b").agg(sum("m").as("tc"))
    val rcnt = docb.groupBy("b").agg(sum("m").as("rc"))
    val totals = docb.agg(
      sum(when(col("lang") === DsirTargetLang, col("m")).otherwise(0L)).as("tt"),
      sum("m").as("rt"))
    val scored = graft.Scratch.memoize(spark, s"$sfDir#dsir#scored") {
      docb
        .join(broadcast(rcnt), Seq("b"))
        .join(broadcast(tcnt), Seq("b"), "left")
        .withColumn("tc", coalesce(col("tc"), lit(0L)))
        .crossJoin(broadcast(totals)) // 1-row side
        .select(col("doc_id"), col("m"),
          expr(s"CAST(m AS DOUBLE) * ($dsirLogRatio)").as("c"))
        .groupBy("doc_id")
        .agg(sum("m").as("n_tokens"), count(lit(1)).as("n_buckets"),
          expr("sorted_sum(c)").as("lw"))
    }
    TextAnalysis.histRankDesc(scored, "lw", DsirHistBuckets)
      .withColumn("selected",
        expr(s"rank <= (n_docs + ${DsirSelDenom - 1}) div $DsirSelDenom"))
      .select("rank", "doc_id", "n_tokens", "n_buckets", "selected")
      .orderBy("rank")
  }

  private val dsirWeightsSql =
    s"""WITH docb AS (
          SELECT doc_id, lang, ${Dedup.hash60Duck("w")} % $DsirBuckets AS b,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM (SELECT doc_id, lang, unnest(${Dedup.rawTokensDuck}) AS w
                FROM documents)
          GROUP BY 1, 2, 3
        ), tcnt AS (
          SELECT b, CAST(SUM(m) AS BIGINT) AS tc FROM docb
          WHERE lang = '$DsirTargetLang' GROUP BY b
        ), rcnt AS (
          SELECT b, CAST(SUM(m) AS BIGINT) AS rc FROM docb GROUP BY b
        ), tot AS (
          SELECT CAST(SUM(CASE WHEN lang = '$DsirTargetLang' THEN m ELSE 0 END)
                   AS BIGINT) AS tt,
                 CAST(SUM(m) AS BIGINT) AS rt
          FROM docb
        ), joined AS (
          SELECT d.doc_id, d.m, COALESCE(tc, 0) AS tc, rc, tt, rt
          FROM docb d JOIN rcnt USING (b) LEFT JOIN tcnt USING (b) CROSS JOIN tot
        ), contrib AS (
          SELECT doc_id, m, CAST(m AS DOUBLE) * ($dsirLogRatio) AS c FROM joined
        ), scored AS (
          SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_buckets,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(c))),
                   (a, x) -> a + x) AS lw
          FROM contrib GROUP BY doc_id
        ), ranked AS (
          SELECT CAST(row_number() OVER (ORDER BY lw DESC, doc_id) AS BIGINT) AS rank,
                 doc_id, n_tokens, n_buckets
          FROM scored
        )
        SELECT rank, doc_id, n_tokens, n_buckets,
               rank <= (CAST(COUNT(*) OVER () AS BIGINT) + ${DsirSelDenom - 1})
                         // $DsirSelDenom AS selected
        FROM ranked ORDER BY rank"""

  // ---- packing strategy comparison ----

  /** `pack_compare`: the packing decision quantified — the SAME shard-local
    * running-sum binning under two document orders, summarized per
    * strategy: `contiguity` (doc_id order — preserves document locality,
    * what [[packSequences]] ships) vs `sorted_greedy` (length-descending —
    * the first-fit-decreasing-style order that trades locality for fill).
    * One row per strategy: bins, total tokens, mean fill, and how many
    * bins run under 90 % — the fragmentation a trainer pays as padding.
    * Everything exact integer until the two divisions per row; the
    * comparison shares ONE tokenized projection.
    *
    * Scale: identical to the packing operators — per-shard windows,
    * parallelism = shard count; the summary is strategies × 1 rows.
    */
  def packCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        expr(s"size(${Dedup.rawTokens})").as("n_tokens"))
    def strat(name: String, w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      docs
        .withColumn("bin",
          floor((sum("n_tokens").over(w) - col("n_tokens")) / lit(PackBudget.toDouble)))
        .groupBy("shard", "bin").agg(sum("n_tokens").as("bin_tokens"))
        .agg(count(lit(1)).as("n_bins"), sum("bin_tokens").as("total_tokens"),
          sum(when(col("bin_tokens") < (PackBudget * 9) / 10, 1L).otherwise(0L))
            .as("bins_under_90"))
        .select(lit(name).as("strategy"), col("n_bins"), col("total_tokens"),
          col("bins_under_90"),
          expr(s"CAST(total_tokens AS DOUBLE) / (n_bins * $PackBudget)").as("mean_fill"))
    strat("contiguity", Window.partitionBy("shard").orderBy("doc_id"))
      .unionByName(strat("sorted_greedy",
        Window.partitionBy("shard").orderBy(col("n_tokens").desc, col("doc_id"))))
      .orderBy("strategy")
  }

  private val packCompareSql = {
    def strat(name: String, order: String) =
      s"""SELECT '$name' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_bins,
             CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN bin_tokens < ${(PackBudget * 9) / 10} THEN 1 ELSE 0 END)
               AS BIGINT) AS bins_under_90,
             CAST(SUM(bin_tokens) AS DOUBLE)
               / (COUNT(*) * $PackBudget) AS mean_fill
          FROM (
            SELECT shard, bin, SUM(n_tokens) AS bin_tokens FROM (
              SELECT shard,
                     floor((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY $order
                              ROWS UNBOUNDED PRECEDING) - n_tokens)
                           / ${PackBudget.toDouble}) AS bin,
                     n_tokens
              FROM d) GROUP BY 1, 2)"""
    s"""WITH d AS (
          SELECT doc_id, doc_id % $PackShards AS shard,
                 len(${Dedup.rawTokensDuck}) AS n_tokens
          FROM documents
        )
        ${strat("contiguity", "doc_id")}
        UNION ALL
        ${strat("sorted_greedy", "n_tokens DESC, doc_id")}
        ORDER BY strategy"""
  }

  // ---- rendezvous (highest-random-weight) shard assignment ----

  /** Current shard count and the expansion target the query measures the
    * reassignment cost against.
    */
  val RvShards = 8
  val RvShardsNext = 9

  /** Per-doc HRW weight array literal for `n` shards: weight(doc, s) =
    * hash60('rv:' || doc_id || ':' || s). The CRITICAL property: shard s's
    * weight expression is IDENTICAL at any shard count, so growing the ring
    * only adds array entries — a doc moves iff the NEW shard's weight beats
    * its current maximum, which happens with probability 1/(n+1).
    */
  private def rvWeights(n: Int): String =
    (0 until n).map(s =>
      Dedup.hash60(s"concat('rv:', CAST(doc_id AS STRING), ':$s')"))
      .mkString("array(", ", ", ")")

  private def rvWeightsDuck(n: Int): String =
    (0 until n).map(s =>
      Dedup.hash60Duck(s"('rv:' || CAST(doc_id AS VARCHAR) || ':$s')"))
      .mkString("[", ", ", "]")

  /** `docs_rendezvous_shards`: rendezvous/HRW hashing (Thaler–Ravishankar,
    * public) as the stable shard assigner a growing corpus store needs —
    * per shard, the doc count AND how many of its docs would move if the
    * ring grew to [[RvShardsNext]] shards. Naive `mod n` reassigns
    * (n-1)/n of all docs on resize; HRW reassigns ~1/(n+1) (only docs whose
    * new-shard weight beats their current max), which the emitted `n_moved`
    * column makes measurable. Map-only per-doc math (two fixed-width hash
    * arrays, argmax by first-position-of-max — 60-bit weights make ties
    * practically impossible and position-of-first-max resolves them
    * identically in both engines), then ONE shards-sized aggregate.
    */
  def rendezvousShards(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"))
      .withColumn("ws", expr(rvWeights(RvShards)))
      .withColumn("ws9", expr(rvWeights(RvShardsNext)))
      .withColumn("shard", expr("CAST(array_position(ws, array_max(ws)) - 1 AS INT)"))
      .withColumn("shard9", expr("CAST(array_position(ws9, array_max(ws9)) - 1 AS INT)"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard") =!= col("shard9"), 1L).otherwise(0L)).as("n_moved"))
      .orderBy("shard")

  private val rendezvousShardsSql =
    s"""WITH w AS (
          SELECT doc_id, ${rvWeightsDuck(RvShards)} AS ws,
                 ${rvWeightsDuck(RvShardsNext)} AS ws9
          FROM documents
        ), a AS (
          SELECT CAST(list_position(ws, list_max(ws)) - 1 AS INT) AS shard,
                 CAST(list_position(ws9, list_max(ws9)) - 1 AS INT) AS shard9
          FROM w
        )
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN shard <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_moved
        FROM a GROUP BY shard ORDER BY shard"""

  // ---- largest-remainder proportional allocation sampling ----

  /** Total sample budget allocated across language strata. */
  val AllocBudget = 100

  /** `docs_allocated_sample`: a FIXED total budget of [[AllocBudget]] docs
    * allocated across language strata in exact proportion by the
    * largest-remainder (Hamilton) method — the eval-set builder's
    * allocation: Σ alloc = budget EXACTLY (quota rounding can't drift the
    * set size), every stratum within 1 of its exact proportional share.
    * All allocation math is exact integer: base = (B·n) div total,
    * remainder = (B·n) mod total, leftover seats to the largest remainders
    * (ties: lang ASC). Within each stratum the picks are the md5-draw rank
    * (append-stable, like [[stratifiedSample]]).
    *
    * Scale: allocation runs on the AGGREGATED langs-sized table (its global
    * windows are the `orders_monthly_growth` altitude — strata-count rows,
    * never corpus rows); the corpus pays one broadcast join + per-stratum
    * WindowGroupLimit rank.
    */
  def allocatedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val alloc = counts
      .withColumn("total", sum("n_docs").over(Window.partitionBy()))
      .withColumn("base", expr(s"($AllocBudget * n_docs) div total"))
      .withColumn("rem", expr(s"($AllocBudget * n_docs) % total"))
      .withColumn("leftover", lit(AllocBudget.toLong) - sum("base").over(Window.partitionBy()))
      .withColumn("rk", row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select("lang", "alloc")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        expr("md5(concat('alloc:', CAST(doc_id AS STRING)))").as("draw"))
      .join(broadcast(alloc), "lang")
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy("draw", "doc_id")).cast("long"))
      .filter(col("rk") <= col("alloc"))
      .select("lang", "rk", "doc_id")
      .orderBy("lang", "rk")
  }

  private val allocatedSampleSql =
    s"""WITH counts AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
        ), a1 AS (
          SELECT lang, n_docs, CAST(SUM(n_docs) OVER () AS BIGINT) AS total FROM counts
        ), a2 AS (
          SELECT lang, ($AllocBudget * n_docs) // total AS base,
                 ($AllocBudget * n_docs) % total AS rem
          FROM a1
        ), a3 AS (
          SELECT lang, base, rem,
                 $AllocBudget - CAST(SUM(base) OVER () AS BIGINT) AS leftover,
                 row_number() OVER (ORDER BY rem DESC, lang) AS rk
          FROM a2
        ), alloc AS (
          SELECT lang,
                 CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
                   AS alloc
          FROM a3
        ), draws AS (
          SELECT doc_id, lang, md5('alloc:' || CAST(doc_id AS VARCHAR)) AS draw
          FROM documents
        ), ranked AS (
          SELECT d.lang, d.doc_id, a.alloc,
                 CAST(row_number() OVER (PARTITION BY d.lang
                        ORDER BY d.draw, d.doc_id) AS BIGINT) AS rk
          FROM draws d JOIN alloc a USING (lang)
        )
        SELECT lang, rk, doc_id FROM ranked WHERE rk <= alloc ORDER BY lang, rk"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "train_dsir_weights" -> (dsirWeights _),
    "docs_rendezvous_shards" -> (rendezvousShards _),
    "docs_allocated_sample" -> (allocatedSample _),
    "text_stable_split" -> (stableSplit _),
    "train_decontaminated_split" -> (decontaminatedSplit _),
    "docs_stratified_sample" -> (stratifiedSample _),
    "docs_priority_sample" -> (prioritySample _),
    "train_negative_pairs" -> (negativePairs _),
    "pack_sequences" -> (packSequences _),
    "pack_compare" -> (packCompare _),
    "pack_manifest" -> (packManifest _),
    "doc_global_index" -> (globalIndex _),
    "docs_chunked" -> (chunkDocs _),
  )

  override def oracle: Map[String, String] = Map(
    "train_dsir_weights" -> dsirWeightsSql,
    "docs_rendezvous_shards" -> rendezvousShardsSql,
    "docs_allocated_sample" -> allocatedSampleSql,
    "text_stable_split" -> stableSplitSql,
    "train_decontaminated_split" -> decontaminatedSplitSql,
    "docs_stratified_sample" -> stratifiedSampleSql,
    "docs_priority_sample" -> prioritySampleSql,
    "train_negative_pairs" -> negativePairsSql,
    "pack_sequences" -> packSequencesSql,
    "pack_compare" -> packCompareSql,
    "pack_manifest" -> packManifestSql,
    "doc_global_index" -> globalIndexSql,
    "docs_chunked" -> chunkDocsSql,
  )
}
