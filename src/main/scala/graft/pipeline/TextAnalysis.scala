package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Text-analysis operators for a training-data pipeline (builder brief):
  * language identification (marker-word heuristic), quality scoring
  * (length / alpha / stopword features), token counting (whitespace and a
  * BPE-ish regex segmentation), and document fingerprinting (min-hash over
  * strided character shingles — the winnowing-style content fingerprint).
  *
  * All four are map-only per document until the final sort — explode +
  * codegen'd aggregation, no UDFs, no collect — and every double is either
  * a ratio of exact integers or a fixed-order small expression, so the
  * DuckDB oracle matches bit-for-bit.
  *
  * Scale: per-doc state is bounded by the marker-profile size (lang-id),
  * O(1) feature counters (quality/tokens), and one running min
  * (fingerprint); nothing grows with corpus size.
  */
object TextAnalysis extends QueryModule {

  /** Marker-word profiles; prediction tie-break = profile order (CASE arm
    * order, mirrored exactly in the oracle).
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "en" -> Seq("the", "and", "a", "is", "of"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")

  /** Language-ID: tokenize, score each language by marker-word hits, argmax
    * with CASE-arm tie-break. Emits the prediction next to the labeled lang.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy("doc_id", "lang")
      .agg(Profiles.map { case (l, ws) =>
        sum(when(col("w").isin(ws: _*), 1).otherwise(0)).as(s"s_$l")
      }.head, Profiles.tail.map { case (l, ws) =>
        sum(when(col("w").isin(ws: _*), 1).otherwise(0)).as(s"s_$l")
      }: _*)
    val others = (l: String) => Profiles.map(_._1).filter(_ != l).map(o => col(s"s_$o"))
    // the s_l > 0 guard makes the 'und' fallback reachable: a document with
    // zero marker hits anywhere is unidentified, not first-profile
    val pred = Profiles.map(_._1).foldRight(lit("und")) { (l, rest) =>
      when(col(s"s_$l") > 0 && col(s"s_$l") >= greatest(others(l): _*), l).otherwise(rest)
    }
    scored
      .withColumn("lang_pred", pred)
      .withColumn("is_match", col("lang_pred") === col("lang"))
      .select("doc_id", "lang", "lang_pred", "is_match")
      .orderBy("doc_id")
  }

  private val langIdSql = {
    val scores = Profiles.map { case (l, ws) =>
      s"SUM(CASE WHEN w IN (${inList(ws)}) THEN 1 ELSE 0 END) AS s_$l"
    }.mkString(", ")
    val pred = Profiles.map(_._1).foldRight("'und'") { (l, rest) =>
      val others = Profiles.map(_._1).filter(_ != l).map(o => s"s_$o").mkString(", ")
      s"CASE WHEN s_$l > 0 AND s_$l >= greatest($others) THEN '$l' ELSE $rest END"
    }
    s"""WITH tok AS (
          SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
          FROM documents
        ), s AS (
          SELECT doc_id, lang, $scores FROM tok GROUP BY doc_id, lang
        )
        SELECT doc_id, lang, $pred AS lang_pred, ($pred) = lang AS is_match
        FROM s ORDER BY doc_id"""
  }

  /** `text_langid_confusion`: the classifier eval readout — the full
    * (labeled, predicted) confusion matrix of the marker-word language
    * identifier, with per-cell counts and the per-label recall on diagonal
    * cells. The eval every heuristic filter needs before it gates a
    * corpus: which languages it confuses, and how asymmetrically. Dense at
    * observed-cells grain ((langs+1)² bounded); exact counts; recall is
    * one division against the label's row total (window over the
    * langs-sized matrix — aggregated altitude).
    */
  def langIdConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langId(spark, sfDir)
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum("n").over(Window.partitionBy("lang")))
      .select(col("lang"), col("lang_pred"), col("n"),
        expr("CAST(n AS DOUBLE) / row_total").as("share_of_label"))
      .orderBy("lang", "lang_pred")
  }

  private val langIdConfusionSql =
    s"""WITH ident AS ($langIdSql)
        SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY lang) AS share_of_label
        FROM ident GROUP BY lang, lang_pred ORDER BY lang, lang_pred"""

  /** Token counting: whitespace segmentation vs a BPE-ish regex (letter runs,
    * digit runs, single punctuation marks) vs raw chars.
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_measured"),
      expr(raw"size(regexp_extract_all(text, '\\S+', 0))").cast("long").as("ws_tokens"),
      expr(raw"size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0))")
        .cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  private val tokenCountsSql =
    raw"""SELECT doc_id,
               length(text) AS n_chars_measured,
               len(regexp_extract_all(text, '\S+')) AS ws_tokens,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
        FROM documents ORDER BY doc_id"""

  /** Quality scoring: alpha ratio, stopword ratio, length saturation — the
    * standard cheap pre-training filters. The composite is a fixed-order
    * small double expression, identical in both engines.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame =
    qualityScoreOf(Tables.documents(spark, sfDir)).orderBy("doc_id")

  /** Unsorted per-doc quality core — the reusable form consumers join on
    * (the canonical-survivor dedup keys its argmax off this exact double,
    * so both engines agree bit-for-bit on the ordering).
    */
  private[graft] def qualityScoreOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_measured"),
      expr("length(regexp_replace(text, '[^a-zA-Z]', ''))").as("alpha_chars"),
      expr(raw"size(regexp_extract_all(text, '\\S+', 0))").cast("long").as("n_tokens"),
      expr(s"""size(filter(regexp_extract_all(lower(text), '[a-z]+', 0),
                 w -> w IN (${inList(graft.operators.TextStats.stopWords)})))""").as("stop_tokens"))
      .filter(col("n_tokens") > 0 && length(col("text")) > 0)
      .withColumn("alpha_ratio",
        col("alpha_chars").cast("double") / col("n_chars_measured"))
      .withColumn("stop_ratio",
        col("stop_tokens").cast("double") / col("n_tokens"))
      .withColumn("quality_score", expr(
        "0.5D * alpha_ratio + 0.3D * (1.0D - stop_ratio) + 0.2D * least(1.0D, CAST(n_tokens AS DOUBLE) / 100.0D)"))
      .select("doc_id", "n_chars_measured", "n_tokens", "alpha_ratio", "stop_ratio", "quality_score")

  private[pipeline] val qualityScoreSql =
    raw"""WITH f AS (
          SELECT doc_id,
                 length(text) AS n_chars_measured,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
                 len(regexp_extract_all(text, '\S+')) AS n_tokens,
                 len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                     w -> w IN (${inList(graft.operators.TextStats.stopWords)}))) AS stop_tokens
          FROM documents
        ), r AS (
          SELECT doc_id, n_chars_measured, n_tokens,
                 CAST(alpha_chars AS DOUBLE) / n_chars_measured AS alpha_ratio,
                 CAST(stop_tokens AS DOUBLE) / n_tokens AS stop_ratio
          FROM f WHERE n_tokens > 0 AND n_chars_measured > 0
        )
        SELECT doc_id, n_chars_measured, n_tokens, alpha_ratio, stop_ratio,
               0.5 * alpha_ratio + 0.3 * (1.0 - stop_ratio)
                 + 0.2 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS quality_score
        FROM r ORDER BY doc_id"""

  /** Shingle window length (chars) and stride for the fingerprint. */
  val ShingleChars = 8
  val Stride = 4

  /** Document fingerprint: 60-bit hashes of strided 8-char shingles, keep
    * the min (winnowing-style content fingerprint — robust to local edits
    * outside the minimal shingle). One explode + codegen'd min aggregate.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= ShingleChars)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, length(text) - ${ShingleChars - 1}, $Stride)")).as("pos"),
        col("text"))
      .select(col("doc_id"),
        expr(Dedup.hash60(s"substring(text, pos, $ShingleChars)")).as("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"), min("h").as("fingerprint"))
      .orderBy("doc_id")

  private val fingerprintSql =
    s"""WITH w AS (
          SELECT doc_id,
                 unnest(range(1, length(text) - ${ShingleChars - 2}, $Stride)) AS pos,
                 text
          FROM documents WHERE length(text) >= $ShingleChars
        )
        SELECT doc_id, COUNT(*) AS n_windows,
               MIN(${Dedup.hash60Duck(s"substring(text, pos, $ShingleChars)")}) AS fingerprint
        FROM w GROUP BY doc_id ORDER BY doc_id"""

  /** Keywords per document. */
  val TfidfTopK = 5

  /** TF-IDF keyword extraction: top-[[TfidfTopK]] terms per document by
    * `tf · ln(N / df)`, ties broken by term. The corpus size N rides in as a
    * scalar subquery, so the plan is: one token explode → (doc, term) count →
    * a term-keyed aggregation for document frequency → join back on term.
    *
    * Scale: the df table is vocabulary-sized (≪ corpus; heavy-tail tokens
    * collapse at the map-side partial agg), so AQE broadcasts it at any
    * realistic vocabulary/corpus ratio and the only full shuffle is the
    * (doc, term) count the job needs anyway. The per-doc top-k window
    * repartitions by doc_id — bounded state, no global sort until the final
    * presentation ORDER BY.
    *
    * Determinism: tf and df are exact integers, but `ln` is NOT bit-stable
    * across engines (measured: ~3% of scores differ in the last ulp vs
    * DuckDB's libm), so the double score ORDERS the ranking — where a
    * sub-ulp difference cannot flip distinct (tf, df) pairs — and the
    * emitted columns are the exact integers (tf, doc_freq, rank) only.
    */
  def tfidfKeywords(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(count(lit(1)).as("n")).scalar()
    // materialized once: tf feeds BOTH the score join and the df aggregate,
    // and Catalyst does not share the subtree — without this the corpus is
    // tokenized and counted twice (visible as two Generate chains in the
    // plan), which at 100 TB is a second full scan
    val tf = graft.Scratch.materialize(
      docs
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf")),
      "graft_tfidf_tf")
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    tf.join(dfreq, "term")
      .withColumn("score",
        col("tf").cast("double") * log(nDocs.cast("double") / col("doc_freq")))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= TfidfTopK)
      .select("doc_id", "term", "tf", "doc_freq", "rank")
      .orderBy("doc_id", "rank")
  }

  private val tfidfKeywordsSql =
    s"""WITH tok AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ), dfreq AS (
          SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY 1
        ), scored AS (
          SELECT doc_id, term, tf, doc_freq,
                 CAST(tf AS DOUBLE)
                   * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / doc_freq)
                   AS score
          FROM tf JOIN dfreq USING (term)
        ), r AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rank
          FROM scored
        )
        SELECT doc_id, term, tf, doc_freq, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= $TfidfTopK ORDER BY doc_id, rank"""

  /** Count-min sketch geometry: [[CmsDepth]] independent hash rows ×
    * [[CmsWidth]] counters, probed for the exact top-[[CmsTopK]] words.
    */
  val CmsDepth = 4
  val CmsWidth = 256
  val CmsTopK = 20

  private def cmsBucket(iExpr: String, wExpr: String): String =
    s"pmod(${Dedup.hash60(s"concat(cast($iExpr AS string), ':', $wExpr)")}, $CmsWidth)"
  private def cmsBucketDuck(iExpr: String, wExpr: String): String =
    s"(${Dedup.hash60Duck(s"concat(CAST($iExpr AS VARCHAR), ':', $wExpr)")} % $CmsWidth)"

  /** Heavy hitters through a count-min sketch: every token stream update is
    * `+1` at ([[CmsDepth]] row, hash_row(word)) — the sketch is a fixed
    * depth×width counter grid whose merge is plain addition, so partial
    * aggregation and any shuffle order give the SAME grid (this is what
    * makes an approximate sketch exactly oracle-checkable: deterministic md5
    * row-hashes, commutative counters). Estimate = min over rows, compared
    * here against the exact counts of the true top-[[CmsTopK]] words.
    *
    * Scale: the grid is depth×width cells REGARDLESS of corpus size — the
    * state a 100 TB stream can afford when the exact (word → count) map
    * cannot; the depth-factor replication rides the vocabulary-sized word
    * counts (a [[CmsDepth]]-row broadcast, no extra shuffle), never the raw
    * token stream. CMS never undercounts (collisions only add), which
    * [[TextAnalysisSemanticsSpec]] pins alongside a planted heavy hitter.
    */
  /** The counter grid over a `word` column — batch OR streaming (the grid
    * is a plain commutative groupBy-count, so a streaming complete-mode run
    * converges to the batch grid exactly; CmsStreamSpec pins it). The batch
    * query below uses the vocabulary-count shortcut instead; this form is
    * the one an unbounded stream can run, because its state is the
    * depth×width grid, not the vocabulary.
    */
  def cmsGrid(words: DataFrame): DataFrame = {
    val rows = words.sparkSession.range(CmsDepth.toLong).toDF("i")
    words.crossJoin(rows)
      .select(col("i"), expr(cmsBucket("i", "word")).as("b"))
      .groupBy("i", "b").agg(count(lit(1)).as("cnt"))
  }

  def cmsHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
    // tokenize + count ONCE, then build the grid from the vocab-sized word
    // counts (sum-of-counts per bucket ≡ count-of-tokens per bucket): the
    // depth-factor replication touches vocabulary rows, never the corpus,
    // and the materialization stops Catalyst re-tokenizing for the top-k arm
    val wc = graft.Scratch.materialize(
      tok.groupBy("word").agg(count(lit(1)).as("true_count")), "graft_cms_wc")
    val rows = spark.range(CmsDepth.toLong).toDF("i")
    val counters = wc.crossJoin(rows)
      .select(col("i"), expr(cmsBucket("i", "word")).as("b"), col("true_count"))
      .groupBy("i", "b").agg(sum("true_count").cast("long").as("cnt"))
    val top = wc.orderBy(col("true_count").desc, col("word")).limit(CmsTopK)
    top.crossJoin(rows)
      .withColumn("b", expr(cmsBucket("i", "word")))
      .join(counters, Seq("i", "b"))
      .groupBy("word", "true_count")
      .agg(min("cnt").as("cms_estimate"))
      .orderBy(col("true_count").desc, col("word"))
  }

  private val cmsHeavyHittersSql =
    s"""WITH tok AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
          FROM documents
        ), rows AS (
          SELECT i FROM range(0, $CmsDepth) t(i)
        ), counters AS (
          SELECT i, ${cmsBucketDuck("i", "word")} AS b, COUNT(*) AS cnt
          FROM tok CROSS JOIN rows GROUP BY 1, 2
        ), top AS (
          SELECT word, COUNT(*) AS true_count FROM tok GROUP BY 1
          ORDER BY true_count DESC, word LIMIT $CmsTopK
        )
        SELECT word, true_count, MIN(cnt) AS cms_estimate
        FROM top CROSS JOIN rows
        JOIN counters USING (i) WHERE counters.b = ${cmsBucketDuck("i", "word")}
        GROUP BY word, true_count
        ORDER BY true_count DESC, word"""

  /** Posting-list preview length and emitted vocabulary head size. */
  val PostingsPreview = 8
  val IndexTopK = 50

  /** `text_inverted_index`: term → (document frequency, the first
    * [[PostingsPreview]] posting doc_ids as an ordered CSV) for the
    * [[IndexTopK]] highest-df terms — the core build step of a search/
    * retrieval index over the corpus.
    *
    * Shape: per-doc DISTINCT terms explode map-side (so a term counts once
    * per doc however often it repeats), then ONE shuffle on term builds df
    * and the posting preview together. Postings sort numerically before
    * joining, so both engines emit the identical string.
    *
    * Scale: posting lists are the textbook skew hazard — stopword terms
    * post in every document. Bounding the emitted list ([[PostingsPreview]])
    * keeps per-group state O(k) here; a full index at 100 TB shards each
    * term's postings by `(term, doc_id range)` so no reducer owns an entire
    * stopword list, and df still comes from this exact aggregate.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr(Dedup.tokenSet)).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"),
        expr(s"""array_join(transform(
                   slice(array_sort(collect_list(doc_id)), 1, $PostingsPreview),
                   x -> CAST(x AS STRING)), ',')""").as("postings"))
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(IndexTopK)

  private val invertedIndexSql =
    s"""WITH posting AS (
          SELECT doc_id, unnest(${Dedup.tokenSetDuck}) AS term FROM documents
        )
        SELECT term, COUNT(*) AS doc_freq,
               array_to_string(list_transform(
                 (list_sort(list(doc_id)))[1:$PostingsPreview],
                 x -> CAST(x AS VARCHAR)), ',') AS postings
        FROM posting GROUP BY 1
        ORDER BY doc_freq DESC, term LIMIT $IndexTopK"""

  /** Emitted head size for the bigram model. */
  val BigramTopK = 30

  /** `text_bigram_lm`: corpus bigram statistics — count, prefix-unigram
    * count, and the conditional probability P(w2|w1) — for the
    * [[BigramTopK]] most frequent bigrams. The estimation step of a
    * classical n-gram language model (and the co-occurrence table feature
    * pipelines mine for collocations).
    *
    * Shape: bigrams come from one map-side explode of
    * `arrays_zip(t, slice(t, 2, ...))` (the codegen'd gram pattern from
    * `text_repetition` — no interpreted lambdas on the per-token path);
    * ONE shuffle on (w1, w2) counts them; the prefix total rides a window
    * over the vocabulary²-bounded count table, never the token stream.
    * cond_p is a single division of exact longs, so the doubles match the
    * oracle bit-for-bit.
    */
  def bigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def f(k: String) = col("z").getField(k)
    val counts = Tables.documents(spark, sfDir)
      .select(expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("t"))
      .filter(expr("size(t) >= 2"))
      .select(explode(expr("arrays_zip(t, slice(t, 2, size(t)))")).as("z"))
      .select(f("t").as("w1"), f("1").as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_bigram"))
    counts
      .withColumn("n_prefix", sum("n_bigram").over(Window.partitionBy("w1")))
      .withColumn("cond_p", col("n_bigram").cast("double") / col("n_prefix"))
      .orderBy(col("n_bigram").desc, col("w1"), col("w2"))
      .limit(BigramTopK)
  }

  private val bigramLmSql =
    s"""WITH toks AS (
          SELECT regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
        ), pos AS (
          SELECT t, unnest(range(0, len(t) - 1)) AS i FROM toks WHERE len(t) >= 2
        ), counts AS (
          SELECT t[i + 1] AS w1, t[i + 2] AS w2, COUNT(*) AS n_bigram
          FROM pos GROUP BY 1, 2
        ), pref AS (
          SELECT w1, w2, n_bigram,
                 CAST(SUM(n_bigram) OVER (PARTITION BY w1) AS BIGINT) AS n_prefix
          FROM counts
        )
        SELECT w1, w2, n_bigram, n_prefix,
               CAST(n_bigram AS DOUBLE) / n_prefix AS cond_p
        FROM pref ORDER BY n_bigram DESC, w1, w2 LIMIT $BigramTopK"""

  /** BM25 parameters (the classic defaults k1=1.2, b=0.75) and the fixed
    * query. The derived constants appear as the LITERAL STRINGS "2.2e0"
    * (k1+1) and "0.25e0" (1−b) in both engines' expression text — never
    * computed at runtime, the [[operators.Graph.Damping]] discipline: both
    * parsers round the same decimal string to the same double, whereas
    * computed 1.2+1.0 need not equal parsed 2.2.
    */
  val Bm25QueryTerms: Seq[String] = Seq("dup", "vector", "scan", "key")
  val Bm25TopK = 25

  /** The per-(doc, term) BM25 contribution — ONE shared SQL string parsed
    * by both engines: Lucene-style non-negative idf
    * `ln(1 + (N − df + ½)/(df + ½))` (plain `ln((N−df+½)/(df+½))` goes
    * negative once df > N/2, which stopword-like terms here hit) times the
    * saturating tf normalization. Every constant is an E-NOTATION literal
    * (`0.5e0`) — both engines parse plain `0.5` as DECIMAL and would run
    * the idf argument through decimal division (scale-rounded, off the
    * IEEE grid by an ulp); e-notation is DOUBLE in both, so every
    * intermediate is one correctly-rounded double op, reproducible by the
    * spec's plain-Scala recomputation.
    */
  private val bm25TermScore =
    """ln(1.0e0 + (n_docs - doc_freq + 0.5e0) / (doc_freq + 0.5e0))
       * ((CAST(tf AS DOUBLE) * 2.2e0)
          / (CAST(tf AS DOUBLE)
             + 1.2e0 * (0.25e0 + 0.75e0 * (CAST(dl AS DOUBLE) / avgdl))))"""

  /** `text_bm25_topk`: the [[Bm25TopK]] documents ranking highest for the
    * fixed query [[Bm25QueryTerms]] under BM25(k1=1.2, b=0.75) — the
    * retrieval scorer a contamination/near-match audit runs against the
    * training corpus (and the lexical half of every hybrid search stack).
    *
    * Shape: the corpus is scanned ONCE into a materialized per-doc
    * projection (doc_id, dl, query-term hits) — the hits array is filtered
    * MAP-SIDE to query terms, so the exploded stream is O(query hits), not
    * O(tokens), and the same projection feeds the corpus stats (N, avgdl),
    * the per-term df (≤|q| rows, broadcast back), and the tf counts. The
    * per-doc score is a sorted fold over its ≤|q| term contributions
    * (pinned IEEE order, the pagerank discipline); the final top-k is
    * orderBy+limit — per-task k-row heaps (`TakeOrderedAndProject`), never
    * a global sort or single-partition window (the rank column is stamped
    * AFTER the limit, on k rows).
    *
    * Scale: corpus-sized work is one scan + one (doc, term) shuffle of
    * query HITS only; df and the (N, avgdl) stats are a ≤|q|-row and 1-row
    * broadcast. Docs with zero query hits drop at the explode — they score
    * 0 and cannot enter the top-k (all idf terms are non-negative by the
    * `1 +` form).
    *
    * Hash-compare discipline: the emitted columns are the exact integers
    * (rank, hit/term counts, dl) — the double score RANKS but is not
    * emitted, the `text_tfidf_keywords` precedent, because the engines' ln
    * disagree in the last ulp (measured: …584 vs …583 at sf0.01). The
    * cross-engine ranking still agrees: within one engine, docs with the
    * identical (tf profile, dl) compute the identical double and tie-break
    * on doc_id; docs with different profiles are separated by far more
    * than an ulp. The score double itself is verified in-JVM against an
    * independent scalar recomputation (TextAnalysisSemanticsSpec).
    */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    // materialized once: the tiny (doc_id, dl, hits) projection feeds the
    // stats aggregate AND the tf explode — without it the corpus text is
    // tokenized twice (the tfidf `tf` materialization lesson)
    val (tf, dfreq, stats) = bm25Inputs(graft.Scratch.materialize(
      bm25Projection(Tables.documents(spark, sfDir)), "graft_bm25_docs"))
    import org.apache.spark.sql.expressions.Window
    bm25ScoredOf(tf, dfreq, stats)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
      .withColumn("rank", // k-row window: the limit above already ran the heap
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("rank", "doc_id", "n_hit_terms", "tf_total", "dl")
      .orderBy("rank")
  }

  /** (doc_id, n_hit_terms, tf_total, dl, score): every query-hit document
    * BM25-scored. Factored out so the spec can check the double against an
    * independent recomputation before [[bm25TopK]] drops it.
    */
  private[pipeline] def bm25ScoredOf(tf: DataFrame, dfreq: DataFrame,
      stats: DataFrame): DataFrame =
    tf.join(dfreq, "term")
      .crossJoin(stats) // 1-row stats broadcast
      .select(col("doc_id"), col("dl"), col("tf"), expr(bm25TermScore).as("s"))
      .groupBy("doc_id", "dl")
      .agg(count(lit(1)).as("n_hit_terms"), sum("tf").as("tf_total"),
        expr("aggregate(array_sort(collect_list(s)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
          .as("score"))
      .select("doc_id", "n_hit_terms", "tf_total", "dl", "score")

  /** The map-only per-doc projection (doc_id, dl, query-term hits) — the
    * ONLY operator that reads corpus text on the BM25 path.
    */
  private[pipeline] def bm25Projection(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        expr(s"filter(t, w -> w IN (${inList(Bm25QueryTerms)}))").as("hits"))

  /** The [[bm25TopK]] inputs (tf, dfreq, stats) from a (materialized)
    * [[bm25Projection]] — shared by the query and the spec's independent
    * recomputation.
    */
  private[pipeline] def bm25Inputs(d: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val stats = d.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .select("n_docs", "avgdl")
    val tf = d.select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    (tf, dfreq, stats)
  }

  private val bm25TopKSql =
    s"""WITH d AS (
          SELECT doc_id, len(t) AS dl,
                 list_filter(t, w -> w IN (${inList(Bm25QueryTerms)})) AS hits
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
                FROM documents)
        ), stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avgdl
          FROM d
        ), tf AS (
          SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, dl, unnest(hits) AS term FROM d)
          GROUP BY 1, 2, 3
        ), dfreq AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM tf GROUP BY 1
        ), contrib AS (
          SELECT doc_id, dl, tf, $bm25TermScore AS s
          FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        ), scored AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
                 CAST(SUM(tf) AS BIGINT) AS tf_total, dl,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(s))),
                   (a, x) -> a + x) AS score
          FROM contrib GROUP BY doc_id, dl
        )
        SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
               doc_id, n_hit_terms, tf_total, dl
        FROM scored ORDER BY score DESC, doc_id LIMIT $Bm25TopK"""

  /** `text_quality_percentile`: the quantile-uniform transform of the
    * quality score — each document's score replaced by its corpus
    * percentile, the calibration every threshold-free consumer wants
    * ("keep the top 30 %" survives a re-scoring that shifts the raw scale;
    * a raw threshold does not). Rank via the shared [[histRankDesc]]
    * distributed cut (no global window); the percentile is ONE division of
    * exact integers. Scores are fixed-order small expressions, bit-equal
    * cross-engine, so the ordering needs no rank-emission hedge.
    */
  def qualityPercentile(spark: SparkSession, sfDir: String): DataFrame =
    // materialized once: histRankDesc consumes its input three times
    // (global stats, bucket counts, the final rank join), and without the
    // scratch table each reference re-ran the three-regex quality score
    // over the full corpus — r18 plan audit counted SIX document scans in
    // one query (the perplexity filter's `scored` stage discipline,
    // applied here; plans/r18/text_quality_percentile_{before,after}.txt)
    qualityPercentileOf(
      graft.Scratch.materialize(
        qualityScoreOf(Tables.documents(spark, sfDir))
          .select("doc_id", "quality_score"),
        "graft_qscore"))

  /** The percentile transform over an already-scored (doc_id,
    * quality_score) frame — factored out so the streaming ingest's
    * incremental readout ([[graft.streaming.CorpusIngest]]) runs the
    * IDENTICAL composed operator over its accumulated score state and
    * converges to this query bit-for-bit.
    */
  private[graft] def qualityPercentileOf(scored: DataFrame): DataFrame =
    histRankDesc(scored, "quality_score", PplHistBuckets)
      .select(col("rank"), col("doc_id"),
        expr("CAST(n_docs - rank AS DOUBLE) / n_docs").as("percentile"))
      .orderBy("rank")

  private val qualityPercentileSql =
    s"""WITH q AS ($qualityScoreSql), r AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
                   AS BIGINT) AS rank,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM q
        )
        SELECT rank, doc_id, CAST(n - rank AS DOUBLE) / n AS percentile
        FROM r ORDER BY rank"""

  /** Token budget for `corpus_token_budget` (the fixture corpus holds ~27k
    * tokens, so the cut is real).
    */
  val CurateTokenBudget = 20000L

  /** `corpus_token_budget`: "build the best B-token corpus" — the actual
    * curation cut a data order executes: rank every document by quality
    * (bit-stable fixed-order score), admit in rank order until the token
    * budget is spent, report per language what survived. The greedy
    * quality-first fill is the standard budgeted-curation policy; the
    * per-lang survival table is what gets reviewed before training.
    *
    * Scale shape: the running token total over the quality order is the
    * `parts_abc_classification` two-phase DISTRIBUTED prefix sum (range
    * partition by the total order, materialized once; pid-local running
    * sums; broadcast exclusive offsets) — no global window over the
    * corpus. Exact BIGINT token arithmetic; the admit test is an integer
    * comparison.
    */
  def tokenBudgetCurate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val parts = graft.Scratch.materialize(
      qualityScoreOf(docs).select("doc_id", "n_tokens", "quality_score")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .repartitionByRange(col("quality_score").desc, col("doc_id"))
        .withColumn("pid", spark_partition_id()),
      "graft_budget_parts")
    val localW = Window.partitionBy("pid")
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = parts.groupBy("pid").agg(sum("n_tokens").as("ptotal"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid")).agg(sum(col("b.ptotal")).as("prefix"))
    parts
      .withColumn("local_cum", sum("n_tokens").over(localW))
      .join(broadcast(offsets), "pid")
      .withColumn("cum", coalesce(col("prefix"), lit(0L)) + col("local_cum"))
      .withColumn("kept", col("cum") <= CurateTokenBudget)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .orderBy("lang")
  }

  private val tokenBudgetCurateSql =
    s"""WITH q AS ($qualityScoreSql), j AS (
          SELECT q.doc_id, q.n_tokens, q.quality_score, d.lang
          FROM q JOIN documents d ON d.doc_id = q.doc_id
        ), c AS (
          SELECT lang, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM j
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
               CAST(SUM(CASE WHEN cum <= $CurateTokenBudget THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN cum <= $CurateTokenBudget THEN n_tokens ELSE 0 END)
                 AS BIGINT) AS tokens_kept
        FROM c GROUP BY lang ORDER BY lang"""

  // ---- hybrid retrieval: reciprocal-rank fusion of BM25 and vector arms ----

  /** RRF constant (the classic k=60), emitted pool per arm, and fused cut. */
  val RrfK = 60
  val RrfTopK = 10

  /** The query embedding's id — vec 0 stands in for "the user query,
    * embedded" (the fixture has no text-to-vector model; in production this
    * row arrives from the encoder).
    */
  val HybridQueryVec = 0L

  /** `hybrid_rrf_fusion`: the modern retrieval stack's fusion step —
    * lexical candidates (the oracle-checked BM25 arm) and vector
    * candidates (brute cosine to the query embedding over the ALIGNED
    * doc_id = vec_id corpus) merged by reciprocal-rank fusion:
    * `rrf = Σ_arms 1/(k + rank)`, k = [[RrfK]] — the standard
    * score-free fusion that needs no cross-arm calibration, which is why
    * hybrid search engines default to it. A doc missing from one arm
    * contributes only its present term (the conventional treatment).
    *
    * Determinism: ranks are exact ints; each term is one IEEE division of
    * exact ints and the two-term sum has fixed order — the fused double is
    * bit-identical cross-engine (no transcendentals). Ties break by doc_id.
    *
    * Scale: each arm is its own proven path (BM25: query-term-filtered
    * token stream; vector: brute here, the LSH/IVF probe at corpus scale —
    * swap `similarity_probe_incremental`'s candidate stage in unchanged);
    * both end in TakeOrderedAndProject heaps, ranks ride k-row windows,
    * and the fusion join touches ≤ 2·pool rows.
    */
  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(spark, sfDir).select(col("rank").as("r_lex"), col("doc_id"))
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
    val q = e.filter(col("vec_id") === HybridQueryVec)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val vec = e.filter(col("vec_id") =!= HybridQueryVec)
      .crossJoin(broadcast(q)) // 1-row side
      .withColumn("cosine", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
      .orderBy(col("cosine").desc, col("vec_id")).limit(Bm25TopK)
      .withColumn("r_vec", row_number().over( // k-row window post-heap
        Window.orderBy(col("cosine").desc, col("vec_id"))).cast("int"))
      .select(col("vec_id").as("doc_id"), col("r_vec"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr(s"1.0e0 / ($RrfK + r_lex)"), lit(0.0)) +
          coalesce(expr(s"1.0e0 / ($RrfK + r_vec)"), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id")).limit(RrfTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .select("rank", "doc_id", "r_lex", "r_vec", "rrf")
      .orderBy("rank")
  }

  private def hybridRrfSql =
    s"""WITH lex AS (
          SELECT rank AS r_lex, doc_id FROM ($bm25TopKSql)
        ), e2 AS (
          SELECT vec_id, embedding AS v, ${Similarity.normDuck("embedding")} AS nrm
          FROM embeddings
        ), q AS (
          SELECT v AS qv, nrm AS qn FROM e2 WHERE vec_id = $HybridQueryVec
        ), vscored AS (
          SELECT vec_id AS doc_id,
                 ${Similarity.dotDuck("q.qv", "e2.v")} / (q.qn * e2.nrm) AS cosine
          FROM e2, q WHERE vec_id <> $HybridQueryVec
        ), vtop AS (
          SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT)
                   AS r_vec
          FROM vscored ORDER BY cosine DESC, doc_id LIMIT $Bm25TopK
        ), fused AS (
          SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
                 COALESCE(1.0e0 / ($RrfK + l.r_lex), 0.0e0)
                   + COALESCE(1.0e0 / ($RrfK + v.r_vec), 0.0e0) AS rrf
          FROM lex l FULL OUTER JOIN vtop v ON l.doc_id = v.doc_id
        )
        SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank,
               doc_id, r_lex, r_vec, rrf
        FROM fused ORDER BY rrf DESC, doc_id LIMIT $RrfTopK"""

  // ---- perplexity filtering under the corpus bigram LM ----

  /** `text_perplexity_filter` flags the top 1/[[PplFlagDenom]] of docs by
    * cross-entropy — a rank cut (exact integers), not a score threshold.
    */
  val PplFlagDenom = 100

  /** Per-bigram smoothed log-probability — ONE shared SQL string parsed by
    * both engines: add-½ smoothing over the corpus bigram table,
    * `ln((c(w1,w2) + ½) / (c(w1·) + ½·V))`, every constant in e-notation
    * (DOUBLE in both parsers, never DECIMAL).
    */
  private val bigramLogProb =
    """ln((CAST(n_bigram AS DOUBLE) + 0.5e0)
          / (CAST(n_prefix AS DOUBLE) + 0.5e0 * CAST(n_vocab AS DOUBLE)))"""

  /** `text_perplexity_filter`: per-doc cross-entropy under the corpus's own
    * add-½-smoothed bigram model — CCNet-style perplexity filtering, the
    * classic "does this read like the corpus?" quality gate (docs scoring
    * far above the corpus's entropy are boilerplate, tables, or noise).
    * Docs are RANKED by cross-entropy and the top 1/[[PplFlagDenom]] are
    * flagged; the emitted columns are the rank and exact integers, never
    * the raw score — the `text_bm25_topk` discipline, forced here by
    * measurement: the engines' `ln` disagree in the last ulp on ~1% of
    * corpus bigram arguments, so a raw-double emission hash-mismatches
    * even though every rank is identical (adjacent-doc CE gaps on the
    * fixture are ~4e-7, nine orders above ulp noise; byte-identical docs
    * tie exactly and break by doc_id).
    *
    * Determinism: each doc's log-likelihood is a sum of ln-doubles — order-
    * dependent — so the per-doc reduction is `sorted_sum` (multiset
    * collect, ascending fold; [[graft.functions.SortedSumAgg]]), mirrored
    * in DuckDB by the list_reduce-over-sorted-list fold. Contributions are
    * m·ln(p) with exact-integer m, one IEEE multiply per distinct bigram.
    *
    * Shape: ONE token-stream explode feeds both the corpus LM tables
    * (vocab²-bounded counts, vocab-bounded prefixes) and the per-doc
    * multiplicity table; the contribution join is (w1, w2)-keyed against
    * the count table (broadcastable at realistic vocabularies), then ONE
    * doc_id shuffle for the sorted fold.
    *
    * The rank (and thus the flag) is computed DISTRIBUTED via the
    * `events_value_quantiles_hist` discipline, not a global window: docs
    * are histogram-bucketed on ce ([[PplHistBuckets]] equi-width buckets,
    * descending), the bucket-count table ([[PplHistBuckets]] rows, corpus-
    * size-independent) yields each bucket's exact number of higher-ce
    * predecessors, and the within-bucket row_number window is PARTITIONED
    * BY bucket — so `rank = n_above(bucket) + rank_within_bucket` is the
    * exact global (ce DESC, doc_id) rank with no single-partition window
    * anywhere (pinned in PlanAssertionsSpec). Bucket assignment is a pure
    * per-row function of (ce, mn, mx), so the decomposition is exact under
    * any partitioning; equal ce always lands in one bucket and breaks by
    * doc_id inside it.
    */
  def perplexityFilter(spark: SparkSession, sfDir: String): DataFrame =
    perplexityFilterOf(Tables.documents(spark, sfDir), Some(s"$sfDir#ppl"))

  /** Histogram resolution for the distributed rank cut; the boundary-bucket
    * window sees ~N/[[PplHistBuckets]] rows, every other stage after the
    * doc-grain score table is bucket-count-sized.
    */
  val PplHistBuckets = 1024

  /** DataFrame core of [[perplexityFilter]] — fixture surface for the
    * hand-computed semantics spec. With `memoKey` (the sfDir-keyed query
    * path) the token-scale doc-bigram table and the doc-grain score table
    * are memoized per corpus per run; without it (fixture specs) they are
    * per-invocation materializations swept by the harness.
    */
  def perplexityFilterOf(docs: DataFrame, memoKey: Option[String] = None): DataFrame = {
    val toks = docs
      .select(col("doc_id"), expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("t"))
    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(countDistinct("w").as("n_vocab"))
    def f(k: String) = col("z").getField(k)
    val bigrams = toks.filter(expr("size(t) >= 2"))
      .select(col("doc_id"), explode(expr("arrays_zip(t, slice(t, 2, size(t)))")).as("z"))
      .select(col("doc_id"), f("t").as("w1"), f("1").as("w2"))
      .filter(col("w2").isNotNull)
    def stage(name: String)(df: => DataFrame): DataFrame = memoKey match {
      case Some(k) => graft.Scratch.memoize(docs.sparkSession, s"$k#$name")(df)
      case None    => graft.Scratch.materialize(df, s"graft_ppl_$name")
    }
    // the per-doc multiplicity table subsumes the corpus LM tables
    // (n_bigram = Σ_docs m, n_prefix = Σ_docs Σ_w2 m), so ONE materialized
    // aggregation of the token stream feeds all three consumers — without
    // it the explode re-runs per LM table (audited in PLANS.md)
    val docBi = stage("docbi")(
      bigrams.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m")))
    val counts = docBi.groupBy("w1", "w2").agg(sum("m").as("n_bigram"))
    val prefix = docBi.groupBy("w1").agg(sum("m").as("n_prefix"))
    // doc-grain score table, materialized once: three consumers below
    // (global stats, bucket counts, the final flag join) must not re-run
    // the contribution join + sorted fold per reference
    val scored = stage("scored")(docBi
      .join(counts, Seq("w1", "w2"))
      .join(prefix, "w1")
      .crossJoin(broadcast(vocab)) // 1-row side
      .select(col("doc_id"), col("m"),
        expr(s"CAST(m AS DOUBLE) * $bigramLogProb").as("c"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_bigrams"), count(lit(1)).as("n_distinct_bigrams"),
        expr("sorted_sum(c)").as("ll"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        expr("-ll / CAST(n_bigrams AS DOUBLE)").as("ce")))
    histRankDesc(scored, "ce", PplHistBuckets)
      .withColumn("flag_high_ppl",
        expr(s"rank <= (n_docs + ${PplFlagDenom - 1}) div $PplFlagDenom"))
      .select("rank", "doc_id", "n_bigrams", "n_distinct_bigrams", "flag_high_ppl")
      .orderBy("rank")
  }

  /** Exact global rank under (`score` DESC, doc_id ASC) — DISTRIBUTED via
    * the histogram-bucket decomposition (the `events_value_quantiles_hist`
    * discipline), never a single-partition window: docs are equi-width-
    * bucketed on the score (descending), the bucket-count table (≤`buckets`
    * rows, corpus-size-independent) yields each bucket's exact number of
    * higher-score predecessors via a bounded triangular join, and the
    * within-bucket `row_number` window is PARTITIONED BY bucket — so
    * `rank = n_above(bucket) + rank_within_bucket` is the exact global rank
    * under any partitioning (bucket assignment is a pure per-row function
    * of (score, mn, mx); equal scores land in one bucket and break by
    * doc_id inside it). Adds `rank` and `n_docs`, carries every input
    * column through. Shared by the perplexity and DSIR cuts; pinned
    * all-windows-partitioned in PlanAssertionsSpec.
    */
  private[pipeline] def histRankDesc(scored: DataFrame, score: String,
                                     buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = scored.agg(count(lit(1)).as("n_docs"),
      min(score).as("mn"), max(score).as("mx"))
    val bucketed = scored.crossJoin(broadcast(stats)) // 1-row side
      .withColumn("bucket", expr(
        s"""CAST(CASE WHEN mx = mn THEN 0
                 ELSE least(floor((mx - $score) / (mx - mn) * $buckets),
                            ${buckets - 1}) END AS BIGINT)"""))
    val bcnt = bucketed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val above = bcnt.select(col("bucket"))
      .join(bcnt.select(col("bucket").as("b2"), col("cnt").as("c2")),
        col("b2") < col("bucket"), "left")
      .groupBy("bucket").agg(sum(coalesce(col("c2"), lit(0L))).as("n_above"))
    bucketed
      .join(broadcast(above), "bucket")
      .withColumn("rank", col("n_above") + row_number().over(
        Window.partitionBy("bucket").orderBy(col(score).desc, col("doc_id"))).cast("long"))
      .drop("bucket", "n_above", "mn", "mx")
  }

  private val perplexityFilterSql =
    s"""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
        ), vocab AS (
          SELECT COUNT(DISTINCT w) AS n_vocab
          FROM (SELECT unnest(t) AS w FROM toks)
        ), bi AS (
          SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2
          FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS i
                FROM toks WHERE len(t) >= 2)
        ), counts AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bigram FROM bi GROUP BY 1, 2
        ), pref AS (
          SELECT w1, CAST(COUNT(*) AS BIGINT) AS n_prefix FROM bi GROUP BY 1
        ), docbi AS (
          SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS m FROM bi GROUP BY 1, 2, 3
        ), contrib AS (
          SELECT d.doc_id, d.m,
                 CAST(d.m AS DOUBLE) * $bigramLogProb AS c
          FROM docbi d
          JOIN counts USING (w1, w2)
          JOIN pref USING (w1)
          CROSS JOIN vocab
        ), scored AS (
          SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bigrams,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(c))),
                   (a, x) -> a + x) AS ll
          FROM contrib GROUP BY doc_id
        ), ranked AS (
          SELECT CAST(row_number() OVER (
                   ORDER BY -ll / CAST(n_bigrams AS DOUBLE) DESC, doc_id)
                 AS BIGINT) AS rank,
                 doc_id, n_bigrams, n_distinct_bigrams
          FROM scored
        )
        SELECT rank, doc_id, n_bigrams, n_distinct_bigrams,
               rank <= (CAST(COUNT(*) OVER () AS BIGINT) + ${PplFlagDenom - 1})
                         // $PplFlagDenom AS flag_high_ppl
        FROM ranked ORDER BY rank"""

  /** Checkpoint vocabulary sizes for [[vocabCoverage]] — log-spaced, the
    * budgets a tokenizer designer actually compares.
    */
  val VocabCheckpoints: Seq[Long] = Seq(1L, 2L, 5L, 10L, 20L, 50L, 100L, 1000L)

  /** `text_vocab_coverage`: the tokenizer-budget coverage curve — for each
    * checkpoint vocabulary size, the fraction of all token OCCURRENCES in
    * the corpus covered by the top-`vocab_size` most frequent token types
    * (ties to the lexicographically first token). The question a vocab
    * budget answers: "how large must the vocabulary be to cover 99 % of
    * the token stream" — the Heaps'-law companion every tokenizer design
    * doc opens with.
    *
    * Shape: ONE map-side-combined token aggregate is the only corpus-scale
    * shuffle; everything after runs on the TYPE-grain table. The running
    * occurrence total and the rank use the `parts_abc_classification`
    * two-phase distributed prefix sum — range-partition by the
    * (occurrences DESC, token) total order, materialize once so every
    * branch sees the same partition assignment, pid-local window sums,
    * then cluster-sized per-partition totals become broadcast exclusive
    * offsets. No window touches more than one partition's rows, so the
    * curve survives web-corpus vocabularies (10⁸ types) where a global
    * `row_number()` window would bottleneck one task.
    *
    * Determinism: occurrence counts and their cumulative are exact BIGINTs
    * pinned by the unique (occurrences DESC, token) total order; coverage
    * is ONE double division of two exact integers — bit-stable across
    * engines and partitionings.
    */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("occurrences"))
    val parts = graft.Scratch.materialize(
      counts.repartitionByRange(col("occurrences").desc, col("token"))
        .withColumn("pid", spark_partition_id()),
      "graft_vocab_cov")
    val order = Window.partitionBy("pid")
      .orderBy(col("occurrences").desc, col("token"))
    val localW = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = parts.groupBy("pid")
      .agg(sum("occurrences").as("ptotal"), count(lit(1)).as("pn"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(sum(col("b.ptotal")).as("occ_prefix"), sum(col("b.pn")).as("rank_prefix"))
    val grand = totals.agg(sum("ptotal").as("total_occurrences"))
    parts
      .withColumn("local_cum", sum("occurrences").over(localW))
      .withColumn("local_rank", row_number().over(order))
      .join(broadcast(offsets), Seq("pid"))
      .crossJoin(broadcast(grand))
      .withColumn("vocab_size",
        coalesce(col("rank_prefix"), lit(0L)) + col("local_rank"))
      .filter(col("vocab_size").isin(VocabCheckpoints: _*))
      .withColumn("cum_occurrences",
        coalesce(col("occ_prefix"), lit(0L)) + col("local_cum"))
      .withColumn("coverage",
        col("cum_occurrences").cast("double") / col("total_occurrences").cast("double"))
      .select(col("vocab_size"), col("token").as("boundary_token"),
        col("cum_occurrences"), col("total_occurrences"), col("coverage"))
      .orderBy("vocab_size")
  }

  private val vocabCoverageSql =
    s"""WITH tok AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
          FROM documents
        ), c AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences FROM tok GROUP BY 1
        ), r AS (
          SELECT token, occurrences,
                 ROW_NUMBER() OVER (ORDER BY occurrences DESC, token) AS vocab_size,
                 CAST(SUM(occurrences) OVER (ORDER BY occurrences DESC, token
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_occurrences,
                 CAST(SUM(occurrences) OVER () AS BIGINT) AS total_occurrences
          FROM c
        )
        SELECT vocab_size, token AS boundary_token, cum_occurrences,
               total_occurrences,
               CAST(cum_occurrences AS DOUBLE) / CAST(total_occurrences AS DOUBLE)
                 AS coverage
        FROM r WHERE vocab_size IN (${VocabCheckpoints.mkString(", ")})
        ORDER BY vocab_size"""

  /** `text_nfc_normalize`: Unicode canonical composition as a corpus
    * CLEANING step — the native [[graft.functions.NfcNormalize]]
    * expression (`nfc_normalize`, named for its DuckDB oracle twin)
    * applied to genuinely DECOMPOSED text. The ASCII corpus is the NFC
    * identity, so the fixture manufactures the real multilingual case in
    * pure SQL: a COMBINING ACUTE ACCENT (U+0301) after every Latin
    * letter of the document's first 48 chars. NFC then recomposes each
    * letter that has a precomposed form (á é ń ś ź ... — ancient,
    * version-stable codepoints) and leaves the rest decomposed (b́ d́ ...,
    * no precomposed form exists), so the composed LENGTH and the md5 of
    * the composed bytes pin the composition table, the combining-mark
    * handling, and the UTF-8 round-trip in both engines. A wrong or
    * missing composition (or an engine disagreeing on the exclusion set)
    * lands as a length/digest mismatch. Map-only until the final sort;
    * the expression's ASCII fast path returns the input untouched, which
    * is the 100 TB common case.
    */
  def nfcNormalizeDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        expr("regexp_replace(substring(text, 1, 48), '([A-Za-z])', '$1́')").as("dec"))
      .select(col("doc_id"),
        length(col("dec")).as("n_decomposed"),
        expr("length(nfc_normalize(dec))").as("n_composed"),
        expr("md5(cast(nfc_normalize(dec) as binary))").as("digest"))
      .orderBy("doc_id")

  private val nfcNormalizeSql =
    """WITH d AS (
         SELECT doc_id,
                regexp_replace(substring(text, 1, 48), '([A-Za-z])',
                               '\1' || chr(769), 'g') AS dec
         FROM documents WHERE length(text) >= 1
       )
       SELECT doc_id,
              CAST(length(dec) AS INT) AS n_decomposed,
              CAST(length(nfc_normalize(dec)) AS INT) AS n_composed,
              md5(nfc_normalize(dec)) AS digest
       FROM d ORDER BY doc_id"""

  /** Unicode script classes for [[scriptProfile]], as Java-and-RE2-common
    * codepoint ranges (`\x{...}` spans — `\u` escapes are Java-only, and
    * `\p{Script=...}` classes drift across Unicode versions between
    * engines; explicit ranges cannot). Each is (name, char-class body).
    */
  val ScriptClasses: Seq[(String, String)] = Seq(
    ("ascii_letter", "A-Za-z"),
    ("latin_ext", "\\x{00C0}-\\x{024F}"),
    ("greek", "\\x{0370}-\\x{03FF}"),
    ("cyrillic", "\\x{0400}-\\x{04FF}"),
    ("cjk", "\\x{4E00}-\\x{9FFF}"),
    ("digit", "0-9"))

  /** `text_script_profile`: per-doc Unicode-script mix — the signal a
    * multilingual pipeline routes on BEFORE n-gram language ID is
    * meaningful (lang-id profiles are per-script; a doc that is 40% CJK
    * bytes shouldn't be scored against Latin-alphabet profiles at all).
    * Counts per script class + the dominant class (ties break by the
    * fixed class order). The fixture plants non-Latin scripts by doc_id
    * formula (the corpus is ASCII): 'e'->'é' puts Latin-ext everywhere,
    * and a mod-3 cycle appends Cyrillic / Greek+CJK tails — so every
    * class is exercised and the oracle runs the IDENTICAL explicit-range
    * regexes (one more Java-vs-RE2 agreement pin, like the PII row).
    * Map-only: each count is one codegen'd regexp_replace + length.
    */
  def scriptProfile(spark: SparkSession, sfDir: String): DataFrame = {
    // Column API on purpose, twice over: Spark's `chr()` is byte-mod-256
    // (codepoints past 255 can't be built with it), and Spark SQL string
    // literals process backslash escapes (which would eat the `\x{...}`
    // regex spans). Scala literals + functions.* bypass both parsers.
    val planted = concat(expr("replace(text, 'e', chr(233))"),
      when(col("doc_id") % 3 === 1, lit(" \u041F\u0440\u0438\u0432"))
        .when(col("doc_id") % 3 === 2, lit(" \u03B1\u03B2\u4E2D\u6587"))
        .otherwise(lit("")))
    val counts = ScriptClasses.map { case (name, cls) =>
      length(regexp_replace(col("s"), s"[^$cls]", "")).cast("long").as(s"n_$name")
    }
    val dominant = ScriptClasses.map(_._1).foldRight(lit("none"): Column) {
      case (name, acc) =>
        when(col(s"n_$name") >= ScriptClasses.map(c => col(s"n_${c._1}"))
          .reduce((a, b) => greatest(a, b)) && col(s"n_$name") > 0, name)
          .otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .withColumn("s", planted)
      .select(col("doc_id") +: counts: _*)
      .withColumn("dominant", dominant)
      .orderBy("doc_id")
  }

  private val scriptProfileSql = {
    val counts = ScriptClasses.map { case (name, cls) =>
      s"CAST(length(regexp_replace(s, '[^$cls]', '', 'g')) AS BIGINT) AS n_$name"
    }.mkString(",\n                 ")
    // dominant: first class (in fixed order) whose count equals the max
    // and is > 0 — identical to the Spark fold
    val maxExpr = ScriptClasses.map(c => s"n_${c._1}").reduce((a, b) => s"greatest($a, $b)")
    val dominant = ScriptClasses.map(_._1).foldRight("'none'") { case (name, acc) =>
      s"CASE WHEN n_$name >= $maxExpr AND n_$name > 0 THEN '$name' ELSE $acc END"
    }
    s"""WITH p AS (
          SELECT doc_id,
                 replace(text, 'e', chr(233)) ||
                 CASE CAST(doc_id % 3 AS INT)
                   WHEN 1 THEN ' ' || chr(1055) || chr(1088) || chr(1080) || chr(1074)
                   WHEN 2 THEN ' ' || chr(945) || chr(946) || chr(20013) || chr(25991)
                   ELSE '' END AS s
          FROM documents
        ), c AS (
          SELECT doc_id, $counts FROM p
        )
        SELECT doc_id, n_ascii_letter, n_latin_ext, n_greek, n_cyrillic,
               n_cjk, n_digit, $dominant AS dominant
        FROM c ORDER BY doc_id"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_script_profile" -> (scriptProfile _),
    "text_nfc_normalize" -> (nfcNormalizeDocs _),
    "text_lang_id" -> (langId _),
    "text_langid_confusion" -> (langIdConfusion _),
    "text_inverted_index" -> (invertedIndex _),
    "text_bigram_lm" -> (bigramLm _),
    "text_token_counts" -> (tokenCounts _),
    "text_quality_score" -> (qualityScore _),
    "text_quality_percentile" -> (qualityPercentile _),
    "corpus_token_budget" -> (tokenBudgetCurate _),
    "text_fingerprint" -> (fingerprint _),
    "text_tfidf_keywords" -> (tfidfKeywords _),
    "text_heavy_hitters_cms" -> (cmsHeavyHitters _),
    "text_bm25_topk" -> (bm25TopK _),
    "hybrid_rrf_fusion" -> (hybridRrf _),
    "text_perplexity_filter" -> (perplexityFilter _),
    "text_vocab_coverage" -> (vocabCoverage _),
  )

  override def oracle: Map[String, String] = Map(
    "text_script_profile" -> scriptProfileSql,
    "text_nfc_normalize" -> nfcNormalizeSql,
    "text_lang_id" -> langIdSql,
    "text_langid_confusion" -> langIdConfusionSql,
    "text_inverted_index" -> invertedIndexSql,
    "text_bigram_lm" -> bigramLmSql,
    "text_token_counts" -> tokenCountsSql,
    "text_quality_score" -> qualityScoreSql,
    "text_quality_percentile" -> qualityPercentileSql,
    "corpus_token_budget" -> tokenBudgetCurateSql,
    "text_fingerprint" -> fingerprintSql,
    "text_tfidf_keywords" -> tfidfKeywordsSql,
    "text_heavy_hitters_cms" -> cmsHeavyHittersSql,
    "text_bm25_topk" -> bm25TopKSql,
    "hybrid_rrf_fusion" -> hybridRrfSql,
    "text_perplexity_filter" -> perplexityFilterSql,
    "text_vocab_coverage" -> vocabCoverageSql,
  )
}
