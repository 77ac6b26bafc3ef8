package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Scratch, Tables}

/** Distributed BPE tokenizer training over the `documents` corpus — the
  * statistic-gathering half of byte-pair encoding (Sennrich et al. 2016,
  * the algorithm behind GPT-2/SentencePiece-BPE vocabularies), built the
  * way production tokenizer trainers actually run at corpus scale:
  *
  *   1. The corpus collapses to a `(word, count)` table in ONE map-side-
  *      combined shuffle — the only stage that ever touches corpus-scale
  *      data (memoized; both queries and every merge round consume it).
  *   2. Words become symbol sequences (characters + an end-of-word marker,
  *      so merges can distinguish "er" mid-word from "er</w>" word-final —
  *      the standard BPE formulation).
  *   3. Each merge round counts adjacent symbol pairs WEIGHTED by word
  *      count (vocab-scale work, alphabet²-bounded output), picks the most
  *      frequent pair (ties broken lexicographically so the vocabulary is
  *      reproducible — a tokenizer retrain MUST emit the identical merge
  *      list or every downstream token id shifts), and rewrites the symbol
  *      sequences with a leftmost-nonoverlapping greedy fold (`aaaa` +
  *      merge (a,a) → `aa aa`, never the overlapping middle pair).
  *
  * Scale (100 TB): corpus bytes are read once; all iteration happens on the
  * word-TYPE table (Heaps' law: ~10⁶–10⁸ rows at web scale — executor-, not
  * corpus-sized), pair tables are symbol-alphabet² bounded, and the 1-row
  * merge winner is broadcast into the rewrite. This is exactly why BPE
  * trainers (HuggingFace tokenizers, SentencePiece) pre-aggregate to word
  * counts before merging — re-expressed as Spark relational ops.
  *
  * Determinism: every statistic is an exact BIGINT; the only strings are
  * symbol concatenations. The DuckDB twin unrolls the same fixed
  * [[BpeRounds]] chain (the `similarity_topk_ivf_trained` Lloyd-unroll
  * discipline), with the greedy rewrite as a `list_reduce` fold proven
  * element-identical to Spark's `aggregate` fold in BpeSpec.
  */
object BpeTokenizer extends QueryModule {

  /** Fixed merge rounds for `text_bpe_train` — fixed, not convergence-
    * tested, so plan depth and the oracle's unrolled CTE chain are bounded
    * and identical (the Lloyd-rounds discipline).
    */
  val BpeRounds = 3

  /** Top pairs emitted by `text_bpe_pairs`. */
  val PairTopK = 20

  /** End-of-word marker appended to every word's symbol sequence. Words are
    * `[a-z]+` runs, so `_` can never collide with a real symbol; merged
    * symbols are plain concatenations and stay collision-free too.
    */
  val Eow = "_"

  /** `(word, wc)` — the ONLY corpus-scale stage (one map-side-combined
    * aggregate), memoized per corpus. NOTE: intentionally the RAW token
    * stream (no stopword filter) — a tokenizer trains on everything,
    * unlike the q1 analytics family.
    */
  private def wordFreq(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#bpe#words") {
      Tables.documents(spark, sfDir)
        .select(explode(expr(Dedup.rawTokens)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wc"))
    }

  private val wordFreqSql =
    s"""SELECT word, COUNT(*) AS wc FROM (
          SELECT unnest(${Dedup.rawTokensDuck}) AS word FROM documents)
        GROUP BY word"""

  /** `(syms, wc)`: word types as symbol sequences (chars + [[Eow]]). */
  private def symWords(spark: SparkSession, sfDir: String): DataFrame =
    wordFreq(spark, sfDir)
      .select(expr(s"concat(split(word, ''), array('$Eow'))").as("syms"),
        col("wc"))

  private val symWordsSql =
    s"""SELECT list_append(string_split(word, ''), '$Eow') AS syms, wc
        FROM ($wordFreqSql)"""

  /** `(l, r, cnt)`: adjacent-pair counts over a symbol-sequence table,
    * weighted by word count — all positions count, so `aaa_` contributes
    * the (a,a) pair twice per occurrence (the BPE statistic).
    */
  private def pairCounts(words: DataFrame): DataFrame = {
    def f(k: String) = col("z").getField(k)
    words
      .select(explode(expr(
        "arrays_zip(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1))"))
        .as("z"), col("wc"))
      .select(f("0").as("l"), f("1").as("r"), col("wc"))
      .groupBy("l", "r").agg(sum("wc").as("cnt"))
  }

  /** DuckDB twin of [[pairCounts]] over CTE `from` (syms[:-2] is "all but
    * last" — DuckDB negative slice bounds are INCLUSIVE).
    */
  private def pairCountsSql(from: String): String =
    s"""SELECT p[1] AS l, p[2] AS r, CAST(SUM(wc) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_zip(syms[:-2], syms[2:])) AS p, wc FROM $from) z
        GROUP BY 1, 2"""

  /** The round's winner: max count, ties broken (l, r)-lexicographically. */
  private def bestPair(words: DataFrame): DataFrame =
    pairCounts(words).orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
      .withColumn("m", concat(col("l"), col("r")))

  private def bestPairSql(from: String): String =
    s"""SELECT l, r, l || r AS m, cnt FROM (${pairCountsSql(from)}) pc
        ORDER BY cnt DESC, l, r LIMIT 1"""

  /** Greedy leftmost-nonoverlapping rewrite: fold the sequence, merging the
    * current symbol into the accumulator's tail when (tail, current) is the
    * winning pair. The size-0 arm runs FIRST (CaseWhen arms are lazy;
    * `element_at(acc, -1)` on an empty array would throw under ANSI).
    * The 1-row winner is broadcast — no shuffle on the vocab side.
    */
  private def applyMerge(words: DataFrame, best: DataFrame): DataFrame =
    words.crossJoin(broadcast(
        best.select(col("l").as("ml"), col("r").as("mr"), col("m").as("mm"))))
      .select(expr(
        """aggregate(syms, CAST(array() AS ARRAY<STRING>),
             (acc, s) -> CASE
               WHEN size(acc) = 0 THEN array(s)
               WHEN element_at(acc, -1) = ml AND s = mr
                 THEN concat(slice(acc, 1, size(acc) - 1), array(mm))
               ELSE concat(acc, array(s)) END)""").as("syms"),
        col("wc"))

  /** DuckDB twin of [[applyMerge]]'s fold: same greedy semantics (the empty
    * guard is implicit — `acc[-1]` on an empty list is NULL, the AND goes
    * non-true, the ELSE appends).
    */
  private def applyMergeSql(wordsFrom: String, bestFrom: String): String =
    s"""SELECT list_reduce(list_prepend([]::VARCHAR[], list_transform(syms, s -> [s])),
             (acc, cur) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND cur[1] = b.r
                                THEN list_append(acc[:-2], b.m)
                                ELSE list_concat(acc, cur) END) AS syms, wc
        FROM $wordsFrom, ($bestFrom) b"""

  /** `text_bpe_pairs`: the round-0 merge candidates — top [[PairTopK]]
    * adjacent symbol pairs by weighted count. The table a tokenizer trainer
    * inspects before committing to a merge list.
    */
  def bpePairs(spark: SparkSession, sfDir: String): DataFrame =
    pairCounts(symWords(spark, sfDir))
      .orderBy(col("cnt").desc, col("l"), col("r"))
      .limit(PairTopK)
      .select(col("l").as("left_sym"), col("r").as("right_sym"),
        col("cnt").as("pair_count"))

  private val bpePairsSql =
    s"""WITH words0 AS ($symWordsSql)
        SELECT l AS left_sym, r AS right_sym, cnt AS pair_count
        FROM (${pairCountsSql("words0")}) pc
        ORDER BY pair_count DESC, left_sym, right_sym LIMIT $PairTopK"""

  /** Per-round (winner, rewritten vocab) chain, MEMOIZED per corpus per
    * run: `text_bpe_train` consumes the winners, `text_bpe_apply` the
    * rewritten vocab tables — each round's aggregation and fold run once
    * per run however many queries consume them (vocab-sized scratch).
    */
  private def rounds(spark: SparkSession,
                     sfDir: String): Seq[(DataFrame, DataFrame)] = {
    var words = symWords(spark, sfDir)
    (1 to BpeRounds).map { r =>
      val best = Scratch.memoize(spark, s"$sfDir#bpe#best$r")(bestPair(words))
      words = Scratch.memoize(spark, s"$sfDir#bpe#words$r")(applyMerge(words, best))
      (best, words)
    }
  }

  /** `text_bpe_train`: [[BpeRounds]] BPE merge rounds — one row per round
    * with the winning pair, the merged symbol, and its weighted count (the
    * head of the merge list a tokenizer ships).
    */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame =
    rounds(spark, sfDir).zipWithIndex.map { case ((best, _), i) =>
      best.select(lit(i + 1).as("round"), col("l").as("left_sym"),
        col("r").as("right_sym"), col("m").as("merged"),
        col("cnt").as("pair_count"))
    }.reduce(_ unionAll _).orderBy("round")

  /** `text_bpe_apply`: the APPLY half of the trainer — the corpus-level
    * compression curve after each merge round: word types, total symbol
    * occurrences (Σ count·|syms|, the "tokens the trainer pays for"),
    * distinct symbol types (base alphabet + one per merge), and the
    * compression ratio vs round 0. The go/no-go readout for a merge
    * budget: ratio flattening means further merges stop paying.
    * All counts exact BIGINTs over the vocab-grain tables; the ratio is
    * ONE double division of two exact integers.
    */
  def bpeApply(spark: SparkSession, sfDir: String): DataFrame = {
    val chain = symWords(spark, sfDir) +: rounds(spark, sfDir).map(_._2)
    val s0 = chain.head.agg(sum(expr("wc * size(syms)")).as("s0"))
    chain.zipWithIndex.map { case (w, r) =>
      w.agg(count(lit(1)).as("n_word_types"),
          sum(expr("wc * size(syms)")).as("n_symbols"))
        .crossJoin(w.select(explode(col("syms")).as("s"))
          .agg(countDistinct("s").as("n_symbol_types")))
        .crossJoin(broadcast(s0))
        .select(lit(r).as("round"), col("n_word_types"), col("n_symbols"),
          col("n_symbol_types"),
          expr("CAST(s0 AS DOUBLE) / CAST(n_symbols AS DOUBLE)").as("compression"))
    }.reduce(_ unionAll _).orderBy("round")
  }

  private val bpeApplySql = {
    val rounds = (1 to BpeRounds).map { r =>
      val best = s"best$r AS (${bestPairSql(s"words${r - 1}")})"
      s"$best,\n words$r AS (${applyMergeSql(s"words${r - 1}", s"SELECT * FROM best$r")})"
    }
    val sels = (0 to BpeRounds).map(r =>
      s"""SELECT $r AS round,
             CAST(COUNT(*) AS BIGINT) AS n_word_types,
             CAST(SUM(wc * len(syms)) AS BIGINT) AS n_symbols,
             (SELECT CAST(COUNT(DISTINCT s) AS BIGINT)
              FROM (SELECT unnest(syms) AS s FROM words$r) u) AS n_symbol_types,
             CAST((SELECT SUM(wc * len(syms)) FROM words0) AS DOUBLE)
               / CAST(SUM(wc * len(syms)) AS DOUBLE) AS compression
          FROM words$r""")
    s"""WITH words0 AS ($symWordsSql),
        ${rounds.mkString(",\n ")}
        ${sels.mkString(" UNION ALL ")}
        ORDER BY round"""
  }

  private val bpeTrainSql = {
    val rounds = (1 to BpeRounds).map { r =>
      val best = s"best$r AS (${bestPairSql(s"words${r - 1}")})"
      if (r < BpeRounds)
        s"$best,\n words$r AS (${applyMergeSql(s"words${r - 1}", s"SELECT * FROM best$r")})"
      else best
    }
    val outs = (1 to BpeRounds).map(r =>
      s"""SELECT $r AS round, l AS left_sym, r AS right_sym, m AS merged,
             cnt AS pair_count FROM best$r""")
    s"""WITH words0 AS ($symWordsSql),
        ${rounds.mkString(",\n ")}
        ${outs.mkString(" UNION ALL ")}
        ORDER BY round"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_pairs" -> (bpePairs _),
    "text_bpe_train" -> (bpeTrain _),
    "text_bpe_apply" -> (bpeApply _),
  )

  override def oracle: Map[String, String] = Map(
    "text_bpe_pairs" -> bpePairsSql,
    "text_bpe_train" -> bpeTrainSql,
    "text_bpe_apply" -> bpeApplySql,
  )
}
