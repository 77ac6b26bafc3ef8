package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Gopher REPETITION rules (Rae et al. 2021, §A1.2 / Table A1) — the
  * other half of the published Gopher filter next to `text_gopher_filter`
  * (§A1.1): a document is removed when too much of it repeats itself.
  * Thirteen signals, each with its published threshold:
  *
  *  - duplicate LINE fraction > 0.30 / duplicate PARAGRAPH fraction > 0.30
  *    (occurrences beyond the first, over total);
  *  - fraction of CHARACTERS in duplicate lines > 0.20 / in duplicate
  *    paragraphs > 0.20 (chars of every occurrence beyond the first);
  *  - characters in the heaviest {2,3,4}-gram > {0.20, 0.18, 0.16} of
  *    word chars (count × gram word-chars; the max over grams of that
  *    product, which resolves the published "most common n-gram"'s tie
  *    ambiguity deterministically);
  *  - characters COVERED by duplicated {5..10}-grams > {0.15, 0.14, 0.13,
  *    0.12, 0.11, 0.10} of word chars (position-coverage union, so
  *    overlapping duplicate grams never double-count a word).
  *
  * Every gate is an integer cross-multiplication (`10·dup ≤ 3·total`,
  * `100·mass ≤ 18·word_chars`, ...) over exact BIGINT counters — no ratio
  * doubles anywhere, so the verdict and all 19 emitted counters are
  * bit-stable across engines.
  *
  * The corpus is single-line (verified at all three SFs, min 10 words per
  * doc), so line/paragraph grain is exercised through the parity-page
  * pattern (`text_c4_filter`, `text_mojibake_repair`): BOTH engines
  * reflow the document's tokens into 8-word lines, append doc_id-keyed
  * duplicate lines (doc_id%3: lines 1 and 2 again — a whole duplicate
  * paragraph when the base line count is even; doc_id%5: line 1 again;
  * both plants are `slice`-bounded so sub-2-line documents degrade to
  * shorter plants identically in both engines, never a NULL element),
  * and pair consecutive lines into paragraphs. The planted repeats also
  * flow into the word stream, making the 5..10-gram coverage signals
  * non-trivial; the oracle recomputes everything independently with
  * DuckDB list lambdas (O(G²) comprehensions — fine at test scale),
  * while the Spark side stays linear: sorted-run aggregates for the
  * top-gram mass, sorted-adjacent dup sets + bounded-window coverage for
  * the dup-gram chars.
  *
  * Scale shape: map-only over the corpus scan — every metric is a
  * per-document array computation (O(L log L) sort + O(L·n) coverage per
  * doc), no explode, no shuffle except the output ORDER BY. The same
  * shape as the C4/entropy screens: at 100 TB this runs at scan speed.
  *
  * Cited reference behavior: q1_mapper.py:19-36 counts every word that
  * arrives; a corpus release must be able to drop the degenerate
  * repeating documents that would dominate those counts.
  */
object GopherRepetition extends QueryModule {

  /** Gate thresholds, numerator/denominator per signal (fraction ≤ n/d). */
  val DupLineFracMax = (3, 10) // 0.30
  val DupCharFracMax = (2, 10) // 0.20
  /** top-{2,3,4}-gram char-mass ceilings, in percent of word chars. */
  val TopGramPctMax = Map(2 -> 20, 3 -> 18, 4 -> 16)
  /** dup-{5..10}-gram coverage ceilings, in percent of word chars. */
  val DupGramPctMax = Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  /** Words per reflowed line / lines per paragraph (parity-page shape). */
  val WordsPerLine = 8
  val LinesPerPara = 2

  def gopherRepetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionOf(Tables.documents(spark, sfDir)).orderBy("doc_id")

  /** occurrences beyond the first, over an array column. */
  private def dupOcc(c: String): Column =
    expr(s"CAST(size($c) - size(array_distinct($c)) AS BIGINT)")

  /** chars of every occurrence beyond the first (sorted-adjacent scan). */
  private def dupChars(c: String): Column = expr(
    s"""aggregate(zip_with(array_sort($c), slice(array_sort($c), 2, size($c)),
          (a, b) -> IF(a = b, CAST(length(b) AS BIGINT), 0L)),
        0L, (acc, x) -> acc + coalesce(x, 0L))""")

  private def totalChars(c: String): Column =
    expr(s"aggregate($c, 0L, (a, x) -> a + length(x))")

  /** Sorted n-gram array over the word column `w` (guarded; empty when
    * the doc is shorter than n words).
    */
  private def sortedGrams(n: Int): String =
    s"""IF(size(w) < $n, CAST(array() AS ARRAY<STRING>),
        array_sort(transform(sequence(1, size(w) - ${n - 1}),
          i -> array_join(slice(w, i, $n), ' '))))"""

  /** Heaviest n-gram char mass: max over grams of count × word-chars
    * (gram word-chars = length - (n-1) separators). ONE linear pass over
    * the sorted gram array with a (prev, run, best) struct accumulator —
    * the run length grows one at a time, so taking the max of
    * run·chars at every step equals the max over full counts.
    */
  private def topGramMass(n: Int): Column = expr(
    s"""aggregate(${sortedGrams(n)},
          named_struct('prev', '', 'run', 0L, 'best', 0L),
          (s, g) -> named_struct(
            'prev', g,
            'run', IF(g = s.prev, s.run + 1L, 1L),
            'best', greatest(s.best,
              IF(g = s.prev, s.run + 1L, 1L) * CAST(length(g) - ${n - 1} AS BIGINT))),
          s -> s.best)""")

  /** Word chars covered by duplicated n-grams: the sorted-adjacent dup
    * set (O(G log G)), a per-position dup flag (O(G·D), D = distinct
    * duplicated grams — tiny in prose), then for each word position j a
    * bounded lookback over the ≤ n gram starts that could cover it.
    *
    * The sorted grams / dup set / dup flags are LET-BOUND as lambda
    * variables via single-element `transform` arrays — NOT intermediate
    * columns. A single-referenced column alias gets inlined by
    * CollapseProject, and an alias inlined into a lambda BODY re-evaluates
    * per element (measured: the column-chained form re-derived the dup
    * set per (j, i) pair — O(L·n·G·D) per doc per n, minutes at sf0.1);
    * a lambda variable is evaluated exactly once per row.
    */
  private def dupGramCoverage(n: Int): Column = expr(
    s"""IF(size(w) < $n, 0L,
        element_at(transform(
          array(array_sort(transform(sequence(1, size(w) - ${n - 1}),
                  i -> array_join(slice(w, i, $n), ' ')))),
          sg -> element_at(transform(
            array(array_distinct(filter(
                    zip_with(sg, slice(sg, 2, size(sg)),
                      (a, b) -> IF(a = b, b, CAST(NULL AS STRING))),
                    x -> x IS NOT NULL))),
            dg -> element_at(transform(
              array(transform(sequence(1, size(w) - ${n - 1}),
                      i -> array_contains(dg, array_join(slice(w, i, $n), ' ')))),
              da -> aggregate(
                transform(sequence(1, size(w)), j ->
                  IF(exists(sequence(greatest(1, j - ${n - 1}), least(j, size(w) - ${n - 1})),
                       i -> element_at(da, i)),
                     CAST(length(element_at(w, j)) AS BIGINT), 0L)),
                0L, (acc, x) -> acc + x)), 1)), 1)), 1))""")

  /** Unordered core over any (doc_id, text) frame — the testable form. */
  def repetitionOf(docs: DataFrame): DataFrame = {
    val df = docs
      .select(col("doc_id"), expr(Dedup.rawTokens).as("w0"))
      .withColumn("base", expr(
        s"""IF(size(w0) < 1, CAST(array() AS ARRAY<STRING>),
            transform(sequence(1, (size(w0) + ${WordsPerLine - 1}) DIV $WordsPerLine),
              i -> array_join(slice(w0, $WordsPerLine * (i - 1) + 1, $WordsPerLine), ' ')))"""))
      .withColumn("ll", expr(
        """concat(base,
             CASE WHEN doc_id % 3 = 0 THEN slice(base, 1, 2)
                  ELSE CAST(array() AS ARRAY<STRING>) END,
             CASE WHEN doc_id % 5 = 0 THEN slice(base, 1, 1)
                  ELSE CAST(array() AS ARRAY<STRING>) END)"""))
      .withColumn("paras", expr(
        s"""IF(size(ll) < 1, CAST(array() AS ARRAY<STRING>),
            transform(sequence(1, (size(ll) + ${LinesPerPara - 1}) DIV $LinesPerPara),
              j -> array_join(slice(ll, $LinesPerPara * (j - 1) + 1, $LinesPerPara), chr(10))))"""))
      .withColumn("w", split(expr("array_join(ll, ' ')"), " "))
    val gates =
      expr(s"10 * dup_line_occ <= ${DupLineFracMax._1} * n_lines") &&
        expr(s"10 * dup_line_chars <= ${DupCharFracMax._1} * line_chars") &&
        expr(s"10 * dup_para_occ <= ${DupLineFracMax._1} * n_paras") &&
        expr(s"10 * dup_para_chars <= ${DupCharFracMax._1} * para_chars") &&
        TopGramPctMax.toSeq.sorted.map { case (n, pct) =>
          expr(s"100 * top${n}_chars <= $pct * word_chars")
        }.reduce(_ && _) &&
        DupGramPctMax.toSeq.sorted.map { case (n, pct) =>
          expr(s"100 * dup${n}_chars <= $pct * word_chars")
        }.reduce(_ && _)
    df
      .withColumn("n_lines", size(col("ll")).cast("long"))
      .withColumn("dup_line_occ", dupOcc("ll"))
      .withColumn("dup_line_chars", dupChars("ll"))
      .withColumn("line_chars", totalChars("ll"))
      .withColumn("n_paras", size(col("paras")).cast("long"))
      .withColumn("dup_para_occ", dupOcc("paras"))
      .withColumn("dup_para_chars", dupChars("paras"))
      .withColumn("para_chars", totalChars("paras"))
      .withColumn("word_chars", totalChars("w"))
      .withColumn("top2_chars", topGramMass(2))
      .withColumn("top3_chars", topGramMass(3))
      .withColumn("top4_chars", topGramMass(4))
      .withColumn("dup5_chars", dupGramCoverage(5))
      .withColumn("dup6_chars", dupGramCoverage(6))
      .withColumn("dup7_chars", dupGramCoverage(7))
      .withColumn("dup8_chars", dupGramCoverage(8))
      .withColumn("dup9_chars", dupGramCoverage(9))
      .withColumn("dup10_chars", dupGramCoverage(10))
      .withColumn("keep", gates)
      .select("doc_id", "n_lines", "dup_line_occ", "dup_line_chars", "line_chars",
        "n_paras", "dup_para_occ", "dup_para_chars", "para_chars", "word_chars",
        "top2_chars", "top3_chars", "top4_chars",
        "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars", "dup9_chars",
        "dup10_chars", "keep")
  }

  // ---- DuckDB mirror (independent O(G²) list-comprehension recompute) ----

  private def topMassDuck(n: Int): String =
    s"""coalesce(list_max(list_transform(g$n, x ->
         len(list_filter(g$n, h -> h = x)) * (length(x) - ${n - 1}))), 0)"""

  private def dupCovDuck(n: Int): String =
    s"""coalesce(list_sum(list_transform(range(1, len(w) + 1), j ->
         CASE WHEN len(list_filter(range(greatest(1, j - ${n - 1}), least(j, len(w) - ${n - 1}) + 1),
                       i -> da$n[i])) > 0
              THEN length(w[j]) ELSE 0 END)), 0)"""

  private def gramsDuck(n: Int): String =
    s"""list_transform(range(1, len(w) - ${n - 2}),
         i -> array_to_string(w[i:i+${n - 1}], ' '))"""

  private def dupAtDuck(n: Int): String =
    s"list_transform(g$n, x -> len(list_filter(g$n, h -> h = x)) > 1)"

  private def dupCharsDuck(c: String): String =
    s"""coalesce(list_sum(list_transform(range(2, len(list_sort($c)) + 1), i ->
         CASE WHEN (list_sort($c))[i] = (list_sort($c))[i-1]
              THEN length((list_sort($c))[i]) ELSE 0 END)), 0)"""

  private def gopherRepetitionSql: String = {
    val ns = DupGramPctMax.keys.toSeq.sorted
    val gates = Seq(
      s"10 * (len(ll) - len(list_distinct(ll))) <= ${DupLineFracMax._1} * len(ll)",
      s"10 * ${dupCharsDuck("ll")} <= ${DupCharFracMax._1} * coalesce(list_sum(list_transform(ll, x -> length(x))), 0)",
      s"10 * (len(paras) - len(list_distinct(paras))) <= ${DupLineFracMax._1} * len(paras)",
      s"10 * ${dupCharsDuck("paras")} <= ${DupCharFracMax._1} * coalesce(list_sum(list_transform(paras, x -> length(x))), 0)") ++
      TopGramPctMax.toSeq.sorted.map { case (n, pct) =>
        s"100 * ${topMassDuck(n)} <= $pct * wc"
      } ++
      DupGramPctMax.toSeq.sorted.map { case (n, pct) =>
        s"100 * ${dupCovDuck(n)} <= $pct * wc"
      }
    s"""WITH d AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w0 FROM documents
        ), b AS (
          SELECT doc_id, list_transform(range(1, (len(w0) + ${WordsPerLine - 1}) // $WordsPerLine + 1),
                   i -> array_to_string(w0[$WordsPerLine*(i-1)+1 : least($WordsPerLine*i, len(w0))], ' ')) AS base
          FROM d
        ), pg AS (
          SELECT doc_id,
            base || (CASE WHEN doc_id % 3 = 0 THEN base[1:least(2, len(base))] ELSE CAST([] AS VARCHAR[]) END)
                 || (CASE WHEN doc_id % 5 = 0 THEN base[1:least(1, len(base))] ELSE CAST([] AS VARCHAR[]) END) AS ll
          FROM b
        ), m AS (
          SELECT doc_id, ll,
            list_transform(range(1, (len(ll) + ${LinesPerPara - 1}) // $LinesPerPara + 1),
              j -> array_to_string(ll[$LinesPerPara*(j-1)+1 : least($LinesPerPara*j, len(ll))], chr(10))) AS paras,
            string_split(array_to_string(ll, ' '), ' ') AS w
          FROM pg
        ), g AS (
          SELECT doc_id, ll, paras, w,
            coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS wc,
            ${(2 to 4).map(n => s"${gramsDuck(n)} AS g$n").mkString(",\n            ")},
            ${ns.map(n => s"${gramsDuck(n)} AS g$n").mkString(",\n            ")}
          FROM m
        ), da AS (
          SELECT *, ${ns.map(n => s"${dupAtDuck(n)} AS da$n").mkString(",\n            ")}
          FROM g
        )
        SELECT doc_id,
          CAST(len(ll) AS BIGINT) AS n_lines,
          CAST(len(ll) - len(list_distinct(ll)) AS BIGINT) AS dup_line_occ,
          CAST(${dupCharsDuck("ll")} AS BIGINT) AS dup_line_chars,
          CAST(coalesce(list_sum(list_transform(ll, x -> length(x))), 0) AS BIGINT) AS line_chars,
          CAST(len(paras) AS BIGINT) AS n_paras,
          CAST(len(paras) - len(list_distinct(paras)) AS BIGINT) AS dup_para_occ,
          CAST(${dupCharsDuck("paras")} AS BIGINT) AS dup_para_chars,
          CAST(coalesce(list_sum(list_transform(paras, x -> length(x))), 0) AS BIGINT) AS para_chars,
          CAST(wc AS BIGINT) AS word_chars,
          ${(2 to 4).map(n => s"CAST(${topMassDuck(n)} AS BIGINT) AS top${n}_chars").mkString(",\n          ")},
          ${ns.map(n => s"CAST(${dupCovDuck(n)} AS BIGINT) AS dup${n}_chars").mkString(",\n          ")},
          (${gates.mkString("\n           AND ")}) AS keep
        FROM da ORDER BY doc_id"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_gopher_repetition" -> (gopherRepetition _),
  )

  override def oracle: Map[String, String] = Map(
    "text_gopher_repetition" -> gopherRepetitionSql,
  )
}
