package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", §A1.1) — the
  * published heuristic filter set most large-corpus builds start from,
  * next to C4's (`text_c4_filter`). Per document:
  *
  *  - word count in [[MinWords]]..[[MaxWords]];
  *  - mean word length in [3, 10] characters;
  *  - symbol-to-word ratio (`#` and `...`) at most 0.1;
  *  - at most 90% of lines starting with a bullet;
  *  - at most 30% of lines ending with an ellipsis;
  *  - at least 80% of words containing an alphabetic character;
  *  - at least 2 of the 8 required English function words present
  *    (the/be/to/of/and/that/have/with) — Gopher's cheap lang-id proxy.
  *
  * EVERY gate is evaluated as an INTEGER cross-multiplication
  * (`10 * symbols <= words`, `3 * words <= chars <= 10 * words`, ...) so
  * the keep decision is bit-stable across engines — no ratio doubles
  * anywhere. The operator emits the raw counters next to the decision:
  * a corpus release wants the signal distribution, not just the verdict.
  * Map-only, one scan, codegen-resident — the same 100 TB shape as the
  * C4/entropy screens.
  *
  * Cited reference behavior: q1_mapper.py:19-36 counts whatever words
  * arrive — a corpus engine must be able to say which documents are
  * prose at all before word statistics mean anything.
  */
object GopherFilter extends QueryModule {

  val MinWords = 50L
  val MaxWords = 100000L

  /** The 8 function words; >= [[MinRequiredStops]] must appear. */
  val RequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val MinRequiredStops = 2

  def gopherFilter(spark: SparkSession, sfDir: String): DataFrame =
    gopherOf(Tables.documents(spark, sfDir)).orderBy("doc_id")

  /** Unordered core over any (doc_id, text) frame — the testable form. */
  def gopherOf(docs: DataFrame): DataFrame = {
    val stops = RequiredStops.map(s => s"'$s'").mkString(", ")
    docs
      .select(col("doc_id"), col("text"))
      .withColumn("words", expr(raw"regexp_extract_all(text, '\\S+', 0)"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("word_chars", expr(
        "aggregate(words, 0L, (a, w) -> a + length(w))"))
      .withColumn("n_alpha_words", expr(
        "CAST(size(filter(words, w -> w rlike '[A-Za-z]')) AS BIGINT)"))
      .withColumn("n_symbols", expr(
        """CAST(length(text) - length(replace(text, '#', '')) +
           (length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)"""))
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_bullet_lines", expr(
        """CAST(size(filter(lines, l -> startswith(l, '- ')
             OR startswith(l, '* ') OR startswith(l, '•'))) AS BIGINT)"""))
      .withColumn("n_ellipsis_lines", expr(
        "CAST(size(filter(lines, l -> endswith(l, '...'))) AS BIGINT)"))
      .withColumn("n_required_stops", expr(
        s"""CAST(size(filter(array($stops),
              s -> array_contains(regexp_extract_all(lower(text), '[a-z]+', 0), s)))
            AS BIGINT)"""))
      .withColumn("keep",
        col("n_words").between(MinWords, MaxWords) &&
          expr("3 * n_words <= word_chars") &&
          expr("word_chars <= 10 * n_words") &&
          expr("10 * n_symbols <= n_words") &&
          expr("10 * n_bullet_lines <= 9 * n_lines") &&
          expr("10 * n_ellipsis_lines <= 3 * n_lines") &&
          expr("5 * n_alpha_words >= 4 * n_words") &&
          col("n_required_stops") >= MinRequiredStops)
      .select("doc_id", "n_words", "word_chars", "n_alpha_words",
        "n_symbols", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
        "n_required_stops", "keep")
  }

  private def gopherFilterSql = {
    val stops = RequiredStops.map(s => s"'$s'").mkString(", ")
    raw"""WITH w AS (
          SELECT doc_id, text,
                 regexp_extract_all(text, '\S+') AS words,
                 string_split(text, chr(10)) AS lines
          FROM documents
        ), c AS (
          SELECT doc_id,
                 CAST(len(words) AS BIGINT) AS n_words,
                 CAST(list_aggregate(list_prepend(0,
                   list_transform(words, x -> length(x))), 'sum') AS BIGINT)
                   AS word_chars,
                 CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
                   AS BIGINT) AS n_alpha_words,
                 CAST(length(text) - length(replace(text, '#', '')) +
                   (length(text) - length(replace(text, '...', ''))) // 3
                   AS BIGINT) AS n_symbols,
                 CAST(len(lines) AS BIGINT) AS n_lines,
                 CAST(len(list_filter(lines, l -> starts_with(l, '- ')
                   OR starts_with(l, '* ') OR starts_with(l, chr(8226))))
                   AS BIGINT) AS n_bullet_lines,
                 CAST(len(list_filter(lines, l -> ends_with(l, '...')))
                   AS BIGINT) AS n_ellipsis_lines,
                 CAST(len(list_filter([$stops],
                   s -> list_contains(regexp_extract_all(lower(text), '[a-z]+'), s)))
                   AS BIGINT) AS n_required_stops
          FROM w
        )
        SELECT doc_id, n_words, word_chars, n_alpha_words, n_symbols,
               n_lines, n_bullet_lines, n_ellipsis_lines, n_required_stops,
               (n_words BETWEEN $MinWords AND $MaxWords
                AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words
                AND 10 * n_symbols <= n_words
                AND 10 * n_bullet_lines <= 9 * n_lines
                AND 10 * n_ellipsis_lines <= 3 * n_lines
                AND 5 * n_alpha_words >= 4 * n_words
                AND n_required_stops >= $MinRequiredStops) AS keep
        FROM c ORDER BY doc_id"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_gopher_filter" -> (gopherFilter _),
  )

  override def oracle: Map[String, String] = Map(
    "text_gopher_filter" -> gopherFilterSql,
  )
}
