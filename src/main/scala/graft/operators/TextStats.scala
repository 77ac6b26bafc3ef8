package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Q1 capability family: MapReduce-style text statistics over documents.text.
  *
  * The reference runs one Hadoop Streaming job multiplexing three aggregations
  * through prefixed keys (q1_mapper.py:29-36, q1_reducer.py:33-43). Spark-first
  * restatement: one tokenized DataFrame, three declarative groupBy plans — the
  * shuffle-by-prefixed-key trick is exactly what Catalyst's partial+final
  * HashAggregate already does, with map-side combine for free.
  *
  * Scale: tokenization is a per-row generator (explode) — embarrassingly
  * parallel, no shuffle until the aggregation; per-word state is bounded by
  * vocabulary, not corpus size, so a 100 TB corpus aggregates fine as long as
  * shuffle partitions scale with the vocab.
  */
object TextStats extends QueryModule {

  /** Reference stop words: q1_mapper.py:11. */
  val stopWords: Seq[String] = Seq("the", "is", "an", "a", "are")
  private val stopWordsSql = stopWords.map(w => s"'$w'").mkString(", ")

  /** Tokenize per the reference (q1_mapper.py:19-27): lowercase, [a-z]+ runs,
    * stop words removed. Keeps everything in built-in, codegen'd expressions.
    */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .filter(!col("word").isin(stopWords: _*))

  private val tokensSql =
    s"""SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents"""

  /** A8 + O2: top-20 words by frequency (q1_reducer.py:55-57), with a word
    * tie-break so the cut line is deterministic.
    */
  def wordCountTop20(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  private val wordCountTop20Sql =
    s"""WITH tok AS ($tokensSql)
        SELECT word, COUNT(*) AS n FROM tok
        WHERE word NOT IN ($stopWordsSql)
        GROUP BY word ORDER BY n DESC, word LIMIT 20"""

  /** A9: word-length histogram (q1_mapper.py:32-33, q1_reducer.py:37-40). */
  def lengthHistogram(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir)
      .groupBy(length(col("word")).as("word_length"))
      .agg(count(lit(1)).as("n"))
      .orderBy("word_length")

  private val lengthHistogramSql =
    s"""WITH tok AS ($tokensSql)
        SELECT CAST(length(word) AS INT) AS word_length, COUNT(*) AS n
        FROM tok WHERE word NOT IN ($stopWordsSql)
        GROUP BY 1 ORDER BY 1"""

  /** A10: corpus totals — total words, unique words, average word length
    * (q1_reducer.py:67-72; avg as exact-int sum / count, both engines divide
    * the same deterministic operands).
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir).agg(
      count(lit(1)).as("total_words"),
      countDistinct("word").as("unique_words"),
      (sum(length(col("word")).cast("long")).cast("double") / count(lit(1)))
        .as("avg_word_length"))

  private val corpusStatsSql =
    s"""WITH tok AS ($tokensSql)
        SELECT COUNT(*) AS total_words,
               COUNT(DISTINCT word) AS unique_words,
               CAST(SUM(CAST(length(word) AS BIGINT)) AS DOUBLE) / COUNT(*)
                 AS avg_word_length
        FROM tok WHERE word NOT IN ($stopWordsSql)"""

  /** CUBE over (lang, source): corpus totals at all four grouping levels in
    * one pass, grouping_id distinguishing them. Spark expands the cube with
    * `Expand` before a single partial+final aggregate — one shuffle of
    * (4 × groups) rows, not four jobs. Sort order pins NULLS FIRST
    * explicitly: DuckDB defaults ASC NULLS LAST, Spark NULLS FIRST.
    */
  def cubeStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .cube("lang", "source")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy(col("gid"), col("lang").asc_nulls_first, col("source").asc_nulls_first)

  private val cubeStatsSql =
    """SELECT lang, source, CAST(GROUPING(lang, source) AS BIGINT) AS gid,
              COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       FROM documents GROUP BY CUBE (lang, source)
       ORDER BY gid, lang NULLS FIRST, source NULLS FIRST"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_wordcount_top20" -> (wordCountTop20 _),
    "q1_length_histogram" -> (lengthHistogram _),
    "q1_corpus_stats" -> (corpusStats _),
    "docs_cube_stats" -> (cubeStats _),
  )

  override def oracle: Map[String, String] = Map(
    "q1_wordcount_top20" -> wordCountTop20Sql,
    "q1_length_histogram" -> lengthHistogramSql,
    "q1_corpus_stats" -> corpusStatsSql,
    "docs_cube_stats" -> cubeStatsSql,
  )
}
