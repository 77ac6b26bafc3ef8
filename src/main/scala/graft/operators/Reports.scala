package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** K3/O3/P11: the reference's presentation surface — banded stdout reports
  * (q1_reducer.py:49-73, q2:211-232) via `df.show(n, truncate = false)`, and
  * the cache → part A → part B → unpersist reuse pattern
  * (q2_ecommerce_analysis.py:68,305).
  *
  * Runnable: `runMain graft.operators.Reports [sfDir]`. Presentation only —
  * every number it prints comes from queries that are DuckDB-verified
  * elsewhere; `show` collects only the displayed n rows (CollectLimit), so
  * the report path is safe at any input scale.
  */
object Reports {

  private def banner(title: String): Unit = {
    println("=" * 60)
    println(title)
    println("=" * 60)
  }

  /** Q1-style corpus report over a SHARED CACHED tokenization (P11): the
    * three aggregates reuse one materialized token set, like the reference's
    * cached cleaned DataFrame, then release it.
    */
  def corpusReport(spark: SparkSession, sfDir: String): Unit = {
    val tokens = TextStats.tokens(spark, sfDir).cache()
    try {
      banner("TOP 20 WORDS")
      tokens.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).show(20, truncate = false)
      banner("WORD LENGTH DISTRIBUTION")
      tokens.groupBy(length(col("word")).as("word_length")).count()
        .orderBy("word_length").show(30, truncate = false)
      banner("CORPUS STATISTICS")
      tokens.agg(count(lit(1)).as("total_words"),
        countDistinct("word").as("unique_words"),
        avg(length(col("word"))).as("avg_word_length")).show(truncate = false)
    } finally tokens.unpersist()
  }

  /** Q2-style customer report: `show` the head of the (verified) summary. */
  def customerReport(spark: SparkSession, sfDir: String): Unit = {
    banner("CUSTOMER SUMMARY (first 20)")
    Retail.customerSummary(spark, sfDir).show(20, truncate = false)
  }

  /** Release-gate report: the per-source dataset card (verified by
    * `corpus_dataset_card`) in the same banded-stdout style — the sheet a
    * curator reads before signing off a snapshot.
    */
  def datasetCardReport(spark: SparkSession, sfDir: String): Unit = {
    banner("DATASET RELEASE CARD (per source)")
    graft.pipeline.CorpusQc.datasetCard(spark, sfDir).show(25, truncate = false)
    banner("SPLIT ASSIGNMENT AFTER GOVERNANCE GATES")
    graft.pipeline.TrainPrep.decontaminatedSplit(spark, sfDir).show(30, truncate = false)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("4")
    corpusReport(spark, sfDir)
    customerReport(spark, sfDir)
    datasetCardReport(spark, sfDir)
    println("REPORT_DONE=true")
    spark.stop()
  }
}
