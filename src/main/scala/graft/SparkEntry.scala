package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-category modules (one per
  * SURVEY.md §2 family). COVERAGE.md maps inventory rows → query names.
  */
object SparkEntry {

  /** All query modules. Order only affects registry listing, not semantics. */
  def modules: Seq[QueryModule] = Seq(
    operators.Retail,
    operators.TextStats,
    operators.Nested,
    operators.Sources,
    operators.Events,
    operators.AsOfJoin,
    operators.RangeJoin,
    operators.BloomJoin,
    operators.SkewJoin,
    operators.FuzzyJoin,
    operators.Graph,
    operators.History,
    operators.Layout,
    operators.Profiling,
    operators.Warc,
    operators.Tar,
    operators.Zip,
    operators.ZstdCorpus,
    operators.Lz4Corpus,
    operators.Jsonl,
    operators.Pdf,
    operators.ParquetMeta,
    operators.Sketches,
    pipeline.Dedup,
    pipeline.SimilaritySearch,
    pipeline.PqSearch,
    pipeline.Whitening,
    pipeline.Multimodal,
    pipeline.Exif,
    pipeline.TextAnalysis,
    pipeline.HtmlExtract,
    pipeline.RobotsTxt,
    pipeline.Sitemaps,
    pipeline.MainContent,
    pipeline.Cleaning,
    pipeline.GopherFilter,
    pipeline.GopherRepetition,
    pipeline.CodeQuality,
    pipeline.TextClassifier,
    pipeline.LuhnPii,
    pipeline.BpeTokenizer,
    pipeline.TrainPrep,
    pipeline.CorpusQc,
    pipeline.CurationPipeline,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Per-customer order summary with favorite part — SURVEY.md §7.2 slice 0.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Retail.customerSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
