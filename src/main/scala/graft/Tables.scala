package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query takes `(spark, sfDir)` and resolves tables through here, so the
  * scan is always a plain parquet read that Catalyst can push filters and
  * column pruning into. No caching at this layer: each query owns its plan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS) in others, so the loader normalizes
    * whatever physical type it finds to a session-TZ TimestampType column:
    *
    *  - native timestamp (µs, with or without UTC adjustment): cast — the
    *    session runs in UTC ([[Sessions.local]]) so NTZ→TZ is value-preserving;
    *  - nanos read as raw longs (requires the caller's session to set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, since Spark 4 otherwise
    *    rejects nanos parquet with PARQUET_TYPE_ILLEGAL): rebuild µs with
    *    integral `div` — double division would lose sub-µs precision on
    *    2024-epoch nanosecond longs (~1.7e18 > 2^53). Truncation matches
    *    DuckDB's own ns→µs cast, so oracle comparisons agree.
    *
    * Any other physical type fails fast with the observed schema in the
    * message rather than surfacing later as a scattered analysis error.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected timestamp, " +
          "timestamp_ntz, or long nanos via spark.sql.legacy.parquet.nanosAsLong)")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
