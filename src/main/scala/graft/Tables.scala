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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by default
    * (PARQUET_TYPE_ILLEGAL). Read it as raw nanos (session conf, declared at
    * construction in [[Sessions.local]]) and rebuild a microsecond
    * TimestampType column — truncation matches DuckDB's own ns→µs cast, so
    * oracle comparisons agree. A loader must not mutate session state, so a
    * foreign session without the conf fails fast with the fix spelled out
    * instead of being silently reconfigured mid-flight.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): build the session via graft.Sessions.local " +
        "(or set spark.sql.legacy.parquet.nanosAsLong=true at session construction)")
    val raw = table(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    // integral `div`, not `/`: double division would lose sub-µs precision
    // on 2024-epoch nanosecond longs (~1.7e18 > 2^53)
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
