package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Runnable Q4 lifecycle demo (T8/K4): feeds the `events` table through a
  * watched directory as arriving JSON files, runs the reference's three
  * concurrent streaming queries against it, drains them, prints the streamed
  * per-key result, and shuts everything down via `spark.streams.active`.
  *
  * `runMain graft.streaming.SensorStreamDemo [sfDir]` — prints
  * `DEMO_ACTIVE=<n>` while running and `DEMO_OK=true` when the streamed
  * per-key counts equal the batch twin's.
  */
object SensorStreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("4")

    val dir = Files.createTempDirectory("graft_stream").toString
    def feed(filter: String): Unit =
      Tables.events(spark, sfDir).filter(filter)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .write.mode("append").json(dir)

    // first tranche of files, then start the three queries (micro-batch 0)
    feed("event_id % 2 = 0")
    val queries = SensorStreams.startAll(spark, dir, triggerInterval = "1 second")
    queries.foreach(_.processAllAvailable())
    println(s"DEMO_ACTIVE=${spark.streams.active.length}")

    // second tranche arrives while the queries run (incremental micro-batch)
    feed("event_id % 2 = 1")
    queries.foreach(_.processAllAvailable())

    // streamed per-key counts must equal the batch twin over the same rows
    // (ts was truncated to seconds on the way to JSON, so rebuild the twin
    // from the same truncated frame rather than the raw table). The memory
    // sink accumulates one row per update in update mode — the final count
    // per key is the max, counts being monotone.
    val streamed = spark.sql(
      "SELECT event_type, max(n_events) AS n_events FROM sensor_per_key GROUP BY event_type ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = graft.operators.Events.perKeyStats(
        Tables.events(spark, sfDir)
          .withColumn("ts", to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    println(s"DEMO_OK=${streamed == batch}")

    SensorStreams.stopAll(spark)
    println(s"DEMO_STOPPED=${spark.streams.active.isEmpty}")

    // production tail of the pipeline: enrich the same stream against the
    // static user dim and land it exactly-once in parquet via foreachBatch
    val out = graft.Scratch.dir("graft_demo_out")
    val ckpt = graft.Scratch.dir("graft_demo_ckpt")
    val enriched = SensorStreams.enriched(
      SensorStreams.parsed(SensorStreams.fileSource(spark, dir)),
      graft.operators.Events.userDim(spark, sfDir))
    val durable = SensorStreams.startDurable(enriched, out, ckpt, "1 second")
    durable.processAllAvailable()
    durable.stop()
    val landed = spark.read.parquet(out).count()
    val expected = graft.operators.Events.enrichedQ(spark, sfDir).count()
    println(s"DEMO_DURABLE_OK=${landed == expected}")
    spark.stop()
  }
}
