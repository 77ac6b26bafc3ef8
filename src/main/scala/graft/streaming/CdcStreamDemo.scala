package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Tables

/** Runnable CDC-apply demo: replays the `orders_cdc_upsert` fixture split
  * as a STREAM — the state side (o_orderkey % 10 ≠ 0) seeds the versioned
  * state table, the change batch (% 7 = 0, op D on % 49 = 0 else U with
  * rewritten priority) arrives as JSON files in two key-disjoint tranches —
  * and checks the final state against the oracle-checked batch query.
  *
  * `runMain graft.streaming.CdcStreamDemo [sfDir]` — prints
  * `CDC_VERSIONS=<n>` and `CDC_OK=true` on convergence.
  */
object CdcStreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("4")

    val inDir = Files.createTempDirectory("graft_cdc_in").toString
    val stateDir = Files.createTempDirectory("graft_cdc_state").toString
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString

    val all = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
      col("o_orderpriority"))
    CdcStream.init(all.filter(col("o_orderkey") % 10 =!= 0), stateDir)

    val batch = all.filter(col("o_orderkey") % 7 === 0)
      .withColumn("op", when(col("o_orderkey") % 49 === 0, "D").otherwise("U"))
      .withColumn("o_orderpriority",
        when(col("op") === "U", concat(lit("UPD-"), col("o_orderpriority")))
          .otherwise(col("o_orderpriority")))
    // two key-disjoint tranches: disjoint keys make sequential merges
    // compose to the single batch merge
    batch.filter(col("o_orderkey") % 2 === 0).write.mode("append").json(inDir)
    val changeStream = spark.readStream.schema(batch.schema).json(inDir)
    val q = CdcStream.start(changeStream, stateDir, ckpt, "o_orderkey")
    q.processAllAvailable()
    batch.filter(col("o_orderkey") % 2 =!= 0).write.mode("append").json(inDir)
    q.processAllAvailable()
    q.stop()
    println(s"CDC_VERSIONS=${CdcStream.latestVersion(spark, stateDir)}")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val ok = rows(CdcStream.latestState(spark, stateDir)) ==
      rows(graft.operators.History.cdcUpsert(spark, sfDir))
    println(s"CDC_OK=$ok")
    spark.stop()
  }
}
