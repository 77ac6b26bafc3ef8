package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing — the pre-shuffle strategy the 100 TB
  * design leans on for repeated fact⋈fact joins: both tables bucketed by
  * the join key into the same bucket count join WITHOUT a shuffle exchange
  * on either side.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-key tables join with no shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucketed").toString
    def writeBucketed(table: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite")
        .option("path", s"$wh/$table")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(table)
    writeBucketed("b_orders",
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"))
    writeBucketed("b_lines",
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice")))
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: at this fixture scale the join would
      // auto-broadcast, which also avoids a shuffle but proves nothing
      // about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "o_orderkey")
        .groupBy("o_custkey").agg(sum("l_extendedprice").as("s"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not re-shuffle either bucketed side
      assert(plan.contains("SortMergeJoin"))
      val exchangesBeforeAgg = "Exchange hashpartitioning\\(o_orderkey".r
        .findAllIn(plan).size
      assert(exchangesBeforeAgg === 0, s"join re-shuffled a bucketed side:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
