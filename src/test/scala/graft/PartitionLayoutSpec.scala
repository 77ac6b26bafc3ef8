package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned layout — the other half of the storage strategy
  * next to bucketing (BucketingSpec): a corpus written `partitionBy(split,
  * lang)` lets a split/lang-filtered read prune whole directories at
  * planning time, so "train only, en only" never touches val/test bytes.
  * At 100 TB this is the difference between scanning a shard and scanning
  * the lake; the split column comes from the deterministic hash split, so
  * the layout is stable under appends.
  */
class PartitionLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("partitionBy layout prunes non-matching partitions at the scan") {
    val out = Files.createTempDirectory("graft_partitioned").toString
    import graft.pipeline.TrainPrep
    Tables.documents(spark, sf)
      .withColumn("h",
        expr(s"${graft.pipeline.Dedup.hash60("CAST(doc_id AS STRING)")} % 100"))
      .withColumn("split",
        when(col("h") < TrainPrep.TrainPct, "train")
          .when(col("h") < TrainPrep.ValPct, "val")
          .otherwise("test"))
      .drop("h")
      .write.mode("overwrite").partitionBy("split", "lang").parquet(out)

    val read = spark.read.parquet(out)
      .filter(col("split") === "train" && col("lang") === "en")
      .select("doc_id", "text")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert("PartitionFilters: \\[[^\\]]*isnotnull\\(split".r.findFirstIn(plan).isDefined
      || plan.contains("split#") && plan.contains("= train"), plan)
    // partition columns never appear in the data read: pruning is structural
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty && reads.forall(r => !r.contains("split") && !r.contains("lang")), plan)

    // and the pruned read returns exactly the matching docs
    val expected = spark.read.parquet(out)
      .collect().count(r => r.getAs[String]("split") == "train" && r.getAs[String]("lang") == "en")
    assert(read.count() == expected && expected > 0)
  }
}
