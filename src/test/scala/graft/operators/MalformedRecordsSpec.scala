package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Defensive parsing (SURVEY §5: the reference skips malformed lines with a
  * stderr note, q1_reducer.py:44-47, and guards timestamp parses): the
  * engine's ingestion must degrade row-wise, not fail job-wise, under
  * corrupt input.
  */
class MalformedRecordsSpec extends SparkSpec {

  test("JSON scan isolates corrupt lines in _corrupt_record (PERMISSIVE)") {
    val dir = Files.createTempDirectory("graft_corrupt")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "v": 10.5}
        |{"id": 2 BROKEN
        |{"id": 3, "v": 2.5}
        |not json at all
        |{"id": 4, "v": null}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column cannot be queried alone without the cache
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 3) // ids 1, 3, 4 (null v is valid)
    assert(bad.count() === 2)
    assert(good.agg(sum("v")).collect().head.getDouble(0) === 13.0)
    df.unpersist()
  }

  test("DROPMALFORMED keeps only parseable rows, like the reference's skip-and-log") {
    val dir = Files.createTempDirectory("graft_dropmalformed")
    Files.writeString(dir.resolve("data.csv"),
      """id,v
        |1,10.5
        |oops,not_a_number
        |3,2.5
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val df = spark.read.schema(schema)
      .option("header", true).option("mode", "DROPMALFORMED")
      .csv(dir.toString)
    // collect, not count: a bare count() prunes every column, so no value is
    // ever parsed and no row can be judged malformed
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getDouble(1)).sum === 13.0)
  }
}
