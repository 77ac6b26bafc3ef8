package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Footer-stats reader against files Spark itself wrote — including a
  * multi-row-group file (tiny block size), where the reader must sum row
  * counts and fold min/max ACROSS groups, not read just the first.
  */
class ParquetMetaSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.session

  test("footerStats: rows, row groups, and min/max come from footers and match the data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_spec").toString
    val df = (0L until 50000L).map(i => (i, s"payload_$i")).toDF("id", "payload")
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024) // force several row groups
      .parquet(dir)
    val stats = ParquetMeta.footerStats(spark, dir, "id").collect()
    assert(stats.map(_.getLong(1)).sum == 50000L)
    assert(stats.exists(_.getInt(2) > 1), "tiny block size must yield >1 row group")
    assert(stats.map(_.getLong(3)).min == 0L)
    assert(stats.map(_.getLong(4)).max == 49999L)
  }

  test("footerStringStats: string min/max + null counts fold across row groups and match data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_str_spec").toString
    val langs = Array("de", "en", "fr", "ja", "und")
    val df = (0L until 50000L)
      .map(i => (i, langs((i % 5).toInt),
        if (i % 3 == 0) null else langs((i % 5).toInt)))
      .toDF("id", "lang", "maybe")
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024) // several row groups
      .parquet(dir)
    val stats = ParquetMeta.footerStringStats(spark, dir, "lang", "maybe").collect()
    assert(stats.map(_.getLong(1)).sum == 50000L)
    assert(stats.map(_.getLong(2)).sum == (0L until 50000L).count(_ % 3 == 0))
    assert(stats.map(_.getString(3)).min == "de")
    assert(stats.map(_.getString(4)).max == "und")
  }

  test("footerStringStats: long strings reject as possibly-truncated, never answer with bounds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_trunc").toString
    val long = "x" * (ParquetMeta.StatsExactCap + 20)
    Seq((1L, long, "en"), (2L, long + "y", "de"))
      .toDF("id", "text", "lang").write.mode("overwrite").parquet(dir)
    val e = intercept[org.apache.spark.SparkException] {
      ParquetMeta.footerStringStats(spark, dir, "text", "lang").collect()
    }
    assert(e.getMessage.contains("truncated") || e.getCause != null)
    // the short column still answers exactly from the same footers
    // (rows may land in several files — fold like the production query)
    val ok = ParquetMeta.footerStringStats(spark, dir, "lang", "lang").collect()
    assert(ok.map(_.getString(3)).min == "de" && ok.map(_.getString(4)).max == "en" &&
      ok.map(_.getLong(2)).sum == 0L)
  }

  test("footerStats: a stats column the footer does not carry rejects loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_missing").toString
    Seq((1L, "x")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    val e = intercept[org.apache.spark.SparkException] {
      ParquetMeta.footerStats(spark, dir, "nope").collect()
    }
    assert(e.getMessage != null)
    // min stayed at the sentinel because the column never matched
    val ok = ParquetMeta.footerStats(spark, dir, "id").collect()
    assert(ok.head.getLong(3) == 1L && ok.head.getLong(4) == 1L)
  }
}
