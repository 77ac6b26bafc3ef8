package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}

class CompactionSpec extends SparkSpec {

  test("compaction collapses a fragmented landing zone without changing content") {
    val frag = Files.createTempDirectory("graft_frag_spec").toString
    val out = Files.createTempDirectory("graft_compact_spec").toString
    Tables.supplier(spark, Sf0001).repartition(16)
      .write.mode("overwrite").parquet(frag)

    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    // empty partitions write no file, so ≤16 — fragmented is what matters
    assert(parquetFiles(frag) > 4)

    val compacted = Sources.compact(spark, frag, out) // supplier ≪ target ⇒ 1 file
    assert(parquetFiles(out) === 1)

    val before = spark.read.parquet(frag).collect().map(_.toSeq).toSet
    assert(compacted.collect().map(_.toSeq).toSet === before)

    // a target below the data size still rounds UP to multiple files
    val out2 = Files.createTempDirectory("graft_compact_spec2").toString
    Sources.compact(spark, frag, out2, targetBytes = 1024)
    assert(parquetFiles(out2) > 1)
  }

  test("compacting into the input directory is rejected, not destroyed") {
    val frag = Files.createTempDirectory("graft_frag_guard").toString
    Tables.supplier(spark, Sf0001).write.mode("overwrite").parquet(frag)
    val e = intercept[IllegalArgumentException] {
      Sources.compact(spark, frag, frag)
    }
    assert(e.getMessage.contains("input directory"))
  }
}
