package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order semantics: the generated interleave matches an independent
  * implementation bit-for-bit and is bijective on the grid; and the point
  * of the layout — a 2-D box query overlaps strictly fewer contiguous
  * key-range chunks under a z-order sort than under a leading-column sort.
  * Range partitions stand in for files here: each covers a contiguous
  * range of the sort key, exactly the min/max ranges parquet footers carry
  * per file after a sorted write.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long =
    (0 until Layout.Bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("morton key matches an independent implementation and is bijective") {
    val cells = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = cells.toDF("x", "y")
      .withColumn("z", expr(Layout.mortonSpark("x", "y")).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cells.foreach { case (x, y) => assert(got((x, y)) == mortonRef(x, y), s"($x,$y)") }
    assert(got.values.toSet.size == cells.size)
  }

  test("a thin y-band box query overlaps fewer chunks under z-order than under x-sort") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", expr(Layout.mortonSpark("x", "y")).cast("bigint"))
    val chunks = 16
    def overlapping(sortCol: String): Long =
      grid.repartitionByRange(chunks, col(sortCol))
        .groupBy(spark_partition_id().as("pid"))
        .agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymax") >= 10 && col("ymin") <= 13) // box: all x, y in [10, 13]
        .count()
    val underX = overlapping("x")
    val underZ = overlapping("z")
    assert(underX == chunks.toLong,
      "an x-sorted layout cannot prune a y predicate: every chunk spans all y")
    assert(underZ < underX, s"z-order must prune: $underZ vs $underX")
    assert(underZ <= chunks / 2, s"expected meaningful locality, got $underZ/$chunks")
  }
}
