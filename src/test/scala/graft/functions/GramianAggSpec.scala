package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[GramianAgg]] against a hand-computed Gramian, plus the partitioning
  * invariance that justifies calling the sums order-independent.
  */
class GramianAggSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 3
  private val vecs: Seq[Seq[Long]] = Seq(
    Seq(1L, 2L, 3L),
    Seq(4L, 0L, 1L),
    Seq(2L, 2L, 2L))

  // upper triangle, column-major: (0,0) (0,1) (1,1) (0,2) (1,2) (2,2)
  private val wantS = Array(7L, 4L, 6L)
  private val wantG = Array(
    1L * 1 + 4 * 4 + 2 * 2, // (0,0) = 21
    1L * 2 + 4 * 0 + 2 * 2, // (0,1) = 6
    2L * 2 + 0 * 0 + 2 * 2, // (1,1) = 8
    1L * 3 + 4 * 1 + 2 * 2, // (0,2) = 11
    2L * 3 + 0 * 1 + 2 * 2, // (1,2) = 10
    3L * 3 + 1 * 1 + 2 * 2) // (2,2) = 14

  private def gramOf(parts: Int): GramBuf = {
    val g = udaf(new GramianAgg(dim))
    spark.createDataset(vecs).repartition(parts).toDF("q")
      .agg(g(col("q")).as("r"))
      .selectExpr("r.n", "r.s", "r.g")
      .as[(Long, Array[Long], Array[Long])]
      .head() match { case (n, s, gr) => GramBuf(n, s, gr) }
  }

  test("hand-computed sums and cross-products, any partitioning") {
    for (parts <- Seq(1, 2, 3)) {
      val r = gramOf(parts)
      assert(r.n == 3L, s"parts=$parts")
      assert(r.s.toSeq == wantS.toSeq, s"parts=$parts: ${r.s.toSeq}")
      assert(r.g.toSeq == wantG.toSeq, s"parts=$parts: ${r.g.toSeq}")
    }
  }

  test("triangle index arithmetic matches the (i ≤ j) layout") {
    // idx = j(j+1)/2 + i must enumerate 0..tri-1 exactly once
    val idx = for (j <- 0 until dim; i <- 0 to j) yield j * (j + 1) / 2 + i
    assert(idx.sorted == (0 until dim * (dim + 1) / 2).toList)
  }

  test("wrong-width input fails fast") {
    val g = udaf(new GramianAgg(dim))
    val e = intercept[Exception] {
      spark.createDataset(Seq(Seq(1L, 2L))).toDF("q")
        .agg(g(col("q"))).collect()
    }
    assert(e.getMessage != null)
  }
}
