package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.pipeline.Dedup

/** r18 optimization guard: the map-only signature kernels must be
  * BIT-IDENTICAL to the explode+aggregate formulations they replaced
  * (`minhash_sig` vs 96 per-permutation `min` columns, `simhash_sig` vs
  * 64 per-bit `sum` columns + majority) on the real sf0.001 corpus —
  * including the drop of token-less documents, which the aggregate form
  * expressed implicitly by exploding zero rows.
  */
class MinhashKernelSpec extends SparkSpec {

  private val M = MinhashSig.M
  private val NumPerms = Dedup.NumPerms

  private def docs = Tables.documents(spark, Sf0001)
    .select(col("doc_id"), expr(s"array_sort(${Dedup.tokenHashes})").as("g"))

  test("minhash_sig kernel == explode + 96-min-aggregate form") {
    val kernel = docs.filter(size(col("g")) > 0)
      .select(col("doc_id"), expr(s"minhash_sig(g, $NumPerms)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val sigCols = (0 until NumPerms).map { k =>
      min(expr(s"(${37L * k + 11} * (h % $M) + ${101L * k + 7}) % $M")).as(s"s$k")
    }
    val agg = docs.select(col("doc_id"), explode(col("g")).as("h"))
      .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"), array((0 until NumPerms).map(k => col(s"s$k")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(agg.nonEmpty)
    assert(kernel == agg)
  }

  test("simhash_sig kernel == explode + 64-sum majority form") {
    val kernel = docs.filter(size(col("g")) > 0)
      .select(col("doc_id"), expr("simhash_sig(g)").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aggCols = count(lit(1)).as("cnt") +:
      (0 until 64).map(j => sum(expr(s"shiftright(h, $j) % 2")).as(s"b$j"))
    val agg = docs.select(col("doc_id"), explode(col("g")).as("h"))
      .groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") * 2 > col("cnt"), lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg.nonEmpty)
    assert(kernel == agg)
  }

  test("kernels drop token-less docs and skip null elements like the agg form") {
    import spark.implicits._
    val f = Seq(
      (1L, Seq[java.lang.Long](5L, 9L, 1L)),
      (2L, Seq.empty[java.lang.Long]),
      (3L, Seq[java.lang.Long](null, 7L))).toDF("doc_id", "g")
    val m = f.filter(size(col("g")) > 0)
      .select(col("doc_id"), expr(s"minhash_sig(g, $NumPerms)").as("sig"))
      .filter(col("sig").isNotNull)
      .select("doc_id").as[Long].collect().sorted
    assert(m.toSeq == Seq(1L, 3L))
    // null element skipped: doc 3's signature equals that of [7] alone
    val s3 = f.filter(col("doc_id") === 3)
      .select(expr(s"minhash_sig(g, $NumPerms)")).head().getSeq[Long](0)
    val s7 = Seq((0L, Seq(7L))).toDF("doc_id", "g")
      .select(expr(s"minhash_sig(g, $NumPerms)")).head().getSeq[Long](0)
    assert(s3 == s7)
  }
}
