package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r18 optimization guard (the PqEncodeSpec pattern): the driver-side IVF
  * Lloyd training and the map-only trained-cell assignment must reproduce
  * the retired DataFrame formulations EXACTLY — every trained centroid
  * component and every corpus cell id bit-for-bit — on the real sf0.001
  * corpus. The retired shapes are kept here verbatim as the reference.
  */
class IvfTrainedParitySpec extends SparkSpec {

  /** Retired (cid, cent) seed relation from the deterministic literals. */
  private def seedCentroids: DataFrame =
    spark.range(1).select(
      posexplode(expr(Similarity.centroidArraySpark)).as(Seq("cid", "cent")))
      .select(col("cid").cast("int").as("cid"), col("cent"))

  /** Retired crossJoin/broadcast/argmin assignment, kept verbatim. */
  private def assignTo(vs: DataFrame, cents: DataFrame): DataFrame = {
    val c2 = cents.withColumn("n2", expr("vec_dot(cent, cent)"))
    vs.crossJoin(broadcast(c2))
      .withColumn("score", col("n2") - lit(2) * expr("vec_dot(v, cent)"))
      .select(col("vec_id"), struct(col("score"), col("cid")).as("sc"))
      .groupBy("vec_id").agg(min("sc").as("sc"))
      .select(col("vec_id"), col("sc.cid").as("cid"))
  }

  test("driver-side IVF Lloyd == retired DataFrame chain, bit-for-bit") {
    val vs = SimilaritySearch.trainingSample(spark, Sf0001)
    var cents = seedCentroids
    for (_ <- 1 to SimilaritySearch.LloydRounds) {
      val means = assignTo(vs, cents).join(vs, "vec_id")
        .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cid", "d")
        .agg((expr("sorted_sum(CAST(x AS DOUBLE))") / count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(d, m))), s -> s.m)")
          .as("mcent"))
      cents = seedCentroids
        .join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mcent"), col("cent")).as("cent"))
    }
    val old = cents.collect()
      .map(r => r.getAs[Int]("cid") ->
        r.getAs[Seq[Double]]("cent").map(java.lang.Double.doubleToRawLongBits).toVector)
      .toMap
    val local = SimilaritySearch.ivfLloydLocal(spark, Sf0001)
    val neu = local.indices.map(cid => cid ->
      local(cid).toSeq.map(java.lang.Double.doubleToRawLongBits).toVector).toMap
    assert(old.size == Similarity.NumCentroids)
    assert(neu == old)
  }

  test("map-only trained-cell assignment == retired crossJoin/argmin") {
    val cb = SimilaritySearch.collectTrainedCents(spark, Sf0001)
    val cbDf = spark.createDataFrame(cb.indices.map(cid => (cid, cb(cid).toSeq)))
      .toDF("cid", "cent")
    val unit = SimilaritySearch.unitVectors(spark, Sf0001)
    val old = assignTo(unit, cbDf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val assign = SimilaritySearch.assignLocal(cb)
    val neu = unit.select(col("vec_id"), assign(col("v")).as("cid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(old.size > 100)
    assert(neu == old)
  }
}
