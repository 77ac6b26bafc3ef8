package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r18 optimization guard: the map-only PQ encoder (local-codebook UDF)
  * must reproduce the retired explode ×M → broadcast ×CodesK → argmin
  * formulation EXACTLY — codes, hex string, and the recon_err double
  * bit-for-bit — on the real sf0.001 corpus. The retired shape is kept
  * here verbatim as the reference.
  */
class PqEncodeSpec extends SparkSpec {

  import PqSearch.{M, SubDim, CodesK}

  private def subvectors(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(1, $M), mm -> slice(v, $SubDim * (mm - 1) + 1, $SubDim))"))
        .as(Seq("p", "sub")))
      .select(col("vec_id"), (col("p") + 1).as("m"), col("sub"))

  private def assignSub(subs: DataFrame, cents: DataFrame): DataFrame =
    subs.join(broadcast(cents.withColumn("cn2", expr("vec_dot(cent, cent)"))), "m")
      .withColumn("score", col("cn2") - lit(2) * expr("vec_dot(sub, cent)"))
      .select(col("vec_id"), col("m"), struct(col("score"), col("cid")).as("sc"))
      .groupBy("vec_id", "m").agg(min("sc").as("sc"))
      .select(col("vec_id"), col("m"), col("sc.cid").as("cid"), col("sc.score").as("score"))

  // the retired DataFrame Lloyd chain (pqSeeds + assign→mean rounds),
  // kept verbatim as the bit-equality reference for lloydLocal
  private def oldSeeds: DataFrame =
    SimilaritySearch.trainingSample(spark, Sf0001)
      .withColumn("draw", md5(concat(lit("ivf:"), col("vec_id").cast("string"))))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("draw", "vec_id")))
      .filter(col("rn") <= CodesK)
      .select((col("rn") - 1).cast("int").as("cid"), col("v"))
      .select(col("cid"),
        posexplode(expr(
          s"transform(sequence(1, $M), mm -> slice(v, $SubDim * (mm - 1) + 1, $SubDim))"))
          .as(Seq("p", "cent")))
      .select((col("p") + 1).as("m"), col("cid"), col("cent"))

  test("driver-side Lloyd == retired DataFrame Lloyd chain, bit-for-bit") {
    val sample = SimilaritySearch.trainingSample(spark, Sf0001)
    val subs = subvectors(sample.select(col("vec_id"), col("v")))
    var cents = oldSeeds
    for (_ <- 1 to PqSearch.LloydRounds) {
      val means = assignSub(subs, cents)
        .join(subs, Seq("vec_id", "m"))
        .select(col("m"), col("cid"), posexplode(col("sub")).as(Seq("d", "x")))
        .groupBy("m", "cid", "d")
        .agg((expr("sorted_sum(CAST(x AS DOUBLE))") / count(lit(1))).as("mc"))
        .groupBy("m", "cid")
        .agg(expr("transform(array_sort(collect_list(struct(d, mc))), s -> s.mc)")
          .as("mcent"))
      cents = oldSeeds
        .join(means, Seq("m", "cid"), "left")
        .select(col("m"), col("cid"), coalesce(col("mcent"), col("cent")).as("cent"))
    }
    val old = cents.collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("cid")) ->
        r.getAs[Seq[Double]]("cent").map(java.lang.Double.doubleToRawLongBits).toVector)
      .toMap
    val local = PqSearch.lloydLocal(spark, Sf0001)
    val neu = (for { m <- 1 to M; cid <- 0 until CodesK }
      yield (m, cid) ->
        local(m - 1)(cid).toSeq.map(java.lang.Double.doubleToRawLongBits).toVector).toMap
    assert(old.size == M * CodesK)
    assert(neu == old)
  }

  test("map-only PQ encode == retired explode/broadcast/argmin formulation") {
    val cb = PqSearch.collectCodebook(spark, Sf0001)
    val cbDf = spark.createDataFrame(
      for { m <- 1 to M; cid <- 0 until CodesK }
        yield (m, cid, cb(m - 1)(cid).toSeq)).toDF("m", "cid", "cent")
    val corpus = SimilaritySearch.unitVectors(spark, Sf0001).select("vec_id", "v")
    val subs = subvectors(corpus)
    val um2 = subs.select(col("vec_id"), col("m"),
      expr("vec_dot(sub, sub)").as("um2"))
    val old = assignSub(subs, cbDf)
      .join(um2, Seq("vec_id", "m"))
      .groupBy("vec_id")
      .agg(
        expr("transform(array_sort(collect_list(struct(m, cid))), s -> s.cid)")
          .as("codes"),
        expr("""array_join(transform(array_sort(collect_list(struct(m, cid))),
                  s -> substr('0123456789abcdef', s.cid + 1, 1)), '')""")
          .as("pq_code"),
        expr("sorted_sum(score + um2)").as("recon_err"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1).toVector, r.getString(2),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toMap
    val neu = PqSearch.pqCodesOf(corpus, cb)
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1).toVector, r.getString(2),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toMap
    assert(old.size > 100)
    assert(neu == old)
  }
}
