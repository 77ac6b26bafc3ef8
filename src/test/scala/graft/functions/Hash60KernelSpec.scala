package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.pipeline.Dedup

/** r18 optimization guards for the md5/60-bit hashing kernels: each must
  * reproduce the retired declarative formulation exactly on the real
  * sf0.001 corpus — per-element hash values (`hash60_array`), the binary
  * classifier's (doc, y, bucket, cnt) relation (`md5_bucket_counts`), and
  * the multi-class char-trigram relation (`trigram_bucket_counts`,
  * including the split('')-code-point gram semantics and the <3-char
  * guard).
  */
class Hash60KernelSpec extends SparkSpec {

  test("hash60_array == per-element conv(substring(md5)) lambda") {
    val docs = Tables.documents(spark, Sf0001)
    val old = docs.select(col("doc_id"),
        expr(s"array_sort(${Dedup.tokenHashes})").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val neu = docs.select(col("doc_id"),
        expr(s"array_sort(hash60_array(${Dedup.tokenSet}))").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(old.nonEmpty && neu == old)
  }

  test("md5_bucket_counts == explode + md5 + mask + groupBy-count") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), expr(Dedup.rawTokens).as("t"))
    val old = docs.select(col("doc_id"), explode(col("t")).as("token"))
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(token), 1, 15), 16, 10) as bigint) & 63"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val neu = docs.select(col("doc_id"), explode(expr("md5_bucket_counts(t, 64)")).as("bc"))
      .select(col("doc_id"), col("bc.bucket"), col("bc.cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(old.nonEmpty && neu == old)
  }

  test("trigram_bucket_counts == split-char lambda grams + md5 + groupBy") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"),
        expr("concat(lower(text), repeat(concat(' xq', lang, 'z'), 3))").as("s"))
    val old = docs.select(col("doc_id"), explode(expr(
        """element_at(transform(array(split(s, '')),
              cs -> IF(size(cs) < 3, CAST(array() AS ARRAY<STRING>),
                      transform(sequence(1, size(cs) - 2),
                        i -> concat(element_at(cs, i), element_at(cs, i + 1),
                                    element_at(cs, i + 2))))), 1)"""))
        .as("g"))
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) & 255"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val neu = docs.select(col("doc_id"),
        explode(expr("trigram_bucket_counts(s, 256)")).as("bc"))
      .select(col("doc_id"), col("bc.bucket"), col("bc.cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(old.nonEmpty && neu == old)
    // the <3-code-point guard
    import spark.implicits._
    val tiny = Seq((1L, "ab"), (2L, ""), (3L, "abc")).toDF("doc_id", "s")
      .select(col("doc_id"), explode(expr("trigram_bucket_counts(s, 256)")).as("bc"))
      .select("doc_id").as[Long].collect().toSeq
    assert(tiny == Seq(3L))
  }
}
