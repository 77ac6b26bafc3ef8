package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed fixture and spreads the hot key") {
    // 9000 of 10000 rows share one key — the classic hot-key shape
    val facts = (1 to 10000).map { i =>
      val k = if (i <= 9000) 1L else (i % 50).toLong + 2
      (i.toLong, k, i * 1.5)
    }.toDF("row_id", "k", "v")
    val dims = (1L to 60L).map(k => (k, s"dim$k")).toDF("k", "label")

    val plain = facts.join(dims, Seq("k"))
      .select("row_id", "k", "v", "label")
      .orderBy("row_id").collect().toSeq
    val salted = SkewJoin.saltedJoin(facts, dims, "k", col("row_id"), factor = 8)
      .select("row_id", "k", "v", "label")
      .orderBy("row_id").collect().toSeq
    assert(salted === plain)
    assert(plain.length === 10000 - facts.filter(!col("k").isin((1L to 60L): _*)).count())

    // the hot key's rows really do land in several salt buckets
    val spread = facts.withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(spread === 8)
  }

  test("chooseJoinStrategy picks plain / aqe_skew / salted on the three planted shapes") {
    import SkewJoin.JoinStrategy

    // uniform: 100 keys × 10 rows — no key above 2× the mean
    val uniform = spark.range(1000)
      .select(col("id").as("row_id"), (col("id") % 100).as("k"))
    assert(SkewJoin.chooseJoinStrategy(uniform, "k") === JoinStrategy.Plain)

    // AQE-splittable: 5 keys at 10× the uniform weight carry ~34% of the
    // rows, but the heaviest single key holds only ~7% — runtime partition
    // splitting rebalances this without any rewrite
    val splittable = spark.range(950)
      .select((col("id") % 95).as("k"))
      .unionAll(spark.range(500).select((lit(100) + col("id") % 5).as("k")))
    assert(SkewJoin.chooseJoinStrategy(splittable, "k") === JoinStrategy.AqeSkew)

    // degenerate-hot: one key owns 90% of the table — every AQE split of
    // it still carries the same dominating build key, so salt statically
    val degenerate = spark.range(1000)
      .select(when(col("id") < 900, lit(0L)).otherwise(col("id")).as("k"))
    assert(SkewJoin.chooseJoinStrategy(degenerate, "k") === JoinStrategy.Salted)
  }

  test("strategicJoin equals the plain join through every branch") {
    val dims = (0L to 120L).map(k => (k, s"dim$k")).toDF("k", "label")
    val fixtures = Seq(
      spark.range(1000).select(col("id").as("row_id"), (col("id") % 100).as("k")),
      spark.range(950).select(col("id").as("row_id"), (col("id") % 95).as("k"))
        .unionAll(spark.range(500).select((col("id") + 1000).as("row_id"),
          (lit(100) + col("id") % 5).as("k"))),
      spark.range(1000).select(col("id").as("row_id"),
        when(col("id") < 900, lit(0L)).otherwise(col("id") % 120).as("k")))
    for (facts <- fixtures) {
      val plain = facts.join(dims, Seq("k"))
        .select("row_id", "k", "label").orderBy("row_id").collect().toSeq
      val routed = SkewJoin.strategicJoin(facts, dims, "k", col("row_id"))
        .select("row_id", "k", "label").orderBy("row_id").collect().toSeq
      assert(routed === plain)
    }
  }
}
