package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EliminateRedundantLeftJoin: fires exactly on the proven-safe shape (dead
  * right side, left outer, unique-keyed aggregate dim) and NEVER on any
  * shape outside the proof — each negative case is one dropped premise.
  */
class JoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "c", 40.0))
    .toDF("id", "k", "v")
  // dim with DUPLICATE keys before aggregation — aggregating is what makes
  // the join safe to drop
  private lazy val dimRaw = Seq(
    ("a", 1.0), ("a", 2.0), ("b", 3.0))
    .toDF("dk", "w")

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def uniqueDim = dimRaw.groupBy("dk").agg(sum("w").as("dw"))

  test("fires: dead unique-keyed left join is dropped; result unchanged") {
    val joined = fact.join(uniqueDim, col("k") === col("dk"), "left_outer")
    val q = joined.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(!optimized(q).contains("Join"), s"join survived:\n${optimized(q)}")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet == Set(("a", 2L, 30.0), ("b", 1L, 30.0), ("c", 1L, 40.0)))
    // projection parent too, not just aggregate
    val p = joined.select("id", "v")
    assert(!optimized(p).contains("Join"), s"join survived under Project:\n${optimized(p)}")
    assert(p.collect().length == 4)
  }

  test("fires: global-aggregate (one row) dim is droppable too") {
    val one = dimRaw.agg(sum("w").as("tw"))
    val q = fact.join(one, col("v") > col("tw"), "left_outer").select("id")
    assert(!optimized(q).contains("Join"), s"join survived:\n${optimized(q)}")
    assert(q.collect().length == 4)
  }

  test("kept: parent reads a right column") {
    val q = fact.join(uniqueDim, col("k") === col("dk"), "left_outer")
      .groupBy("k").agg(max("dw").as("m"))
    assert(optimized(q).contains("Join"), "join wrongly eliminated")
  }

  test("kept: right side is not aggregated (duplicate keys could fan out)") {
    val q = fact.join(dimRaw, col("k") === col("dk"), "left_outer").select("id")
    assert(optimized(q).contains("Join"), "join wrongly eliminated")
    // and indeed the join duplicates: 'a' facts match two dim rows
    assert(q.collect().length == 6)
  }

  test("kept: join keys do not cover the grouping (per-key rows not unique)") {
    val dim2 = dimRaw.withColumn("k2", col("w") > 1.5)
      .groupBy("dk", "k2").agg(sum("w").as("dw"))
    val q = fact.join(dim2, col("k") === col("dk"), "left_outer").select("id")
    assert(optimized(q).contains("Join"), "join wrongly eliminated")
    assert(q.collect().length == 6) // each 'a' fact matches the two ('a', k2) groups
  }

  test("kept: inner join (left rows CAN be dropped)") {
    val q = fact.join(uniqueDim, col("k") === col("dk"), "inner").select("id")
    assert(optimized(q).contains("Join"), "join wrongly eliminated")
    assert(q.collect().length == 3) // 'c' has no dim row
  }
}
