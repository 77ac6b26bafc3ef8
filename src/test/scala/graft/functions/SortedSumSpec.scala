package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** sorted_sum (TypedImperativeAggregate) must agree BIT-IDENTICALLY with the
  * `aggregate(array_sort(collect_list(x)), 0D, (a, x) -> a + x)` HOF form it
  * replaces — under merge-heavy partial aggregation, where the buffer is
  * built from many serialized partials in arbitrary order.
  */
class SortedSumSpec extends SparkSpec {
  import spark.implicits._

  private val hof = "aggregate(array_sort(collect_list(v)), 0D, (a, x) -> a + x)"

  test("bit-identical to the HOF sorted fold under 32-partition partials") {
    // values whose naive partition-order sum genuinely differs in the last
    // ulp: wide magnitude spread forces rounding to depend on add order
    val df = spark.range(0, 10000, 1, 32)
      .selectExpr("id % 7 AS k", "CASE WHEN id % 3 = 0 THEN 1e15 + id ELSE 1.0 / (id + 1) END AS v")
    val rows = df.groupBy("k")
      .agg(expr("sorted_sum(v)").as("agg"), expr(hof).as("hofv"))
      .collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"k=${r.getLong(0)}")
    }
  }

  test("repartitioning cannot change the result (multiset determinism)") {
    val base = spark.range(0, 5000).selectExpr("CAST(1 AS INT) AS k",
      "CASE WHEN id % 2 = 0 THEN -1e12 - id ELSE 3.7e-5 * id END AS v")
    def run(parts: Int): Long = {
      val d = base.repartition(parts).groupBy("k").agg(expr("sorted_sum(v)").as("s"))
        .head().getDouble(1)
      java.lang.Double.doubleToLongBits(d)
    }
    assert(run(1) == run(32))
  }

  test("null inputs are skipped; an all-null group folds to 0.0") {
    val df = Seq((1, Some(2.5)), (1, None), (2, None))
      .toDF("k", "v")
    val rows = df.groupBy("k").agg(expr("sorted_sum(v)").as("s")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(rows(1) == 2.5)
    assert(rows(2) == 0.0, "all-null group must equal the fold init, like the HOF form")
  }

  test("buffer capacity guard raises a named error instead of an executor OOM") {
    SortedSumAgg.checkCapacity(SortedSumAgg.MaxBufferSize) // at the cap: fine
    val e = intercept[IllegalStateException] {
      SortedSumAgg.checkCapacity(SortedSumAgg.MaxBufferSize + 1)
    }
    assert(e.getMessage.contains("sorted_sum"))
    assert(e.getMessage.contains("bounded-state"))
  }
}
