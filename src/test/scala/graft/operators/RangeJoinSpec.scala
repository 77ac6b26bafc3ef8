package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0),    // exactly at an interval's lo → included
    (2L, 9.99),
    (3L, 10.0),   // exactly at [0,10)'s hi → excluded from it
    (4L, 25.0),
    (5L, -3.0),   // below every interval
    (6L, 100.0)   // above every interval
  ).toDF("pid", "p")

  private def intervals = Seq(
    (10L, 0.0, 10.0),   // boundary-aligned
    (11L, 5.0, 26.0),   // spans several bins, overlaps the first
    (12L, 30.0, 30.0),  // empty (lo == hi, exclusive): matches nothing
    (13L, 40.0, 35.0)   // inverted: matches nothing, must not blow up sequence()
  ).toDF("iid", "lo", "hi")

  private def pairs(binWidth: Double, hiInclusive: Boolean = false): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth, hiInclusive)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  private val expectedExclusive = Set(
    1L -> 10L,            // p=0 in [0,10)
    2L -> 10L, 2L -> 11L, // p=9.99 in both
    3L -> 11L,            // p=10 NOT in [0,10), in [5,26)
    4L -> 11L             // p=25 in [5,26)
  )

  test("binned point-in-interval matches the naive cross-filter, across bin widths") {
    val naive = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(naive === expectedExclusive)
    for (w <- Seq(1.0, 3.7, 10.0, 1000.0))
      assert(pairs(w) === expectedExclusive, s"binWidth=$w")
  }

  test("inclusive hi admits the boundary point, and a degenerate [x,x] stays live") {
    // p=10.0 now matches [0,10]; the lo==hi interval survives the filter
    // (it could match a point exactly at x — none here).
    assert(pairs(10.0, hiInclusive = true) === expectedExclusive + (3L -> 10L))
  }

  test("no cartesian or nested-loop operator in the binned plan") {
    val plan = RangeJoin
      .pointInInterval(points, intervals, "p", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("column collisions are rejected up front") {
    val bad = intervals.withColumnRenamed("iid", "pid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, bad, "p", "lo", "hi", 10.0)
    }
    assert(e.getMessage.contains("pid"))
  }

  test("keyed overlap pairs: overlap is symmetric-exclusive of touching windows") {
    val rows = Seq(
      // key, id, lo, hi   — [0,10) overlaps [5,15); [10,20) only touches [0,10)
      ("k", 1L, 0.0, 10.0),
      ("k", 2L, 5.0, 15.0),
      ("k", 3L, 10.0, 20.0),
      ("z", 4L, 0.0, 100.0) // other key: never pairs with k's rows
    ).toDF("key", "id", "lo", "hi")
    val got = RangeJoin.overlapPairs(rows, "key", "id", "lo", "hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === Set(1L -> 2L, 2L -> 3L)) // 1-3 touch at 10: not an overlap
  }
}
