package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.AsOfJoin

/** The native as-of operator ([[AsOfJoinNode]] → [[AsOfMergeExec]]) must
  * agree row-for-row with the compositional union+window form on every
  * semantic corner (strict/inclusive boundary, unmatched keys, null keys and
  * timestamps, self-join inputs) AND plan the way the scaladoc promises:
  * the custom exec node present, two sort-merge-style children, and
  * deterministic left-side filters pushed below the node by
  * [[PushLeftFilterThroughAsOf]].
  */
class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("A", "2024-01-01 10:00:00", 1.0),
    ("A", "2024-01-01 10:00:05", 2.0),
    ("A", "2024-01-01 10:00:10", 3.0),
    ("B", "2024-01-01 10:00:03", 9.0)
  ).toDF("sym", "qts", "px")
    .selectExpr("sym", "cast(qts as timestamp) qts", "px")

  private def trades = Seq(
    ("A", "2024-01-01 10:00:04", 1L),
    ("A", "2024-01-01 10:00:05", 2L),
    ("A", "2024-01-01 09:59:59", 3L),
    ("B", "2024-01-01 10:00:07", 4L),
    ("C", "2024-01-01 10:00:07", 5L)
  ).toDF("sym", "tts", "trade_id")
    .selectExpr("sym", "cast(tts as timestamp) tts", "trade_id")

  private def matchedVia(strict: Boolean): Map[Long, Option[Double]] =
    AsOfJoin
      .asofMerge(trades, quotes, keys = Seq("sym"), leftTs = "tts", rightTs = "qts",
        payload = Seq("px"), strict = strict)
      .select("trade_id", "px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("native strict as-of matches the latest strictly-earlier right row") {
    assert(matchedVia(strict = true) === Map(
      1L -> Some(1.0), 2L -> Some(1.0), 3L -> None, 4L -> Some(9.0), 5L -> None))
  }

  test("native inclusive as-of admits the equal-timestamp right row") {
    val m = matchedVia(strict = false)
    assert(m(2L) === Some(2.0))
    assert(m(1L) === Some(1.0))
  }

  test("null keys and null timestamps match nothing, on either side") {
    val l = Seq(
      (Some("A"), Some("2024-01-01 10:00:04"), 1L),
      (None, Some("2024-01-01 10:00:04"), 2L),       // null key
      (Some("A"), None, 3L)                          // null left ts
    ).toDF("sym", "tts", "trade_id")
      .selectExpr("sym", "cast(tts as timestamp) tts", "trade_id")
    val r = Seq(
      (Some("A"), Some("2024-01-01 10:00:00"), 1.0),
      (None, Some("2024-01-01 10:00:01"), 7.0),      // null key right row skipped
      (Some("A"), None, 8.0)                          // null right ts skipped
    ).toDF("sym", "qts", "px")
      .selectExpr("sym", "cast(qts as timestamp) qts", "px")
    val m = AsOfJoin.asofMerge(l, r, Seq("sym"), "tts", "qts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getDouble(1))))
      .toMap
    assert(m === Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("physical plan is the native merge exec, not a window or join") {
    val p = AsOfJoin
      .asofMerge(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfMerge"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  private def optimized(df: DataFrame) =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]].queryExecution.optimizedPlan

  test("deterministic left-side filters are pushed below the as-of node") {
    // LocalRelation inputs get the pushed filter folded straight into the
    // relation by ConvertToLocalRelation, so pin the row count instead
    val joined = AsOfJoin.asofMerge(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .filter(col("trade_id") > 2L)
    val plan = optimized(joined)
    // no Filter left sitting directly above the node...
    assert(!plan.collect { case Filter(_, _: AsOfJoinNode) => true }.exists(identity), plan)
    // ...and the node's left child already carries only the surviving rows
    val node = plan.collectFirst { case n: AsOfJoinNode => n }.get
    val leftRows = node.left.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.size
    }.get
    assert(leftRows === 3, plan) // trades has 5; trade_id > 2 keeps 3
  }

  test("left-side filters reach the parquet scan through the as-of node") {
    val plan = AsOfJoin.asofViewMergeQ(spark, Sf0001)
      .filter(col("purchase_value") > 50.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMerge"), plan)
    // the predicate sits in the scan-side Filter below the merge node (the
    // PushedFilters list itself is truncated in the plan string)
    assert("""\(value#\d+ > 50\.0\)""".r.findFirstIn(plan).isDefined, plan)
  }

  test("right-side filters stay above the node") {
    val joined = AsOfJoin.asofMerge(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .filter(col("px") > 1.0)
    val plan = optimized(joined)
    assert(plan.collect { case Filter(_, _: AsOfJoinNode) => true }.exists(identity), plan)
  }

  test("self-join attribution agrees with the union+window form at sf0.001") {
    val viaWindow = AsOfJoin.asofViewQ(spark, Sf0001).collect()
    val viaMerge = AsOfJoin.asofViewMergeQ(spark, Sf0001).collect()
    assert(viaMerge.toSeq === viaWindow.toSeq)
  }
}
