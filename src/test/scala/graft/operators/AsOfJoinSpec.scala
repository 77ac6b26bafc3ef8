package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    // key, ts, px
    ("A", "2024-01-01 10:00:00", 1.0),
    ("A", "2024-01-01 10:00:05", 2.0),
    ("A", "2024-01-01 10:00:10", 3.0),
    ("B", "2024-01-01 10:00:03", 9.0)
  ).toDF("sym", "qts", "px")
    .selectExpr("sym", "cast(qts as timestamp) qts", "px")

  private def trades = Seq(
    ("A", "2024-01-01 10:00:04", 1L), // after 10:00:00, before :05
    ("A", "2024-01-01 10:00:05", 2L), // exactly at a quote ts
    ("A", "2024-01-01 09:59:59", 3L), // before any quote
    ("B", "2024-01-01 10:00:07", 4L),
    ("C", "2024-01-01 10:00:07", 5L)  // key with no quotes at all
  ).toDF("sym", "tts", "trade_id")
    .selectExpr("sym", "cast(tts as timestamp) tts", "trade_id")

  private def matched(strict: Boolean): Map[Long, Option[Double]] =
    AsOfJoin
      .asof(trades, quotes, keys = Seq("sym"), leftTs = "tts", rightTs = "qts",
        payload = Seq("px"), strict = strict)
      .select("trade_id", "px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("strict as-of matches the latest strictly-earlier right row") {
    assert(matched(strict = true) === Map(
      1L -> Some(1.0), // 10:00:04 -> quote at 10:00:00
      2L -> Some(1.0), // equal ts excluded under strict
      3L -> None,      // nothing earlier
      4L -> Some(9.0),
      5L -> None))     // key never quoted
  }

  test("inclusive as-of admits the equal-timestamp right row") {
    assert(matched(strict = false)(2L) === Some(2.0))
    assert(matched(strict = false)(1L) === Some(1.0)) // unchanged
  }

  test("multi-column payload arrives row-atomically") {
    val q = quotes.withColumn("venue", org.apache.spark.sql.functions.concat_ws("@", $"sym", $"px"))
    val out = AsOfJoin
      .asof(trades.filter($"trade_id" === 1L), q, Seq("sym"), "tts", "qts", Seq("px", "venue"))
      .select("px", "venue")
      .collect()
    assert(out.toSeq === Seq(Row(1.0, "A@1.0")))
  }

  test("payload name collisions are rejected up front") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(trades, quotes.withColumnRenamed("px", "trade_id"),
        Seq("sym"), "tts", "qts", Seq("trade_id"))
    }
  }

  test("plan is union+window: one key exchange, no join node") {
    val p = AsOfJoin
      .asof(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning\\(sym".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
  }
}
