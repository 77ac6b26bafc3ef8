package graft.operators

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec

/** The sliding-window oracle's covering-starts enumeration must stay in
  * lockstep with Spark's `window()` for ANY window = k·slide — the shipped
  * 10/5 config exercises only k = 2, so this spec pins a 3-bucket ratio
  * (15/5) against an independent Scala enumeration of the same cover set
  * the DuckDB twin generates (`bucket − i·slide`, i ∈ [0, k)).
  */
class SlidingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, at: String, typ: String, value: Double) =
    (id, Timestamp.from(Instant.parse(at)), id % 7, typ, value, "{}")

  test("3-bucket ratio: spark window() matches the generic covering-starts enumeration") {
    // events straddling slide boundaries, duplicate types in one window,
    // and one far-away straggler
    val rows = Seq(
      ev(1, "2024-01-01T00:00:30Z", "click", 1.0),
      ev(2, "2024-01-01T00:04:59Z", "click", 5.0),
      ev(3, "2024-01-01T00:05:00Z", "click", 2.0),
      ev(4, "2024-01-01T00:09:30Z", "view", 7.0),
      ev(5, "2024-01-01T00:14:59Z", "view", 3.0),
      ev(6, "2024-01-01T01:00:00Z", "click", 9.0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val got = Events.slidingAggOf(Events.withEventTime(df), 15, 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // independent enumeration of the same cover set the oracle generates
    val fmtr = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val slideS = 5 * 60
    val expected = rows
      .flatMap { case (_, ts, _, typ, v, _) =>
        val t = ts.getTime / 1000
        val bucket = math.floorDiv(t, slideS) * slideS
        (0 until 3).map(i => (fmtr.format(Instant.ofEpochSecond(bucket - i.toLong * slideS)), typ, v))
      }
      .groupBy { case (start, typ, _) => (start, typ) }
      .view.mapValues(vs => (vs.size.toLong, vs.map(_._3).max)).toMap

    assert(got == expected, s"got=$got\nexpected=$expected")
    // sanity: the 3-bucket fan-out really happened (6 events -> 18 covers)
    assert(got.values.map(_._1).sum == 18L)
  }
}
