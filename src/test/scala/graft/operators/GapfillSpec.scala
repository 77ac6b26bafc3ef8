package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class GapfillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int) = Timestamp.valueOf(f"2026-03-$d%02d 10:00:00")

  test("missing days appear as explicit zeros over the shared global span") {
    val events = Seq(
      (1L, Option(ts(1)), "view"), (1L, Option(ts(4)), "view"), // gap days 2, 3
      (2L, Option(ts(2)), "click"),                             // click on day 2 only
      (3L, Option.empty[Timestamp], "view"))                    // null ts: excluded
      .toDF("user_id", "ts", "event_type")
    val got = Events.dailyGapfilledOf(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // span 2026-03-01..04 for BOTH types → 2 × 4 rows, no implicit gaps
    assert(got.size == 8)
    assert(got(("view", "2026-03-01")) == 1L && got(("view", "2026-03-04")) == 1L)
    assert(got(("view", "2026-03-02")) == 0L && got(("view", "2026-03-03")) == 0L)
    assert(got(("click", "2026-03-02")) == 1L)
    assert(Seq("2026-03-01", "2026-03-03", "2026-03-04")
      .forall(d => got(("click", d)) == 0L))
  }

  test("rolling 7-day active users: distinct across the window, clipped at the last day") {
    // user 1 active days 1 and 3 (must count ONCE in windows covering both),
    // user 2 active day 1 only, user 3 day 10 only — a gap wider than the
    // window, so days 8..9 have zero actives and do not appear
    val events = Seq(
      (1L, Option(ts(1))), (1L, Option(ts(3))),
      (2L, Option(ts(1))),
      (3L, Option(ts(10))),
      (4L, Option.empty[Timestamp]))
      .toDF("user_id", "ts")
    val got = Events.rollingActiveUsersOf(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // windows ending on days 1..7 see users 1/2 (from day 1) and 1 again
    // (day 3); day 10 sees only user 3; days past 10 are clipped
    assert(got == Map(
      "2026-03-01" -> 2L, "2026-03-02" -> 2L, "2026-03-03" -> 2L,
      "2026-03-04" -> 2L, "2026-03-05" -> 2L, "2026-03-06" -> 2L,
      "2026-03-07" -> 2L, // day 1 contributions end here (1+6)
      "2026-03-08" -> 1L, "2026-03-09" -> 1L, // only user 1's day-3 activity
      "2026-03-10" -> 1L), got.toString) // user 3; clipping removes 11..16
  }
}
