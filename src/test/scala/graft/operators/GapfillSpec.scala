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
}
