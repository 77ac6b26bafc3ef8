package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("funnel requires the stages IN ORDER, not merely present") {
    val events = Seq(
      // u1: clean view → click → purchase
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2: purchase BEFORE the click → stage 2, purchase doesn't count
      (2L, ts(1), "view"), (2L, ts(3), "click"), (2L, ts(2), "purchase"),
      // u3: click with no prior view → stage 0
      (3L, ts(1), "click"), (3L, ts(2), "purchase"),
      // u4: simultaneous view+click (strictly-after excludes), later click ok
      (4L, ts(1), "view"), (4L, ts(1), "click"), (4L, ts(5), "click"),
      // u5: noise types only
      (5L, ts(1), "error"), (5L, ts(2), "signup")
    ).toDF("user_id", "ts", "event_type")
    val stages = Events.funnelOf(events).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stages === Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 2, 5L -> 0))
  }
}
