package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Disorder-report semantics on a PLANTED out-of-order stream (the real
  * testdata arrives perfectly ordered, which the registered query honestly
  * reports as all-zero): hand-computed lateness, nearest-rank quantiles,
  * and invariance under input partitioning — the two-phase prefix-max must
  * behave as if the stream were scanned sequentially.
  */
class DisorderSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, ts: String) =
    (id, Timestamp.valueOf(ts), 1L, "view", 1.0, "{}")

  test("planted disorder: lateness, quantiles, and max match hand computation") {
    // arrival order 1..6; events 3 and 5 arrive 7 s and 5 s late
    val rows = Seq(
      ev(1, "2024-01-01 10:00:00"),
      ev(2, "2024-01-01 10:00:05"),
      ev(3, "2024-01-01 09:59:58"), // 7 s behind the running max (10:00:05)
      ev(4, "2024-01-01 10:00:06"),
      ev(5, "2024-01-01 10:00:01"), // 5 s behind (10:00:06)
      ev(6, "2024-01-01 10:00:07"))
    // partition invariance: scatter arrival order across input partitions
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(5)
    val r = Events.disorderReportOf(df).collect().head
    // lateness multiset {0,0,0,0,5,7}: p50 = rank 3 -> 0, p95 = rank 6 -> 7
    assert((r.getLong(0), r.getLong(1)) == ((6L, 2L)))
    assert(r.getDouble(2) == 2.0 / 6.0)
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((0L, 7L, 7L, 7L)))
  }

  test("an ordered stream reports zero everywhere") {
    val rows = (1L to 5L).map(i => ev(i, s"2024-01-01 10:00:0$i"))
    val r = Events.disorderReportOf(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((5L, 0L, 0.0)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((0L, 0L, 0L, 0L)))
  }

  test("seasonal backtest: a perfectly weekly series scores zero seasonal error") {
    // 21 days, count on day d = (d % 7) + 1: exact weekly period
    var id = 0L
    val rows = (0 until 21).flatMap { d =>
      (0 until (d % 7) + 1).map { _ =>
        id += 1
        (id, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
          1L, "t", 1.0, "{}")
      }
    }
    val r = Events.seasonalBacktestOf(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    // scored days 8..21; seasonal-naive is exact, persistence is not:
    // 12 in-week steps of 1 + two week-boundary drops of 6
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (("t", 14L, 0L, 24L)))
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 24.0 / 14.0)
  }
}
