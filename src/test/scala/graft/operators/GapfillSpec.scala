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

  test("daily anomalies: planted spike flags, warm-up and flat baselines stay NULL") {
    // 14 alternating 2/3-event days (nonzero baseline variance), then a
    // 40-event spike on day 15
    val d = java.nio.file.Files.createTempDirectory("graft_anom_fixture").toString
    val dayNs = 86400L * 1000 * 1000 * 1000
    val epoch0 = 1767225600L * 1000 * 1000 * 1000 // 2026-01-01 UTC
    val rows = (0 until 14).flatMap { day =>
      (0 until (if (day % 2 == 0) 2 else 3)).map(i =>
        (day * 10L + i, epoch0 + day * dayNs + i, 1L, "view", 1.0, "{}"))
    } ++ (0 until 40).map(i => (900L + i, epoch0 + 14 * dayNs + i, 1L, "view", 1.0, "{}"))
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Events.dailyAnomalies(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    assert(got.length == 15)
    // warm-up: first AnomalyMinBaseline days have too little history
    got.take(Events.AnomalyMinBaseline).foreach { case (day, _, z, flag) =>
      assert(z.isEmpty && !flag, s"$day should be warm-up NULL")
    }
    // the spike: z against the hand-computed 14-day baseline
    val base = (0 until 14).map(day => if (day % 2 == 0) 2.0 else 3.0)
    val mean = base.sum / base.length
    val sd = math.sqrt(base.map(v => (v - mean) * (v - mean)).sum / (base.length - 1))
    val (lastDay, lastN, lastZ, lastFlag) = got.last
    assert(lastN == 40L && lastFlag, s"$lastDay should flag")
    assert(math.abs(lastZ.get - (40.0 - mean) / sd) < 1e-9, s"z ${lastZ.get}")
    // ordinary alternating days in the steady region stay unflagged
    got.drop(Events.AnomalyMinBaseline).dropRight(1).foreach { case (day, _, z, flag) =>
      assert(z.isDefined && !flag, s"$day should score but not flag")
    }
  }

  test("daily anomalies ride the calendar spine: a planted empty day appears and flags") {
    // 14 alternating 2/3-event days, day 15 EMPTY (no rows at all), then a
    // 3-event day 16 — without the spine the empty day would vanish and the
    // trailing frame would silently skip it
    val d = java.nio.file.Files.createTempDirectory("graft_anom_gap_fixture").toString
    val dayNs = 86400L * 1000 * 1000 * 1000
    val epoch0 = 1767225600L * 1000 * 1000 * 1000 // 2026-01-01 UTC
    val rows = (0 until 14).flatMap { day =>
      (0 until (if (day % 2 == 0) 2 else 3)).map(i =>
        (day * 10L + i, epoch0 + day * dayNs + i, 1L, "view", 1.0, "{}"))
    } ++ Seq(0, 1, 2).map(i => (900L + i, epoch0 + 15 * dayNs + i, 1L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Events.dailyAnomalies(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    // the spine closes the gap: 16 calendar days, not 15 observed ones
    assert(got.length == 16, got.map(_._1).mkString(","))
    val empty = got(14)
    assert(empty._1 == "2026-01-15" && empty._2 == 0L, s"empty day row: $empty")
    // a zero-volume day against a steady baseline is the loudest anomaly
    val base = (0 until 14).map(day => if (day % 2 == 0) 2.0 else 3.0)
    val mean = base.sum / base.length
    val sd = math.sqrt(base.map(v => (v - mean) * (v - mean)).sum / (base.length - 1))
    assert(empty._3.isDefined && empty._4, "pipeline-stopped day must flag")
    assert(math.abs(empty._3.get - (0.0 - mean) / sd) < 1e-9, s"z ${empty._3}")
    // the day after the gap scores against a baseline that INCLUDES the zero
    val after = got(15)
    assert(after._2 == 3L && after._3.isDefined, s"post-gap day: $after")
  }
}
