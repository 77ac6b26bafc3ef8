package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Nearest-rank quantile semantics on a hand-computable fixture: values
  * 1..10 → p50 = 5 (⌈0.5·10⌉ = 5th), p90 = 9, p99 = 10 (⌈9.9⌉ = 10th);
  * values 1..3 → p50 = 2, p90 = p99 = 3. Picked values, no interpolation.
  */
class QuantilesGoldenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_quant_fixture").toString
    val rows =
      (1 to 10).map(i => (i.toLong, 1700000000000000000L + i, 1L, "a", i.toDouble, "{}")) ++
        (1 to 3).map(i => (100L + i, 1700000000000000000L + i, 1L, "b", i.toDouble, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("nearest-rank quantiles pick the exact ranked values per key") {
    val rows = Events.valueQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows("a") == ((10L, 5.0, 9.0, 10.0)))
    assert(rows("b") == ((3L, 2.0, 3.0, 3.0)))
  }

  test("histogram quantiles: hand-computed edges on a uniform fixture, near exact on real data") {
    // key "a": values 1..10, min 1, max 10 → bucket width 9/1000; value v
    // lands in bucket floor((v−1)/9·1000). cum ≥ ⌈q·10⌉ picks the bucket of
    // the ⌈q·10⌉-th value, upper edge = 1 + (b+1)·9/1000 — within one width
    // of the exact nearest-rank pick.
    val rows = Events.valueQuantilesHist(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val w = 9.0 / Events.HistBuckets
    assert(rows("a")._1 == 10L)
    assert(math.abs(rows("a")._2 - 5.0) <= w + 1e-9, s"p50 ${rows("a")._2}")
    assert(math.abs(rows("a")._3 - 9.0) <= w + 1e-9, s"p90 ${rows("a")._3}")
    assert(math.abs(rows("a")._4 - 10.0) <= w + 1e-9, s"p99 ${rows("a")._4}")
    // key "b": values 1..3 — the max itself is clamped into the last bucket
    assert(rows("b")._1 == 3L && math.abs(rows("b")._4 - 3.0) <= 2.0 / Events.HistBuckets)

    // real data: every histogram pick within one bucket width of the exact
    // nearest-rank answer per type
    val sf = "/root/testdata/sf0.001"
    val exact = Events.valueQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val ranges = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(min("value"), max("value")).collect()
      .map(r => r.getString(0) -> (r.getDouble(2) - r.getDouble(1))).toMap
    Events.valueQuantilesHist(spark, sf).collect().foreach { r =>
      val t = r.getString(0)
      val width = ranges(t) / Events.HistBuckets
      assert(math.abs(r.getDouble(2) - exact(t)._1) <= width + 1e-9, s"$t p50")
      assert(math.abs(r.getDouble(3) - exact(t)._2) <= width + 1e-9, s"$t p90")
      assert(math.abs(r.getDouble(4) - exact(t)._3) <= width + 1e-9, s"$t p99")
    }
  }

  test("PII scrub redacts planted emails and digit runs, flags changed rows") {
    val df = Seq(
      (1L, """{"user": "alice.b_1%x@mail-host.example.com", "id": 12345}"""),
      (2L, """{"note": "no pii here"}"""),
      (3L, """{"ids": [7, 42]}"""))
      .toDF("event_id", "props")
    val rows = Events.scrubPiiOf(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    // n_redacted counts digit runs in the ORIGINAL props (the "1" inside
    // the address plus "12345"), independent of the email pass
    assert(rows(1L) == ((2L, """{"user": "<email>", "id": #}""", true)), rows(1L).toString)
    assert(rows(2L) == ((0L, """{"note": "no pii here"}""", false)))
    assert(rows(3L) == ((2L, """{"ids": [#, #]}""", true)))
  }
}
