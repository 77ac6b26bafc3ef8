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
