package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** A/B readout semantics: counts and rates against an independent
  * recompute (own md5 assignment, own z formula), null calibration on
  * exchangeable variants, and a PLANTED effect the statistic must flag
  * with the right sign.
  */
class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }
  private def variantOf(u: Long): String =
    if (hash60(s"ab:$u") % 2 == 0) "A" else "B"

  private def ev(id: Long, u: Long, t: String, v: Double) =
    (id, Timestamp.valueOf("2024-01-01 00:00:00"), u, t, v, "{}")

  test("counts, rates, and z match an independent recompute; planted effect flags with sign") {
    val users = (1L to 60L).toSeq
    val (as, bs) = users.partition(variantOf(_) == "A")
    assert(as.nonEmpty && bs.nonEmpty, "fixture drift: both variants must occur")
    // plant: 80% of A converts (high-value purchase), 20% of B
    val aConv = as.take(as.size * 4 / 5)
    val bConv = bs.take(bs.size / 5)
    val rows =
      users.zipWithIndex.map { case (u, i) => ev(i * 10L, u, "view", 1.0) } ++
      (aConv ++ bConv).zipWithIndex.map { case (u, i) =>
        ev(100000L + i, u, "purchase", Events.AbConvValue + 5.0) } ++
      // sub-bar purchases must NOT count as conversions
      bs.take(3).zipWithIndex.map { case (u, i) =>
        ev(200000L + i, u, "purchase", Events.AbConvValue - 50.0) }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val r = Events.abZtestOf(df).collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert((na, ca, nb, cb) ==
      ((as.size.toLong, aConv.size.toLong, bs.size.toLong, bConv.size.toLong)))
    assert(r.getDouble(4) == aConv.size.toDouble / as.size)
    assert(r.getDouble(5) == bConv.size.toDouble / bs.size)
    // independent z
    val (p1, p2) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (p1 - p2) / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(6) - z) < 1e-12, s"z ${r.getDouble(6)} vs $z")
    // the planted A-advantage must be large and positive
    assert(r.getDouble(6) > 2.0, s"planted effect must flag: z = ${r.getDouble(6)}")
  }

  test("degenerate pools (all or none convert) emit NULL, never NaN/Inf") {
    val all = (1L to 10L).flatMap(u => Seq(
      ev(u * 2, u, "purchase", Events.AbConvValue + 1.0)))
    val none = (1L to 10L).map(u => ev(u, u, "view", 1.0))
    Seq(all, none).foreach { rows =>
      val r = Events.abZtestOf(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
        .collect().head
      assert(r.isNullAt(6), s"degenerate pool must yield NULL z: $r")
    }
  }

  test("k-anonymity: planted group sizes produce exact audit numbers") {
    // one day, one type: a 6-row group (safe at k=5) and a 2-row group
    // (exposed); bucket width 50 keeps values 0-49 together
    val rows =
      (1L to 6L).map(i => ev(i, i, "t", 10.0 + i)) ++
      (7L to 8L).map(i => ev(i, i, "t", 120.0))
    val r = Events.kAnonymityOf(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6)) ==
      (("t", 2L, 8L, 1L, 2L, 2L, 0.25)))
  }
}
