package graft.operators

import graft.SparkSpec

/** Profiling semantics on a planted frame: null counts, exact distinct
  * counts (nulls excluded), and the documented LEXICOGRAPHIC min/max over
  * the string rendering — pinned by a double column whose string order
  * differs from its numeric order.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distincts, string min/max per column") {
    val df = Seq(
      (Option(1L), Option("b"), Option(2.5)),
      (Option(1L), Option.empty[String], Option(10.0)),
      (Option(3L), Option("a"), Option.empty[Double]))
      .toDF("id", "s", "v")
    val got = Profiling.profileOf(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got.keySet == Set("id", "s", "v"))
    assert(got("id") == ((0L, 2L, "1", "3")))
    assert(got("s") == ((1L, 2L, "a", "b")))
    // "10.0" < "2.5" lexicographically — the documented string-cast semantics
    assert(got("v") == ((1L, 2L, "10.0", "2.5")))
  }

  test("profile of an all-null column reports nulls and no values") {
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "empty")
    val got = Profiling.profileOf(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(got("empty") == ((2L, 0L, None, None)))
    assert(got("k") == ((0L, 2L, Some("1"), Some("2"))))
  }
}
