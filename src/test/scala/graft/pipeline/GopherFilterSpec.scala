package graft.pipeline

import graft.SparkSpec

/** Gopher-rule counters and keep decision on hand-computed documents —
  * the independent check next to the mirrored-formula oracle row
  * (`text_gopher_filter`): these expected values are derived BY HAND, so
  * a formula bug that mirrors across engines still fails here.
  */
class GopherFilterSpec extends SparkSpec {
  import spark.implicits._

  private def rows(docs: (Long, String)*): Map[Long, (Long, Long, Long, Long, Long, Long, Long, Long, Boolean)] =
    GopherFilter.gopherOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9)))
      .toMap

  // 50 words x 4 chars, alphabetic, with 'the'/'and' present: passes all gates
  private val good = (Seq.fill(24)("word") ++ Seq("the", "and") ++
    Seq.fill(24)("word")).mkString(" ")

  test("hand-computed counters on a passing document") {
    val r = rows((1L, good))(1L)
    assert(r == ((50L, 198L, 50L, 0L, 1L, 0L, 0L, 2L, true)),
      s"got $r: 50 words, 198 chars (48x4+3+3), all alpha, one line, the+and present")
  }

  test("word-count gate: 49 words fail, mean-length gates catch flooded words") {
    val short49 = (Seq.fill(23)("word") ++ Seq("the", "and") ++
      Seq.fill(24)("word")).mkString(" ")
    assert(!rows((1L, short49))(1L)._9, "49 words is under the 50 floor")
    // 50 two-char words: mean word length 2 < 3 -> dropped
    val tiny = (Seq.fill(48)("ab") ++ Seq("the", "and")).mkString(" ")
    assert(!rows((2L, tiny))(2L)._9, "mean word length 2.1 is under 3")
    // 50 words of 12 chars: mean 12 > 10 -> dropped
    val fat = (Seq.fill(48)("abcdefghijkl") ++ Seq("thethethethe", "andandandand"))
      .mkString(" ") + " the and " + Seq.fill(0)("x").mkString
    val fatRow = rows((3L, fat))(3L)
    assert(!fatRow._9, s"mean word length 12 is over 10: $fatRow")
  }

  test("symbol, bullet, ellipsis, alpha and function-word gates") {
    // 6 '#' among 50 words: 10*6 > 50 -> dropped
    val symbols = good + " # # # # # #"
    val sr = rows((1L, symbols))(1L)
    assert(sr._4 == 6L && !sr._9, s"56 words, 6 symbols: 60 > 56 drops it: $sr")
    // every line a bullet (1 line): 10*1 > 9*1 -> dropped
    assert(!rows((2L, "- " + good))(2L)._9, "100% bullet lines")
    // 2 of 4 lines end with ellipsis: 20 > 12 -> dropped; counters exact
    val ell = s"$good...\nplain line\n$good...\nanother plain"
    val er = rows((3L, ell))(3L)
    assert(er._5 == 4L && er._6 == 0L && er._7 == 2L && er._4 == 2L && !er._9,
      s"4 lines, 0 bullets, 2 ellipsis ends (and 2 '...' symbols): 20 > 12 drops it: $er")
    // numeric flood: 30 of 60 words non-alpha -> 5*30 < 4*60 -> dropped
    val nums = good + " " + (1 to 10).map(_ => "12345").mkString(" ")
    val nr = rows((4L, nums))(4L)
    assert(nr._3 == 50L && nr._1 == 60L && nr._9,
      s"50/60 alpha passes (5*50 >= 4*60): $nr")
    val nums2 = good + " " + (1 to 14).map(_ => "12345").mkString(" ")
    assert(!rows((5L, nums2))(5L)._9, "50/64 alpha fails (250 < 256)")
    // only one function word present -> dropped
    val oneStop = (Seq.fill(49)("word") ++ Seq("the")).mkString(" ")
    val or = rows((6L, oneStop))(6L)
    assert(or._8 == 1L && !or._9, s"one required stop is under 2: $or")
  }
}
