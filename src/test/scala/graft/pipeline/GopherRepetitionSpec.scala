package graft.pipeline

import graft.SparkSpec

/** Gopher repetition counters on hand-computed documents — the
  * independent check next to the mirrored-recompute oracle row
  * (`text_gopher_repetition`). All expectations here are derived BY HAND
  * from the parity-page construction (8-word lines, 2-line paragraphs,
  * doc_id%3 plants lines 1+2, doc_id%5 plants line 1), so a formula bug
  * that mirrors across engines still fails here — in particular the
  * position-coverage union for duplicated n-grams, whose boundary cases
  * (window clamping at both ends, line-crossing grams that do NOT repeat)
  * are each asserted explicitly.
  */
class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  // 16 distinct 2-char words -> two 8-word base lines of 23 chars each.
  private val T = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"

  private def rows(docs: (Long, String)*): Map[Long, Seq[Any]] =
    GopherRepetition.repetitionOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.toSeq.tail)
      .toMap

  test("no plants (doc_id=1): zero dup metrics, single-occurrence gram masses") {
    val r = rows((1L, T))(1L)
    // lines: 2 x 23 chars; 1 paragraph l1\nl2 = 47; 16 words / 32 chars.
    // top-n mass with all grams unique = 1 x (2n + (n-1) separators - (n-1)) = 2n.
    assert(r == Seq(2L, 0L, 0L, 46L, 1L, 0L, 0L, 47L, 32L,
      4L, 6L, 8L, 0L, 0L, 0L, 0L, 0L, 0L,
      // keep fails on the top-3/4 gates: a SINGLE 3-gram is already
      // 600/576 of 18% of a 16-word doc — the published thresholds
      // assume the >=50-word floor of text_gopher_filter.
      false), s"got $r")
  }

  test("planted lines 1+2 (doc_id=3): whole-page duplicate, full coverage") {
    val r = rows((3L, T))(3L)
    // ll = [l1,l2,l1,l2]: 2 dup occurrences / 46 dup chars / 92 total.
    // paras = [l1\nl2, l1\nl2]: 1 dup / 47 dup chars / 94 total.
    // word stream has period 16 -> every word is covered by a duplicated
    // n-gram for every n in 5..10 (64 chars), and every n-gram in the
    // first copy repeats (mass 2 x 2n).
    assert(r == Seq(4L, 2L, 46L, 92L, 2L, 1L, 47L, 94L, 64L,
      8L, 12L, 16L, 64L, 64L, 64L, 64L, 64L, 64L, false), s"got $r")
  }

  test("planted line 1 only (doc_id=5): coverage stops at the line boundary") {
    val r = rows((5L, T))(5L)
    // ll = [l1,l2,l1]: 1 dup occurrence / 23 dup chars / 69 total.
    // paras = [l1\nl2, l1] - no dup; 70 chars.
    // Duplicated n-grams live INSIDE the two l1 copies only, so coverage
    // is words 1..8 and 17..24 (32 chars) for n=5..8; a 9- or 10-gram
    // cannot fit inside an 8-word line, and the line-crossing grams
    // (l1->l2 vs l2->l1) differ -> zero.
    assert(r == Seq(3L, 1L, 23L, 69L, 2L, 0L, 0L, 70L, 48L,
      8L, 12L, 16L, 32L, 32L, 32L, 32L, 0L, 0L, false), s"got $r")
  }

  test("a long distinct document passes every gate") {
    // 64 distinct 2-char words, doc_id coprime to 3 and 5: no plants, no
    // dups, and the single-occurrence gram masses now clear the ceilings
    // (e.g. top-4: 100*8 = 800 <= 16*128 = 2048).
    val words = (0 until 64).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val r = rows((7L, words.mkString(" ")))(7L)
    assert(r(8) == 128L && r.last == true, s"got $r")
    assert(r(1) == 0L && r(5) == 0L && r(12) == 0L, s"no dup signals: $r")
  }
}
