package graft.pipeline

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The generic cleaning transforms on hand-written inputs — rule edges the
  * formula-oracle fixture rows can't exercise (tab words, \r endings,
  * case variants, pattern overlap order).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def c4(text: String): (Int, Int, Boolean, String) = {
    val (a, b, c, d) = Cleaning.c4Filter(col("t"))
    Seq(text).toDF("t").select(a, b, c, d).as[(Int, Int, Boolean, String)].head()
  }

  private def pii(text: String): String =
    Seq(text).toDF("t").select(Cleaning.piiRedact(col("t"))).as[String].head()

  test("c4Filter: line rules — terminal punctuation, 3 words, javascript, word split on tabs") {
    val page = Seq(
      "A good first sentence.", // kept
      "no ending punctuation here", // dropped
      "Too short.", // dropped: 2 words
      "tabbed\twords\tstill\tcount.", // kept: tabs separate words
      "Contains JavaScript somewhere in it.", // dropped: case-insensitive
      "Ends with a question?", // kept
      "Ends with a bang!", // kept
      "Ends with a quote\"", // kept
      "trailing carriage return stays dropped.\r" // dropped: \r after the period
    ).mkString("\n")
    val (nLines, nKept, pageKept, cleaned) = c4(page)
    assert(nLines == 9 && nKept == 5)
    assert(pageKept) // 5 survivors, no lorem/brace
    assert(cleaned == Seq("A good first sentence.", "tabbed\twords\tstill\tcount.",
      "Ends with a question?", "Ends with a bang!", "Ends with a quote\"").mkString("\n"))
  }

  test("c4Filter: page gates — lorem ipsum, brace, under five survivors") {
    val five = Seq.tabulate(5)(i => s"Perfectly valid sentence number $i.")
    assert(c4(five.mkString("\n"))._3)
    assert(!c4((five :+ "then Lorem Ipsum appears").mkString("\n"))._3)
    assert(!c4((five :+ "code { here }").mkString("\n"))._3)
    assert(!c4(five.take(4).mkString("\n"))._3) // 4 survivors < 5
  }

  test("piiRedact: all three types, SSN-before-phone ordering, non-PII untouched") {
    assert(pii("mail a.b+c@sub.example.org now") == "mail <EMAIL> now")
    assert(pii("ssn 123-45-6789 phone +1-555-0100 done") == "ssn <SSN> phone <PHONE> done")
    // 2-3-4 digit grouping is a phone (not an SSN, whose shape is 3-2-4)
    assert(pii("+12-345-6789") == "<PHONE>")
    assert(pii("v1.2-3 semver and 10-20-30 dates stay") == "v1.2-3 semver and 10-20-30 dates stay")
  }

  test("dedupLinesOf: global first occurrence wins, order preserved, empty docs survive the join") {
    val docs = Seq(
      (0L, "nav\nalpha\nfooter"),
      (1L, "nav\nbeta\nfooter"),   // nav+footer dup away, beta stays
      (2L, "nav\nalpha\nfooter"),  // everything dups away -> 0 kept
      (3L, "gamma\nnav\ndelta")    // interior dup: gamma+delta keep their order
    ).toDF("doc_id", "text")
    val got = Cleaning.dedupLinesOf(docs, col("text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0L) == ((3L, md5("nav\nalpha\nfooter"))))
    assert(got(1L) == ((1L, md5("beta"))))
    assert(got(2L) == ((0L, md5(""))))
    assert(got(3L) == ((2L, md5("gamma\ndelta"))))
  }

  private def moji(text: String): String =
    Seq(text).toDF("t").select(Cleaning.repairMojibake(col("t"))).as[String].head()

  test("repairMojibake: fixes the classic double encoding, NBSP continuation included") {
    // "Caf\u00e9" whose UTF-8 bytes (43 61 66 C3 A9) were misread as Latin-1
    assert(moji("Caf\u00c3\u00a9 bar") == "Caf\u00e9 bar")
    // "\u00e0" (C3 A0): continuation byte A0 decodes to NBSP, not a letter
    assert(moji("voil\u00c3\u00a0!") == "voil\u00e0!")
    // 3-byte sequence: EURO SIGN (E2 82 AC) misread as three Latin-1 chars
    assert(moji("price \u00e2\u0082\u00ac5.") == "price \u20ac5.")
  }

  test("repairMojibake: passthrough guards - no signature, non-Latin-1, invalid recovery") {
    assert(moji("plain ascii stays.") == "plain ascii stays.")
    // genuinely accented text: e-acute followed by ASCII never matches the
    // lead+continuation signature, so it is NOT "repaired" into garbage
    assert(moji("Caf\u00e9 r\u00e9el") == "Caf\u00e9 r\u00e9el")
    // a char past U+00FF can't come from a Latin-1 misdecode: passthrough
    assert(moji("\u00c3\u00a9 with \u4e2d text") == "\u00c3\u00a9 with \u4e2d text")
    // signature present but the recovered bytes are invalid UTF-8
    // (C3 A9 is fine, the stray FF is not): passthrough, no data loss
    assert(moji("x \u00c3\u00a9\u00ff y") == "x \u00c3\u00a9\u00ff y")
  }
}
