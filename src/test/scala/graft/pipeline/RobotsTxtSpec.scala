package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 9309 parser + longest-match decision semantics, pinned on
  * hand-written robots.txt payloads (the oracle row `html_robots_parsed`
  * pins the END-TO-END chain; these pin each grammar clause in isolation,
  * including the rejects the fixture formula cannot plant).
  */
class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private def rulesOf(robots: String): Set[(String, Boolean)] =
    RobotsTxt.parsedRules(
      Seq(("d.com", robots)).toDF("regdom", "robots_txt"))
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet

  test("group selection: a specific group beats *, and OTHER agents never apply") {
    val robots =
      """User-agent: OtherBot
        |Disallow: /everything
        |
        |User-agent: GraftBot
        |Disallow: /private
        |Allow: /private/open
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(rulesOf(robots) ==
      Set(("/private", false), ("/private/open", true)),
      "specific group's rules only: OtherBot's and *'s must both be ignored")
  }

  test("* group applies when no specific group exists; UA token match is case-insensitive") {
    val robots =
      """User-agent: OtherBot
        |Disallow: /everything
        |
        |USER-AGENT: *
        |DISALLOW: /tmp
        |""".stripMargin
    assert(rulesOf(robots) == Set(("/tmp", false)))
    assert(rulesOf(robots.replace("*", "gRaFtBoT")) == Set(("/tmp", false)),
      "the product token matches case-insensitively")
  }

  test("consecutive User-agent lines open ONE group; a UA line after rules starts a new one") {
    val robots =
      """User-agent: HelperBot
        |User-agent: graftbot
        |Disallow: /a
        |User-agent: HelperBot
        |Disallow: /b
        |""".stripMargin
    assert(rulesOf(robots) == Set(("/a", false)),
      "/a is in the shared (HelperBot, graftbot) group; /b is HelperBot-only")
  }

  test("comments, CRLF, tabs, empty Disallow, and pre-group rules") {
    val robots = "# header comment\r\n" +
      "Disallow: /orphan\r\n" + // before any UA line: no group, ignored
      "User-agent: * # trailing comment\r\n" +
      "Disallow: /private\t# inline comment after tab\r\n" +
      "Disallow:\r\n" + // empty value: allow-all marker, no rule
      "Allow:   /private/open  \r\n"
    assert(rulesOf(robots) ==
      Set(("/private", false), ("/private/open", true)),
      "orphan rule dropped, comments stripped, CR/tab/space-trimmed values")
  }

  test("non-directive lines (sitemap, garbage) neither contribute rules nor split groups") {
    val robots =
      """User-agent: *
        |Sitemap: https://d.com/sitemap.xml
        |Crawl-delay: 10
        |random garbage line
        |Disallow: /x
        |""".stripMargin
    assert(rulesOf(robots) == Set(("/x", false)),
      "/x still belongs to the * group across the ignored lines")
  }

  test("decision: longest match wins, Allow wins ties, no match means allowed") {
    val rules = Seq(
      ("d.com", "/private", false),
      ("d.com", "/private/open", true),
      ("d.com", "/tie", false),
      ("d.com", "/tie", true))
      .toDF("regdom", "path_prefix", "allow")
    val pages = Seq(
      (1L, "d.com", "/public/x"), // no match -> kept
      (2L, "d.com", "/private/x"), // disallow /private -> dropped
      (3L, "d.com", "/private/open/x"), // allow out-lengths disallow -> kept
      (4L, "d.com", "/tie/x"), // equal-length allow+disallow -> allow wins
      (5L, "e.org", "/private/x")) // domain with no rules at all -> kept
      .toDF("doc_id", "regdom", "path")
    val kept = RobotsTxt.robotsDecide(pages, rules)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("fixture payload formulas produce the planted rule classes") {
    val doms = Seq(("s0.com", 0), ("s1.org", 1), ("s2.net", 2))
      .toDF("regdom", "k")
      .select(col("regdom"), RobotsTxt.robotsPayload(col("k")).as("robots_txt"))
    val rules = RobotsTxt.parsedRules(doms)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rules == Set(
      // k=0 (k%3==0): empty Disallow -> no rules at all
      ("s1.org", "/private", false), // k=1: disallow + allow override
      ("s1.org", "/private/open", true),
      ("s2.net", "/private", false))) // k=2: inline-comment disallow only
  }

  test("Sitemap directive: group-independent, case-insensitive, comment/ws tolerant") {
    val doms = Seq(
      // pre-group placement + uppercase key + trailing comment
      ("a.com", "# hi\nSITEMAP: https://a.com/sm.xml\t# note\nUser-agent: *\nDisallow: /x"),
      // end-of-file placement inside a foreign bot's group + CRLF + spaces
      ("b.com", "User-agent: OtherBot\r\nDisallow: /\r\nSitemap:   https://b.com/s1.xml  \r\nsitemap: https://b.com/s2.xml"),
      // no directive at all; an empty value contributes nothing
      ("c.com", "User-agent: *\nDisallow: /y\nSitemap:")
    ).toDF("regdom", "robots_txt")
    val locs = RobotsTxt.sitemapLocs(doms)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(locs == Set(
      ("a.com", "https://a.com/sm.xml"),
      ("b.com", "https://b.com/s1.xml"),
      ("b.com", "https://b.com/s2.xml")))
    // and the RULE parser keeps ignoring the directive lines entirely
    val rules = RobotsTxt.parsedRules(doms)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rules == Set(("a.com", "/x"), ("c.com", "/y")))
  }
}
