package graft.pipeline

import graft.SparkSpec

/** The sitemap parser: urlset/index shapes, one-level recursion contract,
  * child resolution against the fetched set, lastmod binding.
  */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(rows: (String, String, Boolean, String)*) =
    Sitemaps.parseSitemaps(
      rows.toDF("regdom", "loc", "is_root", "xml"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)))).toSet

  test("direct urlset root: every <url> row with its lastmod") {
    val xml = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
      "<url><loc>https://a.com/p/1</loc><lastmod>2024-01-05</lastmod></url>" +
      "<url><loc>https://a.com/p/2</loc></url></urlset>"
    assert(parse(("a.com", "https://a.com/sitemap.xml", true, xml)) == Set(
      ("a.com", "https://a.com/p/1", Some("2024-01-05")),
      ("a.com", "https://a.com/p/2", None)))
  }

  test("index root resolves children by loc against the fetched set; non-roots contribute nothing alone") {
    val idx = "<sitemapindex>" +
      "<sitemap><loc>https://a.com/sm0.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.com/sm1.xml</loc></sitemap></sitemapindex>"
    val sm0 = "<urlset><url><loc>https://a.com/x</loc></url></urlset>"
    val sm1 = "<urlset><url><loc>https://a.com/y</loc><lastmod>2024-02-01</lastmod></url></urlset>"
    assert(parse(
      ("a.com", "https://a.com/sitemap.xml", true, idx),
      ("a.com", "https://a.com/sm0.xml", false, sm0),
      ("a.com", "https://a.com/sm1.xml", false, sm1)) == Set(
      ("a.com", "https://a.com/x", None),
      ("a.com", "https://a.com/y", Some("2024-02-01"))))
  }

  test("a child referenced by the index but never fetched is silently absent (join semantics)") {
    val idx = "<sitemapindex><sitemap><loc>https://a.com/sm9.xml</loc></sitemap></sitemapindex>"
    assert(parse(("a.com", "https://a.com/sitemap.xml", true, idx)).isEmpty)
  }

  test("an index nested under an index rejects loudly") {
    val idx = "<sitemapindex><sitemap><loc>https://a.com/sm0.xml</loc></sitemap></sitemapindex>"
    val nested = "<sitemapindex><sitemap><loc>https://a.com/sm1.xml</loc></sitemap></sitemapindex>"
    intercept[Exception](parse(
      ("a.com", "https://a.com/sitemap.xml", true, idx),
      ("a.com", "https://a.com/sm0.xml", false, nested)))
  }

  test("malformed XML contributes nothing — the lenient crawl contract (loss is VISIBLE in coverage)") {
    // broken sitemaps are routine in a real crawl; unlike the document
    // front doors (where a silent drop is invisible data loss), a dropped
    // sitemap surfaces as crawled-only inflation in the coverage audit,
    // so the lenient skip is the production-sane contract — pinned here
    val good = "<urlset><url><loc>https://a.com/ok</loc></url></urlset>"
    assert(parse(
      ("a.com", "https://a.com/sitemap.xml", true, "<urlset><url><loc>broken"),
      ("b.com", "https://b.com/sitemap.xml", true, "not xml at all"),
      ("c.com", "https://c.com/sitemap.xml", true, good.replace("a.com", "c.com"))) ==
      Set(("c.com", "https://c.com/ok", None)))
  }

  test("child resolution is domain-scoped: another domain's same loc does not leak") {
    val idx = "<sitemapindex><sitemap><loc>https://shared/sm.xml</loc></sitemap></sitemapindex>"
    val smB = "<urlset><url><loc>https://b.com/z</loc></url></urlset>"
    // b.com fetched a child under the same loc string; a.com's index must not pick it up
    assert(parse(
      ("a.com", "https://a.com/sitemap.xml", true, idx),
      ("b.com", "https://shared/sm.xml", false, smB)).isEmpty)
  }
}
