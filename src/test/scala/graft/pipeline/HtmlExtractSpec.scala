package graft.pipeline

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The generic HTML column transforms on hand-written pages — behavior the
  * parity-fixture oracle rows can't pin (arbitrary markup, quoting styles,
  * HTML entity semantics).
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.htmlToText(col("h"))).as[String].head()

  private def links(html: String): Seq[String] =
    Seq(html).toDF("h").select(HtmlExtract.linkUrls(col("h"))).as[Seq[String]].head()

  test("htmlToText: script/style/comment CONTENT vanishes, tags strip, whitespace collapses") {
    val page =
      """<html><head><style>body { color: red } a > b { x: 1 }</style>
        |<script type="text/js">if (a < b && c > d) { alert("gone"); }</script></head>
        |<body><!-- secret <b>comment</b> -->
        |<h1>Title</h1>  <p>one
        |   two</p><div><span>three</span></div></body></html>""".stripMargin
    assert(text(page) == "Title one two three")
  }

  test("htmlToText: entity decoding, &amp; last (double-escaped entities stay literal)") {
    assert(text("<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y &amp; z</p>") ==
      "a <tag> \"q\" 's' x y & z")
    // HTML semantics: &amp;lt; is the LITERAL text "&lt;", not "<"
    assert(text("<p>&amp;lt;</p>") == "&lt;")
  }

  test("htmlToText: case-insensitive tag and script handling") {
    assert(text("<P>ok</P><SCRIPT>var x;</SCRIPT><p>more</p>") == "ok more")
  }

  test("linkUrls: double- and single-quoted hrefs, other attributes, no links") {
    val page = """<a href="http://a/1">x</a> <A CLASS="k" HREF="http://a/2">y</A>
                 |<a title='t' href='http://b/3'>z</a> <area href="http://no/">""".stripMargin
    assert(links(page).toSet == Set("http://a/1", "http://a/2", "http://b/3"))
    assert(links("<p>no anchors here</p>").isEmpty)
  }

  private def anchors(html: String): Seq[(String, String)] =
    Seq(html).toDF("h").select(HtmlExtract.anchorTexts(col("h")))
      .as[Seq[(String, String)]].head()

  test("anchorTexts: element boundaries, quote styles, inner markup stripped") {
    val page = """<a href="http://a/1">first</a> gap <a title='t' href='http://b/2'>has <b>bold</b>
                 | and  spaces</a><a class="k" href="http://c/3"><img src="x"></a>""".stripMargin
    assert(anchors(page) == Seq(
      ("http://a/1", "first"),
      ("http://b/2", "has bold and spaces"),
      ("http://c/3", "")))
    assert(anchors("<p>none</p>").isEmpty)
  }

  private def canon(url: String): String =
    Seq(url).toDF("u").select(HtmlExtract.canonicalizeUrl(col("u"))).as[String].head()

  test("canonicalizeUrl: case, ports, slashes, index.html, tracking params, sort, fragment") {
    assert(canon("HTTP://WWW.X.COM:80/a//b?utm_source=y&b=2&a=1#frag")
      == "http://www.x.com/a/b?a=1&b=2")
    assert(canon("https://x.com:443/p/index.html") == "https://x.com/p/")
    // non-default ports survive; :8080 must not lose its ':80' prefix
    assert(canon("http://x.com:8080/a") == "http://x.com:8080/a")
    // :443 is NOT default for http; :80 not for https
    assert(canon("http://x.com:443/a") == "http://x.com:443/a")
    // no path -> '/', no surviving params -> no '?'
    assert(canon("http://X.com?utm_campaign=z&gclid=1") == "http://x.com/")
    assert(canon("https://a.b/c?fbclid=x&msclkid=y") == "https://a.b/c")
    // index.html only strips as a whole trailing segment
    assert(canon("http://x.com/index.html.bak") == "http://x.com/index.html.bak")
  }

  private def regdom(host: String): String =
    Seq(host).toDF("h").select(HtmlExtract.registrableDomain(col("h"))).as[String].head()

  test("registrableDomain: two-level suffixes take three labels, plain TLDs take two") {
    assert(regdom("www.example.com") == "example.com")
    assert(regdom("a.b.c.example.com") == "example.com")
    assert(regdom("news.bbc.co.uk") == "bbc.co.uk")
    assert(regdom("deep.sub.site.gov.uk") == "site.gov.uk")
    assert(regdom("example.com") == "example.com")
    // the host IS a two-level suffix: nothing above it to register — the
    // heuristic hands back the last two labels (PSL would reject outright)
    assert(regdom("co.uk") == "co.uk")
    assert(regdom("localhost") == "localhost")
  }
}
