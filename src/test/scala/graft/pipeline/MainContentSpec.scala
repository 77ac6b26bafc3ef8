package graft.pipeline

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Block-classifier semantics for main-content extraction: each gate
  * pinned in isolation on hand-written pages (the oracle row
  * `html_main_content` pins the end-to-end parity fixture).
  */
class MainContentSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(Tuple1(html)).toDF("page")
      .select(MainContent.mainContent(col("page")).as("t"))
      .as[String].head()

  // clears every gate: 69 chars, 5/14 stop tokens, no links
  private val Prose =
    "The story is a long one and the reader is happy to follow it through."

  test("prose survives; an empty page yields an empty string") {
    assert(extract(s"<html><body><p>$Prose</p></body></html>") == Prose)
    assert(extract("") == "")
    assert(extract("<html><body></body></html>") == "")
  }

  test("length gate: short blocks are chrome even when stop-rich and link-free") {
    assert(extract("<body><h1>The a is an are</h1><p>" + Prose + "</p></body>")
      == Prose)
  }

  test("link-density gate: a block of anchors drops even when long and stop-rich") {
    val nav = "<nav><a href=\"/\">Home page of the site</a> " +
      "<a href=\"/x\">About all the things that are here</a> " +
      "<a href=\"/y\">Contact the team</a></nav>"
    assert(extract(s"<body>$nav<p>$Prose</p></body>") == Prose)
  }

  test("stopword gate: long link-free boilerplate strings drop") {
    val footer = "<footer>Copyright 2026 SiteCorp GmbH privacy terms " +
      "imprint contact careers sitemap help desk support portal</footer>"
    assert(extract(s"<body><p>$Prose</p>$footer</body>") == Prose)
  }

  test("an inline link inside prose is KEPT, text included") {
    val html = s"<body><p>$Prose <a href='/more'>Read the full story</a></p></body>"
    assert(extract(html) == s"$Prose Read the full story")
  }

  test("script/style/comment content never reaches a block, even stop-rich") {
    val html = "<body><script>var x = \"the a is an are the a is an are\";</script>" +
      "<style>p { content: 'the a is an are the a is an are'; }</style>" +
      "<!-- the a is an are the a is an are the a is an are -->" +
      s"<p>$Prose</p></body>"
    assert(extract(html) == Prose)
  }

  test("multiple surviving blocks join with single spaces in document order") {
    val p2 = "It is an archive entry and the text here is a bit longer than the bar."
    assert(extract(s"<body><p>$Prose</p><div>junk</div><p>$p2</p></body>")
      == s"$Prose $p2")
  }

  test("entities decode in surviving text") {
    val raw = "Tom &amp; Jerry is a story the reader is happy to follow again."
    val html = s"<body><p>$raw</p></body>"
    assert(extract(html) ==
      "Tom & Jerry is a story the reader is happy to follow again.")
  }
}
