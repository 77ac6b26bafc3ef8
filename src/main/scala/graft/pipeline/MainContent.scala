package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Main-content extraction (boilerplate removal) — the step between
  * [[HtmlExtract.htmlToText]] and the quality screens. A crawl page is
  * mostly chrome: navigation bars, link sidebars, footers. Plain tag
  * stripping keeps all of it; training-data pipelines score text BLOCKS
  * and keep only content-like ones (JusText, Kohlschütter et al.'s
  * Boilerpipe). This is that block classifier as a fixed chain of native
  * higher-order/regexp expressions — map-only, codegen-resident, no UDFs,
  * zero state, so at 100 TB it rides the scan exactly like
  * [[HtmlExtract.htmlToText]] does:
  *
  *  1. strip script/style/comment elements (content-bearing non-text);
  *  2. split the page into blocks at block-level element boundaries
  *     (`p`, `div`, `section`, `nav`, `footer`, `li`, headings, ...);
  *  3. per block, compute the three classic boilerplate signals:
  *     - text length after inline-tag strip + entity decode + whitespace
  *       collapse (chrome blocks are short);
  *     - link density = anchor-text chars / text chars (nav/sidebar
  *       blocks are mostly anchor text);
  *     - stopword ratio = stopword tokens / alpha tokens (boilerplate
  *       strings — "privacy terms imprint" — carry no function words);
  *  4. keep blocks with length >= [[MinBlockChars]], link density <=
  *     [[MaxLinkDensity]], stopword ratio >= [[MinStopRatio]]; join
  *     survivors with single spaces.
  *
  * The thresholds are the operator's contract, not tuning noise: the
  * fixture plants one block per gate that fails exactly that gate and two
  * content blocks that clear all three (one containing an inline link, so
  * links alone never disqualify prose) — see [[mainContentQuery]].
  *
  * Cited reference behavior: q1_mapper.py:19-36 tokenizes whatever text
  * the file source hands it — on crawl data the text handed onward must
  * be the article, not the chrome, or every downstream count measures
  * boilerplate.
  */
object MainContent extends QueryModule {

  /** Blocks shorter than this (after cleaning) are chrome: headings,
    * button labels, breadcrumbs.
    */
  val MinBlockChars = 40

  /** Blocks whose anchor-text share exceeds this are link lists. */
  val MaxLinkDensity = 0.4

  /** Blocks with a stopword share below this are boilerplate strings
    * (copyright lines, tag clouds) — prose carries function words.
    */
  val MinStopRatio = 0.15

  private val BlockSplit =
    "(?i)</?(?:p|div|section|article|aside|main|header|footer|nav|ul|ol|li|h[1-6]|table|tr|td|th|blockquote|pre|form)\\b[^>]*>"

  /** Inline-tag strip + entity decode + whitespace collapse — the same
    * normalization [[HtmlExtract.htmlToText]] applies, factored so block
    * bodies and anchor inners normalize identically.
    */
  private def cleanText(c: Column): Column = {
    val noTags = regexp_replace(c, "(?s)<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }
    trim(regexp_replace(unescaped, "[ \\t\\n\\r]+", " "))
  }

  /** The extractor: HTML in, main-content text out (kept blocks joined
    * with single spaces; empty string when nothing survives).
    */
  def mainContent(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = split(noComment, BlockSplit)
    val scored = transform(blocks, b => {
      val text = cleanText(b)
      val linkChars = aggregate(
        transform(
          regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1)),
          i => length(cleanText(i))),
        lit(0), (acc, x) => acc + x)
      val tokens = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
      struct(text.as("text"), length(text).as("n"),
        linkChars.as("link_chars"), size(tokens).as("n_tokens"),
        size(filter(tokens, t =>
          t.isin(graft.operators.TextStats.stopWords: _*))).as("n_stop"))
    })
    val kept = filter(scored, s =>
      s.getField("n") >= MinBlockChars &&
        s.getField("link_chars").cast("double") <=
          lit(MaxLinkDensity) * s.getField("n").cast("double") &&
        s.getField("n_stop").cast("double") >=
          lit(MinStopRatio) * s.getField("n_tokens").cast("double"))
    array_join(transform(kept, s => s.getField("text")), " ")
  }

  /** Expected survivor texts, shared between the Spark page builder and
    * the DuckDB oracle (which concatenates them verbatim — it never runs
    * the extractor). Stopword margins are wide: content1 is 5/17 stop
    * tokens, content2 is 7/24 — both safely over [[MinStopRatio]];
    * content2's inline anchor is 19 of ~110 chars — safely under
    * [[MaxLinkDensity]].
    */
  private val Content1Pre = "The main article about item "
  private val Content1Post =
    " says Tom & Jerry is a story the reader is happy to follow."
  private val Content2Pre = "It is an archive entry "
  private val Content2Post =
    " and the text here is a bit longer than the bar we set for it."
  private val Content2Link = "Read the full story"

  /** The fixture page: every gate gets a planted block that fails exactly
    * it, around two formula-derived content blocks that pass all three —
    *  - `<nav>` block: all text inside anchors (density 1.0, length and
    *    stop ratio both fine) — dropped ONLY by the link gate;
    *  - `<h1>` block: short — dropped ONLY by the length gate;
    *  - `<footer>` block: long, link-free, zero stopwords — dropped ONLY
    *    by the stopword gate;
    *  - content block 1: prose with an `&amp;` entity (decode pinned);
    *  - content block 2: prose with an inline `<a>` whose text must be
    *    KEPT (low density — links alone never disqualify prose).
    */
  private def pageOf: Column = {
    val id = col("doc_id")
    concat(
      lit("<html lang=\"en\"><head><title>Site</title>" +
        "<style>p { color: #000; }</style>" +
        "<script>if (1 < 2 && 2 > 1) { alert(\"the a is are an\"); }</script>" +
        "</head><body>\n" +
        "<!-- the a is are an comment -->\n" +
        "<nav><a href=\"/\">Home page of the site</a> " +
        "<a href=\"/x\">About all the things that are here</a> " +
        "<a href=\"/y\">Contact the team</a></nav>\n" +
        "<h1>Item "), id, lit("</h1>\n<p>"),
      lit(Content1Pre), id, lit(Content1Post.replace("&", "&amp;")),
      lit("</p>\n<p>"), lit(Content2Pre), id, lit(Content2Post),
      lit(" <a href=\"/more\">" + Content2Link + "</a></p>\n" +
        "<footer>Copyright 2026 SiteCorp GmbH privacy terms imprint " +
        "contact careers sitemap help desk support portal legal notices" +
        "</footer></body></html>"))
  }

  /** `html_main_content`: build the fixture page, extract, emit md5 +
    * length of the recovered main content. The oracle concatenates the
    * expected survivor strings straight from the formulas — a gate
    * misfiring in either direction (chrome kept, prose dropped, link text
    * lost, entity undecoded) changes the digest on every row.
    */
  def mainContentQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("extracted", mainContent(pageOf))
      .select(col("doc_id"),
        expr("md5(cast(extracted as binary))").as("digest"),
        length(col("extracted")).cast("bigint").as("n_chars"))
      .orderBy("doc_id")

  private def mainContentSql = {
    def q(s: String) = s.replace("'", "''")
    s"""WITH e AS (
          SELECT doc_id,
                 '${q(Content1Pre)}' || doc_id || '${q(Content1Post)}'
                   || ' ' ||
                 '${q(Content2Pre)}' || doc_id || '${q(Content2Post)}'
                   || ' ${q(Content2Link)}' AS expected
          FROM documents
        )
        SELECT doc_id, md5(expected) AS digest,
               CAST(length(expected) AS BIGINT) AS n_chars
        FROM e ORDER BY doc_id"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "html_main_content" -> (mainContentQuery _),
  )

  override def oracle: Map[String, String] = Map(
    "html_main_content" -> mainContentSql,
  )
}
