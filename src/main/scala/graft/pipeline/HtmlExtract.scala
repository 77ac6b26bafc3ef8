package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** HTML → text extraction and link harvesting — the WET-generation step of
  * a crawl pipeline (what turns a WARC response payload into a `documents`
  * row, and what feeds a link graph). The reference ingests free-text
  * lines (`q1_mapper.py:19-36` tokenizes whatever the file source hands
  * it); real crawl corpora hand it HTML, so the engine needs the
  * boilerplate step in front: strip markup, decode entities, collapse
  * whitespace, and pull the outbound links.
  *
  * Both operators are generic column transforms ([[htmlToText]],
  * [[linkUrls]]) built ONLY from native codegen'd functions — a fixed
  * chain of `regexp_replace` / `regexp_extract_all` / `replace`, no UDFs —
  * so extraction runs inside whole-stage codegen on the scan path, map-only
  * until the final sort/agg. Per-row cost is linear in the page; state is
  * zero. At 100 TB this is the same shape as the media decoders' landing
  * path: bytes in, text out, nothing shuffles but results.
  *
  * Oracle strategy (parity-fixture): Spark BUILDS a conformant page per
  * document — title/h1 from doc_id, the document text entity-escaped into
  * `<p>`, plus a `<style>` with `p > span` selectors, a `<script>` with
  * `<`/`&&`/quotes, an HTML comment containing tags, and entity text — and
  * extracts it back in the SAME projection. The DuckDB oracle recomputes
  * the EXPECTED text directly from the raw document (never running the
  * extractor), so a strip-order bug (tags before scripts), a missed
  * entity, or an over-eager collapse lands as a digest mismatch, and
  * script/style/comment CONTENT leaking through changes the hash.
  */
object HtmlExtract extends QueryModule {

  /** Generic HTML → plain text: remove script/style blocks (content and
    * all), comments, then tags; decode the common entities (`&amp;` LAST,
    * per HTML semantics — `&amp;lt;` must yield literal `&lt;`, not `<`);
    * collapse runs of blank space to one and trim. The whitespace class is
    * spelled `[ \t\n\r]` explicitly (not `\s`) so Spark/Java and RE2-style
    * engines agree byte-for-byte.
    */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }
    trim(regexp_replace(unescaped, "[ \\t\\n\\r]+", " "))
  }

  /** Generic link harvest: every `href` attribute of an `<a>` tag —
    * double-quoted links first, then single-quoted (order within each
    * quoting style is document order; downstream aggregation doesn't care).
    * Host resolution / relative-link filtering is the caller's job (see
    * [[linkHosts]] via `parse_url`). Unquoted hrefs (formally legal,
    * vanishingly rare in crawl data) are a documented scope cut.
    */
  def linkUrls(c: Column): Column = concat(
    regexp_extract_all(c, lit("(?is)<a\\s[^>]*?href=\"([^\"]*)\""), lit(1)),
    regexp_extract_all(c, lit("(?is)<a\\s[^>]*?href='([^']*)'"), lit(1)))

  private def escaped(c: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(c) { case (acc, (ch, e)) => replace(acc, lit(ch), lit(e)) }

  /** The deterministic fixture page: hostile-but-conformant HTML around
    * the escaped document text. Link section only when `links` (the text
    * fixture keeps its expected-output algebra link-free).
    */
  private def pageOf(links: Boolean): Column = {
    val id = col("doc_id")
    val linkPart =
      if (!links) lit("")
      else concat(
        lit("<p>See <a href=\"http://h"), id % 7,
        lit(".example.com/p/"), id,
        lit("\">first</a> and <a class=\"x\" href=\"https://h"), (id + 1) % 7,
        lit(".example.org/q?x="), id,
        lit("\">second</a> and <a href=\"http://h"), id % 7,
        lit(".example.com/again/"), id,
        lit("\">again</a> and <a href=\"/local/"), id,
        lit("\">relative</a>.</p>\n"))
    concat(
      lit("<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n<title>Doc "), id,
      lit("</title>\n<style type=\"text/css\"> body { color: #000; } p > span { x: 1; } </style>\n" +
        "<script>var n = "), id,
      lit("; if (n < 3 && n > 0) { alert(\"x & y\"); }</script>\n</head>\n<body>\n" +
        "<!-- comment with <tags> & stuff -->\n<h1 class=\"t\">Doc "), id,
      lit("</h1>\n"), linkPart,
      lit("<p>"), escaped(col("text")),
      lit("</p>\n<div>&nbsp;&amp; tail &#39;q&#39;</div>\n</body>\n</html>"))
  }

  /** `html_text_extract`: build the fixture page, extract, emit the md5 +
    * length of the recovered text. The oracle computes the expected string
    * straight from the raw document (title + h1 + text + entity tail,
    * whitespace-collapsed) — extraction must invert the page build exactly.
    */
  def textExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("extracted", htmlToText(pageOf(links = false)))
      .select(col("doc_id"),
        expr("md5(cast(extracted as binary))").as("digest"),
        length(col("extracted")).cast("bigint").as("n_chars"))
      .orderBy("doc_id")

  private val textExtractSql =
    s"""WITH e AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   'Doc ' || doc_id || ' Doc ' || doc_id || ' ' || text || ' & tail ''q''',
                   '[ \t\n\r]+', ' ', 'g')) AS expected
          FROM documents
        )
        SELECT doc_id, md5(expected) AS digest,
               CAST(length(expected) AS BIGINT) AS n_chars
        FROM e ORDER BY doc_id"""

  /** `html_link_hosts`: harvest every `<a href>` from the fixture pages,
    * resolve hosts with native `parse_url` (relative links resolve to NULL
    * and are dropped — the generic absolute-link filter), and aggregate
    * the crawl's host-level out-link profile: links and distinct linking
    * docs per host. This is the link-graph front door — swap the count for
    * an edge list and it feeds [[graft.operators.Graph]]'s PageRank. One
    * shuffle, at host grain; the oracle recomputes host membership from
    * the link formula, so a harvest or parse bug changes the counts.
    */
  def linkHosts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("url", explode(linkUrls(pageOf(links = true))))
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .filter(col("host").isNotNull)
      .groupBy("host")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("host")

  private val linkHostsSql =
    """WITH hosts AS (
         SELECT doc_id, 'h' || (doc_id % 7) || '.example.com' AS host, 2 AS n FROM documents
         UNION ALL
         SELECT doc_id, 'h' || ((doc_id + 1) % 7) || '.example.org' AS host, 1 AS n FROM documents
       )
       SELECT host, CAST(SUM(n) AS BIGINT) AS n_links,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM hosts GROUP BY host ORDER BY host"""

  /** Two-level public suffixes the registrable-domain heuristic knows. A
    * fixed table standing in for the (large, versioned) Public Suffix List:
    * the OPERATOR shape is the deliverable — at production scale the table
    * is a broadcast lookup refreshed with the PSL, the expression chain is
    * identical.
    */
  val TwoLevelSuffixes: Seq[String] =
    Seq("co.uk", "gov.uk", "com.au", "ac.jp", "co.jp", "com.br")

  /** DuckDB twin of [[registrableDomain]] over a host SQL expression —
    * the shared oracle fragment (used by the host-hygiene, robots, and
    * sitemap oracles).
    */
  private[pipeline] def regdomDuck(host: String): String =
    s"""CASE WHEN len(string_split($host, '.')) >= 3
              AND array_to_string(string_split($host, '.')[-2:], '.')
                  IN (${TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")})
             THEN array_to_string(string_split($host, '.')[-3:], '.')
             ELSE array_to_string(string_split($host, '.')[-2:], '.') END"""

  /** Registrable domain (eTLD+1) of a host column: last two labels, or last
    * three when the trailing two form a known two-level suffix
    * ("a.b.co.uk" -> "b.co.uk", "a.b.com" -> "b.com"). Native split /
    * element_at / isin — map-only, codegen'd.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(n >= 3 && last2.isin(TwoLevelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Max documents kept per registrable domain — the standard crawl-curation
    * cap that stops one boilerplate-heavy site from dominating a corpus.
    */
  val HostCap = 5

  /** Registrable domains excluded outright (spam / tracker farms in a real
    * crawl; fixture names here).
    */
  val BlockedDomains: Seq[String] = Seq("s3.com", "s5.co.uk", "s2.ac.jp")

  /** Shared Spark/DuckDB SQL fragment: each document's crawl URL. Multi-label
    * hosts rotate through sub-label, site, and an 8-way suffix mix (4 plain
    * TLDs + 4 two-level suffixes) so the registrable-domain branch takes
    * both paths corpus-wide.
    */
  /** Exposed for the streaming admission cap, which derives the identical
    * domain key ([[graft.streaming.CorpusIngest.domainCappedStream]]).
    */
  private[graft] def urlSql: String = urlSqlFragment

  private val urlSqlFragment =
    """'https://w' || (doc_id % 3) || '.s' || (doc_id % 7) || '.' ||
       CASE CAST(doc_id % 8 AS INT)
         WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'net' WHEN 3 THEN 'io'
         WHEN 4 THEN 'co.uk' WHEN 5 THEN 'com.au' WHEN 6 THEN 'gov.uk'
         ELSE 'ac.jp' END || '/p/' || doc_id"""

  /** `html_host_caps`: the crawl host-hygiene chain — parse each document's
    * URL to a host (`parse_url`, pinned by the oracle recomputing the host
    * from the URL formula), reduce to the registrable domain
    * ([[registrableDomain]]), drop blocklisted domains with a broadcast
    * LEFT ANTI join, and cap survivors at [[HostCap]] docs per domain
    * (first-crawled wins: rank by doc_id). The rank-filter compiles to
    * Spark's WindowGroupLimit two-phase top-k — partial limit map-side,
    * final limit after the domain-grain shuffle — so at 100 TB the shuffle
    * carries AT MOST `HostCap + 1` rows per domain per mapper, never the
    * whole crawl.
    */
  def hostCaps(spark: SparkSession, sfDir: String): DataFrame =
    hostCapsOf(Tables.documents(spark, sfDir)).orderBy("doc_id")

  /** Batch core of [[hostCaps]] — unordered; also the convergence twin the
    * STREAMING admission cap is tested against
    * ([[graft.streaming.CorpusIngest.domainCappedStream]]).
    */
  def hostCapsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocked = docs.sparkSession.createDataFrame(
      BlockedDomains.map(Tuple1(_))).toDF("regdom")
    docs
      .select(col("doc_id"), expr(urlSqlFragment).as("url"))
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .withColumn("regdom", registrableDomain(col("host")))
      .join(broadcast(blocked), Seq("regdom"), "left_anti")
      .withColumn("rk",
        row_number().over(Window.partitionBy("regdom").orderBy("doc_id"))
          .cast("long"))
      .filter(col("rk") <= HostCap)
      .select("doc_id", "host", "regdom", "rk")
  }

  private val hostCapsSql = {
    val blocked = BlockedDomains.map(d => s"'$d'").mkString(", ")
    s"""WITH u AS (
          SELECT doc_id, $urlSqlFragment AS url FROM documents
        ), h AS (
          SELECT doc_id,
                 regexp_extract(url, 'https://([^/]+)/', 1) AS host
          FROM u
        ), r AS (
          SELECT doc_id, host,
                 CASE WHEN len(string_split(host, '.')) >= 3
                       AND array_to_string(string_split(host, '.')[-2:], '.')
                           IN (${TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")})
                      THEN array_to_string(string_split(host, '.')[-3:], '.')
                      ELSE array_to_string(string_split(host, '.')[-2:], '.') END
                   AS regdom
          FROM h
        ), k AS (
          SELECT doc_id, host, regdom,
                 row_number() OVER (PARTITION BY regdom ORDER BY doc_id) AS rk
          FROM r WHERE regdom NOT IN ($blocked)
        )
        SELECT doc_id, host, regdom, CAST(rk AS BIGINT) AS rk
        FROM k WHERE rk <= $HostCap ORDER BY doc_id"""
  }

  /** Tracking query parameters dropped by [[canonicalizeUrl]]. */
  private val TrackingParams = "(utm_[^=&]*|gclid|fbclid|msclkid)"

  /** Crawl URL canonicalization — the dedup-key normalizer every crawl
    * pipeline runs so `HTTP://WWW.X.COM:80/a//b?utm_source=y&b=2&a=1#frag`
    * and `http://www.x.com/a/b?a=1&b=2` count as ONE page:
    * scheme/host lowercased, fragment dropped, default ports stripped
    * (:80 for http, :443 for https), duplicate path slashes collapsed, a
    * trailing `/index.html` reduced to `/`, tracking params (the utm_
    * family, gclid, fbclid, msclkid) dropped, surviving query params
    * sorted.
    * A fixed chain of native regexp/array functions — map-only, codegen'd,
    * no UDFs; the dedup/count that follows keys on the result.
    */
  def canonicalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    // default-port strip is anchored to the END of the authority — a
    // `\b`-bounded match could fire on a pathological authority containing
    // ":80." mid-string (":8080" was already safe: 0→8 is not a boundary)
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)", 1)
    val path0 = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/{2,}", "/")
    val path1 = when(path0 === "", lit("/")).otherwise(path0)
    // `$` is safe here: the operator's regexes run only on the Spark side
    // (the oracle reconstructs expected strings by formula), and a URL
    // path has no embedded newline for Java's `$` to stop at
    val path = regexp_replace(path1, "/index\\.html$", "/")
    val query = regexp_extract(rest, "\\?(.*)", 1)
    val keptParams = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(s"^$TrackingParams=")))
    val queryOut = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    // non-absolute inputs (scheme-relative `//cdn...`, bare paths, garbage)
    // pass through UNCHANGED: without a scheme every extract above returns
    // "" and the rewrite would collapse them all to a constant-prefix
    // "://..." string, merging distinct URLs into one dedup key
    when(scheme === "", c)
      .otherwise(concat(scheme, lit("://"), host, path, queryOut))
  }

  /** `url_canonicalize`: fixture URLs plant every noise class the
    * canonicalizer handles (mixed-case scheme/host, default ports, doubled
    * slashes, index.html tails, utm/gclid params, unsorted params,
    * fragments), keyed by doc_id. The oracle never runs the canonicalizer:
    * it CONSTRUCTS the expected canonical string from the same doc_id
    * formulas — so a missed rule, an over-eager strip, or a sort bug lands
    * as a string mismatch on the exact row class that exercises that rule.
    */
  def urlCanonicalize(spark: SparkSession, sfDir: String): DataFrame = {
    val noisy = concat(
      when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("HttpS")),
      lit("://WWW.Site"), col("doc_id") % 5, lit(".COM"),
      when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
      lit("/a//b"),
      when(col("doc_id") % 3 === 0, lit("/index.html"))
        .otherwise(concat(lit("/page"), col("doc_id"))),
      lit("?utm_source=x&b="), col("doc_id") % 7, lit("&a=1"),
      when(col("doc_id") % 4 === 0, lit("&gclid=abc")).otherwise(lit("")),
      lit("#frag"), col("doc_id"))
    // every 11th (offset 3) row is a scheme-relative URL: the canonicalizer
    // must pass it through UNCHANGED (case, doubled slash, params, fragment
    // all preserved) — the oracle reconstructs the raw string verbatim, so
    // any rewrite of a non-absolute input lands as a mismatch on this leg
    val relative = concat(lit("//CDN.Site"), col("doc_id") % 5,
      lit(".com/Asset//"), col("doc_id"), lit("?b=2&a=1#frag"))
    val input = when(col("doc_id") % 11 === 3, relative).otherwise(noisy)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), canonicalizeUrl(input).as("canon"))
      .orderBy("doc_id")
  }

  private val urlCanonicalizeSql =
    """SELECT doc_id,
              CASE WHEN doc_id % 11 = 3 THEN
                '//CDN.Site' || (doc_id % 5) || '.com/Asset//' || doc_id
                  || '?b=2&a=1#frag'
              ELSE
                CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
                || '://www.site' || (doc_id % 5) || '.com/a/b'
                || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '/page' || doc_id END
                || '?a=1&b=' || (doc_id % 7)
              END AS canon
       FROM documents ORDER BY doc_id"""

  /** `html_domain_scorecard`: the per-registrable-domain curation table a
    * crawl release actually filters on (the RefinedWeb-style domain pass):
    * doc volume, how far past the per-domain cap the domain runs, total
    * bytes, and three quality legs — entropy-band drops, low-quality-score
    * docs, and the bucketed mean quality — with blocklisted domains
    * excluded up front. EVERY per-doc signal is a map-only column on ONE
    * scan ([[CorpusQc.qualityFeaturesOf]] keeps `text` so the entropy
    * expression rides the same projection); the only shuffle is the final
    * domain-grain aggregate (plus the tiny broadcast anti-join). The
    * oracle recomputes each leg from the shared per-doc SQL fragments the
    * standalone rows already pin, joined at doc grain.
    */
  def domainScorecard(spark: SparkSession, sfDir: String): DataFrame = {
    val blocked = spark.createDataFrame(
      BlockedDomains.map(Tuple1(_))).toDF("regdom")
    CorpusQc.qualityFeaturesOf(Tables.documents(spark, sfDir))
      .withColumn("regdom",
        registrableDomain(expr(s"parse_url($urlSqlFragment, 'HOST')")))
      .withColumn("em", expr("byte_entropy_milli(text)"))
      .join(broadcast(blocked), Seq("regdom"), "left_anti")
      .groupBy("regdom")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(expr("octet_length(text)")).cast("long").as("total_bytes"),
        sum(when(expr(
          s"em BETWEEN ${CorpusQc.EntropyLowMilli} AND ${CorpusQc.EntropyHighMilli}"),
          0L).otherwise(1L)).as("n_entropy_drop"),
        sum(when(col("q") < CorpusQc.LowQuality, 1L).otherwise(0L)).as("n_low_quality"),
        sum(expr("2 * qb + 1")).as("qnum"))
      .select(col("regdom"), col("n_docs"),
        greatest(col("n_docs") - HostCap, lit(0L)).as("n_over_cap"),
        col("total_bytes"), col("n_entropy_drop"), col("n_low_quality"),
        expr(s"CAST(qnum AS DOUBLE) / (${2 * CorpusQc.QBuckets} * n_docs)")
          .as("mean_quality_bucketed"))
      .orderBy("regdom")
  }

  private def domainScorecardSql: String = {
    val blocked = BlockedDomains.map(d => s"'$d'").mkString(", ")
    s"""WITH u AS (
          SELECT doc_id, $urlSqlFragment AS url FROM documents
        ), h AS (
          SELECT doc_id, regexp_extract(url, 'https://([^/]+)/', 1) AS host FROM u
        ), r AS (
          SELECT doc_id,
                 CASE WHEN len(string_split(host, '.')) >= 3
                       AND array_to_string(string_split(host, '.')[-2:], '.')
                           IN (${TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")})
                      THEN array_to_string(string_split(host, '.')[-3:], '.')
                      ELSE array_to_string(string_split(host, '.')[-2:], '.') END
                   AS regdom
          FROM h
        ), q AS (SELECT * FROM ${CorpusQc.qualityPerDocSql} qq),
        e AS (SELECT * FROM ${CorpusQc.entropyPerDocSql} ee),
        j AS (
          SELECT r.regdom, q.n_chars, q.q, q.qb, e.n_bytes, e.entropy_milli
          FROM r JOIN q USING (doc_id) JOIN e USING (doc_id)
          WHERE r.regdom NOT IN ($blocked)
        )
        SELECT regdom, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(greatest(COUNT(*) - $HostCap, 0) AS BIGINT) AS n_over_cap,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(SUM(CASE WHEN entropy_milli BETWEEN ${CorpusQc.EntropyLowMilli}
                     AND ${CorpusQc.EntropyHighMilli} THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_entropy_drop,
               CAST(SUM(CASE WHEN q < ${CorpusQc.LowQuality} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_low_quality,
               CAST(SUM(2 * qb + 1) AS DOUBLE) / (${2 * CorpusQc.QBuckets} * COUNT(*))
                 AS mean_quality_bucketed
        FROM j GROUP BY regdom ORDER BY regdom"""
  }

  /** Generic anchor harvest: every `<a ...>inner</a>` element as a
    * (url, anchor_text) struct — the web-graph feature CRAWL quality
    * models key on (anchor text pointing AT a page is independent
    * evidence about it). Element extraction is one codegen'd
    * `regexp_extract_all`; the per-element href/text projection is a
    * `transform` lambda (fine off the hot path: anchors are a tiny
    * fraction of page bytes, and the lambda is still native expressions,
    * no UDF). Inner markup is stripped, whitespace collapsed.
    */
  def anchorTexts(c: Column): Column =
    transform(
      regexp_extract_all(c,
        lit("(?is)<a\\s[^>]*?href=(?:\"[^\"]*\"|'[^']*')[^>]*>.*?</a\\s*>"), lit(0)),
      a => {
        val dq = regexp_extract(a, "(?is)href=\"([^\"]*)\"", 1)
        val sq = regexp_extract(a, "(?is)href='([^']*)'", 1)
        val inner = regexp_extract(a, "(?is)>(.*)</a\\s*>$", 1)
        struct(
          when(dq =!= "", dq).otherwise(sq).as("url"),
          trim(regexp_replace(regexp_replace(inner, "(?s)<[^>]*>", " "),
            "[ \\t\\n\\r]+", " ")).as("text"))
      })

  /** `html_anchor_texts`: the per-(host, anchor-text) link profile over the
    * fixture pages — what feeds anchor-text quality features and anchor
    * language models. The oracle recomputes membership from the link
    * formulas (three absolute links per doc with fixed texts; the relative
    * link resolves to NULL host and must be dropped), so element-boundary
    * bugs (greedy `.*` eating to the LAST `</a>`, quote-style misses,
    * inner-markup leaks) land as count or grouping mismatches.
    */
  def anchorTextsQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("a", explode(anchorTexts(pageOf(links = true))))
      .withColumn("host", expr("parse_url(a.url, 'HOST')"))
      .filter(col("host").isNotNull)
      .groupBy(col("host"), col("a.text").as("anchor_text"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("host", "anchor_text")

  private val anchorTextsSql =
    """WITH a AS (
         SELECT doc_id, 'h' || (doc_id % 7) || '.example.com' AS host, 'first' AS anchor_text
         FROM documents
         UNION ALL
         SELECT doc_id, 'h' || ((doc_id + 1) % 7) || '.example.org', 'second' FROM documents
         UNION ALL
         SELECT doc_id, 'h' || (doc_id % 7) || '.example.com', 'again' FROM documents
       )
       SELECT host, anchor_text, CAST(COUNT(*) AS BIGINT) AS n_links,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM a GROUP BY host, anchor_text ORDER BY host, anchor_text"""

  /** Robots-style disallow rules: (registrable domain, path prefix). A
    * fixed fixture table standing in for parsed robots.txt records — the
    * OPERATOR (broadcast anti-join on domain + prefix match) is the
    * deliverable; production swaps in the fetched rule set.
    */
  val RobotsRules: Seq[(String, String)] = Seq(
    ("s1.com", "/private"), ("s2.org", "/private"), ("s4.ac.jp", "/tmp"))

  /** Drop pages a disallow rule covers: LEFT ANTI join on
    * `same registrable domain AND path startsWith prefix`. The rule set is
    * dimension-sized (robots records for the crawled domains), so it
    * BROADCASTS and the page side never shuffles — at 100 TB this is a
    * map-only filter with a lookup table, the same shape the blocklist
    * uses, extended with the prefix predicate in the join condition.
    */
  def robotsFilter(pages: DataFrame, rules: DataFrame): DataFrame =
    pages.join(broadcast(rules),
      pages("regdom") === rules("rule_regdom") &&
        pages("path").startsWith(rules("path_prefix")),
      "left_anti")

  /** Shared Spark/DuckDB fragment: each doc's crawl path — 3-way cycle
    * coprime to the host fragment's mod-7/mod-8 keys, so every
    * (domain, path-class) combination occurs and each disallow rule has
    * real matches to drop.
    */
  private val pathSqlFragment =
    """CASE CAST(doc_id % 3 AS INT)
         WHEN 0 THEN '/public/a' || doc_id
         WHEN 1 THEN '/private/b' || doc_id
         ELSE '/tmp/c' || doc_id END"""

  /** `html_robots_filter`: the allowed-page manifest after the disallow
    * rules run — completing the crawl-hygiene chain (canonicalize →
    * blocklist → robots → per-domain caps). The oracle recomputes domain
    * and path from the doc_id formulas and applies the rule table as
    * explicit predicates, so a join-condition bug (prefix vs contains,
    * domain vs host) surfaces as extra or missing rows.
    */
  def robotsFilterQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val rules = spark.createDataFrame(RobotsRules).toDF("rule_regdom", "path_prefix")
    val pages = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        registrableDomain(expr(s"parse_url($urlSqlFragment, 'HOST')")).as("regdom"),
        expr(pathSqlFragment).as("path"))
    robotsFilter(pages, rules).orderBy("doc_id")
  }

  private def robotsFilterSql = {
    val disallow = RobotsRules.map { case (d, p) =>
      s"(regdom = '$d' AND starts_with(path, '$p'))"
    }.mkString(" OR ")
    s"""WITH u AS (
          SELECT doc_id, $urlSqlFragment AS url, $pathSqlFragment AS path
          FROM documents
        ), h AS (
          SELECT doc_id, path, regexp_extract(url, 'https://([^/]+)/', 1) AS host FROM u
        ), r AS (
          SELECT doc_id, path,
                 CASE WHEN len(string_split(host, '.')) >= 3
                       AND array_to_string(string_split(host, '.')[-2:], '.')
                           IN (${TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")})
                      THEN array_to_string(string_split(host, '.')[-3:], '.')
                      ELSE array_to_string(string_split(host, '.')[-2:], '.') END
                   AS regdom
          FROM h
        )
        SELECT doc_id, regdom, path FROM r
        WHERE NOT ($disallow) ORDER BY doc_id"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "html_text_extract" -> (textExtract _),
    "html_link_hosts" -> (linkHosts _),
    "html_host_caps" -> (hostCaps _),
    "url_canonicalize" -> (urlCanonicalize _),
    "html_domain_scorecard" -> (domainScorecard _),
    "html_robots_filter" -> (robotsFilterQuery _),
    "html_anchor_texts" -> (anchorTextsQuery _),
  )

  override def oracle: Map[String, String] = Map(
    "html_text_extract" -> textExtractSql,
    "html_link_hosts" -> linkHostsSql,
    "html_host_caps" -> hostCapsSql,
    "url_canonicalize" -> urlCanonicalizeSql,
    "html_domain_scorecard" -> domainScorecardSql,
    "html_robots_filter" -> robotsFilterSql,
    "html_anchor_texts" -> anchorTextsSql,
  )
}
