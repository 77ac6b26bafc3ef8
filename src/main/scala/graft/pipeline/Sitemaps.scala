package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.{QueryModule, Tables}

/** Sitemap ingestion — robots.txt's sibling crawl-discovery input
  * (sitemaps.org protocol, referenced by RFC 9309's `Sitemap:` field):
  * `<urlset>` leaf sitemaps and one level of `<sitemapindex>` recursion,
  * parsed from crawl payloads with Spark 4's native XML machinery
  * (`from_xml` with a declared schema — the expression twin of the X76
  * `xml` datasource), then joined against the canonicalized crawl URL
  * table for the coverage audit every crawl release runs: which listed
  * pages were fetched, which fetched pages the site never listed.
  *
  * Scale shape: sitemap payloads are domain-grain (dimension-sized); the
  * parse and the index→child join shuffle only domain-grain rows. The
  * coverage join is honestly page-grain — sitemap URL sets are as big as
  * the crawl — so it rides a url-keyed equi-join (one exchange per side),
  * never a broadcast of the corpus.
  *
  * Cited reference behavior: the reference ingests whatever the file
  * source hands it (q4_streaming.ipynb cell 0); a crawl-scale engine
  * derives its fetch frontier from the site's own declared inventory.
  */
object Sitemaps extends QueryModule {

  /** Declared schema covering BOTH root shapes: a `<urlset>` carries
    * repeated `<url><loc/><lastmod/></url>` children, a `<sitemapindex>`
    * carries repeated `<sitemap><loc/></sitemap>` children; the absent
    * family parses to null.
    */
  val SitemapSchema: StructType = StructType(Seq(
    StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType), StructField("lastmod", StringType))))),
    StructField("sitemap", ArrayType(StructType(Seq(
      StructField("loc", StringType)))))))

  /** Parse fetched sitemap payloads — (regdom, loc, is_root, xml) — into
    * (regdom, url, lastmod) rows. Roots are the payloads robots.txt
    * pointed at; an index root's children resolve AGAINST THE SAME
    * FETCHED SET by loc (the crawler fetched them too), one level deep: a
    * child that is itself an index rejects loudly (the protocol allows
    * nesting; this engine's contract is the common one-level shape, and a
    * silent drop would undercount coverage). MALFORMED XML, by contrast,
    * contributes nothing (from_xml's permissive null): broken sitemaps
    * are routine in a real crawl, and unlike the document front doors the
    * loss stays VISIBLE — a dropped sitemap surfaces as crawled-only
    * inflation in the coverage audit (contract pinned in SitemapsSpec).
    */
  def parseSitemaps(payloads: DataFrame): DataFrame = {
    val parsed = payloads.select(col("regdom"), col("loc"), col("is_root"),
      from_xml(col("xml"), SitemapSchema).as("p"))
    val roots = parsed.filter(col("is_root"))
    val direct = roots
      .filter(col("p.url").isNotNull)
      .select(col("regdom"), explode(col("p.url")).as("u"))
      .select(col("regdom"), col("u.loc").as("url"), col("u.lastmod").as("lastmod"))
    val childLocs = roots
      .filter(col("p.sitemap").isNotNull)
      .select(col("regdom"), explode(col("p.sitemap")).as("s"))
      .select(col("regdom"), col("s.loc").as("loc"))
    val children = childLocs
      .join(parsed.drop("is_root"), Seq("regdom", "loc"))
      .select(col("regdom"), expr(
        """CASE WHEN p.sitemap IS NOT NULL
                THEN raise_error(concat('sitemap index nests deeper than one level under ', loc))
                ELSE p.url END""").as("urls"))
      .select(col("regdom"), explode(col("urls")).as("u"))
      .select(col("regdom"), col("u.loc").as("url"), col("u.lastmod").as("lastmod"))
    direct.unionByName(children)
  }

  /** Extra sitemap-only URLs planted per domain (pages the site lists but
    * the crawl never fetched).
    */
  val ExtrasPerDomain = 2

  private def lastmodSql = "'2024-01-' || lpad(cast(1 + doc_id % 28 as string), 2, '0')"

  /** `sitemap_coverage`: the crawl-vs-declared-inventory audit, end to
    * end. Spark BUILDS each domain's sitemap XML by formula — every page
    * with doc_id%5 != 4 is listed with a formula lastmod, plus
    * [[ExtrasPerDomain]] never-crawled `/extra/` URLs; EVEN site keys
    * ship a `<sitemapindex>` with two child `<urlset>`s (split by
    * doc_id%2 — the one-level recursion leg), odd keys one direct
    * `<urlset>` — parses the payloads back with [[parseSitemaps]], and
    * full-outer-joins the parsed URL set against the crawled URL table
    * (host → registrable domain via the REAL `parse_url` chain). The
    * oracle never parses XML: it recomputes every per-domain count from
    * the planting formulas, so an index-recursion miss, a dropped
    * `<url>`, a lastmod binding bug, or a join-side loss lands as a count
    * mismatch on exactly the domain class that exercises that clause.
    */
  def sitemapCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pages = docs.select(col("doc_id"),
      expr(HtmlExtract.urlSql).as("url"),
      HtmlExtract.registrableDomain(
        expr(s"parse_url(${HtmlExtract.urlSql}, 'HOST')")).as("regdom"))
    // the domain universe and each domain's site key k (regdom is a pure
    // function of (k, j) — the robots fixture's derivation)
    val suffix = expr(
      """CASE CAST(j AS INT)
           WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'net' WHEN 3 THEN 'io'
           WHEN 4 THEN 'co.uk' WHEN 5 THEN 'com.au' WHEN 6 THEN 'gov.uk'
           ELSE 'ac.jp' END""")
    val domains = docs
      .select((col("doc_id") % 7).as("k"), (col("doc_id") % 8).as("j"))
      .distinct()
      .select(col("k"), concat(lit("s"), col("k"), lit("."), suffix).as("regdom"))
    // listed entries: (regdom, child split, <url> block), extras included
    val listed = docs
      .filter(col("doc_id") % 5 =!= 4)
      .select((col("doc_id") % 7).as("k"), (col("doc_id") % 8).as("j"),
        (col("doc_id") % 2).as("child"),
        expr(s"concat('<url><loc>', ${HtmlExtract.urlSql}, '</loc>'," +
          s" '<lastmod>', $lastmodSql, '</lastmod></url>')").as("entry"),
        col("doc_id"))
      .select(concat(lit("s"), col("k"), lit("."), suffix).as("regdom"),
        col("child"), col("entry"), col("doc_id"))
    val extras = domains.select(col("regdom"),
      explode(expr(s"sequence(0, ${ExtrasPerDomain - 1})")).as("i"))
      .select(col("regdom"), (col("i") % 2).as("child"),
        concat(lit("<url><loc>https://"), col("regdom"), lit("/extra/"),
          col("i"), lit("</loc></url>")).as("entry"),
        (lit(Long.MaxValue) - col("i")).as("doc_id"))
    val entries = listed.unionByName(extras)
    // payload assembly: deterministic entry order (by doc_id), urlset body
    def urlset(body: org.apache.spark.sql.Column) =
      concat(lit("""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">"""),
        body, lit("</urlset>"))
    val byChild = entries
      .groupBy("regdom", "child")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(doc_id, entry))), x -> x.entry), '')")
        .as("body"))
    val whole = entries
      .groupBy("regdom")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(doc_id, entry))), x -> x.entry), '')")
        .as("body"))
    val rootLoc = concat(lit("https://"), col("regdom"), lit("/sitemap.xml"))
    val childLoc = concat(lit("https://"), col("regdom"), lit("/sm"), col("child"), lit(".xml"))
    // even k: index root + child urlsets; odd k: one direct urlset root
    val evenDoms = domains.filter(col("k") % 2 === 0).select("regdom")
    val oddDoms = domains.filter(col("k") % 2 === 1).select("regdom")
    val indexRoots = evenDoms
      .select(col("regdom"), rootLoc.as("loc"), lit(true).as("is_root"),
        concat(lit("<sitemapindex>"),
          lit("<sitemap><loc>https://"), col("regdom"), lit("/sm0.xml</loc></sitemap>"),
          lit("<sitemap><loc>https://"), col("regdom"), lit("/sm1.xml</loc></sitemap>"),
          lit("</sitemapindex>")).as("xml"))
    val childPayloads = byChild.join(evenDoms, "regdom")
      .select(col("regdom"), childLoc.as("loc"), lit(false).as("is_root"),
        urlset(col("body")).as("xml"))
    val directRoots = whole.join(oddDoms, "regdom")
      .select(col("regdom"), rootLoc.as("loc"), lit(true).as("is_root"),
        urlset(col("body")).as("xml"))
    val payloads = indexRoots.unionByName(childPayloads).unionByName(directRoots)
    // coverage: parsed sitemap URL set vs crawled URL set, url-keyed
    val sm = parseSitemaps(payloads)
      .select(col("regdom").as("sm_regdom"), col("url"), col("lastmod"),
        lit(true).as("in_sm"))
    val cr = pages.select(col("regdom").as("cr_regdom"), col("url"),
      lit(true).as("in_cr"))
    sm.join(cr, Seq("url"), "full_outer")
      .select(coalesce(col("sm_regdom"), col("cr_regdom")).as("regdom"),
        col("in_sm"), col("in_cr"), col("lastmod"))
      .groupBy("regdom")
      .agg(
        sum(when(col("in_sm"), 1L).otherwise(0L)).as("n_sitemap_urls"),
        sum(when(col("in_sm") && col("in_cr"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("in_sm") && col("in_cr").isNull, 1L).otherwise(0L)).as("n_sitemap_only"),
        sum(when(col("in_cr") && col("in_sm").isNull, 1L).otherwise(0L)).as("n_crawled_only"),
        sum(when(col("in_cr"), 1L).otherwise(0L)).as("n_crawled"),
        min(col("lastmod")).as("min_lastmod"))
      .orderBy("regdom")
  }

  private def sitemapCoverageSql =
    s"""WITH u AS (
          SELECT doc_id, ${HtmlExtract.urlSql} AS url, doc_id % 5 AS m5
          FROM documents
        ), h AS (
          SELECT doc_id, m5,
                 regexp_extract(url, 'https://([^/]+)/', 1) AS host
          FROM u
        ), r AS (
          SELECT doc_id, m5, ${HtmlExtract.regdomDuck("host")} AS regdom
          FROM h
        )
        SELECT regdom,
               CAST(SUM(CASE WHEN m5 <> 4 THEN 1 ELSE 0 END) + $ExtrasPerDomain AS BIGINT)
                 AS n_sitemap_urls,
               CAST(SUM(CASE WHEN m5 <> 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
               CAST($ExtrasPerDomain AS BIGINT) AS n_sitemap_only,
               CAST(SUM(CASE WHEN m5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_crawled_only,
               CAST(COUNT(*) AS BIGINT) AS n_crawled,
               MIN(CASE WHEN m5 <> 4 THEN $lastmodSql END) AS min_lastmod
        FROM r GROUP BY regdom ORDER BY regdom"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sitemap_coverage" -> (sitemapCoverage _),
  )

  override def oracle: Map[String, String] = Map(
    "sitemap_coverage" -> sitemapCoverageSql,
  )
}
