package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** robots.txt PARSING — deriving the crawl's hygiene rules from the crawl
  * itself. [[HtmlExtract.robotsFilter]] consumes a (domain, prefix) rule
  * table; until r14 that table was a fixture standing in for parsed
  * records (`HtmlExtract.RobotsRules`). This module implements the parser
  * from raw robots.txt payloads, per RFC 9309 (the Robots Exclusion
  * Protocol):
  *
  *  - lines are `key: value`; `#` starts a comment anywhere on a line;
  *    keys are case-insensitive; surrounding spaces/tabs/CR are ignored
  *    (CRLF payloads parse identically to LF);
  *  - consecutive `User-agent` lines open ONE group; a `User-agent` line
  *    appearing after rule lines starts a NEW group (RFC 9309 §2.2.1 —
  *    blank lines are NOT group separators);
  *  - rules before any `User-agent` line belong to no group: ignored;
  *  - group selection: if any group names this crawler's product token
  *    ([[AgentToken]], matched case-insensitively), ALL such groups apply
  *    and `*` groups are ignored; otherwise the `*` groups apply
  *    (RFC 9309 §2.2.1 most-specific-match, two specificity levels);
  *  - an empty `Disallow:` / `Allow:` value is the allow-all marker — it
  *    contributes no rule;
  *  - decision per URL path (RFC 9309 §2.2.2, [[robotsDecide]]): among
  *    matching prefixes the LONGEST wins; an Allow/Disallow tie at equal
  *    length resolves to Allow; no matching rule means allowed.
  *
  * Scale shape: robots.txt corpora are DOMAIN-grain — millions of small
  * text payloads next to a 100 TB page corpus. The parser's windows and
  * aggregations all key on (domain) or (domain, group): dimension-sized
  * shuffles. The parsed rule table then BROADCASTS into the page-side
  * decision exactly like the fixture table did — the page corpus never
  * shuffles.
  *
  * Cited reference behavior: the reference pipeline ingests whatever the
  * file source hands it (q1_mapper.py:19-36, q1_mapper.py:43-46) — a
  * crawl-scale engine must derive admission rules from crawl payloads.
  */
object RobotsTxt extends QueryModule {

  /** This crawler's product token (what a robots.txt `User-agent` line
    * must name, case-insensitively, to address us specifically).
    */
  val AgentToken = "graftbot"

  /** Space/tab/CR trim — Spark's `trim` strips ASCII space only, but
    * robots.txt values tolerate tabs and CRLF line ends.
    */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^[ \\t\\r]+|[ \\t\\r]+$", "")

  /** Parse (regdom, robots_txt) payloads into the (regdom, path_prefix,
    * allow) rule rows that apply to [[AgentToken]]. See the object doc for
    * the grammar/selection semantics implemented.
    */
  def parsedRules(robots: DataFrame): DataFrame = {
    val lines = robots.select(col("regdom"),
      posexplode(split(col("robots_txt"), "\n")).as(Seq("pos", "raw")))
    val d = lines
      .withColumn("clean", regexp_replace(col("raw"), "#.*", ""))
      .withColumn("key", lower(wsTrim(regexp_extract(col("clean"), "^([^:]+):", 1))))
      .withColumn("value", wsTrim(regexp_extract(col("clean"), "^[^:]+:(.*)$", 1)))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    // group ids: a user-agent line whose PREVIOUS directive line was not a
    // user-agent line starts a new group; consecutive UA lines accumulate.
    // The window partitions by domain — robots data is dimension-grain.
    val w = Window.partitionBy("regdom").orderBy("pos")
    val isUA = col("key") === "user-agent"
    val grouped = d
      .withColumn("new_group",
        (isUA && !coalesce(lag(isUA.cast("boolean"), 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("gid", sum(col("new_group")).over(w))
      .filter(col("gid") > 0) // rules before any User-agent line: no group
    val flags = grouped.filter(isUA)
      .groupBy("regdom", "gid")
      .agg(max(col("value") === "*").as("ua_star"),
        max(lower(col("value")) === AgentToken).as("ua_spec"))
    val domSpec = flags.groupBy("regdom").agg(max(col("ua_spec")).as("has_spec"))
    grouped.filter(!isUA && col("value") =!= "") // empty value = allow-all marker
      .join(flags, Seq("regdom", "gid"))
      .join(domSpec, Seq("regdom"))
      .filter(when(col("has_spec"), col("ua_spec")).otherwise(col("ua_star")))
      .select(col("regdom"), col("value").as("path_prefix"),
        (col("key") === "allow").as("allow"))
  }

  /** Parse the `Sitemap:` directive (RFC 9309 §2.3 "Other records";
    * sitemaps.org's discovery mechanism) from (regdom, robots_txt)
    * payloads: case-insensitive key, group-INDEPENDENT (a Sitemap line
    * belongs to the file, not to any User-agent group — it is collected
    * even before the first group or inside a foreign bot's group), same
    * comment/whitespace tolerance as the rule grammar. Output
    * (regdom, sitemap_url) — the crawl's entry points into the X122
    * sitemap ingestion.
    */
  def sitemapLocs(robots: DataFrame): DataFrame =
    robots.select(col("regdom"),
      explode(split(col("robots_txt"), "\n")).as("raw"))
      .withColumn("clean", regexp_replace(col("raw"), "#.*", ""))
      .filter(lower(wsTrim(regexp_extract(col("clean"), "^([^:]+):", 1))) === "sitemap")
      .select(col("regdom"),
        wsTrim(regexp_extract(col("clean"), "^[^:]+:(.*)$", 1)).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** RFC 9309 §2.2.2 longest-match decision over a parsed rule table:
    * pages keep rows whose path's longest matching prefix rule is an Allow
    * (ties at equal length resolve to Allow; no match means allowed). The
    * rule table aggregates to ONE array per domain and BROADCASTS — the
    * page side stays map-only, like [[HtmlExtract.robotsFilter]]'s
    * anti-join but with the Allow/Disallow precedence the flat prefix
    * filter cannot express.
    */
  def robotsDecide(pages: DataFrame, rules: DataFrame): DataFrame = {
    val byDom = rules.groupBy("regdom")
      .agg(sort_array(collect_list(struct(col("path_prefix"), col("allow"))))
        .as("rules"))
    pages.join(broadcast(byDom), Seq("regdom"), "left")
      .withColumn("verdict", expr(
        """aggregate(
             filter(rules, r -> startswith(path, r.path_prefix)),
             named_struct('len', -1, 'allow', true),
             (s, r) -> IF(length(r.path_prefix) > s.len
                          OR (length(r.path_prefix) = s.len AND r.allow),
                          named_struct('len', length(r.path_prefix),
                                       'allow', r.allow),
                          s),
             s -> s.allow)"""))
      .filter(col("rules").isNull || col("verdict"))
      .drop("rules", "verdict")
  }

  /** Deterministic per-domain robots.txt, a formula of the site index `k`
    * (= doc_id % 7 — every domain `s<k>.<suffix>` shares it). Each clause
    * plants a parser feature:
    *  - a leading comment line and blank lines;
    *  - an `OtherBot` group disallowing everything — must NEVER apply;
    *  - even k: consecutive `User-agent: HelperBot` + `User-agent: *`
    *    lines (UA accumulation into one group);
    *    odd k: `User-agent: GraftBot` (case-insensitive token match) PLUS
    *    a trailing `User-agent: *` group disallowing `/` — which must be
    *    IGNORED because a specific group exists;
    *  - the rule key cycles `Disallow`/`DISALLOW` (case-insensitive keys);
    *  - k%3==0: an EMPTY `Disallow:` (allow-all marker, no rule);
    *    k%3==1: `Disallow: /private` with trailing spaces + an
    *    `Allow: /private/open` (longest-match override);
    *    k%3==2: `Disallow: /private<TAB># stay away` (inline comment +
    *    tab before it).
    */
  def robotsPayload(k: Column): Column = {
    val ours = when(k % 2 === 0,
      lit("User-agent: HelperBot\nUser-agent: *"))
      .otherwise(lit("User-agent: GraftBot"))
    val dKey = when(k % 2 === 0, lit("Disallow")).otherwise(lit("DISALLOW"))
    val rules = when(k % 3 === 0, concat(dKey, lit(":")))
      .when(k % 3 === 1,
        concat(dKey, lit(": /private  \nAllow: /private/open")))
      .otherwise(concat(dKey, lit(": /private\t# stay away")))
    val tail = when(k % 2 === 1, lit("\n\nUser-agent: *\nDisallow: /"))
      .otherwise(lit(""))
    // Sitemap directives (RFC 9309 §2.3): one PRE-GROUP (must be
    // collected though it belongs to no group, and the rule parser must
    // keep IGNORING it), key case cycling, inline comment for k%3==2,
    // and a second one at the very END — after/inside the last group —
    // for k%3==0 (group-independence)
    val sm1 = concat(
      when(k % 2 === 0, lit("SITEMAP")).otherwise(lit("Sitemap")),
      lit(": https://maps"), k, lit(".example/one.xml"),
      when(k % 3 === 2, lit("\t# find me")).otherwise(lit("")))
    val sm2 = when(k % 3 === 0,
      concat(lit("\nSitemap: https://maps"), k, lit(".example/two.xml")))
      .otherwise(lit(""))
    concat(
      lit("# robots fixture\n"), sm1,
      lit("\n\nUser-agent: OtherBot\nDisallow: /\n\n"),
      ours, lit("\n"), rules, tail, sm2)
  }

  /** Each doc's crawl path — a 4-way cycle so the Allow-over-Disallow
    * longest-match case (`/private/open/...`) has real rows next to plain
    * disallowed (`/private/...`) and allowed (`/public/...`, `/docs/...`)
    * classes. Kept coprime-free of the mod-7 site key on purpose: every
    * (rule-class, path-class) pair occurs.
    */
  private val path4SqlFragment =
    """CASE CAST(doc_id % 4 AS INT)
         WHEN 0 THEN '/public/a' || doc_id
         WHEN 1 THEN '/private/b' || doc_id
         WHEN 2 THEN '/private/open/c' || doc_id
         ELSE '/docs/d' || doc_id END"""

  /** `html_robots_parsed`: the full derive-hygiene-from-the-crawl chain —
    * build each domain's robots.txt (formula of the site index), PARSE it
    * ([[parsedRules]]: groups, UA selection, comments, case, empty-value
    * markers), and apply the RFC longest-match decision to every page.
    * The oracle NEVER parses: it recomputes the kept set from the planted
    * rule formulas directly, so a group-boundary bug, a UA-selection bug,
    * a missed comment strip, or a tie-break inversion lands as extra or
    * missing doc_ids on exactly the (k, path-class) pairs that exercise
    * that clause.
    */
  def robotsParsedQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pages = docs.select(col("doc_id"),
      HtmlExtract.registrableDomain(
        expr(s"parse_url(${HtmlExtract.urlSql}, 'HOST')")).as("regdom"),
      expr(path4SqlFragment).as("path"))
    // domain-grain: one payload per distinct registrable domain (regdom
    // built by the same s<k>.<suffix_j> formula the URL fragment uses; the
    // PAGE side still goes through the real parse_url + registrableDomain
    // chain, so the two meet only if that chain is right)
    val domains = fixtureDomains(spark, sfDir).select("regdom", "robots_txt")
    robotsDecide(pages, parsedRules(domains))
      .select("doc_id", "regdom", "path")
      .orderBy("doc_id")
  }

  private def robotsParsedSql =
    s"""WITH u AS (
          SELECT doc_id, ${HtmlExtract.urlSql} AS url, $path4SqlFragment AS path,
                 doc_id % 7 AS k, doc_id % 4 AS m
          FROM documents
        ), h AS (
          SELECT doc_id, path, k, m,
                 regexp_extract(url, 'https://([^/]+)/', 1) AS host
          FROM u
        ), r AS (
          SELECT doc_id, path, k, m, ${HtmlExtract.regdomDuck("host")} AS regdom
          FROM h
        )
        SELECT doc_id, regdom, path FROM r
        WHERE k % 3 = 0               -- empty Disallow: no rules at all
           OR m IN (0, 3)             -- /public, /docs: no prefix matches
           OR (k % 3 = 1 AND m = 2)   -- Allow /private/open out-lengths Disallow /private
        ORDER BY doc_id"""

  /** The domain universe + payload fixture shared by both queries. */
  private def fixtureDomains(spark: SparkSession, sfDir: String): DataFrame = {
    val suffix = expr(
      """CASE CAST(j AS INT)
           WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'net' WHEN 3 THEN 'io'
           WHEN 4 THEN 'co.uk' WHEN 5 THEN 'com.au' WHEN 6 THEN 'gov.uk'
           ELSE 'ac.jp' END""")
    Tables.documents(spark, sfDir)
      .select((col("doc_id") % 7).as("k"), (col("doc_id") % 8).as("j"))
      .distinct()
      .select(col("k"), concat(lit("s"), col("k"), lit("."), suffix).as("regdom"),
        robotsPayload(col("k")).as("robots_txt"))
  }

  /** `robots_sitemap_locs`: the crawl's sitemap DISCOVERY step — parse
    * every `Sitemap:` directive out of the per-domain robots payloads
    * ([[sitemapLocs]]: pre-group and end-of-file placements, key case,
    * inline comments). The oracle reconstructs the expected (regdom, url)
    * rows from the planting formulas without parsing.
    */
  def sitemapLocsQuery(spark: SparkSession, sfDir: String): DataFrame =
    sitemapLocs(fixtureDomains(spark, sfDir).select("regdom", "robots_txt"))
      .orderBy("regdom", "sitemap_url")

  private def sitemapLocsSql =
    s"""WITH d AS (
          SELECT DISTINCT doc_id % 7 AS k, doc_id % 8 AS j FROM documents
        ), u AS (
          SELECT k, 's' || k || '.' ||
                 CASE CAST(j AS INT)
                   WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'net' WHEN 3 THEN 'io'
                   WHEN 4 THEN 'co.uk' WHEN 5 THEN 'com.au' WHEN 6 THEN 'gov.uk'
                   ELSE 'ac.jp' END AS regdom
          FROM d
        ), sm AS (
          SELECT regdom, 'https://maps' || k || '.example/one.xml' AS sitemap_url FROM u
          UNION ALL
          SELECT regdom, 'https://maps' || k || '.example/two.xml' FROM u WHERE k % 3 = 0
        )
        SELECT regdom, sitemap_url FROM sm ORDER BY regdom, sitemap_url"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "html_robots_parsed" -> (robotsParsedQuery _),
    "robots_sitemap_locs" -> (sitemapLocsQuery _),
  )

  override def oracle: Map[String, String] = Map(
    "html_robots_parsed" -> robotsParsedSql,
    "robots_sitemap_locs" -> sitemapLocsSql,
  )
}
