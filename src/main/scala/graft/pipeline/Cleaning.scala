package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Corpus cleaning — two named steps every public LLM corpus recipe
  * applies between raw text and training data:
  *
  *   - [[c4Filter]]: the C4 line/page rules (Raffel et al. 2020, §2.2 of
  *     the T5 paper): keep lines that end in terminal punctuation and have
  *     ≥ 3 words, drop lines mentioning javascript, drop whole pages that
  *     contain "lorem ipsum" or a curly brace, require ≥ 5 surviving lines
  *     for the page to survive.
  *   - [[piiRedact]]: regex scrubbing of emails / phone numbers / SSNs to
  *     typed placeholder tokens — the minimum-viable PII pass in front of
  *     any corpus release. Complements
  *     [[graft.operators.Events.scrubPiiOf]] (the event-props payload
  *     scrub: email + digit-run blanket redaction) with document-grain
  *     TYPED placeholders, so downstream token accounting can distinguish
  *     redaction classes.
  *
  * Both are fixed chains of native `split` / `filter` / `regexp_replace` /
  * `regexp_extract_all` — higher-order array functions and codegen'd
  * regexps, no UDFs, map-only per document; per-row cost is linear in the
  * document, state is zero. At 100 TB both run on the scan path and
  * shuffle nothing but their final sort.
  *
  * Regex dialect notes: every pattern stays inside the Java∩RE2 common
  * subset (no lookaround, no backrefs; `\b` agrees because both define
  * `\w` as `[0-9A-Za-z_]`), so the DuckDB oracle can run the IDENTICAL
  * pattern and the oracle row pins cross-engine regex agreement
  * byte-for-byte. One trap avoided deliberately: `$` is NOT in the common
  * subset — Java's `$` matches before a trailing `\r` (it treats `\r` as a
  * line terminator even without MULTILINE), RE2's does not — so the
  * terminal-punctuation test is spelled as explicit `endswith` checks.
  */
object Cleaning extends QueryModule {

  /** A C4 "kept" line: ends in terminal punctuation (`. ! ? "`), has at
    * least three words, and doesn't mention javascript.
    */
  private def keptLine(l: Column): Column = {
    val t = trim(l)
    Seq(".", "!", "?", "\"").map(s => t.endsWith(lit(s))).reduce(_ || _) &&
      size(filter(split(t, "[ \\t]+"), w => w =!= "")) >= 3 &&
      !lower(t).contains("javascript")
  }

  /** C4 page cleaning over a text column: (n_lines, n_kept, page_kept,
    * cleaned text). Page-level drops: "lorem ipsum" (case-insensitive),
    * any `{`, or fewer than 5 surviving lines (the paper's ≥-5-sentence
    * gate applied at line grain).
    */
  def c4Filter(text: Column): (Column, Column, Column, Column) = {
    val lines = split(text, "\n")
    val kept = filter(lines, keptLine _)
    val pageKept = !lower(text).contains("lorem ipsum") &&
      !text.contains("{") && size(kept) >= 5
    (size(lines), size(kept), pageKept, array_join(kept, "\n"))
  }

  /** The fixture page: ten lines around the raw document text, exercising
    * every C4 rule with doc_id-keyed variants. The corpus is verified
    * single-line with no terminal punctuation, no braces, and no
    * javascript/lorem mentions (checked at all three SFs), so each line's
    * fate — and therefore the whole expected output — is a pure doc_id
    * formula the oracle recomputes WITHOUT running any filter.
    */
  private def fixturePage: Column = {
    val id = col("doc_id")
    concat_ws("\n",
      concat(lit("Intro for document "), id, lit(" begins here.")), // kept
      col("text"), // dropped: no terminal punctuation (verified corpus-wide)
      lit("Short."), // dropped: < 3 words
      lit("This line is a valid sentence."), // kept
      lit("this javascript line should vanish now."), // dropped: javascript
      lit("Another perfectly valid line sits here."), // kept
      lit("A fourth valid sentence appears right here."), // kept
      when(id % 3 === 0, lit("The fifth survivor line arrives now."))
        .otherwise(lit("no terminal punctuation on this line")),
      when(id % 7 === 0, lit("lorem ipsum dolor sit amet.")) // kept line, kills page
        .when(id % 5 === 0, lit("another line lacking an ending"))
        .otherwise(lit("Tail content line ends cleanly.")),
      when(id % 11 === 0, lit("code with { a brace }")) // dropped line, kills page
        .otherwise(lit("Final regular line closes out.")))
  }

  /** `text_c4_filter`: the C4 rules over fixture pages built around each
    * document — per-page line totals, survivor counts, the page gate, and
    * the md5 of the cleaned text (kept lines re-joined). The oracle never
    * runs the filter: every line's fate is a doc_id formula (the fixture
    * construction is deterministic and the corpus is verified free of
    * trigger strings), so it CONCATENATES the expected survivors directly
    * — a line-predicate, strip-order, or join bug lands as a count or
    * digest mismatch against an independent computation.
    */
  def c4FilterQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val (nLines, nKept, pageKept, cleaned) = c4Filter(fixturePage)
    Tables.documents(spark, sfDir)
      .withColumn("c", cleaned)
      .select(col("doc_id"), nLines.cast("bigint").as("n_lines"),
        nKept.cast("bigint").as("n_kept"), pageKept.as("page_kept"),
        expr("md5(cast(c as binary))").as("digest"))
      .orderBy("doc_id")
  }

  private val c4FilterSql =
    """WITH e AS (
         SELECT doc_id,
                'Intro for document ' || doc_id || ' begins here.'
                  || chr(10) || 'This line is a valid sentence.'
                  || chr(10) || 'Another perfectly valid line sits here.'
                  || chr(10) || 'A fourth valid sentence appears right here.'
                  || CASE WHEN doc_id % 3 = 0
                       THEN chr(10) || 'The fifth survivor line arrives now.' ELSE '' END
                  || CASE WHEN doc_id % 7 = 0
                       THEN chr(10) || 'lorem ipsum dolor sit amet.'
                     WHEN doc_id % 5 = 0 THEN ''
                     ELSE chr(10) || 'Tail content line ends cleanly.' END
                  || CASE WHEN doc_id % 11 = 0 THEN ''
                     ELSE chr(10) || 'Final regular line closes out.' END AS expected,
                4 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 7 = 0 THEN 1
                         WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END
                  + CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END AS nk
         FROM documents
       )
       SELECT doc_id, CAST(10 AS BIGINT) AS n_lines, CAST(nk AS BIGINT) AS n_kept,
              (doc_id % 7 <> 0 AND doc_id % 11 <> 0 AND nk >= 5) AS page_kept,
              md5(expected) AS digest
       FROM e ORDER BY doc_id"""

  /** The three PII patterns, applied in this order (email first so a
    * later pass can't eat its digits; SSN before phone so the more
    * specific 3-2-4 shape wins on any overlap). Java∩RE2 subset only.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"))

  /** Generic PII scrub of a text column. */
  def piiRedact(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, p, tok)) => regexp_replace(acc, p, tok) }

  /** `text_pii_redact`: seed each document with one known email / phone /
    * SSN built from doc_id (the parity-fixture pattern), scrub, and emit
    * per-type match counts plus the md5 of the scrubbed text. The oracle
    * applies the IDENTICAL patterns in DuckDB — so the row both proves the
    * scrub fires on every seeded instance (each count ≥ 1 by construction)
    * and pins Java-vs-RE2 pattern semantics across 100% of corpus text.
    */
  def piiRedactQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val seeded = concat(col("text"),
      lit(" Contact: user"), col("doc_id"),
      lit("@example.com or +1-555-"), lit(1000) + col("doc_id") % 9000,
      lit(" SSN "), lit(100) + col("doc_id") % 900,
      lit("-"), lit(10) + col("doc_id") % 90,
      lit("-"), lit(1000) + col("doc_id") % 9000, lit("."))
    val counts = PiiPatterns.map { case (name, p, _) =>
      size(regexp_extract_all(col("s"), lit(p), lit(0))).cast("bigint").as(s"n_$name")
    }
    Tables.documents(spark, sfDir)
      .withColumn("s", seeded)
      .withColumn("r", piiRedact(col("s")))
      .select(col("doc_id") +: counts :+ expr("md5(cast(r as binary))").as("digest"): _*)
      .orderBy("doc_id")
  }

  private val piiRedactSql = {
    // DuckDB '…' strings don't process backslashes, so the Scala pattern
    // text (one backslash per escape) embeds verbatim; patterns hold no quotes
    def q(p: String) = p
    val seeded = "text || ' Contact: user' || doc_id || '@example.com or +1-555-' || " +
      "(1000 + doc_id % 9000) || ' SSN ' || (100 + doc_id % 900) || '-' || " +
      "(10 + doc_id % 90) || '-' || (1000 + doc_id % 9000) || '.'"
    val redacted = PiiPatterns.foldLeft("s") { case (acc, (_, p, tok)) =>
      s"regexp_replace($acc, '${q(p)}', '$tok', 'g')"
    }
    val counts = PiiPatterns.map { case (name, p, _) =>
      s"CAST(len(regexp_extract_all(s, '${q(p)}')) AS BIGINT) AS n_$name"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, $seeded AS s FROM documents)
        SELECT doc_id, $counts, md5($redacted) AS digest
        FROM d ORDER BY doc_id"""
  }

  /** UTF-8-as-Latin-1 mojibake signature: a would-be UTF-8 lead byte
    * (0xC2-0xF4) decoded as a Latin-1 char, followed by a would-be
    * continuation byte (0x80-0xBF) decoded likewise — the "Ã©" shape. Plain
    * Latin-1 prose essentially never puts a C1-control/NBSP-range char
    * right after an accented capital, so the signature is the standard
    * cheap detector (cf. ftfy's heuristics).
    */
  private val MojibakeSig = "[\u00C2-\u00F4][\u0080-\u00BF]"
  private val NonLatin1 = "[^\u0000-\u00FF]"

  /** Repair the classic UTF-8-read-as-Latin-1 double encoding ("Ã©" -> "é").
    *
    * Guarded three ways before it rewrites anything: the mojibake signature
    * must be present, every char must be Latin-1-representable (a char past
    * U+00FF cannot have come from a Latin-1 misdecode), and the recovered
    * byte sequence must be valid UTF-8 (`is_valid_utf8` — Spark 4 native).
    * The recovery itself is two native codegen'd steps: `encode(c,
    * 'ISO-8859-1')` maps each char back to the byte it was misdecoded from,
    * and the binary->string cast reinterprets those bytes as UTF-8 (Spark's
    * cast is a zero-copy reinterpret, which is exactly what's wanted — the
    * validity gate has already run). Map-only, no UDFs, stays inside
    * whole-stage codegen.
    */
  def repairMojibake(c: Column): Column = {
    val candidate = encode(c, "ISO-8859-1").cast("string")
    when(c.rlike(MojibakeSig) && !c.rlike(NonLatin1) &&
        call_function("is_valid_utf8", candidate), candidate)
      .otherwise(c)
  }

  /** `text_mojibake_repair`: parity corpus — both engines build accented
    * text from the (ASCII) corpus with `replace(.., 'e'/'a', chr(233)/
    * chr(224))`; even doc_ids then get the MOJIBAKE form as input (Spark
    * derives it with a real charset round-trip, `decode(utf8-bytes,
    * 'ISO-8859-1')`; the oracle builds the identical string with two
    * replaces, since the only non-ASCII chars are the two planted ones) and
    * odd doc_ids get the clean accented form. [[repairMojibake]] must fix
    * every even leg back to the accented original and pass every odd leg
    * through untouched — so `out` is ALWAYS the accented text, and the
    * oracle can state the expected digest without being able to decode
    * charsets at all (the masked-fixture pattern).
    */
  def mojibakeRepairQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("acc", expr("replace(replace(text, 'e', chr(233)), 'a', chr(224))"))
      .withColumn("input",
        when(col("doc_id") % 2 === 0,
          expr("decode(cast(acc AS binary), 'ISO-8859-1')"))
          .otherwise(col("acc")))
      .withColumn("out", repairMojibake(col("input")))
      .select(col("doc_id"),
        (col("out") =!= col("input")).as("was_repaired"),
        (length(col("input")) - length(col("out"))).cast("long").as("n_fixed"),
        length(col("out")).cast("long").as("out_len"),
        expr("md5(cast(out AS binary))").as("digest"))
      .orderBy("doc_id")

  private val mojibakeRepairSql =
    """WITH a AS (
         SELECT doc_id,
                replace(replace(text, 'e', chr(233)), 'a', chr(224)) AS acc
         FROM documents
       ), i AS (
         SELECT doc_id, acc,
                CASE WHEN doc_id % 2 = 0
                     THEN replace(replace(acc, chr(233), chr(195) || chr(169)),
                                  chr(224), chr(195) || chr(160))
                     ELSE acc END AS input
         FROM a
       )
       SELECT doc_id,
              (doc_id % 2 = 0 AND input <> acc) AS was_repaired,
              CAST(length(input) - length(acc) AS BIGINT) AS n_fixed,
              CAST(length(acc) AS BIGINT) AS out_len,
              md5(acc) AS digest
       FROM i ORDER BY doc_id"""

  /** Corpus-wide exact line deduplication (the RefinedWeb/Gopher boilerplate
    * pass): a line survives only at its globally FIRST occurrence
    * (min (doc_id, position)), so navigation bars, cookie banners, and
    * copyright footers repeated across a crawl collapse to one instance
    * while unique prose is untouched. Returns per-doc
    * (doc_id, n_lines, n_kept, digest-of-cleaned-text).
    *
    * Shape at 100 TB: two shuffles and nothing else. The key insight is
    * that the surviving (doc, pos, line) rows ARE the per-line group
    * minimums of the single integer key `k = doc_id * maxLines + pos` — so
    * the first-occurrence pass is one `groupBy(line).agg(min(k))` whose
    * partial min combines MAP-SIDE (the wire carries one row per distinct
    * line per mapper; boilerplate is by definition few distinct lines), and
    * (doc_id, pos) come back out of `k` arithmetically, no join against the
    * full line set. The second shuffle reassembles at doc grain.
    */
  def dedupLinesOf(docs: DataFrame, page: Column, maxLines: Int = 8): DataFrame = {
    val kept = docs
      .select(col("doc_id"), posexplode(split(page, "\n")).as(Seq("pos", "line")))
      // a page with >= maxLines lines would alias another doc's key space —
      // fail loudly instead of silently mis-deduping (raise_error sits in a
      // non-taken branch: zero cost until the contract is violated)
      .select(col("line"),
        (col("doc_id") * maxLines +
          when(col("pos") < maxLines, col("pos"))
            .otherwise(expr(s"raise_error('dedupLinesOf: page has >= $maxLines lines; " +
              "raise maxLines')"))).as("k"))
      .groupBy("line").agg(min("k").as("k"))
      .select(col("line"), expr(s"k div $maxLines").as("doc_id"),
        expr(s"k % $maxLines").as("pos"))
    docs.select("doc_id")
      .join(
        kept.groupBy("doc_id").agg(
          count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("cleaned")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        expr("md5(cast(coalesce(cleaned, '') AS binary))").as("digest"))
  }

  /** `text_line_dedup`: fixture pages plant two boilerplate lines around
    * each document — one corpus-global nav line and one 4-way-shared
    * footer — so the pass must keep each exactly once corpus-wide, keep
    * unique document text everywhere EXCEPT the corpus's planted exact-dup
    * docs (whose text line dedups too, same as production), and reassemble
    * the rest in order. The oracle runs the same reduction in SQL from a
    * 3-row UNION per doc (positions are the fixture constants), so
    * first-occurrence choice, ordering, and reassembly all pin.
    */
  def lineDedupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val page = concat_ws("\n",
      lit("Home | About | Contact"),
      col("text"),
      concat(lit("Copyright "), col("doc_id") % 4, lit(" example.com")))
    dedupLinesOf(Tables.documents(spark, sfDir), page)
      .withColumn("n_lines", lit(3L))
      .select("doc_id", "n_lines", "n_kept", "digest")
      .orderBy("doc_id")
  }

  private val lineDedupSql =
    """WITH l AS (
         SELECT doc_id, 0 AS pos, 'Home | About | Contact' AS line FROM documents
         UNION ALL SELECT doc_id, 1, text FROM documents
         UNION ALL SELECT doc_id, 2, 'Copyright ' || (doc_id % 4) || ' example.com'
           FROM documents
       ), f AS (
         SELECT line, min(doc_id * 8 + pos) AS first_k FROM l GROUP BY line
       ), k AS (
         SELECT l.doc_id, l.pos, l.line FROM l JOIN f USING (line)
         WHERE l.doc_id * 8 + l.pos = f.first_k
       ), r AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                string_agg(line, chr(10) ORDER BY pos) AS cleaned
         FROM k GROUP BY doc_id
       )
       SELECT d.doc_id, CAST(3 AS BIGINT) AS n_lines,
              COALESCE(r.n_kept, 0) AS n_kept,
              md5(COALESCE(r.cleaned, '')) AS digest
       FROM documents d LEFT JOIN r USING (doc_id) ORDER BY doc_id"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_c4_filter" -> (c4FilterQuery _),
    "text_pii_redact" -> (piiRedactQuery _),
    "text_mojibake_repair" -> (mojibakeRepairQuery _),
    "text_line_dedup" -> (lineDedupQuery _),
  )

  override def oracle: Map[String, String] = Map(
    "text_c4_filter" -> c4FilterSql,
    "text_pii_redact" -> piiRedactSql,
    "text_mojibake_repair" -> mojibakeRepairSql,
    "text_line_dedup" -> lineDedupSql,
  )
}
