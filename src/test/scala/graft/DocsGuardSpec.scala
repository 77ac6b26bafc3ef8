package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-rot guard for the audit prose (VERDICT r8 #7 / r10 #5): PLANS.md and
  * COVERAGE.md carry ~1,300 lines of per-query audit claims, and a renamed
  * or deleted query silently turns those claims into fiction (the r9 stale
  * "zero divergent pairs" text was exactly this failure mode, in prose
  * form). This spec pins the mechanical half: every backticked snake_case
  * token whose leading segment matches a REGISTERED query family (the
  * `dedup_`/`text_`/`q1_`... namespaces derived from `SparkEntry.queries`
  * itself, not a hand-list) must BE a registered query. Tokens outside
  * those families (column names, conf keys, file names) are never flagged.
  *
  * No Spark session: building the queries map only touches the module
  * registries.
  */
class DocsGuardSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet
  private val families = names.map(_.takeWhile(_ != '_'))
  private val token = "`([a-z][a-z0-9]*(?:_[a-z0-9]+)+)`".r

  /** Family-prefixed backticked tokens that are COLUMN names, not queries —
    * each entry must be justified here. `customer_name`: an output column
    * of the entity-resolution tables (SURVEY §2.11 X-rows).
    */
  private val columnAllowlist = Set("customer_name",
    "zip_with",      // Spark builtin function cited in PLANS prose, not a query
    "zstd_inflate", "zstd_deflate")  // graft's injected SQL functions, cited as functions

  private def repoFile(name: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(name)
    if (java.nio.file.Files.exists(p)) p
    else java.nio.file.Paths.get(sys.props("user.dir"), name)
  }

  /** The numeric half of the guard (VERDICT r10 #4): COVERAGE.md's
    * "Current bench anchors" table is the ONE place wall-seconds claim to
    * describe the current committed artifact (prose numbers are historical
    * by the documented convention). Each anchor must sit within 2x of the
    * committed `bench_result.json` — a tolerance wide enough for the box's
    * ±40 % swing but narrow enough that a genuinely regressed or
    * stale-by-a-round number fails the build. Skipped (cancelled, loudly)
    * when bench_result.json is not an sf0.1 run: dev smokes at other
    * scales routinely overwrite the file and say nothing about the
    * anchors' scale.
    */
  test("COVERAGE.md current bench anchors are within 2x of bench_result.json") {
    val cov = new String(java.nio.file.Files.readAllBytes(repoFile("COVERAGE.md")), "UTF-8")
    val section = cov.split("\n## ").find(_.startsWith("Current bench anchors"))
      .getOrElse(fail("COVERAGE.md lost its 'Current bench anchors' section"))
    val anchorRe = """\|\s*`([a-z0-9_]+)`\s*\|\s*([0-9]+(?:\.[0-9]+)?)\s*\|""".r
    val anchors = anchorRe.findAllMatchIn(section)
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    assert(anchors.nonEmpty, "anchors table is empty — the convention needs at least one row")
    anchors.foreach { case (n, _) =>
      assert(names.contains(n), s"anchor `$n` is not a registered query")
    }
    val benchPath = repoFile("bench_result.json")
    assume(java.nio.file.Files.exists(benchPath), "no bench_result.json to check against")
    val bench = new String(java.nio.file.Files.readAllBytes(benchPath), "UTF-8")
    assume(bench.contains("\"sf\":\"/root/testdata/sf0.1\""),
      "bench_result.json is not an sf0.1 run; anchors are sf0.1 numbers — not checked")
    // the queries map is the first {...} after "queries": — flat numeric pairs
    val qsection = bench.drop(bench.indexOf("\"queries\":{"))
      .takeWhile(_ != '}')
    val timeRe = """"([a-z0-9_]+)":([0-9.eE+-]+)""".r
    val actual = timeRe.findAllMatchIn(qsection)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val drifted = anchors.flatMap { case (n, doc) =>
      actual.get(n) match {
        case None => Some(s"$n: missing from bench_result.json")
        case Some(a) if a > doc * 2 || a < doc / 2 =>
          Some(f"$n: documented $doc%.2f s vs measured $a%.2f s (>2x drift)")
        case _ => None
      }
    }
    assert(drifted.isEmpty,
      "bench anchors drifted — re-measure and update COVERAGE.md's table:\n  " +
        drifted.mkString("\n  "))
  }

  for (doc <- Seq("PLANS.md", "COVERAGE.md", "SURVEY.md")) {
    test(s"every query-family backtick name in $doc is a registered query") {
      val path = repoFile(doc)
      assert(java.nio.file.Files.exists(path), s"$doc not found from test cwd")
      val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      val cited = token.findAllMatchIn(text).map(_.group(1)).toSet
      val stale = cited.filter(t => families.contains(t.takeWhile(_ != '_')))
        .diff(names).diff(columnAllowlist)
      assert(stale.isEmpty,
        s"$doc cites query-family names that are not registered queries " +
          s"(renamed or deleted?): ${stale.toSeq.sorted.mkString(", ")}")
    }
  }
}
