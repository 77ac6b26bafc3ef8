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
  private val columnAllowlist = Set("customer_name")

  private def repoFile(name: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(name)
    if (java.nio.file.Files.exists(p)) p
    else java.nio.file.Paths.get(sys.props("user.dir"), name)
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
