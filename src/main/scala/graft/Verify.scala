package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional trailing substrings restrict to matching query names (dev
    // iteration); the driver passes two args and gets every query.
    val filters = args.drop(2).toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.filter { case (name, _) =>
      filters.isEmpty || filters.exists(name.contains)
    }
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A broken query must surface as a FAILED row, never a missing one:
        // replace any partial output with a sentinel dir holding only _ERROR,
        // so the driver's parquet read of it errs instead of skipping.
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        failed(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        val dir = Paths.get(s"$outDir/$name")
        if (Files.exists(dir))
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
        Files.createDirectories(dir)
        Files.writeString(dir.resolve("_ERROR"), msg + "\n")
      }
      spark.catalog.clearCache() // per-query caches must not outlive the query
      Scratch.sweepEphemeral() // nor per-query scratch materializations
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable failure summary (empty object when all green) plus a
    // one-line verdict on stderr — a regression must be loud in every channel.
    val errJson = failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size}/${selected.size} queries FAILED: " +
        failed.keys.mkString(", "))
    spark.stop()
    // exit 0 even on per-query failure: the driver must still ingest the
    // green rows + sentinels; the sentinel dirs are what make failures loud
  }
}
