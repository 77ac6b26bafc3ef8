package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module per SURVEY.md §2 category. `queries` feeds `SparkEntry.queries`
  * (driver runs each on sf0.01 parquet and hash-compares against `oracle`'s
  * DuckDB SQL). Queries missing from `oracle` get a weaker rows-only check.
  *
  * Determinism contract for every oracle-checked query (SURVEY.md §7.4):
  *   - total ORDER BY with tie-breaks, mirrored in the SQL;
  *   - money math in DECIMAL so sums are order-independent, cast to double
  *     only at the final projection;
  *   - no `round()` on doubles (engines disagree in the last ulp); round
  *     decimals instead, or divide deterministic doubles;
  *   - timestamps emitted as formatted UTC strings, never raw timestamps.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
