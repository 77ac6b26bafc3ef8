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
  *   - timestamps emitted as formatted UTC strings, never raw timestamps;
  *   - the final DECIMAL→double cast is engine-identical only while the
  *     unscaled value stays below 2^53 (native DECIMAL/HUGEINT→double
  *     conversions disagree in the last ulp past that). Every money column
  *     here is orders of magnitude under the bound; when an exact integer
  *     can exceed it, convert limb-exact instead — see
  *     `Profiling.hlSpark/hlDuck` (the correlation matrix hit this at
  *     sf0.1 and is the in-repo template).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
