package graft.operators

import graft.SparkSpec

/** The RUNTIME half of the skew story (SkewJoin's scaladoc: "AQE's
  * skew-join handles most cases by splitting oversized partitions at
  * runtime; salting is the static fallback"): prove the runtime path
  * actually engages on this engine's session. A 90%-hot-key join under
  * forced sort-merge must come out of adaptive execution with the
  * SortMergeJoin marked `skew=true` — the hot partition split into
  * advisory-sized chunks with the build side replicated — and identical
  * results to the unskewed logical join.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot key's partition at runtime (skew=true in the final plan)") {
    val confs = Map(
      // force the sort-merge path: broadcast also dodges skew, proving nothing
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-sized thresholds: the hot partition (~90k rows) is "huge"
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of fact rows share key 1; the rest spread over 2..51
      val facts = spark.range(0, 100000).selectExpr(
        "id AS row_id",
        "CAST(CASE WHEN id % 10 < 9 THEN 1 ELSE id % 50 + 2 END AS BIGINT) AS k",
        "id * 1.5 AS v")
      val dims = spark.range(1, 61).selectExpr("id AS k", "concat('dim', id) AS label")
      val joined = facts.join(dims, "k")
      // execute THIS frame (count() would plan its own execution and leave
      // joined's adaptive plan unfinalized), then read the final plan
      assert(joined.collect().length == 100000, "every fact key exists in the dim")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
