package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` doorway graft uses: wrap a hand-built
  * [[LogicalPlan]] back into a DataFrame, and read a DataFrame's analyzed
  * plan so custom operators can reference its resolved attributes.
  *
  * Spark deliberately keeps `Dataset.ofRows` package-private — the supported
  * route for a library shipping its own operator is exactly this: a minimal
  * bridge object compiled into `org.apache.spark.sql` (the pattern every
  * public Spark extension library uses for plan-level operators). Everything
  * else in graft goes through the public API; keep this file to these two
  * calls so the private surface area stays auditable.
  */
object GraftSqlBridge {
  /** `Dataset.ofRows`: analyze `plan` in `spark` and wrap it as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan behind `df` (resolved attributes included). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed
}
