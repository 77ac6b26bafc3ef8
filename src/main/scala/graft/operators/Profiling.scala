package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Schema-driven data profiling: per-column null counts, exact distinct
  * counts, and lexicographic min/max (values rendered as strings so one
  * result schema fits every column type) — the first query a pipeline runs
  * against an unfamiliar table, generated from `df.schema` so it works on
  * ANY table without per-table code.
  *
  * Reference scope: the reference eyeballs `printSchema`/`show` per script
  * (q3_json_processing.py:30-40); a reusable profiling operator is the
  * production replacement.
  *
  * Shape: ONE aggregation pass emits all 4·n_cols metrics; the `stack`
  * generator unpivots the single wide row into one row per column. The
  * exact per-column COUNT(DISTINCT) forces Catalyst's Expand (input rows ×
  * n_cols before the shuffle) — the deliberate exact/oracle-checkable
  * form. At 100 TB swap `count_distinct` for `approx_count_distinct`
  * (HLL): same single pass, NO Expand, ~2% error — the documented
  * production knob, same operator otherwise.
  *
  * Min/max compare AFTER the string cast (lexicographic), so the metric is
  * type-agnostic and engine-identical; numeric extremes belong to a
  * numeric query, not a profile.
  */
object Profiling extends QueryModule {

  /** Profile any DataFrame: one row per column. Unordered. */
  def profileOf(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stacked) AS (column_name, n_nulls, n_distinct, min_value, max_value)")
  }

  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profileOf(Tables.orders(spark, sfDir)).orderBy("column_name")

  /** The synthetic orders schema spelled out (the oracle cannot reflect). */
  private val OrdersCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  private val profileOrdersSql =
    OrdersCols.map { c =>
      s"""SELECT '$c' AS column_name,
                 CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 COUNT(DISTINCT $c) AS n_distinct,
                 MIN(CAST($c AS VARCHAR)) AS min_value,
                 MAX(CAST($c AS VARCHAR)) AS max_value
          FROM orders"""
    }.mkString("", " UNION ALL ", " ORDER BY column_name")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_orders" -> (profileOrders _),
  )

  override def oracle: Map[String, String] = Map(
    "profile_orders" -> profileOrdersSql,
  )
}
