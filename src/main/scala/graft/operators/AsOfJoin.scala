package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}
import graft.plans.AsOfJoinNode

/** As-of join: attach to every left row the payload of the single most
  * recent right row on the same key (right.ts < left.ts when `strict`,
  * <= otherwise), left-outer — unmatched left rows keep a null payload.
  *
  * The reference's attribution notebook (q4_streaming.ipynb) matches
  * purchases to the click window that precedes them; the as-of form is the
  * same question asked point-wise ("the latest prior event, exactly one"),
  * which Spark has no built-in operator for.
  *
  * Spark-first plan, NOT a join: tag both sides, union, and take a running
  * `last(payload, ignoreNulls)` over a (key, ts, side)-sorted window, then
  * keep the left rows. That is exactly the sorted-merge an as-of join wants:
  *   - ONE hash exchange on the key for the combined input (a join would
  *     shuffle both sides too — and then pay a per-key product);
  *   - the running unbounded-preceding frame is incremental, so work is
  *     O(left + right) per partition even when one user has thousands of
  *     rows on each side — a join + argmax pays |left_k| × |right_k| per
  *     key before aggregating it back down;
  *   - payload travels as ONE struct column, so the matched attributes are
  *     row-atomic by construction (no risk of mixing two right rows).
  *
  * Strictness is encoded in the sort, not a filter: at equal timestamps the
  * left row sorts before the right row under `strict` (the same-instant
  * right row is not yet in the running frame), after it otherwise.
  *
  * At 100 TB: state per key is a single struct (the current "last seen"
  * payload), partitions only need to hold their sort run; skew on the key
  * behaves like any windowed aggregation (one task per hot key's run) and
  * the ts-sorted runs make the frame sequential I/O. Rows with a null
  * timestamp sort first and therefore never match — filter them beforehand
  * if they should be dropped entirely.
  */
object AsOfJoin extends QueryModule {

  /** @param payload right-side columns to attach; names must not collide
    *                with left's (rename on `right` before calling).
    * @param strict  true → right.ts <  left.ts; false → right.ts <= left.ts.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = true): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload columns collide with left: $collisions")
    require(payload.nonEmpty, "payload must name at least one right column")

    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)
    val keyCols = keys.map(col)
    val rightRows = right.select(
      keyCols ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"),
        lit(rightSide).as("__side"),
        lit(null).as("__row"),
        struct(payload.map(col): _*).as("__match")): _*)
    val leftRows = left.select(
      keyCols ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(leftSide).as("__side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__row"),
        lit(null).cast(rightRows.schema("__match").dataType).as("__match")): _*)

    val running = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftOut: Seq[Column] = left.columns.toSeq.map(c => col(s"__row.$c").as(c))
    val matchOut: Seq[Column] = payload.map(c => col(s"__match.$c").as(c))
    leftRows
      .unionByName(rightRows.withColumn("__row", col("__row").cast(leftRows.schema("__row").dataType)))
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(running))
      .filter(col("__side") === leftSide)
      .select(leftOut ++ matchOut: _*)
  }

  /** Native-operator form of [[asof]]: plans to [[graft.plans.AsOfMergeExec]],
    * a streamed O(1)-state merge of two (key, ts)-sorted runs — the
    * sort-merge-join cost model instead of the union+window's combined sort
    * run and per-key frame state. Same semantics, same signature; see
    * [[graft.plans.AsOfJoinNode]] for the plan-level contract.
    *
    * The right side is pre-projected to keys + ts + payload and every
    * column re-aliased (fresh exprIds), so a self-join — both sides derived
    * from the same table, the attribution case — can never carry ambiguous
    * attribute references into the node.
    */
  def asofMerge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = true): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload columns collide with left: $collisions")
    require(payload.nonEmpty, "payload must name at least one right column")

    val rKeyNames = keys.map(k => s"__asof_k_$k")
    val pruned = right.select(
      keys.zip(rKeyNames).map { case (k, a) => col(k).as(a) } ++
        Seq(col(rightTs).cast("timestamp").as("__asof_ts")) ++
        payload.map(c => col(c).as(c)): _*)

    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan = GraftSqlBridge.analyzed(pruned)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))

    val lTime = attr(lPlan, leftTs)
    val rTime = attr(rPlan, "__asof_ts")
    require(lTime.dataType == rTime.dataType,
      s"left ts ($leftTs: ${lTime.dataType}) must already be ${rTime.dataType}")
    GraftSqlBridge.ofRows(left.sparkSession, AsOfJoinNode(
      leftKeys = keys.map(attr(lPlan, _)),
      rightKeys = rKeyNames.map(attr(rPlan, _)),
      leftTime = lTime,
      rightTime = rTime,
      payload = payload.map(attr(rPlan, _)),
      strict = strict,
      left = lPlan,
      right = rPlan))
  }

  /** Purchases attributed to the user's most recent strictly-earlier view:
    * the point-wise twin of `events_attribution`'s window join. Gap is in
    * whole (floor-truncated) seconds so both engines agree on sub-second ts.
    */
  def asofViewQ(spark: SparkSession, sfDir: String): DataFrame =
    asofViewUsing(asof(_, _, _, _, _, _))(spark, sfDir)

  /** Same question through the native [[asofMerge]] operator — shares the
    * oracle SQL with [[asofViewQ]], so the DuckDB `ASOF JOIN` checks both
    * the compositional and the native plan.
    */
  def asofViewMergeQ(spark: SparkSession, sfDir: String): DataFrame =
    asofViewUsing(asofMerge(_, _, _, _, _, _))(spark, sfDir)

  private def asofViewUsing(
      join: (DataFrame, DataFrame, Seq[String], String, String, Seq[String]) => DataFrame)(
      spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).filter(col("ts").isNotNull)
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"), col("value"))
    val views = e
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    join(purchases, views, Seq("user_id"), "ts", "view_ts", Seq("view_id", "view_ts"))
      .select(
        col("purchase_id"),
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        col("value").as("purchase_value"),
        col("view_id"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_time"),
        (col("ts").cast("long") - col("view_ts").cast("long")).as("gap_seconds"))
      .orderBy("purchase_id")
  }

  private val asofViewSql =
    """SELECT p.event_id AS purchase_id, p.user_id,
              strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
              p.value AS purchase_value,
              v.event_id AS view_id,
              strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_time,
              CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_seconds
       FROM (SELECT * FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL) p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view' AND ts IS NOT NULL) v
         ON p.user_id = v.user_id AND p.ts > v.ts
       ORDER BY purchase_id"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_view" -> (asofViewQ _),
    "events_asof_view_native" -> (asofViewMergeQ _)
  )

  override def oracle: Map[String, String] = Map(
    "events_asof_view" -> asofViewSql,
    "events_asof_view_native" -> asofViewSql
  )
}
