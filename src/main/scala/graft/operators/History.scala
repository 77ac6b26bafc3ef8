package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Slowly-changing-dimension (Type 2) history build — the warehouse
  * operator that turns an event log of attribute observations into
  * validity-interval rows (`valid_from`, `valid_to`, `is_current`), one per
  * run of consecutive equal values. The run detection is the classic
  * gaps-and-islands shape: a LAG-based change flag, a running sum to number
  * islands, one aggregation per island, then LEAD to close each interval
  * at the next island's start.
  *
  * Reference scope: the reference cleans and aggregates the order log
  * (q2_ecommerce_analysis.py) but never reconstructs attribute history;
  * any warehouse-grade pipeline needs this to dimension-ize a change log.
  *
  * Plan shape: ONE `Exchange hashpartitioning(o_custkey)` feeds every step —
  * the two stacked windows (LAG + running SUM) share a partition-compatible
  * sort, the island aggregation groups on a superset of the partition key,
  * and the closing LEAD re-uses the same clustering. Nothing here shuffles
  * twice; at 100 TB the per-customer history is the only state and the
  * island table is strictly smaller than the input.
  *
  * Determinism: islands are defined over the total order
  * (o_orderdate, o_orderkey); dates leave as formatted strings; counts and
  * version numbers are exact longs. The open interval's sentinel end is the
  * conventional '9999-12-31'.
  */
object History extends QueryModule {

  /** SCD-2 intervals of `o_orderpriority` per customer over the order log.
    * Exposed on a pre-projected frame so specs can feed planted histories.
    */
  private[graft] def scd2Core(orders: DataFrame): DataFrame = {
    val byTime = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("o_orderpriority"), 1).over(byTime)
    val islands = orders
      .withColumn("chg", when(prev.isNull || prev =!= col("o_orderpriority"), 1L).otherwise(0L))
      .withColumn("version", sum("chg").over(run))
      .groupBy(col("o_custkey"), col("version"), col("o_orderpriority"))
      .agg(min("o_orderdate").as("from_date"), count(lit(1)).as("n_orders"))
    val byVersion = Window.partitionBy("o_custkey").orderBy("version")
    islands
      .withColumn("to_date", lead(col("from_date"), 1).over(byVersion))
      .select(col("o_custkey"), col("version"),
        col("o_orderpriority").as("priority"),
        date_format(col("from_date"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("to_date"), "yyyy-MM-dd"), lit("9999-12-31")).as("valid_to"),
        col("to_date").isNull.as("is_current"),
        col("n_orders"))
  }

  def priorityScd2(spark: SparkSession, sfDir: String): DataFrame =
    scd2Core(Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"))
      .orderBy("o_custkey", "version")

  private val priorityScd2Sql =
    """WITH flagged AS (
         SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                CASE WHEN LAG(o_orderpriority) OVER w IS NULL
                       OR LAG(o_orderpriority) OVER w <> o_orderpriority
                     THEN 1 ELSE 0 END AS chg
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ), versioned AS (
         SELECT o_custkey, o_orderdate, o_orderpriority,
                CAST(SUM(chg) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
         FROM flagged
       ), islands AS (
         SELECT o_custkey, version, o_orderpriority,
                MIN(o_orderdate) AS from_date, COUNT(*) AS n_orders
         FROM versioned GROUP BY 1, 2, 3
       )
       SELECT o_custkey, version, o_orderpriority AS priority,
              strftime(from_date, '%Y-%m-%d') AS valid_from,
              COALESCE(strftime(LEAD(from_date) OVER w2, '%Y-%m-%d'),
                       '9999-12-31') AS valid_to,
              LEAD(from_date) OVER w2 IS NULL AS is_current,
              n_orders
       FROM islands
       WINDOW w2 AS (PARTITION BY o_custkey ORDER BY version)
       ORDER BY o_custkey, version"""

  /** `orders_incremental_agg`: incremental view maintenance for an additive
    * aggregate — the nightly-ETL pattern where a materialized per-month
    * revenue table absorbs a new batch WITHOUT rescanning history. The
    * fixture split stands in for "materialized state" (o_orderkey % 10 ≠ 0)
    * vs "today's batch" (% 10 = 0); the merge is the algebraic union-then-
    * combine (`state ⊎ delta`): counts add, DECIMAL revenue sums add —
    * associative and commutative, so merge ≡ full recompute, and the
    * DuckDB oracle PROVES it by computing the aggregate flat over all
    * orders. Avg rides the merged (sum, count) pair, never an avg-of-avgs.
    *
    * Scale: the whole point — per-night cost ∝ batch, not history. The
    * state side is a month-grain table (read, not rebuilt); only the delta
    * pays a fact-table scan. Any aggregate expressible as a commutative
    * monoid (count/sum/min/max, and avg/stddev/corr via moment pairs —
    * see `lineitem_corr_matrix`) maintains this way; rank/median do not,
    * which is why the quantile operators ship separate full and
    * bounded-state paths.
    */
  def incrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    def monthAgg(orders: DataFrame): DataFrame = orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(o_totalprice AS DECIMAL(12,2))")).as("rev"))
    val all = Tables.orders(spark, sfDir).filter(col("o_orderdate").isNotNull)
    val state = monthAgg(all.filter(col("o_orderkey") % 10 =!= 0))
    val delta = monthAgg(all.filter(col("o_orderkey") % 10 === 0))
    state.unionByName(delta)
      .groupBy("month")
      .agg(sum("n_orders").as("n_orders"), sum("rev").as("rev"))
      .select(col("month"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") / col("n_orders")).as("avg_order_value"))
      .orderBy("month")
  }

  private val incrementalAggSql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
              COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                AS avg_order_value
       FROM orders WHERE o_orderdate IS NOT NULL
       GROUP BY 1 ORDER BY 1"""

  /** `orders_monthly_growth`: month-over-month and year-over-year revenue
    * growth — the reporting staple that windows over an AGGREGATED series
    * rather than raw rows (contrast `q2_trailing_revenue`, whose RANGE
    * frame rides the fact stream). The fact table pays one month-grain
    * aggregate; the LAG(1)/LAG(12) window then runs over the months-sized
    * series, so the single-partition window is months-cheap at any corpus
    * size. Growth ratios are one double division of exact DECIMAL sums per
    * row; the first month (and first year) legitimately report NULL.
    *
    * LAG(12) means "12 PRESENT months back": on a series with empty months,
    * compose with the calendar gap-fill operator (`events_daily_gapfilled`'s
    * spine pattern) first so the offset is truly one year.
    *
    * The unpartitioned `Window.orderBy("month")` is safe BECAUSE its input
    * is the month-grain aggregate: calendar cardinality bounds it at ~12
    * rows/year (a century of data is ~1,200 rows on one task), regardless
    * of fact-table size.
    */
  def monthlyGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy("month")
    Tables.orders(spark, sfDir).filter(col("o_orderdate").isNotNull)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(12,2))")).as("rev"))
      .withColumn("prev_m", lag("rev", 1).over(w))
      .withColumn("prev_y", lag("rev", 12).over(w))
      .select(col("month"), col("rev").cast("double").as("revenue"),
        ((col("rev") - col("prev_m")).cast("double") / col("prev_m").cast("double"))
          .as("mom_growth"),
        ((col("rev") - col("prev_y")).cast("double") / col("prev_y").cast("double"))
          .as("yoy_growth"))
      .orderBy("month")
  }

  private val monthlyGrowthSql =
    """WITH m AS (
         SELECT strftime(o_orderdate, '%Y-%m') AS month,
                SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
         FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
       )
       SELECT month, CAST(rev AS DOUBLE) AS revenue,
              CAST(rev - lag(rev, 1) OVER (ORDER BY month) AS DOUBLE)
                / CAST(lag(rev, 1) OVER (ORDER BY month) AS DOUBLE) AS mom_growth,
              CAST(rev - lag(rev, 12) OVER (ORDER BY month) AS DOUBLE)
                / CAST(lag(rev, 12) OVER (ORDER BY month) AS DOUBLE) AS yoy_growth
       FROM m ORDER BY month"""

  /** `orders_cdc_upsert`: MERGE-INTO semantics as a plain full-outer join —
    * the nightly CDC upsert every parquet-backed warehouse table runs
    * (lakehouse MERGE without a table-format dependency). A keyed state
    * table absorbs a change batch of upserts and delete tombstones:
    * matched keys take the batch row, tombstoned keys disappear, unmatched
    * state rows survive. Fixture split: state = o_orderkey % 10 ≠ 0,
    * batch = % 7 = 0 with rewritten priority — chosen to OVERLAP the
    * state so all three MERGE cases genuinely occur: matched updates
    * (% 7 = 0, % 10 ≠ 0), pure inserts (% 70 = 0 but not % 49, absent
    * from state), and tombstones (% 49 = 0 — 7², coprime with the state
    * split so it cannot swallow every insert) that delete from state or
    * drop on arrival.
    *
    * Row-level semantics, not column coalesce: the batch row REPLACES the
    * state row wholesale (CDC images are full rows), decided by the
    * batch-side op flag — NULL-safe because presence is tested on the op
    * column, never on payload columns that could legitimately be NULL.
    *
    * Scale: the state side is the big one, so it IS persisted BUCKETED AND
    * SORTED by the key (`Scratch.memoizeBucketed` — the band-index /
    * PageRank-edge lifecycle): the nightly full-outer sort-merge join reads
    * the state's bucket layout straight from the files with ZERO exchange
    * on the state side (pinned in PlanAssertionsSpec under forced SMJ);
    * only the batch-sized side shuffles into the layout, and writing the
    * merge result back bucketed keeps the next night's merge co-located
    * too. No windows, no skew by construction (unique keys).
    */
  def cdcUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
      col("o_orderpriority"))
    val state = cdcState(spark, sfDir, all)
    val batch = all.filter(col("o_orderkey") % 7 === 0)
      .withColumn("op", when(col("o_orderkey") % 49 === 0, "D").otherwise("U"))
      .withColumn("o_orderpriority",
        when(col("op") === "U", concat(lit("UPD-"), col("o_orderpriority")))
          .otherwise(col("o_orderpriority")))
    mergeCdc(state, batch, "o_orderkey").orderBy("o_orderkey")
  }

  /** The schema-generic MERGE core behind [[cdcUpsert]] (and its streaming
    * twin, `graft.streaming.CdcStream`): `state ⟗ batch` on `key`; a batch
    * row with op 'U' REPLACES the state row wholesale (or inserts), op 'D'
    * tombstones it. Output columns = the state schema. Presence is tested
    * on the op column only, so NULL payload columns merge correctly; the
    * plan is ONE key shuffle (or zero state-side exchanges when the state
    * is bucketed, as `cdcState` persists it).
    */
  def mergeCdc(state: DataFrame, batch: DataFrame, key: String): DataFrame = {
    require(batch.columns.contains("op"),
      s"batch needs an 'op' column (U=upsert, D=delete); got ${batch.columns.mkString(",")}")
    val dataCols = state.columns.filter(_ != key)
    val b = batch.columns.filter(_ != key).foldLeft(batch) {
      (df, c) => df.withColumnRenamed(c, s"b_$c")
    }
    state.join(b, Seq(key), "full_outer")
      .filter(col("b_op").isNull || col("b_op") =!= "D")
      .select(col(key) +: dataCols.map(c =>
        when(col("b_op").isNotNull, col(s"b_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** The keyed CDC state table, persisted bucketed+sorted by `o_orderkey`
    * — what a real warehouse keeps between nightly merges.
    */
  private def cdcState(spark: SparkSession, sfDir: String, all: DataFrame): DataFrame =
    graft.Scratch.memoizeBucketed(spark, s"$sfDir#history#cdc_state",
      "graft_cdc_state", Seq("o_orderkey")) {
      all.filter(col("o_orderkey") % 10 =!= 0)
    }

  private val cdcUpsertSql =
    """WITH all_rows AS (
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
         FROM orders
       ), state AS (
         SELECT * FROM all_rows WHERE o_orderkey % 10 <> 0
       ), batch AS (
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                CASE WHEN o_orderkey % 49 = 0 THEN o_orderpriority
                     ELSE 'UPD-' || o_orderpriority END AS o_orderpriority,
                CASE WHEN o_orderkey % 49 = 0 THEN 'D' ELSE 'U' END AS op
         FROM all_rows WHERE o_orderkey % 7 = 0
       )
       SELECT COALESCE(s.o_orderkey, b.o_orderkey) AS o_orderkey,
              CASE WHEN b.op IS NOT NULL THEN b.o_custkey ELSE s.o_custkey END AS o_custkey,
              CASE WHEN b.op IS NOT NULL THEN b.o_orderstatus ELSE s.o_orderstatus END AS o_orderstatus,
              CASE WHEN b.op IS NOT NULL THEN b.o_totalprice ELSE s.o_totalprice END AS o_totalprice,
              CASE WHEN b.op IS NOT NULL THEN b.o_orderdate ELSE s.o_orderdate END AS o_orderdate,
              CASE WHEN b.op IS NOT NULL THEN b.o_orderpriority ELSE s.o_orderpriority END AS o_orderpriority
       FROM state s FULL OUTER JOIN batch b ON s.o_orderkey = b.o_orderkey
       WHERE b.op IS NULL OR b.op <> 'D'
       ORDER BY o_orderkey"""

  // ---- point-in-time (temporal) join against the SCD2 history ----

  /** `lineitem_pit_priority`: the temporal-join pattern every SCD2
    * dimension exists for — fact rows joined to the dimension row VALID AT
    * the fact's own timestamp, here: each lineitem priced under the
    * customer priority state in force on its ship date. Late-arriving
    * facts land in their historical context instead of today's.
    *
    * Composition, not new machinery: [[scd2Core]] builds the validity
    * islands; they reduce to end-of-day states (max version per
    * (custkey, valid_from) — same-date flip-flops collapse to the last
    * order's state, the total order scd2 already pins); then
    * [[AsOfJoin.asof]] (strict=false: a change effective ON the ship date
    * is visible) attaches the latest state at-or-before each ship date —
    * ONE custkey exchange, O(facts + history) per key, no per-key
    * interval product. Because islands tile time, "latest valid_from ≤ d"
    * IS the interval containing d — no valid_to predicate needed.
    *
    * The oracle states the same semantics independently (latest order
    * at-or-before the ship date per customer, via a correlated argmax) —
    * proving the scd2→eod→asof composition equals the point-wise
    * definition. Money in DECIMAL to the final projection; ship dates are
    * midnight-aligned in this dataset so the string-date cast is exact.
    * Facts PREDATING their customer's first observed state (the synthetic
    * data ships some lines before the order date) keep the as-of join's
    * left-outer NULL and surface as their own bucket — the honest answer,
    * not a silent drop.
    */
  /** DataFrame core of [[pitPriority]] — fixture surface for HistorySpec.
    * `orders` needs (o_custkey, o_orderkey, o_orderdate, o_orderpriority),
    * `lineitem` (l_orderkey, l_shipdate, amount).
    */
  private[graft] def pitPriorityOf(orders: DataFrame,
                                   lineitem: DataFrame): DataFrame = {
    val eod = scd2Core(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("o_custkey", "valid_from").orderBy(col("version").desc)))
      .filter(col("rk") === 1)
      .select(col("o_custkey"), col("valid_from"),
        col("priority").as("pit_priority"))
    val facts = lineitem
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        "l_orderkey")
    AsOfJoin.asof(facts, eod, keys = Seq("o_custkey"),
        leftTs = "l_shipdate", rightTs = "valid_from",
        payload = Seq("pit_priority"), strict = false)
      .groupBy("pit_priority")
      .agg(count(lit(1)).as("n_lines"), sum("amount").as("rev"))
      .select(col("pit_priority"), col("n_lines"),
        col("rev").cast("double").as("revenue"))
      .orderBy("pit_priority")
  }

  def pitPriority(spark: SparkSession, sfDir: String): DataFrame =
    pitPriorityOf(
      Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_shipdate"), Retail.lineAmount.as("amount")))

  private val pitPrioritySql =
    s"""WITH f AS (
          SELECT o.o_custkey, l.l_shipdate,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2))) AS amount
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), pit AS (
          SELECT f.amount,
                 (SELECT o2.o_orderpriority FROM orders o2
                  WHERE o2.o_custkey = f.o_custkey
                    AND o2.o_orderdate <= f.l_shipdate
                  ORDER BY o2.o_orderdate DESC, o2.o_orderkey DESC
                  LIMIT 1) AS pit_priority
          FROM f
        )
        SELECT pit_priority, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(amount) AS DOUBLE) AS revenue
        FROM pit GROUP BY pit_priority ORDER BY pit_priority"""

  // ---- incremental view maintenance for a JOIN view (delta-join algebra) ----

  /** `orders_lineitem_ivm`: maintain a materialized JOIN view — per-customer
    * line count + revenue over orders ⋈ lineitem — incrementally under
    * deltas to BOTH base tables, by the textbook delta-join decomposition:
    *
    *   V(o ∪ Δo, l ∪ Δl) = V(o,l) ⊎ agg(Δo ⋈ l) ⊎ agg(o ⋈ Δl) ⊎ agg(Δo ⋈ Δl)
    *
    * ⊎ being the per-key merge of the commutative-monoid metrics
    * (count/DECIMAL sum — the `orders_incremental_agg` contract lifted
    * from a single-table aggregate to a join view). Fixture deltas are
    * INDEPENDENT slices (`o_orderkey % 7` new orders, `l_linenumber % 3`
    * late-arriving lines), so all three delta terms are genuinely
    * non-empty — including late lines for pre-existing orders, the case
    * that forces the o ⋈ Δl term.
    *
    * The oracle is the FLAT recompute over the full tables — the IVM
    * algebra must be indistinguishable from rebuild, bit for bit (exact
    * DECIMAL sums are order-independent; the one double cast happens at
    * the final projection).
    *
    * Scale (100 TB): the standing view and each nightly merge cost
    * O(|Δo|·fanout + |Δl| + view): each delta term joins a DELTA side
    * against a base scan — broadcast the delta (it is batch-sized) and no
    * base table ever re-shuffles; the full base ⋈ base join never re-runs.
    * The base-side scans stay pruned to the join keys + metrics.
    */
  def joinIvm(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, sfDir).select(col("l_orderkey"),
      col("l_linenumber"), Retail.lineAmount.as("amount"))
    joinIvmOf(
      o.filter(col("o_orderkey") % 7 =!= 0), o.filter(col("o_orderkey") % 7 === 0),
      l.filter(col("l_linenumber") % 3 =!= 0), l.filter(col("l_linenumber") % 3 === 0))
  }

  /** The IVM core — fixture surface for HistorySpec. */
  private[graft] def joinIvmOf(oBase: DataFrame, oDelta: DataFrame,
                               lBase: DataFrame, lDelta: DataFrame): DataFrame = {
    def view(o: DataFrame, l: DataFrame): DataFrame =
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_lines"), sum("amount").as("rev"))
    view(oBase, lBase)                   // the standing view (built once)
      .unionByName(view(broadcast(oDelta), lBase))   // new orders × old lines
      .unionByName(view(oBase, broadcast(lDelta)))   // old orders × late lines
      .unionByName(view(oDelta, lDelta))             // new × new (batch-sized)
      .groupBy("o_custkey")
      .agg(sum("n_lines").as("n_lines"), sum("rev").as("rev"))
      .select(col("o_custkey"), col("n_lines"),
        col("rev").cast("double").as("revenue"))
      .orderBy("o_custkey")
  }

  private val joinIvmSql =
    """SELECT o.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                AS revenue
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_custkey ORDER BY o.o_custkey"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_priority_scd2" -> (priorityScd2 _),
    "lineitem_pit_priority" -> (pitPriority _),
    "orders_lineitem_ivm" -> (joinIvm _),
    "orders_incremental_agg" -> (incrementalAgg _),
    "orders_monthly_growth" -> (monthlyGrowth _),
    "orders_cdc_upsert" -> (cdcUpsert _),
  )

  override def oracle: Map[String, String] = Map(
    "orders_priority_scd2" -> priorityScd2Sql,
    "lineitem_pit_priority" -> pitPrioritySql,
    "orders_lineitem_ivm" -> joinIvmSql,
    "orders_incremental_agg" -> incrementalAggSql,
    "orders_monthly_growth" -> monthlyGrowthSql,
    "orders_cdc_upsert" -> cdcUpsertSql,
  )
}
