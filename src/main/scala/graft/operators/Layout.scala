package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Scratch, Tables}

/** Z-order (Morton) layout keys — multi-dimensional data clustering for
  * scan pruning. Sorting a table by the bit-interleave of two cell
  * coordinates places rows that are close in EITHER dimension into the
  * same files, so min/max footer statistics prune 2-D range scans that a
  * single-column sort order can only prune along its leading column. This
  * is the layout step behind `OPTIMIZE ZORDER BY`-style table maintenance,
  * expressed as a plain deterministic key column any writer can sort by.
  *
  * Reference scope: the reference writes unordered CSV output
  * (q2_ecommerce_analysis.py:271-275); physical layout for selective reads
  * is exactly the kind of 100 TB concern this engine adds.
  *
  * The interleave is a generated 2·[[Bits]]-term shift-mask sum — the same
  * expression in both dialects, all integer ops, so the oracle matches
  * exactly. Map-only: the key costs no shuffle; the SORT that applies the
  * layout is the table-maintenance job's existing global sort.
  * LayoutSpec proves the point structurally: the same box query touches
  * strictly fewer files under a z-order sort than under a leading-column
  * sort, via per-file min/max ranges — the same statistics parquet footers
  * carry.
  */
object Layout extends QueryModule {

  /** Per-dimension resolution in bits; two dimensions → 2·Bits-bit keys. */
  val Bits = 10

  /** The Morton interleave of two [[Bits]]-bit cells, Spark dialect:
    * even bit positions take x's bits, odd take y's.
    */
  def mortonSpark(x: String, y: String): String = {
    val xs = (0 until Bits).map(i => s"shiftleft((shiftright($x, $i) & 1), ${2 * i})")
    val ys = (0 until Bits).map(i => s"shiftleft((shiftright($y, $i) & 1), ${2 * i + 1})")
    (xs ++ ys).mkString("(", " + ", ")")
  }

  /** The identical interleave in DuckDB's operator syntax. */
  def mortonDuck(x: String, y: String): String = {
    val xs = (0 until Bits).map(i => s"((($x >> $i) & 1) << ${2 * i})")
    val ys = (0 until Bits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
    (xs ++ ys).mkString("(", " + ", ")")
  }

  /** `orders_zorder_key`: each order's 2-D cell (customer hash cell ×
    * order-day cell) and its Morton key — the column a layout job sorts by
    * before writing.
    */
  def zorderKey(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        (col("o_custkey") % 1024).as("cust_cell"),
        (datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
          .cast("bigint") % 1024).as("day_cell"))
      .withColumn("zkey", expr(mortonSpark("cust_cell", "day_cell")).cast("bigint"))
      .orderBy("o_orderkey")

  private val zorderKeySql = {
    val x = "(o_custkey % 1024)"
    val y = "(CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) % 1024)"
    s"""SELECT o_orderkey,
               o_custkey % 1024 AS cust_cell,
               CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) % 1024
                 AS day_cell,
               CAST(${mortonDuck(x, y)} AS BIGINT) AS zkey
        FROM orders ORDER BY o_orderkey"""
  }

  /** Dim-side year selecting which fact partitions survive pruning. */
  val DppYear = "1997"

  /** The orders fact, Hive-partitioned by order month (`o_month=yyyy-MM/`
    * directories) under scratch — the date-partitioned fact layout every
    * 100 TB warehouse uses so time-scoped scans read only the matching
    * directories. Memoized: written once per run, shared by every consumer.
    */
  def ordersByMonth(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoizePartitioned(spark, s"$sfDir#orders_by_month", Seq("o_month")) {
      Tables.orders(spark, sfDir)
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        // cluster by the partition column before the partitionBy write:
        // without this every write task emits one file per month it sees
        // (tasks × months small files); with it each month directory gets
        // its writing task's single file — the standard layout-job shape
        .repartition(col("o_month"))
    }

  /** A month calendar dim (month, year, quarter) — the tiny table whose
    * attribute filters drive partition pruning on the fact. Derived from
    * the order-date domain and materialized as its OWN scratch table, so
    * the fact query joins a genuinely separate scan (as a warehouse
    * calendar dim would be).
    */
  def monthDim(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoize(spark, s"$sfDir#month_dim") {
      Tables.orders(spark, sfDir)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("m_month"))
        .distinct()
        .select(col("m_month"),
          substring(col("m_month"), 1, 4).as("m_year"),
          concat(lit("Q"),
            (((substring(col("m_month"), 6, 2).cast("int") - 1) / 3).cast("int") + 1))
            .as("m_quarter"))
    }

  /** `dpp_monthly_revenue`: monthly order volume and revenue for the months
    * of [[DppYear]], computed as a star join of the month-PARTITIONED fact
    * against the calendar dim filtered on its year attribute — the shape
    * where Spark's dynamic partition pruning fires. The year predicate
    * lives only on the dim, so no static filter reaches the fact; at
    * runtime the broadcast dim's `m_month` values are injected into the
    * fact scan as a `DynamicPruningExpression` partition filter and only
    * the 12 matching `o_month=` directories are read (pinned in
    * PlanAssertionsSpec).
    *
    * This is the 100 TB scan-killer the reference's own date filtering
    * gestures at (q2_ecommerce_analysis.py:58-61 filters a parsed
    * timestamp): at scale the filter must prune DIRECTORIES before any
    * row is read, not rows after. The DuckDB oracle computes the same
    * months directly from the flat table — layout must never change
    * results, only which files a scan touches.
    */
  def dppMonthlyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = ordersByMonth(spark, sfDir)
    val dim = monthDim(spark, sfDir).filter(col("m_year") === DppYear)
    fact.join(broadcast(dim), col("o_month") === col("m_month"))
      .groupBy(col("o_month").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(o_totalprice AS DECIMAL(12,2))")).as("rev"))
      .select(col("month"), col("n_orders"), col("rev").cast("double").as("revenue"))
      .orderBy("month")
  }

  private val dppMonthlyRevenueSql =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders
        WHERE strftime(o_orderdate, '%Y') = '$DppYear'
        GROUP BY 1 ORDER BY 1"""

  /** The lineitem fact (4× the orders rows), Hive-partitioned by SHIP
    * month (`l_month=yyyy-MM/` directories) under scratch — the same
    * date-partitioned layout as [[ordersByMonth]] on the bigger fact.
    * Memoized: written once per run, shared by every consumer.
    */
  def lineitemByShipMonth(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoizePartitioned(spark, s"$sfDir#lineitem_by_ship_month", Seq("l_month")) {
      Tables.lineitem(spark, sfDir)
        .withColumn("l_month", date_format(col("l_shipdate"), "yyyy-MM"))
        // one file per month directory, not tasks × months (see ordersByMonth)
        .repartition(col("l_month"))
    }

  /** `dpp_lineitem_revenue`: revenue SHIPPED in each month of [[DppYear]],
    * restricted to orders also PLACED in [[DppYear]] — the two-level
    * version of [[dppMonthlyRevenue]]: one broadcast calendar-dim filter
    * dynamically prunes BOTH month-partitioned facts, the 4×-bigger
    * lineitem through its ship-month join key and orders through its
    * order-month, before the fact⋈fact orderkey join runs. No static
    * filter ever reaches either fact; both scans read only their 12
    * surviving month directories (pinned in PlanAssertionsSpec) — at
    * 100 TB this is the difference between scanning a year and scanning
    * the table, on every fact in the star.
    */
  def dppLineitemRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    // the two month-partitioned fact layouts are independent one-time
    // builds — write them concurrently (guide §2.6) instead of paying
    // sum(write walls) on the cold run; memo hits no-op when the other
    // dpp/layout rows already built them
    Scratch.buildConcurrently(Seq(
      () => lineitemByShipMonth(spark, sfDir),
      () => ordersByMonth(spark, sfDir)))
    val dimMonths = monthDim(spark, sfDir).filter(col("m_year") === DppYear)
    val li = lineitemByShipMonth(spark, sfDir)
      .join(broadcast(dimMonths.select(col("m_month").as("ship_m"))),
        col("l_month") === col("ship_m"))
    val ord = ordersByMonth(spark, sfDir)
      .join(broadcast(dimMonths.select(col("m_month").as("ord_m"))),
        col("o_month") === col("ord_m"))
      .select(col("o_orderkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_month").as("month"))
      .agg(count(lit(1)).as("n_items"), sum(Retail.lineAmount).as("rev"))
      .select(col("month"), col("n_items"), col("rev").cast("double").as("revenue"))
      .orderBy("month")
  }

  private val dppLineitemRevenueSql =
    s"""SELECT strftime(l_shipdate, '%Y-%m') AS month,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE strftime(l_shipdate, '%Y') = '$DppYear'
          AND strftime(o_orderdate, '%Y') = '$DppYear'
        GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_zorder_key" -> (zorderKey _),
    "dpp_monthly_revenue" -> (dppMonthlyRevenue _),
    "dpp_lineitem_revenue" -> (dppLineitemRevenue _),
  )

  override def oracle: Map[String, String] = Map(
    "orders_zorder_key" -> zorderKeySql,
    "dpp_monthly_revenue" -> dppMonthlyRevenueSql,
    "dpp_lineitem_revenue" -> dppLineitemRevenueSql,
  )
}
