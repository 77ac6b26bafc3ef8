package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryModule, Tables}

/** Range joins, the two shapes a pipeline actually hits:
  *
  *   1. point-in-interval with NO equi key (price tiers, IP→geo blocks,
  *      calendar buckets). Naively this is a cartesian product that Spark
  *      plans as BroadcastNestedLoopJoin — O(|points|·|intervals|) compares
  *      and a broadcast that stops fitting long before 100 TB. The classic
  *      fix (bin blocking): pick a bin width w, explode every interval to
  *      the w-bins it covers, map every point to its single bin, and
  *      equi-join on the bin. The shuffle moves 8-byte bin keys, each point
  *      meets only the intervals sharing its bin, and the exact predicate
  *      re-checked after the join keeps the result identical to the naive
  *      form (RangeJoinSpec pins that, plus the absence of any
  *      nested-loop/cartesian operator in the plan).
  *   2. interval overlap WITH an equi key (same-customer order windows,
  *      same-user sessions). Here the key already bounds the per-group
  *      product, so the right plan is the plain shuffled equi-join with the
  *      overlap predicate as a post-condition — no binning machinery needed
  *      unless a single key's group is itself huge (then bin within key).
  *
  * Bin-width choice mirrors the LSH planner's logic: w ≈ the median
  * interval length makes each interval cover ~2 bins while keeping each
  * point's candidate set near the true match set. Candidate quality
  * degrades gracefully — a too-small w only multiplies the interval-side
  * replication (rows = Σ ceil(len/w)), never the correctness.
  */
object RangeJoin extends QueryModule {

  /** Binned point-in-interval join: rows of `points` paired with every row
    * of `intervals` whose [lo, hi) contains the point (hi exclusive —
    * half-open intervals tile cleanly; make hi inclusive by passing
    * `hiInclusive = true`).
    *
    * Each point lands in exactly ONE bin, so a (point, interval) pair can
    * meet at most once and the output needs no dedup. Intervals replicate
    * to ceil(len/w)(+1 on exact-boundary ends) bins — at 100 TB that
    * replication is the knob: it trades interval-side rows for candidate
    * precision, and both sides stay map-side until the one bin-key shuffle.
    *
    * Empty intervals (lo >= hi when exclusive, lo > hi when inclusive)
    * match nothing and are dropped up front — also keeps `sequence()` from
    * generating a descending bin range.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      hiInclusive: Boolean = false): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision between sides: $overlap")

    val w = lit(binWidth)
    // Last covered bin: for exclusive hi an interval ending exactly on a bin
    // boundary does not reach into that bin, so ceil(hi/w)-1, not floor.
    val lastBin =
      if (hiInclusive) floor(col(hiCol) / w).cast("long")
      else (ceil(col(hiCol) / w).cast("long") - 1)
    val binned = intervals
      .filter(if (hiInclusive) col(loCol) <= col(hiCol) else col(loCol) < col(hiCol))
      .withColumn("__bin", explode(sequence(floor(col(loCol) / w).cast("long"), lastBin)))
    val pointed = points.withColumn("__bin", floor(col(pointCol) / w).cast("long"))

    val contains: Column =
      if (hiInclusive) col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
      else col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    pointed.join(binned, pointed("__bin") === binned("__bin") && contains)
      .drop("__bin")
  }

  /** Keyed interval-overlap self-join: pairs of rows sharing `key` whose
    * [lo, hi) windows overlap (a.lo < b.hi AND b.lo < a.hi), each unordered
    * pair once via `id` asymmetry. The equi key is the blocker; the overlap
    * predicate rides the join as a post-condition.
    */
  def overlapPairs(
      rows: DataFrame,
      key: String,
      id: String,
      loCol: String,
      hiCol: String): DataFrame = {
    val a = rows.columns.foldLeft(rows)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = rows.columns.foldLeft(rows)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    a.join(b,
      col(s"a_$key") === col(s"b_$key") &&
        col(s"a_$id") < col(s"b_$id") &&
        col(s"a_$loCol") < col(s"b_$hiCol") &&
        col(s"b_$loCol") < col(s"a_$hiCol"))
  }

  // ---------------------------------------------------------------- queries

  private val TierWidth = 15000.0
  private val TierStride = 5000.0
  private val TierCount = 100

  /** Orders priced into 100 OVERLAPPING price tiers (stride 5k, width 15k —
    * every order matches ~3 tiers, so this is a genuine range join, not a
    * binning): per tier, order count and exact-decimal revenue. Tier bounds
    * are whole-number doubles, so containment compares identically in both
    * engines; the sum is DECIMAL until the final cast.
    */
  def priceTiersQ(spark: SparkSession, sfDir: String): DataFrame = {
    val tiers = spark.range(TierCount.toLong).toDF("tier_id")
      .withColumn("lo", col("tier_id") * lit(TierStride))
      .withColumn("hi", col("lo") + lit(TierWidth))
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    pointInInterval(orders, tiers, "o_totalprice", "lo", "hi", binWidth = TierStride)
      .groupBy("tier_id", "lo", "hi")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("double").as("tier_value"))
      .orderBy("tier_id")
  }

  private val priceTiersSql =
    s"""WITH tiers AS (
          -- integer math then CAST: DuckDB decimal-point literals are DECIMAL,
          -- and the Spark side produces DOUBLE tier bounds
          SELECT i AS tier_id,
                 CAST(i * ${TierStride.toLong} AS DOUBLE) AS lo,
                 CAST(i * ${TierStride.toLong} + ${TierWidth.toLong} AS DOUBLE) AS hi
          FROM range(0, $TierCount) t(i))
        SELECT tier_id, lo, hi, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS tier_value
        FROM tiers JOIN orders ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY 1, 2, 3 ORDER BY tier_id"""

  /** Same-customer orders whose 7-day activity windows overlap — the keyed
    * overlap shape. Gap in whole days (timestamps are date-grained), pair
    * emitted once (smaller orderkey first), total order for the oracle.
    */
  def orderOverlapQ(spark: SparkSession, sfDir: String): DataFrame = {
    val windows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").as("lo"),
        date_add(col("o_orderdate"), 7).cast("timestamp").as("hi"))
    overlapPairs(windows, key = "o_custkey", id = "o_orderkey", loCol = "lo", hiCol = "hi")
      .select(
        col("a_o_custkey").as("o_custkey"),
        col("a_o_orderkey").as("first_order"),
        col("b_o_orderkey").as("second_order"),
        abs(datediff(col("b_lo"), col("a_lo"))).as("start_gap_days"))
      .orderBy("o_custkey", "first_order", "second_order")
  }

  private val orderOverlapSql =
    """WITH w AS (
         SELECT o_orderkey, o_custkey, o_orderdate AS lo,
                o_orderdate + INTERVAL 7 DAY AS hi
         FROM orders)
       SELECT a.o_custkey,
              a.o_orderkey AS first_order,
              b.o_orderkey AS second_order,
              CAST(abs(date_diff('day', a.lo, b.lo)) AS INT) AS start_gap_days
       FROM w a JOIN w b
         ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        AND a.lo < b.hi AND b.lo < a.hi
       ORDER BY 1, 2, 3"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_join_price_tiers" -> (priceTiersQ _),
    "range_join_order_overlap" -> (orderOverlapQ _),
  )

  override def oracle: Map[String, String] = Map(
    "range_join_price_tiers" -> priceTiersSql,
    "range_join_order_overlap" -> orderOverlapSql,
  )
}
