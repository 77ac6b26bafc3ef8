package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryModule, Tables}

/** Salted equi-join for skewed keys (builder brief: "salting for skew, AQE
  * for runtime re-plan").
  *
  * AQE's skew-join handles most cases by splitting oversized partitions at
  * runtime; salting is the static fallback when one key is so hot that even
  * a split partition's build side overflows, or when AQE is unavailable
  * (e.g. inside a streaming micro-batch join). Mechanics: every fact row
  * gets a DETERMINISTIC salt in [0, factor) derived by hashing the whole
  * row's distinguishing column, and the dim side is exploded `factor` times
  * so every (key, salt) pair finds its match — the hot key's rows spread
  * over `factor` reducers instead of one.
  *
  * Result equality with the plain join is exact (proved in SkewJoinSpec):
  * salting only refines the partitioning key, never the match condition.
  */
object SkewJoin extends QueryModule {

  /** Equi-join `facts ⋈ dims` on `key`, spreading each fact key over
    * `factor` partitions. `saltSource` must be a fact-side column (any type)
    * whose hash spreads rows — a line number, an id, a timestamp.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 saltSource: Column, factor: Int): DataFrame = {
    require(factor >= 1,
      s"salt factor must be >= 1, got $factor (0 divides by zero under ANSI, negatives silently empty the join)")
    // withColumn would silently OVERWRITE a caller's __salt column and then
    // drop it from the output — fail loudly instead of corrupting data
    require(!facts.columns.contains("__salt") && !dims.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the input first")
    val salted = facts.withColumn("__salt", pmod(hash(saltSource), lit(factor)))
    val exploded = dims.withColumn("__salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  // ---------------------------------------------------------------- queries

  /** Orders ⋈ customers through the salted path, factor 8: per-nation order
    * count and exact-decimal revenue. Identical to the plain join (salting
    * refines partitioning, never the match), so the oracle is the plain SQL
    * join — this puts the skew machinery itself under the CORRECTNESS gate,
    * not just its spec.
    */
  def saltedRevenueQ(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    val dim = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    saltedJoin(fact, dim, "c_custkey", saltSource = col("o_orderkey"), factor = 8)
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }

  /** Hot-key threshold multiple for [[skewReportOf]]: a key is "hot" when
    * its row count exceeds this multiple of the mean rows-per-key.
    */
  val HotKeyFactor = 2.0

  /** `events_key_skew_report`: join-key skew diagnostics — the query a
    * pipeline runs BEFORE choosing a join strategy (plain / AQE-split /
    * salted). One row: total rows, distinct keys, mean rows-per-key, the
    * heaviest key's count and share, and how many keys (and what row
    * share) sit above [[HotKeyFactor]]× the mean. All exact longs plus
    * fixed-shape double divisions, so the report hash-matches the oracle.
    *
    * Scale: one key-grain counting shuffle (the map-side-combined
    * aggregate the join itself would pay anyway), then all statistics
    * reduce the keys-sized count table — no windows, no sorts, and the
    * 1-row stats frame re-enters as a broadcast for the hot-key pass.
    */
  def skewReportOf(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      sum("cnt").as("n_rows"),
      count(lit(1)).as("n_keys"),
      max("cnt").as("max_key_rows"))
    val hot = counts.crossJoin(broadcast(stats))
      .filter(col("cnt").cast("double") >
        lit(HotKeyFactor) * col("n_rows") / col("n_keys"))
      .agg(count(lit(1)).as("n_hot_keys"),
        coalesce(sum("cnt"), lit(0L)).as("hot_rows"))
    stats.crossJoin(hot).select(
      col("n_rows"), col("n_keys"),
      (col("n_rows").cast("double") / col("n_keys")).as("avg_rows_per_key"),
      col("max_key_rows"),
      (col("max_key_rows").cast("double") / col("n_rows")).as("max_key_share"),
      col("n_hot_keys"),
      (col("hot_rows").cast("double") / col("n_rows")).as("hot_rows_share"))
  }

  def eventsKeySkewReport(spark: SparkSession, sfDir: String): DataFrame =
    skewReportOf(Tables.events(spark, sfDir), "user_id")

  /** The three join strategies [[chooseJoinStrategy]] selects among. */
  sealed abstract class JoinStrategy(val name: String)
  object JoinStrategy {
    /** No meaningful skew: the standard shuffle join partitions evenly. */
    case object Plain extends JoinStrategy("plain")
    /** Hot keys exist but none dominates: AQE's runtime skew-join split
      * (`spark.sql.adaptive.skewJoin`) rebalances the oversized
      * partitions; no static rewrite needed (proven live in AqeSkewSpec).
      */
    case object AqeSkew extends JoinStrategy("aqe_skew")
    /** One key owns most of the table: spread it statically with
      * [[saltedJoin]] — the fallback for degenerate skew and for joins
      * where AQE is unavailable (e.g. streaming micro-batches).
      */
    case object Salted extends JoinStrategy("salted")
  }

  /** Hot-row share below which skew is irrelevant: even if a few keys
    * exceed [[HotKeyFactor]]× the mean, they carry too little of the
    * table to unbalance a reducer.
    */
  val PlainHotShare = 0.2

  /** Max single-key share above which skew is degenerate: the heaviest
    * key alone owns half the table, so per-partition splitting leaves
    * every split still dominated by that key's build side — salt it.
    */
  val DegenerateShare = 0.5

  /** Pick the join strategy for an equi-join keyed on `key`, by the
    * [[skewReportOf]] thresholds: hot-row share under [[PlainHotShare]] →
    * [[JoinStrategy.Plain]]; heaviest-key share over [[DegenerateShare]] →
    * [[JoinStrategy.Salted]]; otherwise → [[JoinStrategy.AqeSkew]].
    *
    * The report costs the same key-grain counting shuffle the join itself
    * pays, and the decision reads ONE summary row on the driver — the
    * plan-time probe a nightly pipeline runs once per (table, key), not a
    * per-row data path. Thresholds are deliberately coarse: the goal is
    * the right MECHANISM (even partitioning vs runtime split vs static
    * salt), not a precise cost model.
    */
  def chooseJoinStrategy(df: DataFrame, key: String): JoinStrategy = {
    val r = skewReportOf(df, key).head()
    val hotShare = r.getAs[Double]("hot_rows_share")
    val maxShare = r.getAs[Double]("max_key_share")
    if (hotShare < PlainHotShare) JoinStrategy.Plain
    else if (maxShare > DegenerateShare) JoinStrategy.Salted
    else JoinStrategy.AqeSkew
  }

  /** Execute `facts ⋈ dims` on `key` via whatever [[chooseJoinStrategy]]
    * picks: the salted rewrite for degenerate skew, the plain shuffle join
    * otherwise ([[JoinStrategy.AqeSkew]] needs no rewrite — the session's
    * AQE splits oversized partitions at runtime, proven in AqeSkewSpec).
    * Result equality across all three branches is exact — strategy only
    * ever changes partitioning, never the match (SkewJoinSpec proves each
    * branch against the plain join on its planted fixture).
    */
  def strategicJoin(facts: DataFrame, dims: DataFrame, key: String,
                    saltSource: Column, factor: Int = 8): DataFrame =
    chooseJoinStrategy(facts, key) match {
      case JoinStrategy.Salted => saltedJoin(facts, dims, key, saltSource, factor)
      case _ => facts.join(dims, Seq(key))
    }

  /** `skew_join_strategic_revenue`: the [[saltedRevenueQ]] rollup routed
    * through [[strategicJoin]] — on the (uniform) fixture the chooser
    * takes the plain branch, and the oracle is the identical plain-join
    * SQL: the dispatcher itself sits under the correctness gate.
    */
  def strategicRevenueQ(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    val dim = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    strategicJoin(fact, dim, "c_custkey", saltSource = col("o_orderkey"))
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }

  private val eventsKeySkewReportSql =
    s"""WITH c AS (
          SELECT user_id AS k, COUNT(*) AS cnt FROM events GROUP BY 1
        ), s AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 COUNT(*) AS n_keys,
                 CAST(MAX(cnt) AS BIGINT) AS max_key_rows
          FROM c
        ), h AS (
          SELECT COUNT(*) AS n_hot_keys,
                 CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS hot_rows
          FROM c, s
          WHERE CAST(cnt AS DOUBLE) > $HotKeyFactor * n_rows / n_keys
        )
        SELECT s.n_rows, s.n_keys,
               CAST(s.n_rows AS DOUBLE) / s.n_keys AS avg_rows_per_key,
               s.max_key_rows,
               CAST(s.max_key_rows AS DOUBLE) / s.n_rows AS max_key_share,
               h.n_hot_keys,
               CAST(h.hot_rows AS DOUBLE) / s.n_rows AS hot_rows_share
        FROM s, h"""

  private val nationRevenueSql =
    """SELECT c_nationkey, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_join_salted_revenue" -> (saltedRevenueQ _),
    "skew_join_strategic_revenue" -> (strategicRevenueQ _),
    "events_key_skew_report" -> (eventsKeySkewReport _),
  )

  override def oracle: Map[String, String] = Map(
    "skew_join_salted_revenue" -> nationRevenueSql,
    "skew_join_strategic_revenue" -> nationRevenueSql,
    "events_key_skew_report" -> eventsKeySkewReportSql,
  )
}
