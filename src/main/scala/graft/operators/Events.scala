package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryModule, Tables}

/** Q4 capability family, batch twins (SURVEY §2.9, §7.2 step 5).
  *
  * The streaming pipelines themselves live in graft.streaming.SensorStreams —
  * the SAME transformation functions are applied here to the batch events
  * table, which is how the DuckDB oracle can check streaming semantics
  * (per-key global agg A5/T1, tumbling window T3, sliding window T4): a
  * Structured Streaming query over a finite input must converge to its batch
  * twin's result. ScalaTest drives the real readStream/writeStream path with
  * MemoryStream and asserts it equals these.
  *
  * Scale: windowed aggregation state is bounded by (keys × open windows) under
  * the watermark; the unwatermarked per-key aggregate (the reference's
  * deliberate Part A, q4 cell 0:51-59) is bounded by key cardinality.
  * events.value carries ≤2 decimals → DECIMAL sums for oracle parity.
  */
object Events extends QueryModule {

  /** T1: event-time extraction — parse/guard the timestamp (q4 cell 0:44-48). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", col("ts"))
      .filter(col("event_time").isNotNull)

  /** A5/T1: per-key unbounded aggregate — avg/count/min/max of value by
    * event_type (q4 cell 0:51-59; sensor_id→event_type).
    */
  def perKeyStats(df: DataFrame): DataFrame =
    withEventTime(df)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).as("value_sum"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .withColumn("avg_value", col("value_sum").cast("double") / col("n_events"))
      .withColumn("value_sum", col("value_sum").cast("double"))

  def perKeyStatsQ(spark: SparkSession, sfDir: String): DataFrame =
    perKeyStats(Tables.events(spark, sfDir))
      .select("event_type", "n_events", "value_sum", "avg_value", "min_value", "max_value")
      .orderBy("event_type")

  private val perKeyStatsSql =
    """SELECT event_type, COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
              MIN(value) AS min_value, MAX(value) AS max_value
       FROM events WHERE ts IS NOT NULL
       GROUP BY event_type ORDER BY event_type"""

  /** T3: tumbling 5-minute window, global avg + count (q4 cell 0:74-87).
    * Window bounds emitted as formatted UTC strings (oracle parity).
    * `tumblingAgg` takes a frame that already has `event_time` so the
    * streaming path can insert `withWatermark` between extraction and
    * aggregation (graft.streaming.SensorStreams).
    */
  def tumbling(df: DataFrame): DataFrame = tumblingAgg(withEventTime(df))

  def tumblingAgg(df: DataFrame): DataFrame =
    df
      .groupBy(window(col("event_time"), "5 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).as("value_sum"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("n_events"),
        (col("value_sum").cast("double") / col("n_events")).as("avg_value"))

  def tumblingQ(spark: SparkSession, sfDir: String): DataFrame =
    tumbling(Tables.events(spark, sfDir)).orderBy("window_start")

  private val tumblingSql =
    """SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
                AS window_start,
              strftime(time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes',
                       '%Y-%m-%d %H:%M:%S') AS window_end,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
       FROM events WHERE ts IS NOT NULL
       GROUP BY 1, 2 ORDER BY 1"""

  /** T4: sliding window ([[SlidingWindowMinutes]] length,
    * [[SlidingSlideMinutes]] slide) per key — max + count (q4 cell
    * 0:100-114). Each event lands in exactly window/slide windows; the
    * oracle enumerates the covering starts GENERICALLY from that ratio
    * ([[slidingStartsDuck]]), so re-parameterizing the window cannot
    * silently desync the twin (SlidingWindowSpec proves the enumeration
    * at a 3-bucket ratio against Spark's own window()).
    */
  val SlidingWindowMinutes = 10
  val SlidingSlideMinutes = 5

  def sliding(df: DataFrame): DataFrame = slidingAgg(withEventTime(df))

  def slidingAgg(df: DataFrame): DataFrame =
    slidingAggOf(df, SlidingWindowMinutes, SlidingSlideMinutes)

  /** [[slidingAgg]] at any window = k·slide (minutes). */
  def slidingAggOf(df: DataFrame, windowMinutes: Int, slideMinutes: Int): DataFrame = {
    require(windowMinutes % slideMinutes == 0,
      s"slide must divide window: $windowMinutes % $slideMinutes != 0")
    df
      .groupBy(window(col("event_time"), s"$windowMinutes minutes", s"$slideMinutes minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), max("value").as("max_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("max_value"))
  }

  def slidingQ(spark: SparkSession, sfDir: String): DataFrame =
    sliding(Tables.events(spark, sfDir)).orderBy("window_start", "event_type")

  /** The DuckDB list of an event's covering window starts for any
    * window = k·slide: `bucket − i·slide` for i ∈ [0, k) where bucket is
    * the event's slide-grain floor — exactly Spark's `window()` cover set
    * (start ≤ t < start + window over slide-aligned starts). The bucket
    * floor is pinned to the Unix epoch origin explicitly: Spark's
    * `window()` aligns starts to 1970-01-01 while DuckDB's `time_bucket`
    * defaults to a 2000-01-01 origin, which only coincides for slides
    * dividing the 2000−1970 offset — with the explicit origin the two
    * grids agree for EVERY slide (e.g. 7 minutes), not just the default 5.
    */
  private[operators] def slidingStartsDuck(windowMinutes: Int, slideMinutes: Int): String = {
    require(windowMinutes % slideMinutes == 0,
      s"slide must divide window: $windowMinutes % $slideMinutes != 0")
    (0 until windowMinutes / slideMinutes)
      .map(i => s"""time_bucket(INTERVAL '$slideMinutes minutes', ts,
                                TIMESTAMP '1970-01-01 00:00:00')
                      - INTERVAL '${i * slideMinutes} minutes'""")
      .mkString("[", ", ", "]")
  }

  private val slidingSql =
    s"""WITH e AS (
         SELECT event_type, value,
                unnest(${slidingStartsDuck(SlidingWindowMinutes, SlidingSlideMinutes)})
                  AS window_start
         FROM events WHERE ts IS NOT NULL)
       SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, COUNT(*) AS n_events, MAX(value) AS max_value
       FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Session windows (extension beyond the reference's fixed windows): per
    * user, events merge into a session while consecutive gaps stay under 12
    * hours; the session ends 12 hours after its last event (Spark
    * `session_window` semantics: per-event windows [ts, ts+gap) merged while
    * overlapping, i.e. new session iff gap ≥ 12h — the oracle's
    * gap-and-island formulation mirrors that exactly). The streaming twin
    * with explicit custom state lives in
    * `graft.streaming.SensorStreams.sessionize` (flatMapGroupsWithState).
    */
  val SessionGapMs: Long = 12 * 3600 * 1000L
  val SessionGap = s"${SessionGapMs / 3600000} hours" // single source of truth with the streaming twin

  def sessionizeAgg(df: DataFrame): DataFrame =
    df
      .groupBy(col("user_id"), session_window(col("event_time"), SessionGap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))

  def sessionizeQ(spark: SparkSession, sfDir: String): DataFrame =
    sessionizeAgg(withEventTime(Tables.events(spark, sfDir)))
      .orderBy("user_id", "session_start")

  private val sessionizeSql =
    """WITH g AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '12 hours'
                     THEN 1 ELSE 0 END AS new_session
         FROM events WHERE ts IS NOT NULL
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), s AS (
         SELECT user_id, ts,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
         FROM g
       )
       SELECT user_id,
              strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              strftime(MAX(ts) + INTERVAL '12 hours', '%Y-%m-%d %H:%M:%S') AS session_end,
              COUNT(*) AS n_events
       FROM s GROUP BY user_id, session_id
       ORDER BY user_id, session_start"""

  /** Distinct-user cardinality per event type, exact AND via the KMV sketch
    * ([[graft.functions.KmvSketch]]) — the bounded-state path a 100 TB
    * pipeline uses where exact countDistinct's shuffle is too wide. KMV is
    * deterministic (min-K of a set), so the DuckDB oracle reproduces the
    * estimate bit-for-bit from the same hashes and k-th order statistic.
    */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        expr(graft.pipeline.Dedup.hash60("CAST(user_id AS STRING)")).as("h"))
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"),
        // production form: bounded-buffer TypedImperativeAggregate installed
        // as SQL fn kmv_distinct (bit-identical to the KmvSketch Aggregator)
        expr("kmv_distinct(h)").as("kmv_estimate"))
      .orderBy("event_type")

  private val kmvDistinctSql = {
    val k = graft.functions.KmvSketch.K
    s"""WITH h AS (
          SELECT DISTINCT event_type,
                 ${graft.pipeline.Dedup.hash60Duck("CAST(user_id AS VARCHAR)")} AS h
          FROM events
        ), r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM h
        ), a AS (
          SELECT event_type, COUNT(*) AS nd,
                 MAX(CASE WHEN rn = $k THEN h END) AS kth
          FROM r GROUP BY event_type
        ), x AS (
          SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
          FROM events GROUP BY event_type
        )
        SELECT x.event_type, x.exact_users,
               CASE WHEN a.nd < $k THEN CAST(a.nd AS DOUBLE)
                    ELSE ${k - 1}.0 * 1152921504606846976.0 / kth END AS kmv_estimate
        FROM x JOIN a USING (event_type)
        ORDER BY event_type"""
  }

  /** The static user dimension for enrichment joins: customer keyed by
    * custkey with its market segment. events.user_id draws from the custkey
    * domain in the synthetic data, mirroring a production user→profile dim.
    */
  def userDim(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))

  /** Enrichment join core, shared verbatim by the batch query below and the
    * stream-static join (`SensorStreams.enriched`) — the sharing is what
    * makes the STREAMING join oracle-checkable: the stream must converge to
    * this. Inner equi-join on user_id; no broadcast hint — a dimension this
    * size is AQE's call (broadcast when small, shuffle on user_id when the
    * dim outgrows executors; either way stateless per micro-batch on the
    * stream side).
    */
  def enrichJoin(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, Seq("user_id"))

  def enrichedQ(spark: SparkSession, sfDir: String): DataFrame =
    enrichJoin(withEventTime(Tables.events(spark, sfDir)), userDim(spark, sfDir))
      .select("event_id", "user_id", "event_type", "value", "segment")
      .orderBy("event_id")

  private val enrichedSql =
    """SELECT e.event_id, e.user_id, e.event_type, e.value,
              c.c_mktsegment AS segment
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       WHERE e.ts IS NOT NULL
       ORDER BY e.event_id"""

  /** Attribution window for the click→purchase interval join. */
  val AttributionWindow = "6 hours"

  /** The two sides of the attribution join, projected to disjoint column
    * names so the streaming path can watermark each side independently.
    * Both expect `event_time` (post-[[withEventTime]]).
    */
  def clicksOf(df: DataFrame): DataFrame =
    df.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_time").as("click_time"))

  def purchasesOf(df: DataFrame): DataFrame =
    df.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("event_time").as("purchase_time"))

  /** Interval-join core (click ⋈ purchase by user within
    * [[AttributionWindow]]), shared by the batch query and the watermarked
    * stream-stream join (`SensorStreams.attribution`). The equi-key
    * (user_id) carries the shuffle; the time range is a post-join predicate
    * batch-side and the state-retention bound stream-side — Spark derives
    * "a click older than watermark − window can never match again" from
    * exactly this condition and evicts its state.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      joinType: String = "inner"): DataFrame =
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr(s"INTERVAL $AttributionWindow"),
      joinType)
      // coalesce is a no-op for inner/left (click side always present) and
      // makes full_outer's purchase-only rows carry their user
      .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"),
        date_format(col("click_time"), "yyyy-MM-dd HH:mm:ss").as("click_time"),
        date_format(col("purchase_time"), "yyyy-MM-dd HH:mm:ss").as("purchase_time"))

  def attributionQ(spark: SparkSession, sfDir: String): DataFrame = {
    val e = withEventTime(Tables.events(spark, sfDir))
    attributionJoin(clicksOf(e), purchasesOf(e))
      .orderBy("click_id", "purchase_id")
  }

  private val attributionSql =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
              strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
              strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
       FROM events c JOIN events p
         ON c.user_id = p.user_id
        AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
       WHERE c.ts IS NOT NULL AND p.ts IS NOT NULL
       ORDER BY click_id, purchase_id"""

  /** Left-outer attribution: every click, matched or not (unconverted
    * clicks carry null purchase columns). Stream-side this is the
    * emit-after-watermark shape — see `SensorStreams.attributionOuter`.
    */
  def attributionOuterQ(spark: SparkSession, sfDir: String): DataFrame = {
    val e = withEventTime(Tables.events(spark, sfDir))
    attributionJoin(clicksOf(e), purchasesOf(e), "left_outer")
      .orderBy("click_id", "purchase_id")
  }

  private val attributionOuterSql =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
              strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
              strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
       FROM (SELECT * FROM events WHERE event_type = 'click' AND ts IS NOT NULL) c
       LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL) p
         ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
       ORDER BY click_id, purchase_id"""

  /** Full-outer attribution: unmatched CLICKS and unmatched PURCHASES both
    * survive with nulls on the other side — the complete conversion picture
    * (unconverted clicks + unattributed purchases) in one frame. user_id is
    * taken from whichever side is present.
    */
  def attributionFullQ(spark: SparkSession, sfDir: String): DataFrame = {
    val e = withEventTime(Tables.events(spark, sfDir))
    attributionJoin(clicksOf(e), purchasesOf(e), "full_outer")
      .orderBy("click_id", "purchase_id")
  }

  private val attributionFullSql =
    """SELECT COALESCE(c.user_id, p.user_id) AS user_id,
              c.event_id AS click_id, p.event_id AS purchase_id,
              strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
              strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
       FROM (SELECT * FROM events WHERE event_type = 'click' AND ts IS NOT NULL) c
       FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL) p
         ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
       ORDER BY click_id, purchase_id"""

  /** JSON scalar surface (SURVEY §2.8): extract props.k per event, aggregate
    * per event_type. get_json_object ↔ json_extract_string.
    */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
        min("k").as("k_min"), max("k").as("k_max"))
      .orderBy("event_type")

  private val propsExtractSql =
    """SELECT event_type, COUNT(*) AS n,
              CAST(SUM(k) AS BIGINT) AS k_sum,
              MIN(k) AS k_min, MAX(k) AS k_max
       FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             FROM events)
       WHERE k IS NOT NULL
       GROUP BY event_type ORDER BY event_type"""

  /** Exact nearest-rank quantiles of value per event_type: rank ⌈q·n⌉'s
    * VALUE is picked, never interpolated, so doubles cross engines
    * untouched (interpolated percentile arithmetic differs per engine and
    * would break the bit-exact oracle). Scale: a per-key sort — the exact,
    * oracle-checkable form; at 100 TB the first pass is percentile_approx
    * or a t-digest sketch and this runs on the filtered tail.
    */
  def valueQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val byValue = Window.partitionBy("event_type").orderBy("value")
    val all = Window.partitionBy("event_type")
    def pick(q: Double, name: String) =
      max(when(col("rn") === ceil(col("n") * q), col("value"))).as(name)
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(byValue))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy("event_type")
      .agg(max("n").as("n"), pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99"))
      .orderBy("event_type")
  }

  private val valueQuantilesSql =
    """WITH v AS (
         SELECT event_type, value,
                row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
         FROM events)
       SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
              MAX(CASE WHEN rn = ceil(n * 0.5) THEN value END) AS p50,
              MAX(CASE WHEN rn = ceil(n * 0.9) THEN value END) AS p90,
              MAX(CASE WHEN rn = ceil(n * 0.99) THEN value END) AS p99
       FROM v GROUP BY 1 ORDER BY 1"""

  /** Trailing window size (days) for [[rollingActiveUsers]]. */
  val RollingDays = 7

  /** `events_rolling_active_users`: exact trailing-7-day distinct active
    * users per day — the sliding-DISTINCT aggregate the fixed-window
    * queries (t3/t4: count/max, decomposable) cannot express: distinct
    * does not sum across days, so a rolling SUM of daily distincts
    * double-counts returning users.
    *
    * Shape: dedup to (user, active-day) pairs (ONE shuffle, the only one
    * the raw stream pays), then each pair COVERS the [[RollingDays]] days
    * it contributes to via a map-only `sequence`+`explode` fan-out (×7,
    * bounded), and a distinct-count per covered day. Days are integer
    * epoch-days end-to-end so both engines do exact integer arithmetic;
    * the final projection renders them as date strings (house rule:
    * timestamps leave as formatted strings). Days past the last observed
    * day are clipped by a scalar-subquery max — no driver collect.
    *
    * 100 TB: cost is two key-shuffles of (user, day)-grain rows — no
    * window-function sort over the event stream, no per-day re-scan; the
    * ×7 fan-out happens AFTER the first dedup, on the much smaller
    * user-day grain. An approximate variant swaps the final
    * count_distinct for HLL/KMV sketches (the documented knob, same
    * plan shape).
    */
  def rollingActiveUsers(spark: SparkSession, sfDir: String): DataFrame =
    rollingActiveUsersOf(Tables.events(spark, sfDir))

  /** [[rollingActiveUsers]] core over any (user_id, ts) frame. */
  def rollingActiveUsersOf(events: DataFrame): DataFrame = {
    val ud = events
      .filter(col("ts").isNotNull)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("d"))
      .distinct()
    val maxD = ud.agg(max("d")).scalar()
    ud.select(col("user_id"),
        explode(expr(s"sequence(d, d + ${RollingDays - 1})")).as("cd"))
      .filter(col("cd") <= maxD)
      .groupBy("cd")
      .agg(countDistinct("user_id").as("active_users"))
      .select(
        date_format(expr("date_add(DATE '1970-01-01', CAST(cd AS INT))"), "yyyy-MM-dd")
          .as("day"),
        col("active_users"))
      .orderBy("day")
  }

  private val rollingActiveUsersSql =
    s"""WITH ud AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
          FROM events WHERE ts IS NOT NULL
        ), cover AS (
          SELECT user_id, d + i AS cd
          FROM ud CROSS JOIN (SELECT unnest(range(0, $RollingDays)) AS i)
          WHERE d + i <= (SELECT MAX(d) FROM ud)
        )
        SELECT strftime(DATE '1970-01-01' + CAST(cd AS INTEGER), '%Y-%m-%d') AS day,
               COUNT(DISTINCT user_id) AS active_users
        FROM cover GROUP BY 1 ORDER BY 1"""

  /** `events_rolling_active_users_kmv`: [[rollingActiveUsers]] with the
    * final per-day distinct count swapped for the deterministic KMV
    * sketch — the approximate composition the exact operator's scaladoc
    * promises, PROVEN rather than documented. Same dedup-then-cover plan
    * shape; the per-day aggregate state drops from "all covering users"
    * to ≤K longs, which is what makes a 10⁹-user daily-actives dashboard
    * a bounded-memory query. KMV (min-K of a hash set) is a pure set
    * function, so the DuckDB oracle reproduces every day's estimate
    * bit-for-bit; days with fewer than K active users are EXACT.
    */
  def rollingActiveUsersKmv(spark: SparkSession, sfDir: String): DataFrame =
    rollingActiveUsersKmvOf(Tables.events(spark, sfDir))

  def rollingActiveUsersKmvOf(events: DataFrame): DataFrame = {
    val ud = events
      .filter(col("ts").isNotNull)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("d"))
      .distinct()
    val maxD = ud.agg(max("d")).scalar()
    ud.select(
        expr(graft.pipeline.Dedup.hash60("CAST(user_id AS STRING)")).as("h"),
        explode(expr(s"sequence(d, d + ${RollingDays - 1})")).as("cd"))
      .filter(col("cd") <= maxD)
      .groupBy("cd")
      .agg(expr("kmv_distinct(h)").as("active_users_kmv"))
      .select(
        date_format(expr("date_add(DATE '1970-01-01', CAST(cd AS INT))"), "yyyy-MM-dd")
          .as("day"),
        col("active_users_kmv"))
      .orderBy("day")
  }

  private val rollingActiveUsersKmvSql = {
    val k = graft.functions.KmvSketch.K
    s"""WITH ud AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
          FROM events WHERE ts IS NOT NULL
        ), cover AS (
          SELECT user_id, d + i AS cd
          FROM ud CROSS JOIN (SELECT unnest(range(0, $RollingDays)) AS i)
          WHERE d + i <= (SELECT MAX(d) FROM ud)
        ), h AS (
          SELECT DISTINCT cd,
                 ${graft.pipeline.Dedup.hash60Duck("CAST(user_id AS VARCHAR)")} AS h
          FROM cover
        ), r AS (
          SELECT cd, h, row_number() OVER (PARTITION BY cd ORDER BY h) AS rn
          FROM h
        ), a AS (
          SELECT cd, COUNT(*) AS nd, MAX(CASE WHEN rn = $k THEN h END) AS kth
          FROM r GROUP BY cd
        )
        SELECT strftime(DATE '1970-01-01' + CAST(cd AS INTEGER), '%Y-%m-%d') AS day,
               CASE WHEN nd < $k THEN CAST(nd AS DOUBLE)
                    ELSE ${k - 1}.0 * 1152921504606846976.0 / kth END AS active_users_kmv
        FROM a ORDER BY day"""
  }

  /** Trailing baseline window (days) and flag threshold for
    * [[dailyAnomalies]].
    */
  val AnomalyWindow = 28
  val AnomalyMinBaseline = 7
  val AnomalyZ = 3.0

  /** `events_daily_anomalies`: daily event-volume anomaly detection — each
    * day's count z-scored against the trailing [[AnomalyWindow]]-day
    * baseline (excluding the day itself), flagged at |z| ≥ [[AnomalyZ]].
    * The monitoring query every ingestion pipeline runs on its own volume.
    *
    * Determinism: counts are exact longs, so the baseline moments (k, Σn,
    * Σn²) accumulated by the window frame are exact; mean/variance/z are a
    * fixed-shape double expression over them, identical in the oracle.
    * Days with fewer than [[AnomalyMinBaseline]] baseline days (the series
    * warm-up) report NULL z rather than a spurious score, as does a
    * zero-variance baseline. (Baseline sums stay far below 2^53 at any
    * gate scale; past it, the limb-exact conversion in `Profiling` is the
    * documented fallback.)
    *
    * Shape: the event stream pays ONE day-grain count; the window rides
    * the days-sized series. The series is first joined onto the dense
    * calendar spine (min..max day, generated — the `events_daily_gapfilled`
    * pattern) with empty days as explicit zero counts, so the trailing
    * ROWS frame means "[[AnomalyWindow]] CALENDAR days" even under sparse
    * data — without the spine it silently degrades to "the last
    * [[AnomalyWindow]] OBSERVED days", and a zero-volume day (often the
    * most anomalous signal there is: the pipeline stopped) never even
    * appears. GapfillSpec proves both properties on a planted empty day.
    */
  def dailyAnomalies(spark: SparkSession, sfDir: String): DataFrame =
    dailyAnomaliesOf(Tables.events(spark, sfDir))

  /** [[dailyAnomalies]] core over any (ts) frame. The unpartitioned
    * `Window.orderBy("d")` is safe BECAUSE its input is the day-grain
    * series: calendar cardinality bounds it at 365 rows/year (a decade is
    * ~3,650 rows on one task), regardless of event volume.
    */
  def dailyAnomaliesOf(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d").rowsBetween(-AnomalyWindow, -1)
    val zExpr =
      """(CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / k)
         / sqrt((CAST(k AS DOUBLE) * s2 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / (CAST(k AS DOUBLE) * k) / (k - 1) * k)"""
    val daily = events
      .filter(col("ts").isNotNull)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("d"))
      .agg(count(lit(1)).as("n"))
    val spine = daily.agg(min("d").as("d0"), max("d").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("d"))
    spine.join(daily, Seq("d"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("k", count("n").over(w))
      .withColumn("s", sum("n").over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .withColumn("z",
        when(col("k") >= AnomalyMinBaseline &&
          col("k") * col("s2") > col("s") * col("s"), expr(zExpr)))
      .select(
        date_format(expr("date_add(DATE '1970-01-01', CAST(d AS INT))"), "yyyy-MM-dd")
          .as("day"),
        col("n").as("n_events"), col("z"),
        (col("z").isNotNull && abs(col("z")) >= AnomalyZ).as("anomalous"))
      .orderBy("day")
  }

  private val dailyAnomaliesSql =
    s"""WITH daily0 AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                 COUNT(*) AS n
          FROM events WHERE ts IS NOT NULL GROUP BY 1
        ), r AS (
          SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily0
        ), spine AS (
          SELECT unnest(range(d0, d1 + 1)) AS d FROM r
        ), daily AS (
          SELECT s.d, COALESCE(daily0.n, 0) AS n
          FROM spine s LEFT JOIN daily0 ON daily0.d = s.d
        ), m AS (
          SELECT d, n,
                 COUNT(n) OVER w AS k,
                 SUM(n) OVER w AS s,
                 SUM(n * n) OVER w AS s2
          FROM daily
          WINDOW w AS (ORDER BY d ROWS BETWEEN $AnomalyWindow PRECEDING AND 1 PRECEDING)
        ), z AS (
          SELECT d, n,
                 CASE WHEN k >= $AnomalyMinBaseline AND k * s2 > s * s THEN
                   (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / k)
                   / sqrt((CAST(k AS DOUBLE) * s2 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                          / (CAST(k AS DOUBLE) * k) / (k - 1) * k)
                 END AS z
          FROM m
        )
        SELECT strftime(DATE '1970-01-01' + CAST(d AS INTEGER), '%Y-%m-%d') AS day,
               CAST(n AS BIGINT) AS n_events, z,
               (z IS NOT NULL AND abs(z) >= $AnomalyZ) AS anomalous
        FROM z ORDER BY day"""

  /** Histogram resolution for [[valueQuantilesHist]]. */
  val HistBuckets = 1000

  /** `events_value_quantiles_hist`: the BOUNDED-STATE quantile path the
    * exact operator's scaladoc points to for 100 TB — a fixed-resolution
    * equi-width histogram per key, quantiles read off the cumulative bucket
    * counts (upper bucket edge: the answer is exact to one bucket width,
    * (max−min)/[[HistBuckets]]). Same output shape as [[valueQuantiles]] so
    * the two rows compare side by side.
    *
    * Unlike rank-based exact quantiles (whose per-key SORT of every value
    * is the scale bottleneck) or `approx_percentile` (whose sketch merge is
    * partition-order dependent and can never hash-match another engine),
    * the histogram is deterministic under ANY partitioning: bucket
    * assignment is a pure per-row function of (value, min, max), and
    * counts are associative. The corpus pays two map-side-combined
    * aggregations (min/max/count, then bucket counts); everything after
    * runs on ≤ types·[[HistBuckets]] rows. The degenerate min=max key
    * collapses to bucket 0 rather than dividing by zero.
    */
  def valueQuantilesHist(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).filter(col("value").isNotNull)
    val stats = ev.groupBy("event_type")
      .agg(min("value").as("mn"), max("value").as("mx"), count(lit(1)).as("n"))
    val cum = ev.join(broadcast(stats), "event_type")
      .withColumn("bucket", expr(
        s"""CAST(CASE WHEN mx = mn THEN 0
                 ELSE least(floor((value - mn) / (mx - mn) * $HistBuckets),
                            ${HistBuckets - 1}) END AS BIGINT)"""))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("event_type").orderBy("bucket")))
    def pick(q: Double, name: String) =
      min(when(col("cum") >= ceil(col("n") * q), col("bucket"))).as(s"b_$name")
    def edge(name: String) =
      expr(s"mn + (b_$name + 1) * (mx - mn) / $HistBuckets").as(name)
    cum.join(broadcast(stats), "event_type")
      .groupBy("event_type", "mn", "mx", "n")
      .agg(pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99"))
      .select(col("event_type"), col("n"), edge("p50"), edge("p90"), edge("p99"))
      .orderBy("event_type")
  }

  private val valueQuantilesHistSql =
    s"""WITH s AS (
          SELECT event_type, MIN(value) AS mn, MAX(value) AS mx, COUNT(*) AS n
          FROM events WHERE value IS NOT NULL GROUP BY 1
        ), b AS (
          SELECT e.event_type,
                 CAST(CASE WHEN s.mx = s.mn THEN 0
                      ELSE least(floor((e.value - s.mn) / (s.mx - s.mn) * $HistBuckets),
                                 ${HistBuckets - 1}) END AS BIGINT) AS bucket,
                 COUNT(*) AS cnt
          FROM events e JOIN s USING (event_type)
          WHERE e.value IS NOT NULL GROUP BY 1, 2
        ), c AS (
          SELECT event_type, bucket, cnt,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM b
        ), p AS (
          SELECT c.event_type,
                 MIN(CASE WHEN cum >= ceil(s.n * 0.5) THEN bucket END) AS b_p50,
                 MIN(CASE WHEN cum >= ceil(s.n * 0.9) THEN bucket END) AS b_p90,
                 MIN(CASE WHEN cum >= ceil(s.n * 0.99) THEN bucket END) AS b_p99
          FROM c JOIN s USING (event_type) GROUP BY 1
        )
        SELECT p.event_type, CAST(s.n AS BIGINT) AS n,
               s.mn + (b_p50 + 1) * (s.mx - s.mn) / $HistBuckets AS p50,
               s.mn + (b_p90 + 1) * (s.mx - s.mn) / $HistBuckets AS p90,
               s.mn + (b_p99 + 1) * (s.mx - s.mn) / $HistBuckets AS p99
        FROM p JOIN s USING (event_type) ORDER BY 1"""

  /** Tukey-fence outlier audit per event_type: the quartiles are exact
    * nearest-rank PICKED values (same formulation as [[valueQuantiles]] —
    * rank-⌈qn⌉ in sorted order, value-determined under ties, so no
    * cross-engine interpolation), the fences q1/q3 ∓ 1.5·IQR a fixed-order
    * small double expression mirrored exactly in the oracle. Emits the audit
    * row a data-quality monitor keeps per type: fences and how many rows
    * fall outside.
    *
    * Scale: two shuffles on event_type (rank, then the summary agg); the
    * per-type fence table is type-count-sized and broadcast back onto the
    * stream. At 100 TB the first pass switches to the sketch quantiles the
    * quantile operator documents; the fence join is unchanged.
    */
  def valueOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val byValue = Window.partitionBy("event_type").orderBy("value")
    val all = Window.partitionBy("event_type")
    def pick(q: Double, name: String) =
      max(when(col("rn") === ceil(col("n") * q), col("value"))).as(name)
    val fences = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(byValue))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy("event_type")
      .agg(pick(0.25, "q1"), pick(0.75, "q3"))
      .withColumn("lo_fence", expr("q1 - 1.5D * (q3 - q1)"))
      .withColumn("hi_fence", expr("q3 + 1.5D * (q3 - q1)"))
    Tables.events(spark, sfDir).select(col("event_type"), col("value"))
      .join(fences, "event_type")
      .groupBy("event_type", "q1", "q3", "lo_fence", "hi_fence")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") < col("lo_fence") || col("value") > col("hi_fence"), 1)
          .otherwise(0)).cast("long").as("n_outliers"))
      .select("event_type", "n", "q1", "q3", "lo_fence", "hi_fence", "n_outliers")
      .orderBy("event_type")
  }

  private val valueOutliersSql =
    """WITH v AS (
         SELECT event_type, value,
                row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
         FROM events
       ), f AS (
         SELECT event_type,
                MAX(CASE WHEN rn = ceil(n * 0.25) THEN value END) AS q1,
                MAX(CASE WHEN rn = ceil(n * 0.75) THEN value END) AS q3
         FROM v GROUP BY 1
       ), fence AS (
         SELECT event_type, q1, q3,
                q1 - CAST(1.5 AS DOUBLE) * (q3 - q1) AS lo_fence,
                q3 + CAST(1.5 AS DOUBLE) * (q3 - q1) AS hi_fence
         FROM f
       )
       SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n, q1, q3, lo_fence, hi_fence,
              CAST(SUM(CASE WHEN value < lo_fence OR value > hi_fence
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM events e JOIN fence USING (event_type)
       GROUP BY 1, 3, 4, 5, 6 ORDER BY 1"""

  /** Ordered funnel analysis (view → click → purchase per user): each stage
    * timestamp is the earliest qualifying event STRICTLY AFTER the previous
    * stage — the sequence must actually happen in order, not merely all
    * occur. Expressed as three chained full-partition window minima (t2's
    * predicate reads t1, so the windows cannot collapse — deliberately):
    * ONE hash exchange on user_id, one partition-grouping sort shared by
    * all three Window passes (unbounded frames need no ORDER BY), no
    * self-joins — where the naive per-stage-join formulation pays three
    * shuffled joins, this pays one exchange regardless of funnel depth.
    * Stage timestamps are partition-constants, so the per-user reduction is
    * a trivial max; timestamps leave as formatted UTC strings per the
    * determinism contract.
    */
  def funnelQ(spark: SparkSession, sfDir: String): DataFrame =
    funnelOf(Tables.events(spark, sfDir))

  def funnelOf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    def fmt(c: Column) = date_format(c, "yyyy-MM-dd HH:mm:ss")
    events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(byUser))
      .groupBy("user_id")
      .agg(max("t1").as("viewed_at"), max("t2").as("clicked_at"), max("t3").as("purchased_at"))
      .select(col("user_id"),
        when(col("purchased_at").isNotNull, 3)
          .when(col("clicked_at").isNotNull, 2)
          .when(col("viewed_at").isNotNull, 1).otherwise(0).as("stage"),
        fmt(col("viewed_at")).as("viewed_at"),
        fmt(col("clicked_at")).as("clicked_at"),
        fmt(col("purchased_at")).as("purchased_at"))
      .orderBy("user_id")
  }

  private val funnelSql =
    """WITH s AS (
         SELECT user_id, ts, event_type,
                MIN(CASE WHEN event_type = 'view' THEN ts END)
                  OVER (PARTITION BY user_id) AS t1
         FROM events
       ), s2 AS (
         SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                     OVER (PARTITION BY user_id) AS t2
         FROM s
       ), s3 AS (
         SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                     OVER (PARTITION BY user_id) AS t3
         FROM s2
       ), u AS (
         SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
         FROM s3 GROUP BY 1
       )
       SELECT user_id,
              CAST(CASE WHEN t3 IS NOT NULL THEN 3
                        WHEN t2 IS NOT NULL THEN 2
                        WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
              strftime(t1, '%Y-%m-%d %H:%M:%S') AS viewed_at,
              strftime(t2, '%Y-%m-%d %H:%M:%S') AS clicked_at,
              strftime(t3, '%Y-%m-%d %H:%M:%S') AS purchased_at
       FROM u ORDER BY user_id"""

  /** Weekly cohort retention: users are anchored to the Monday-truncated
    * week of their FIRST event; every event then lands in a non-negative
    * whole-week offset from that anchor, and the cell (cohort_week, offset)
    * counts distinct users still active. All grid math is exact integers
    * (day diffs / 7) on top of one first-seen window — two shuffles total
    * (user anchor, then the grid aggregate), the shape a 100 TB product
    * funnel runs daily.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .withColumn("cohort", date_trunc("week", min(col("ts")).over(byUser)))
      .withColumn("week_offset",
        floor(datediff(col("ts").cast("date"), col("cohort").cast("date")) / 7).cast("long"))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"), col("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  private val cohortRetentionSql =
    """WITH anchored AS (
         SELECT user_id, ts,
                date_trunc('week', MIN(ts) OVER (PARTITION BY user_id)) AS cohort
         FROM events
       )
       SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
              CAST(floor(date_diff('day', CAST(cohort AS DATE), CAST(ts AS DATE)) / 7)
                   AS BIGINT) AS week_offset,
              COUNT(DISTINCT user_id) AS n_users
       FROM anchored
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Event-transition matrix (the path-analysis primitive): for each user's
    * time-ordered event sequence, count from→to transitions and each
    * target's share of its source's outgoing edges. The sequence order is
    * TOTAL ((ts, event_id)), so lead() is deterministic under same-ms
    * events; shares divide two exact longs. One user-partition window, one
    * pair aggregate.
    */
  def transitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val seq_ = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val bySrc = Window.partitionBy("from_type")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(seq_))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") / sum("n").over(bySrc).cast("double"))
      .orderBy("from_type", "to_type")
  }

  private val transitionMatrixSql =
    """WITH seq AS (
         SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS to_type
         FROM events
       ), pairs AS (
         SELECT from_type, to_type, COUNT(*) AS n
         FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
       )
       SELECT from_type, to_type, n,
              CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
                AS share
       FROM pairs ORDER BY from_type, to_type"""

  /** Email-shaped token pattern — identical semantics in Java regex (Spark)
    * and RE2 (DuckDB): plain character classes only, no lookaround.
    */
  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+"

  /** PII scrub of the props payload: redact email-shaped tokens, then digit
    * runs — the standard redact-before-training step, as map-only codegen'd
    * `regexp_replace`. `n_redacted` counts the digit runs removed so scrub
    * coverage is auditable downstream. DataFrame core is per-row, reusable
    * on a streaming micro-batch.
    */
  def scrubPiiOf(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("props"),
      expr("size(regexp_extract_all(props, '[0-9]+', 0))").cast("long").as("n_redacted"),
      regexp_replace(regexp_replace(col("props"), EmailPat, "<email>"), "[0-9]+", "#")
        .as("props_clean"))
      .withColumn("changed", col("props_clean") =!= col("props"))
      .drop("props")

  def scrubPii(spark: SparkSession, sfDir: String): DataFrame =
    scrubPiiOf(Tables.events(spark, sfDir)).orderBy("event_id")

  private val scrubPiiSql =
    s"""WITH s AS (
         SELECT event_id, props,
                CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted,
                regexp_replace(regexp_replace(props, '$EmailPat', '<email>', 'g'),
                               '[0-9]+', '#', 'g') AS props_clean
         FROM events)
       SELECT event_id, n_redacted, props_clean, props_clean <> props AS changed
       FROM s ORDER BY event_id"""

  /** `events_daily_gapfilled`: per-type daily counts on a COMPLETE calendar
    * spine — days with no events appear as explicit zeros. Dashboards,
    * rate-of-change windows, and anomaly baselines all break on implicit
    * gaps; the spine join is the standard fix.
    *
    * Shape: the corpus pays ONE aggregation shuffle (the daily counts it
    * needs anyway); the spine is GENERATED from the 1-row min/max aggregate
    * (`sequence` + explode × the type list — days·types rows, trivially
    * broadcast into the left join). Nothing about the spine scales with
    * corpus size, only with the calendar span.
    */
  def dailyGapfilled(spark: SparkSession, sfDir: String): DataFrame =
    dailyGapfilledOf(Tables.events(spark, sfDir)).orderBy("event_type", "day")

  /** DataFrame core of [[dailyGapfilled]] — any frame with (event_type, ts).
    * Unordered.
    */
  def dailyGapfilledOf(events: DataFrame): DataFrame = {
    val e = events.filter(col("ts").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val daily = e.groupBy("event_type", "day").agg(count(lit(1)).as("n_events"))
    val spine = e.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(e.select("event_type").distinct())
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  private val dailyGapfilledSql =
    """WITH e AS (
         SELECT event_type, CAST(ts AS DATE) AS day
         FROM events WHERE ts IS NOT NULL
       ), daily AS (
         SELECT event_type, day, COUNT(*) AS n_events FROM e GROUP BY 1, 2
       ), r AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
       spine AS (
         SELECT t.event_type, g.day
         FROM (SELECT DISTINCT event_type FROM e) t
         CROSS JOIN (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                       AS day FROM r) g
       )
       SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
              COALESCE(d.n_events, 0) AS n_events
       FROM spine s LEFT JOIN daily d
         ON d.event_type = s.event_type AND d.day = s.day
       ORDER BY 1, 2"""

  /** `events_daily_resampled`: quality-gated daily resampling with linear
    * imputation — the time-series cleaning step between raw telemetry and
    * a trainer/forecaster: a day whose sample count falls below the
    * series' mean is UNRELIABLE (sensor flakiness, partial ingest), so
    * its aggregate is replaced by the linear interpolation between the
    * nearest reliable neighbors; leading/trailing unreliable days report
    * NULL (no anchor to interpolate from).
    *
    * Determinism: the gate is an exact integer comparison
    * (`n·n_days ≥ total` — no double mean), the daily aggregate is MAX
    * (order-independent, unlike a double sum), anchors are picked by
    * IGNORE NULLS window navigation over the total day order, and the
    * imputation is one fixed IEEE tree over exact day distances — both
    * engines compute bit-identical values.
    *
    * Shape: the event stream pays its ONE daily-aggregate shuffle; the
    * gate re-enters as a 1-row broadcast; the windows ride the days-sized
    * series (unpartitioned `Window.orderBy` safe by calendar cardinality:
    * 365 rows/year regardless of event volume).
    */
  def dailyResampled(spark: SparkSession, sfDir: String): DataFrame =
    dailyResampledOf(Tables.events(spark, sfDir))

  /** [[dailyResampled]] core over any (ts, value) frame. */
  def dailyResampledOf(events: DataFrame): DataFrame = {
    val daily = events.filter(col("ts").isNotNull)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("d"))
      .agg(count(lit(1)).as("n"), max("value").as("v"))
    val gate = daily.agg(sum("n").as("total"), count(lit(1)).as("n_days"))
    val gated = daily.crossJoin(broadcast(gate)) // 1-row gate
      .withColumn("observed", col("n") * col("n_days") >= col("total"))
    val asc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.orderBy("d").rowsBetween(1, Window.unboundedFollowing)
    def anchored(c: String) = when(col("observed"), col(c))
    gated
      .withColumn("pv", last(anchored("v"), ignoreNulls = true).over(asc))
      .withColumn("pd", last(anchored("d"), ignoreNulls = true).over(asc))
      .withColumn("nv", first(anchored("v"), ignoreNulls = true).over(desc))
      .withColumn("nd", first(anchored("d"), ignoreNulls = true).over(desc))
      .withColumn("value_resampled",
        when(col("observed"), col("v"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv")) *
              ((col("d") - col("pd")).cast("double") / (col("nd") - col("pd")).cast("double"))))
      .select(
        date_format(expr("date_add(DATE '1970-01-01', CAST(d AS INT))"), "yyyy-MM-dd")
          .as("day"),
        col("n").as("n_events"), col("observed"), col("value_resampled"))
      .orderBy("day")
  }

  private val dailyResampledSql =
    """WITH daily AS (
         SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                COUNT(*) AS n, MAX(value) AS v
         FROM events WHERE ts IS NOT NULL GROUP BY 1
       ), gate AS (
         SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_days FROM daily
       ), g AS (
         SELECT d, n, v, n * n_days >= total AS observed FROM daily CROSS JOIN gate
       ), a AS (
         SELECT d, n, v, observed,
                last_value(CASE WHEN observed THEN v END IGNORE NULLS)
                  OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                last_value(CASE WHEN observed THEN d END IGNORE NULLS)
                  OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
                first_value(CASE WHEN observed THEN v END IGNORE NULLS)
                  OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN observed THEN d END IGNORE NULLS)
                  OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
         FROM g
       )
       SELECT strftime(DATE '1970-01-01' + CAST(d AS INTEGER), '%Y-%m-%d') AS day,
              n AS n_events, observed,
              CASE WHEN observed THEN v
                   WHEN pv IS NOT NULL AND nv IS NOT NULL
                     THEN pv + (nv - pv) * (CAST(d - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
                   END AS value_resampled
       FROM a ORDER BY day"""

  // ---- seasonal-naive forecast backtest ----

  /** `events_seasonal_backtest`: the forecasting BASELINE report every
    * capacity/volume forecast must beat before anything fancier ships —
    * per event type, the mean absolute error of the seasonal-naive
    * forecast (same weekday last week) against plain persistence
    * (yesterday), backtested over the dense daily series. Read
    * mae_seasonal < mae_naive as "weekly seasonality exists and the
    * seasonal baseline captures it".
    *
    * Composes [[dailyGapfilledOf]] (the dense calendar spine, so LAG(7)
    * means seven CALENDAR days — on the raw sparse series it would mean
    * "seven present rows back", a different and wrong question). Windows
    * are per-type over the days-sized aggregated series (the
    * `orders_monthly_growth` altitude). Counts and absolute errors are
    * exact BIGINTs; the two MAEs are single double divisions.
    */
  def seasonalBacktest(spark: SparkSession, sfDir: String): DataFrame =
    seasonalBacktestOf(Tables.events(spark, sfDir))

  /** DataFrame core of [[seasonalBacktest]] — fixture surface for the spec. */
  private[graft] def seasonalBacktestOf(events: DataFrame): DataFrame = {
    val daily = dailyGapfilledOf(events)
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("f7", lag("n_events", 7).over(w))
      .withColumn("f1", lag("n_events", 1).over(w))
      .filter(col("f7").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n_events") - col("f7"))).as("ae_seasonal"),
        sum(abs(col("n_events") - col("f1"))).as("ae_naive"))
      .select(col("event_type"), col("n_days"), col("ae_seasonal"), col("ae_naive"),
        expr("CAST(ae_seasonal AS DOUBLE) / n_days").as("mae_seasonal"),
        expr("CAST(ae_naive AS DOUBLE) / n_days").as("mae_naive"))
      .orderBy("event_type")
  }

  private val seasonalBacktestSql =
    s"""WITH gap AS ($dailyGapfilledSql), l AS (
          SELECT event_type, n_events,
                 LAG(n_events, 7) OVER w AS f7,
                 LAG(n_events, 1) OVER w AS f1
          FROM gap
          WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(abs(n_events - f7)) AS BIGINT) AS ae_seasonal,
               CAST(SUM(abs(n_events - f1)) AS BIGINT) AS ae_naive,
               CAST(SUM(abs(n_events - f7)) AS DOUBLE) / COUNT(*) AS mae_seasonal,
               CAST(SUM(abs(n_events - f1)) AS DOUBLE) / COUNT(*) AS mae_naive
        FROM l WHERE f7 IS NOT NULL
        GROUP BY event_type ORDER BY event_type"""

  // ---- k-anonymity release audit ----

  /** Anonymity bar and the value-bucket width of the quasi-identifier. */
  val KAnonK = 5
  val KAnonBucket = 50

  /** `events_k_anonymity`: the release audit that pairs with the PII scrub —
    * after direct identifiers are stripped, can rows still be singled out
    * by their QUASI-identifiers? Here the quasi-identifier is
    * (event_type, day, value bucket): the audit reports, per event type,
    * how many identifier groups and rows sit below k = [[KAnonK]]
    * (re-identifiable under linkage) and the exposed-row share. A release
    * gate reads one number: `share_below_k` must be ~0, or the release
    * needs coarser buckets / suppression.
    *
    * Shape: ONE counting shuffle at quasi-identifier grain; the audit math
    * runs on the group-count table (identifier-space bounded). Exact
    * integers; one double division per type.
    */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    kAnonymityOf(Tables.events(spark, sfDir))

  /** DataFrame core of [[kAnonymity]] — fixture surface for the spec. */
  private[graft] def kAnonymityOf(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr(s"CAST(floor(value / $KAnonBucket) AS BIGINT)").as("vb"))
      .groupBy("event_type", "day", "vb").agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum("n").as("n_rows"),
        sum(when(col("n") < KAnonK, 1L).otherwise(0L)).as("groups_below_k"),
        sum(when(col("n") < KAnonK, col("n")).otherwise(0L)).as("rows_below_k"),
        min("n").as("min_group"))
      .select(col("event_type"), col("n_groups"), col("n_rows"),
        col("groups_below_k"), col("rows_below_k"), col("min_group"),
        expr("CAST(rows_below_k AS DOUBLE) / n_rows").as("share_below_k"))
      .orderBy("event_type")

  private val kAnonymitySql =
    s"""WITH g AS (
          SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(floor(value / $KAnonBucket) AS BIGINT) AS vb,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN n < $KAnonK THEN 1 ELSE 0 END) AS BIGINT)
                 AS groups_below_k,
               CAST(SUM(CASE WHEN n < $KAnonK THEN n ELSE 0 END) AS BIGINT)
                 AS rows_below_k,
               CAST(MIN(n) AS BIGINT) AS min_group,
               CAST(SUM(CASE WHEN n < $KAnonK THEN n ELSE 0 END) AS DOUBLE)
                 / SUM(n) AS share_below_k
        FROM g GROUP BY event_type ORDER BY event_type"""

  // ---- event-time disorder report (watermark sizing) ----

  /** `events_disorder_report`: how out-of-order does this stream actually
    * arrive? For each event (arrival order = `event_id`, the producer's
    * sequence), lateness = running-max(event time so far) − its own event
    * time — exactly the quantity a watermark bounds. The report emits the
    * lateness distribution at SECOND grain (count, late share, nearest-rank
    * p50/p95/p99, max): "set the watermark at p99 + margin" becomes a
    * measurement instead of folklore, and re-running the report validates
    * the choice after every producer change.
    *
    * Scale shape: the running max is the `parts_abc_classification`
    * two-phase DISTRIBUTED prefix pattern with MAX as the monoid —
    * range-partition by arrival order (materialized once so every branch
    * shares the partition assignment), pid-local running max in parallel,
    * cluster-sized per-partition maxima → broadcast exclusive prefix
    * maxima — no single-partition window over events. The quantile cut
    * runs on the SECOND-grain lateness distribution, whose cardinality is
    * bounded by the disorder horizon in seconds (an aggregated-altitude
    * window, the `orders_monthly_growth` argument). Exact integers
    * throughout; one double division.
    */
  def disorderReport(spark: SparkSession, sfDir: String): DataFrame =
    disorderReportOf(Tables.events(spark, sfDir))

  /** DataFrame core of [[disorderReport]] — fixture surface for the spec. */
  private[graft] def disorderReportOf(events: DataFrame): DataFrame = {
    val parts = graft.Scratch.materialize(
      events.select(col("event_id"), expr("unix_micros(ts)").as("t"))
        .repartitionByRange(col("event_id"))
        .withColumn("pid", spark_partition_id()),
      "graft_disorder_parts")
    val localW = Window.partitionBy("pid").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pmax = parts.groupBy("pid").agg(max("t").as("pmax"))
    val offsets = pmax.as("a")
      .join(pmax.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid")).agg(max(col("b.pmax")).as("prefix"))
    val late = parts
      .withColumn("lmax", max("t").over(localW))
      .join(broadcast(offsets), "pid")
      .withColumn("rm",
        greatest(coalesce(col("prefix"), lit(Long.MinValue)), col("lmax")))
      .withColumn("late_s", expr("(rm - t) div 1000000"))
    val stats = late.agg(count(lit(1)).as("n"),
      sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
      max("late_s").as("max_s"))
    val cum = late.groupBy("late_s").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("late_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(stats)) // 1-row side
    cum.agg(
        max("n").as("n_events"),
        max("n_late").as("n_late"),
        min(when(col("cum") >= expr("(50 * n + 99) div 100"), col("late_s"))).as("p50_s"),
        min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("late_s"))).as("p95_s"),
        min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("late_s"))).as("p99_s"),
        max("max_s").as("max_s"))
      .select(col("n_events"), col("n_late"),
        expr("CAST(n_late AS DOUBLE) / n_events").as("share_late"),
        col("p50_s"), col("p95_s"), col("p99_s"), col("max_s"))
  }

  private val disorderReportSql =
    """WITH o AS (
         SELECT event_id, epoch_us(ts) AS t FROM events
       ), r AS (
         SELECT t, MAX(t) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS rm
         FROM o
       ), l AS (
         SELECT (rm - t) // 1000000 AS late_s FROM r
       ), c AS (
         SELECT late_s, COUNT(*) AS c FROM l GROUP BY 1
       ), cum AS (
         SELECT late_s, SUM(c) OVER (ORDER BY late_s ROWS UNBOUNDED PRECEDING) AS cum
         FROM c
       ), st AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                CAST(MAX(late_s) AS BIGINT) AS max_s
         FROM l
       )
       SELECT st.n AS n_events, st.n_late,
              CAST(st.n_late AS DOUBLE) / st.n AS share_late,
              (SELECT CAST(MIN(late_s) AS BIGINT) FROM cum
               WHERE cum >= (50 * st.n + 99) // 100) AS p50_s,
              (SELECT CAST(MIN(late_s) AS BIGINT) FROM cum
               WHERE cum >= (95 * st.n + 99) // 100) AS p95_s,
              (SELECT CAST(MIN(late_s) AS BIGINT) FROM cum
               WHERE cum >= (99 * st.n + 99) // 100) AS p99_s,
              st.max_s
       FROM st"""

  // ---- hash-stable A/B assignment + two-proportion z-test ----

  /** The shared z-statistic expression — ONE SQL string parsed by both
    * engines: pooled two-proportion z over exact integer counts. Every
    * operand derives from BIGINTs; `sqrt` is IEEE-correctly-rounded, so
    * the double is bit-identical cross-engine (unlike ln/exp). Degenerate
    * pools (conversion 0 or 1 — zero variance) emit NULL.
    */
  private val zExpr =
    """CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
         (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
           / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (1.0e0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (1.0e0 / n_a + 1.0e0 / n_b))
       END"""

  /** `events_ab_ztest`: experiment readout — users are assigned to variants
    * by a HASH-STABLE draw (`hash60('ab:' || user_id) % 2`: append-stable
    * and recomputable anywhere, never a stored assignment table or a
    * `rand()`), conversion is "ever made a high-value purchase" (value >=
    * [[AbConvValue]] — plain "ever purchased" saturates at 100 % on this
    * fixture and degenerates the variance), and the comparison is the
    * classic pooled two-proportion z-test. On the synthetic events the
    * variants are exchangeable, so |z| should sit within ordinary bounds —
    * the null-calibration reading, which the spec pins alongside a planted
    * real effect.
    *
    * Shape: ONE user_id aggregate (conversion per user), a map-only
    * variant projection, one 2-group aggregate, scalar math on a 1-row
    * frame. At any corpus size only the user-grain aggregation shuffles.
    */
  /** Conversion bar: a purchase at or above this value. */
  val AbConvValue = 150

  def abZtest(spark: SparkSession, sfDir: String): DataFrame =
    abZtestOf(Tables.events(spark, sfDir))

  /** DataFrame core of [[abZtest]] — fixture surface for the spec. */
  private[graft] def abZtestOf(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") >= AbConvValue,
        1L).otherwise(0L)).as("conv"))
      .withColumn("variant", expr(
        s"CASE WHEN ${graft.pipeline.Dedup.hash60("concat('ab:', CAST(user_id AS STRING))")} % 2 = 0 " +
          "THEN 'A' ELSE 'B' END"))
      .agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "A", col("conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === "B", col("conv")).otherwise(0L)).as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("CAST(conv_a AS DOUBLE) / n_a").as("rate_a"),
        expr("CAST(conv_b AS DOUBLE) / n_b").as("rate_b"),
        expr(zExpr).as("z"))

  private val abZtestSql =
    s"""WITH u AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'purchase' AND value >= $AbConvValue THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY user_id
        ), v AS (
          SELECT CASE WHEN ${graft.pipeline.Dedup.hash60Duck("('ab:' || CAST(user_id AS VARCHAR))")} % 2 = 0
                      THEN 'A' ELSE 'B' END AS variant,
                 conv
          FROM u
        ), agg AS (
          SELECT CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
                 CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                 CAST(SUM(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
          FROM v
        )
        SELECT n_a, conv_a, n_b, conv_b,
               CAST(conv_a AS DOUBLE) / n_a AS rate_a,
               CAST(conv_b AS DOUBLE) / n_b AS rate_b,
               $zExpr AS z
        FROM agg"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_ab_ztest" -> (abZtest _),
    "events_disorder_report" -> (disorderReport _),
    "events_k_anonymity" -> (kAnonymity _),
    "events_seasonal_backtest" -> (seasonalBacktest _),
    "events_daily_gapfilled" -> (dailyGapfilled _),
    "events_daily_resampled" -> (dailyResampled _),
    "events_value_quantiles" -> (valueQuantiles _),
    "events_value_quantiles_hist" -> (valueQuantilesHist _),
    "events_rolling_active_users" -> (rollingActiveUsers _),
    "events_rolling_active_users_kmv" -> (rollingActiveUsersKmv _),
    "events_daily_anomalies" -> (dailyAnomalies _),
    "events_value_outliers" -> (valueOutliers _),
    "events_funnel" -> (funnelQ _),
    "events_cohort_retention" -> (cohortRetention _),
    "events_transitions" -> (transitionMatrix _),
    "events_scrub_pii" -> (scrubPii _),
    "t1_per_key_stats" -> (perKeyStatsQ _),
    "t3_tumbling_window" -> (tumblingQ _),
    "t4_sliding_window" -> (slidingQ _),
    "events_sessionize" -> (sessionizeQ _),
    "events_kmv_distinct" -> (kmvDistinct _),
    "events_props_json" -> (propsExtract _),
    "events_enriched" -> (enrichedQ _),
    "events_attribution" -> (attributionQ _),
    "events_attribution_outer" -> (attributionOuterQ _),
    "events_attribution_full" -> (attributionFullQ _),
  )

  override def oracle: Map[String, String] = Map(
    "events_ab_ztest" -> abZtestSql,
    "events_disorder_report" -> disorderReportSql,
    "events_k_anonymity" -> kAnonymitySql,
    "events_seasonal_backtest" -> seasonalBacktestSql,
    "events_daily_gapfilled" -> dailyGapfilledSql,
    "events_daily_resampled" -> dailyResampledSql,
    "events_value_quantiles" -> valueQuantilesSql,
    "events_value_quantiles_hist" -> valueQuantilesHistSql,
    "events_rolling_active_users" -> rollingActiveUsersSql,
    "events_rolling_active_users_kmv" -> rollingActiveUsersKmvSql,
    "events_daily_anomalies" -> dailyAnomaliesSql,
    "events_value_outliers" -> valueOutliersSql,
    "events_funnel" -> funnelSql,
    "events_cohort_retention" -> cohortRetentionSql,
    "events_transitions" -> transitionMatrixSql,
    "events_scrub_pii" -> scrubPiiSql,
    "t1_per_key_stats" -> perKeyStatsSql,
    "t3_tumbling_window" -> tumblingSql,
    "t4_sliding_window" -> slidingSql,
    "events_sessionize" -> sessionizeSql,
    "events_kmv_distinct" -> kmvDistinctSql,
    "events_props_json" -> propsExtractSql,
    "events_enriched" -> enrichedSql,
    "events_attribution" -> attributionSql,
    "events_attribution_outer" -> attributionOuterSql,
    "events_attribution_full" -> attributionFullSql,
  )
}
