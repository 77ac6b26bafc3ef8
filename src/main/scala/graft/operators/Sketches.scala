package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the standard
  * mergeable cardinality estimator, built from exact integer pieces so the
  * oracle can recompute it bit-for-bit:
  *
  *   - hash: the first 15 hex chars of `md5(key)` as a 60-bit integer —
  *     the repo's cross-engine deterministic hash (the md5-draw pattern);
  *   - registers: bucket = top 8 bits (m = 256), rho = leading-zero count
  *     of the remaining 52 bits + 1 via `length(bin(x))` (identical
  *     minimal-binary semantics in Spark and DuckDB; the x = 0 case is
  *     explicit because both engines render `bin(0)` as "0", length 1);
  *   - harmonic sum: Σ 2^(-M_j) scaled by 2^53 — every term
  *     `2^(53-M_j)` is an exact BIGINT, the m-term sum stays < 2^62, and
  *     absent buckets contribute 2^53 each (register 0). Doubles appear
  *     ONLY in the final α·m²·2^53 / S division, whose numerator is one
  *     shortest-repr literal both engines parse to the same IEEE value.
  *
  * Why it matters at 100 TB: per-group state is 256 bytes regardless of
  * cardinality, register max is commutative/associative (map-side partial
  * aggregation does most of the work), and sketches MERGE — union =
  * pointwise max — so per-partition/per-day sketches roll up without
  * re-scanning (the property `COUNT(DISTINCT)` fundamentally lacks;
  * [[graft.pipeline.CorpusQc]]'s KMV covers the same need at doc-overlap
  * grain, HLL is the constant-memory stream form). The small-range
  * linear-counting correction (m·ln(m/V)) is deliberately NOT applied in
  * the emitted estimate: `ln` is not cross-engine bit-stable (see
  * `text_perplexity_filter`), so the row emits the raw estimator plus the
  * exact pieces (V, scaled harmonic sum) a caller needs to apply it.
  */
object Sketches extends QueryModule {

  private val M = 256 // 2^8 buckets
  private val RestBits = 52 // 60-bit hash minus 8 bucket bits
  private val RestMask = (1L << RestBits) - 1
  private val Scale = 1L << (RestBits + 1) // 2^53: weight of an empty register

  /** α_256 · 256² · 2^53 — the estimator numerator, as one double literal
    * (shortest repr round-trips identically through the JVM and DuckDB
    * float parsers).
    */
  private val Numer: Double = 0.7213 / (1 + 1.079 / M) * M * M * 9007199254740992.0

  /** The HLL register table of `df`: one (bucket, m) row per non-empty
    * bucket, optionally per group. THE mergeable partial: two streams'
    * register tables union-merge by pointwise max (SketchesSpec pins
    * merge == whole-stream equality).
    */
  def registers(df: DataFrame, key: String, groupCols: Seq[String] = Nil): DataFrame =
    df.withColumn("hv", expr(s"cast(conv(substring(md5(cast($key as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("rest", col("hv").bitwiseAND(lit(RestMask)))
      .withColumn("rho", when(col("rest") === 0, lit(RestBits + 1))
        .otherwise(lit(RestBits + 1) - length(expr("bin(rest)"))))
      .groupBy(groupCols.map(col) :+ shiftright(col("hv"), RestBits).as("bucket"): _*)
      .agg(max(col("rho")).as("m"))

  /** `sketch_hll_distinct`: HLL-256 over the order stream's customer keys
    * next to the exact distinct count — registers, zero-register count,
    * exact scaled harmonic sum, raw estimate. Oracle recomputes every
    * piece (same md5 hash, same integer registers, same one-division
    * estimate) independently in DuckDB.
    */
  def hllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val regs = registers(Tables.orders(spark, sfDir), "o_custkey")
    val s = regs.agg(
      sum(expr("cast(shiftleft(cast(1 as bigint), 53 - m) as bigint)")).as("sp"),
      (lit(M.toLong) - count(lit(1))).as("v"))
    val exact = Tables.orders(spark, sfDir)
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    s.crossJoin(exact) // 1-row × 1-row stats frame
      .select(
        col("v").cast("bigint").as("v_zero"),
        (col("sp") + col("v") * lit(Scale)).cast("bigint").as("harmonic_scaled"),
        (lit(Numer) / (col("sp") + col("v") * lit(Scale)).cast("double")).as("estimate"),
        col("exact_distinct").cast("bigint"))
  }

  private def hllSqlNumer = {
    // java Double.toString round-trips; DuckDB parses correctly-rounded
    s"CAST('${Numer.toString}' AS DOUBLE)"
  }

  private val hllDistinctSql =
    s"""WITH h AS (
          SELECT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS hv
          FROM orders
        ), r AS (
          SELECT hv >> $RestBits AS bucket,
                 MAX(CASE WHEN (hv & $RestMask) = 0 THEN ${RestBits + 1}
                     ELSE ${RestBits + 1} - length(bin(hv & $RestMask)) END) AS m
          FROM h GROUP BY 1
        ), s AS (
          SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT) AS sp,
                 CAST($M - COUNT(*) AS BIGINT) AS v FROM r
        )
        SELECT v AS v_zero,
               sp + v * $Scale AS harmonic_scaled,
               $hllSqlNumer / CAST(sp + v * $Scale AS DOUBLE) AS estimate,
               (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders) AS exact_distinct
        FROM s"""

  /** `sketch_hll_by_nation`: the grouped form — one 256-byte sketch per
    * customer nation estimating that nation's distinct active customers,
    * next to the exact count. The group-by carries (nation, bucket) pairs
    * through ONE shuffle at ≤ 25·256 rows; per-nation state stays
    * constant-size however many orders a nation has. This is the shape
    * that rolls up: per-day (nation, bucket, m) partials merge by max.
    */
  def hllByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val joined = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
    val regs = registers(joined, "o_custkey", Seq("n_name"))
    val sketches = regs.groupBy("n_name")
      .agg(sum(expr("cast(shiftleft(cast(1 as bigint), 53 - m) as bigint)")).as("sp"),
        (lit(M.toLong) - count(lit(1))).as("v"))
    val exact = joined.groupBy("n_name")
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    sketches.join(exact, "n_name")
      .select(col("n_name"),
        col("v").cast("bigint").as("v_zero"),
        (col("sp") + col("v") * lit(Scale)).cast("bigint").as("harmonic_scaled"),
        (lit(Numer) / (col("sp") + col("v") * lit(Scale)).cast("double")).as("estimate"),
        col("exact_distinct").cast("bigint"))
      .orderBy("n_name")
  }

  private val hllByNationSql =
    s"""WITH j AS (
          SELECT n_name, o_custkey FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        ), h AS (
          SELECT n_name,
                 CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS hv
          FROM j
        ), r AS (
          SELECT n_name, hv >> $RestBits AS bucket,
                 MAX(CASE WHEN (hv & $RestMask) = 0 THEN ${RestBits + 1}
                     ELSE ${RestBits + 1} - length(bin(hv & $RestMask)) END) AS m
          FROM h GROUP BY 1, 2
        ), s AS (
          SELECT n_name,
                 CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT) AS sp,
                 CAST($M - COUNT(*) AS BIGINT) AS v
          FROM r GROUP BY 1
        ), e AS (
          SELECT n_name, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
          FROM j GROUP BY 1
        )
        SELECT s.n_name, v AS v_zero,
               sp + v * $Scale AS harmonic_scaled,
               $hllSqlNumer / CAST(sp + v * $Scale AS DOUBLE) AS estimate,
               exact_distinct
        FROM s JOIN e ON s.n_name = e.n_name
        ORDER BY s.n_name"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll_distinct" -> (hllDistinct _),
    "sketch_hll_by_nation" -> (hllByNation _),
  )

  override def oracle: Map[String, String] = Map(
    "sketch_hll_distinct" -> hllDistinctSql,
    "sketch_hll_by_nation" -> hllByNationSql,
  )
}
