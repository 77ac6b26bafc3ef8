package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryModule, Tables}

/** Bloom-filtered join: prune the fact side with a compact membership sketch
  * of the dim side's join keys BEFORE the join's shuffle, so rows that cannot
  * match never leave the scan stage.
  *
  * Why this matters at 100 TB: a selective dim (say 0.3% of customers) still
  * forces a full shuffle of the fact table under a plain shuffled equi-join —
  * the fact rows only die AT the join. A bloom filter built over the dim keys
  * is a few hundred KB regardless of fact size; shipped to every scan task it
  * kills ~99% of fact rows map-side, shrinking the shuffle by the dim's
  * selectivity at the cost of one extra pass over the dim (which the join
  * reads anyway). False positives only cost wasted shuffle bytes — the exact
  * join behind the filter removes them, so the result is IDENTICAL to the
  * unfiltered join (the oracle is the plain join; BloomJoinSpec also pins
  * equality directly).
  *
  * All of it stays native and codegen'd: Spark's own `bloom_filter_agg` /
  * `BloomFilterMightContain` expressions (the machinery behind AQE's
  * runtime row-level filtering, here applied deliberately), the bloom
  * delivered as a scalar subquery — no driver-side collect, no UDF. Spark's
  * `InjectRuntimeFilter` can do this automatically only for shuffle-heavy
  * plans it recognizes; making it a first-class operator lets a pipeline
  * apply it to any fact/dim pair (or persist the bloom and reuse it across
  * queries, which the optimizer can never do).
  *
  * Mirrors the reference's filter-before-join discipline (its Q2 pipeline
  * filters the fact table before its customer join) at the 100 TB scale
  * where the filter itself has to be a sketch.
  */
object BloomJoin extends QueryModule {

  /** Membership sketch of `key` over `dim`, as a scalar-subquery Column
    * suitable for [[semiFilter]]. `expectedItems`/`numBits` size the sketch:
    * numBits ≈ 8–10 bits per expected item gives ~1–2% false positives
    * (wasted shuffle bytes only, never wrong results).
    */
  def keyBloom(dim: DataFrame, key: Column, expectedItems: Long, numBits: Long): Column =
    dim.agg(call_function("bloom_filter_agg", xxhash64(key), lit(expectedItems), lit(numBits))
      .as("bloom")).scalar()

  /** `fact` rows whose `factKey` might be in `bloom` — the map-side pruning
    * step. Keep the exact join after it; this alone admits false positives.
    */
  def semiFilter(fact: DataFrame, factKey: Column, bloom: Column): DataFrame =
    fact.filter(call_function("might_contain", bloom, xxhash64(factKey)))

  /** Inner equi-join with the fact side bloom-pruned before the shuffle. */
  def bloomJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val overlap = fact.columns.toSet.intersect(dim.columns.toSet)
    require(overlap.isEmpty, s"column collision between fact and dim: $overlap")
    val bloom = keyBloom(dim, col(dimKey), expectedItems, numBits)
    semiFilter(fact, col(factKey), bloom)
      .join(dim, col(factKey) === col(dimKey))
  }

  // ---------------------------------------------------------------- queries

  /** Revenue of orders from BUILDING-segment customers in nations 0–4 — a
    * selective dim (~6% of customers) joined into the full orders table,
    * bloom-pruned map-side. Must equal the plain join byte-for-byte.
    */
  def filteredRevenueQ(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") < 5)
      .select("c_custkey", "c_nationkey")
    val fact = Tables.orders(spark, sfDir).select("o_custkey", "o_totalprice")
    bloomJoin(fact, dim, "o_custkey", "c_custkey",
        expectedItems = 10000L, numBits = 1L << 17)
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }

  private val filteredRevenueSql =
    """SELECT c_nationkey, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 5
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_join_filtered_revenue" -> (filteredRevenueQ _),
  )

  override def oracle: Map[String, String] = Map(
    "bloom_join_filtered_revenue" -> filteredRevenueSql,
  )
}
