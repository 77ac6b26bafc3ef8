package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden unit tests replaying the reference's exact boundary semantics
  * (SURVEY §5.2): the order-size UDF thresholds (bonus.py:51-58, rescaled
  * ×1000 to this data's order-value range: <50000 Small, <=200000 Medium,
  * else Large, null→Unknown), the native/UDF form equivalence, and the pivot
  * null-fill (q3:84).
  */
class RetailGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("categorize boundaries: 49999.99→Small, 50000→Medium, 200000→Medium, 200000.01→Large, null→Unknown") {
    val df = Seq[Option[Double]](
      None, Some(49999.99), Some(50000.0), Some(200000.0), Some(200000.01), Some(1e9))
      .toDF("v")
      .select(Retail.categorize(col("v")).as("size"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("Unknown", "Small", "Medium", "Medium", "Large", "Large"))
  }

  test("UDF form and native when/otherwise form agree on real data (U1)") {
    val native = Retail.orderSizeNative(spark, Sf0001).collect().toSeq
    val viaUdf = Retail.orderSizeUdf(spark, Sf0001).collect().toSeq
    assert(native.nonEmpty && native === viaUdf)
  }

  test("top-k unshipped revenue equals the full-sort answer and respects every filter") {
    val sf = "/root/testdata/sf0.001"
    val got = Retail.topkUnshippedRevenue(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(got.length == 10)
    // independent derivation: aggregate WITHOUT the top-k operator, sort in
    // Scala, take 10 — the heap-based TakeOrdered path must agree exactly
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") < lit(Retail.ShippingCutoff).cast("timestamp"))
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") > lit(Retail.ShippingCutoff).cast("timestamp"))
    val full = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(Retail.lineAmount).cast("double").as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("o_orderpriority"), col("revenue"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val expected = full.sortBy(t => (-t._4, t._1)).take(10)
    assert(got.toSeq == expected.toSeq)
    // and the filters really bit: the top-k is a strict subset of the pool
    assert(full.length > 10)
  }

  test("pivot output has no nulls and total_orders sums the pivot columns (A7/P8/P10)") {
    val pivoted = Nested.customerPriorityPivot(spark, Sf0001)
    val cols = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
    val bad = pivoted.filter(
      cols.map(c => col(c).isNull).reduce(_ || _) ||
        col("total_orders") =!= cols.map(col).reduce(_ + _))
    assert(pivoted.count() > 0 && bad.count() === 0)
  }
}
