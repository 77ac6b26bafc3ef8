package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck invariants over the aggregation surface (SURVEY §5.4). Money is
  * DECIMAL cents, so sums are exact and grouping-order-independent — the same
  * reason the oracle comparisons are exact.
  */
object AggregationProps extends Properties("aggregation") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val lineGen = Gen.listOfN(40,
    for {
      cust <- Gen.choose(1, 5)
      order <- Gen.choose(1, 12)
      cents <- Gen.choose(-100000L, 100000L)
    } yield (cust, order, BigDecimal(cents) / 100))

  property("two-level rollup equals direct per-customer sum (A1)") =
    forAll(lineGen) { lines =>
      val df = lines.toDF("cust", "order", "amount")
        .withColumn("amount", col("amount").cast(DecimalType(12, 2)))
      val direct = df.groupBy("cust").agg(sum("amount").as("total"))
      val twoLevel = df.groupBy("cust", "order").agg(sum("amount").as("order_total"))
        .groupBy("cust").agg(sum("order_total").as("total"))
      direct.orderBy("cust").collect().map(r => (r.getInt(0), r.getDecimal(1))).toSeq ==
        twoLevel.orderBy("cust").collect().map(r => (r.getInt(0), r.getDecimal(1))).toSeq
    }

  property("top-k is a prefix of the full descending sort (O2)") =
    forAll(lineGen, Gen.choose(1, 8)) { (lines, k) =>
      val df = lines.toDF("cust", "order", "amount")
      val full = df.groupBy("cust").count()
        .orderBy(col("count").desc, col("cust")).collect().map(_.toSeq).toSeq
      val topK = df.groupBy("cust").count()
        .orderBy(col("count").desc, col("cust")).limit(k).collect().map(_.toSeq).toSeq
      topK == full.take(k)
    }

  property("pivot row-sum equals the per-key count (A7/P10)") =
    forAll(lineGen) { lines =>
      val df = lines.toDF("cust", "order", "amount")
        .withColumn("bucket", (col("order") % 3).cast("string"))
      val pivoted = df.groupBy("cust").pivot("bucket", Seq("0", "1", "2")).count()
        .na.fill(0L)
        .withColumn("total", col("0") + col("1") + col("2"))
      val counts = df.groupBy("cust").count()
      pivoted.join(counts, "cust").filter(col("total") =!= col("count")).count() == 0
    }
}
