package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** HLL semantics the oracle rows can't express: mergeability (the whole
  * point of the sketch), the small-range linear-counting correction the
  * query deliberately leaves to the caller, and the rho edge case.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("register tables MERGE: pointwise max of two half-streams equals the whole stream") {
    val orders = Tables.orders(spark, Sf001)
    val whole = Sketches.registers(orders, "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = Sketches.registers(orders.filter(col("o_orderkey") % 2 === 0), "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sketches.registers(orders.filter(col("o_orderkey") % 2 =!= 0), "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val merged = (a.keySet ++ b.keySet).map { k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))
    }.toMap
    assert(merged == whole)
  }

  test("raw estimate lands within 10% at n >> m; linear counting recovers the small-range case") {
    val Array(vZero, _, est, exact) =
      Sketches.hllDistinct(spark, Sf0001).collect().head.toSeq.toArray
    val n = exact.asInstanceOf[Long].toDouble
    // sf0.001 has ~150 distinct customers against m=256 registers — the
    // small-range regime where the raw estimator is known-biased and the
    // correction the scaladoc points to (m·ln(m/V)) must land instead
    val corrected = 256.0 * math.log(256.0 / vZero.asInstanceOf[Long])
    assert(math.abs(corrected - n) / n < 0.10,
      s"linear counting $corrected vs exact $n")
    val Array(v2, _, est2, exact2) =
      Sketches.hllDistinct(spark, Sf001).collect().head.toSeq.toArray
    val n2 = exact2.asInstanceOf[Long].toDouble
    assert(math.abs(est2.asInstanceOf[Double] - n2) / n2 < 0.10,
      s"raw estimate $est2 vs exact $n2")
  }

  test("rho edge: a hash with all-zero rest bits maps to register 53") {
    // drive the same expression the register build uses on a synthetic key
    // column whose md5 we can't control — so pin the rho FORMULA directly
    val df = Seq(0L, 1L, (1L << 52) - 1).toDF("rest")
    val rho = df.select(
      when(col("rest") === 0, lit(53))
        .otherwise(lit(53) - length(expr("bin(rest)"))).as("rho"))
      .as[Int].collect().toSeq
    assert(rho == Seq(53, 52, 1))
  }
}
