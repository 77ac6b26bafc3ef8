package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck invariant for the bin-blocked range join: for ANY points,
  * intervals (including empty, inverted, negative, boundary-aligned) and ANY
  * positive bin width, the binned plan equals the naive cross-filter. The
  * fixed-fixture spec pins known edge cases; this sweeps the space.
  */
object RangeJoinProps extends Properties("range-join") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // quarter-steps exercise exact bin-boundary hits without float noise
  private val coord: Gen[Double] = Gen.choose(-40, 40).map(_ / 4.0)
  private val pointsGen = Gen.listOfN(12, coord).map(_.zipWithIndex.map {
    case (p, i) => (i.toLong, p)
  })
  private val intervalsGen = Gen.listOfN(8, Gen.zip(coord, coord)).map(_.zipWithIndex.map {
    case ((a, b), i) => (1000L + i, a, b) // inverted/empty pairs included by design
  })
  private val widthGen = Gen.oneOf(0.25, 1.0, 2.5, 7.0, 100.0)

  property("binned point-in-interval equals the naive cross-filter") =
    forAll(pointsGen, intervalsGen, widthGen, Gen.oneOf(true, false)) {
      (ps, is, w, inclusive) =>
        val points = ps.toDF("pid", "p")
        val intervals = is.toDF("iid", "lo", "hi")
        val contains =
          if (inclusive) col("p") >= col("lo") && col("p") <= col("hi")
          else col("p") >= col("lo") && col("p") < col("hi")
        val naive = points.crossJoin(intervals).filter(contains)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val binned = RangeJoin
          .pointInInterval(points, intervals, "p", "lo", "hi", w, inclusive)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        binned == naive
    }
}
