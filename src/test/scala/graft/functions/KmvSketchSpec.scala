package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch invariants: exact below K, merge-order independence (the
  * property that makes it oracle-checkable), and estimator sanity above K.
  */
class KmvSketchSpec extends AnyFunSuite {

  private def sketchOf(hashes: Seq[Long]): KmvBuf =
    hashes.foldLeft(KmvSketch.zero)(KmvSketch.reduce)

  test("exact counting below K, duplicates ignored") {
    val s = sketchOf(Seq(5L, 3L, 5L, 9L, 3L))
    assert(KmvSketch.finish(s) === 3.0)
  }

  test("merge order cannot change the sketch (set semantics)") {
    val hs = (1 to 500).map(i => (i.toLong * 2654435761L) % (1L << 60))
    val (a, b) = hs.splitAt(200)
    val ab = KmvSketch.merge(sketchOf(a), sketchOf(b))
    val ba = KmvSketch.merge(sketchOf(b), sketchOf(a))
    val whole = sketchOf(scala.util.Random.shuffle(hs))
    assert(ab === ba)
    assert(ab === whole)
    assert(ab.hashes.length === KmvSketch.K)
  }

  test("estimator lands near the true cardinality above K") {
    val n = 10000
    val hs = (1 to n).map(i => (i.toLong * 6364136223846793005L) % (1L << 60))
      .map(h => if (h < 0) h + (1L << 60) else h)
    val est = KmvSketch.finish(sketchOf(hs))
    assert(est > n * 0.6 && est < n * 1.4) // K=64 → ~13% rse; 40% is >3 sigma
  }

  test("TypedImperativeAggregate form is bit-identical under merge-heavy partials") {
    // drive the imperative buffer directly through a worst case for bounded
    // state: 64 single-element partials serialized/deserialized then merged
    // pairwise in a skewed order, with duplicates across partials
    val agg = KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val hs = (1 to 640).map(i => (i.toLong * 2654435761L) % (1L << 60))
    def bufOf(part: Seq[Long]) = {
      val b = agg.createAggregationBuffer()
      part.foreach(h => { b.add(h); while (b.size > KmvSketch.K) b.pollLast() })
      agg.deserialize(agg.serialize(b)) // round-trip the shuffle format
    }
    val partials = (hs ++ hs.take(100)).grouped(10).map(p => bufOf(p)).toSeq
    val merged = partials.reduceLeft(agg.merge)
    val expected = KmvSketch.finish(hs.foldLeft(KmvSketch.zero)(KmvSketch.reduce))
    assert(java.lang.Double.doubleToLongBits(agg.eval(merged).asInstanceOf[Double]) ===
      java.lang.Double.doubleToLongBits(expected))
    assert(merged.size === KmvSketch.K)
  }

  test("kmv_sketch set form: ascending K-minima, identical under any partial order") {
    val agg = KmvSketchSetAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val hs = (1 to 640).map(i => (i.toLong * 2654435761L) % (1L << 60))
    def bufOf(part: Seq[Long]) = {
      val b = agg.createAggregationBuffer()
      part.foreach(h => { b.add(h); while (b.size > KmvSketch.K) b.pollLast() })
      agg.deserialize(agg.serialize(b))
    }
    def sketchVia(groups: Seq[Seq[Long]]): Seq[Long] =
      agg.eval(groups.map(bufOf).reduceLeft(agg.merge))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    val a = sketchVia((hs ++ hs.take(50)).grouped(7).toSeq)
    val b = sketchVia(scala.util.Random.shuffle(hs).grouped(100).toSeq)
    // the sketch is the rank-K prefix of the distinct universe, ascending —
    // exactly the DuckDB oracle's row_number() <= K formulation
    val want = hs.distinct.sorted.take(KmvSketch.K)
    assert(a === want)
    assert(b === want)
  }
}
