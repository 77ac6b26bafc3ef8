package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV buffer: the K smallest DISTINCT 60-bit hashes seen so far, sorted. */
case class KmvBuf(hashes: Seq[Long])

/** K-Minimum-Values distinct-count sketch as a typed `Aggregator` — the
  * sketch-aggregate surface (SURVEY §4 custom-piece list) over a
  * deterministic estimator: unlike HLL's implementation-defined registers,
  * KMV's state (the K smallest distinct hash values) is a pure set function
  * of the input — merge order cannot change it — so the estimate is exactly
  * reproducible in the DuckDB oracle (same hashes, same k-th order
  * statistic, same arithmetic).
  *
  * Estimator: with fewer than K distinct hashes the count is exact; else
  * D ≈ (K-1) / F(h_K) where F(h) = h / 2^60 is the fraction of hash space
  * below the K-th minimum (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002).
  *
  * Scale: the buffer is ≤ K longs per group regardless of input size;
  * map-side partial aggregation reduces each partition to one buffer before
  * the shuffle. The per-row sorted-Seq insert is O(K) — this Aggregator is
  * the reference/spec form; the production path is [[KmvSketchAgg]], a
  * TypedImperativeAggregate with an O(log K) mutable bounded ordered set,
  * proven bit-identical in KmvSketchSpec and used by `events_kmv_distinct`.
  */
object KmvSketch extends Aggregator[Long, KmvBuf, Double] {

  /** Sketch size: 64 minima → ~13% relative standard error. */
  val K = 64

  /** Hash-space size: hashes are 60-bit (md5-derived, see Dedup.hash60). */
  val HashSpace: Double = 1152921504606846976.0 // 2^60, exactly representable

  override def zero: KmvBuf = KmvBuf(Vector.empty)

  private def insert(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.contains(h)) buf
    else if (buf.length < K) (buf :+ h).sorted
    else if (h >= buf.last) buf
    else ((buf :+ h).sorted).take(K)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = KmvBuf(insert(b.hashes, h))

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hashes ++ b.hashes).distinct.sorted.take(K))

  override def finish(b: KmvBuf): Double =
    if (b.hashes.length < K) b.hashes.length.toDouble
    else (K - 1).toDouble * HashSpace / b.hashes.last

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
