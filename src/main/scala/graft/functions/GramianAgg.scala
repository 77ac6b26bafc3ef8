package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Gramian buffer: vector count, per-dimension code sums, and the upper
  * triangle of the code cross-product matrix, flattened column-major —
  * the (i ≤ j) cell lives at index `j·(j+1)/2 + i` (0-based).
  */
case class GramBuf(n: Long, s: Array[Long], g: Array[Long])

/** Single-pass Gramian over int-quantized vectors: one corpus scan
  * accumulates N, Σq_i, and Σq_i·q_j for every i ≤ j — the sufficient
  * statistics for the full covariance/correlation matrix — in ONE
  * d·(d+3)/2-long integer buffer per partition.
  *
  * This is the RowMatrix.computeGramian shape re-expressed as a typed
  * `Aggregator`: the buffer merges associatively (elementwise long adds),
  * so the plan is a regular partial+final aggregation — map-side combine
  * reduces each partition to one buffer before a single-row shuffle. No
  * N·d² row fan-out ever materializes, which is what makes a covariance
  * pass affordable at 100 TB (the fan-out form ships d²/2 rows per vector
  * through the shuffle; this ships d·(d+3)/2 longs per PARTITION).
  *
  * Integer codes are the point: every sum is exact, so merge order cannot
  * perturb the result and the DuckDB oracle reproduces each final double
  * bit-for-bit from the same integers (the double-summed float form is
  * order-dependent and could never hash-match).
  */
class GramianAgg(dim: Int) extends Aggregator[Seq[Long], GramBuf, GramBuf] {
  private val tri = dim * (dim + 1) / 2

  override def zero: GramBuf = GramBuf(0L, Array.ofDim[Long](dim), Array.ofDim[Long](tri))

  override def reduce(b: GramBuf, q: Seq[Long]): GramBuf = {
    require(q != null, "GramianAgg: null code vector — filter null embeddings " +
      "before aggregating (a null row would otherwise NPE the whole pass)")
    require(q.length == dim, s"expected $dim codes, got ${q.length}")
    val qa = q.toArray
    var j = 0
    var k = 0
    while (j < dim) {
      b.s(j) += qa(j)
      val qj = qa(j)
      var i = 0
      while (i <= j) { b.g(k) += qa(i) * qj; i += 1; k += 1 }
      j += 1
    }
    GramBuf(b.n + 1, b.s, b.g)
  }

  override def merge(x: GramBuf, y: GramBuf): GramBuf = {
    var i = 0
    while (i < dim) { x.s(i) += y.s(i); i += 1 }
    var k = 0
    while (k < tri) { x.g(k) += y.g(k); k += 1 }
    GramBuf(x.n + y.n, x.s, x.g)
  }

  override def finish(r: GramBuf): GramBuf = r

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
}
