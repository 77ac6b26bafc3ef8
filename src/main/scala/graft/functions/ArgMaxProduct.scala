package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (product, score) observation per customer×product aggregate row. */
case class ProductScore(l_partkey: Long, order_frequency: Long, product_spent: BigDecimal)

/** U2: typed `Aggregator` UDAF — argmax of `l_partkey` by
  * (order_frequency DESC, product_spent DESC, l_partkey ASC), the
  * "favorite product" semantics of A6 (q2_ecommerce_analysis.py:116-138)
  * with the deterministic tie-break the oracle needs.
  *
  * This is the SURVEY §7.3 demonstration of the typed-UDAF surface: compared
  * to the row_number window form it needs no per-group sort — the buffer is
  * a single running champion, merged associatively, so it runs as a regular
  * partial+final hash aggregation (map-side combine, one shuffle, O(1) state
  * per group) — the cheaper plan at scale.
  *
  * The empty buffer is the sentinel `order_frequency = -1` (real frequencies
  * are ≥ 1); groups are never empty under `groupBy.agg`, so `finish` never
  * sees it.
  */
object ArgMaxProduct extends Aggregator[ProductScore, ProductScore, Long] {

  override def zero: ProductScore = ProductScore(-1L, -1L, BigDecimal(0))

  private def better(x: ProductScore, y: ProductScore): ProductScore = {
    val cmp =
      if (x.order_frequency != y.order_frequency)
        x.order_frequency.compare(y.order_frequency)
      else if (x.product_spent != y.product_spent)
        x.product_spent.compare(y.product_spent)
      else -x.l_partkey.compare(y.l_partkey) // smaller key wins ties
    if (cmp >= 0) x else y
  }

  override def reduce(b: ProductScore, a: ProductScore): ProductScore =
    if (b.order_frequency < 0) a else better(b, a)

  override def merge(x: ProductScore, y: ProductScore): ProductScore =
    if (x.order_frequency < 0) y else if (y.order_frequency < 0) x else better(x, y)

  override def finish(r: ProductScore): Long = r.l_partkey

  override def bufferEncoder: Encoder[ProductScore] = Encoders.product[ProductScore]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
