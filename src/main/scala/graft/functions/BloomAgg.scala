package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registry shim for Spark's own `BloomFilterAggregate` — the build side of
  * the bloom pair (see [[MightContain]] for the probe side and the rationale:
  * Spark ships both expressions for its runtime-filter rule but does not
  * expose them on the public function registry).
  *
  * `bloom_filter_agg(xxhash64(key)[, expectedItems[, numBits]]) -> binary`.
  */
object BloomAgg {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_filter_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
    (children: Seq[Expression]) => children match {
      case Seq(c)       => new BloomFilterAggregate(c)
      case Seq(c, n)    => new BloomFilterAggregate(c, n)
      case Seq(c, n, m) => new BloomFilterAggregate(c, n, m)
      case _ => throw new IllegalArgumentException(
        s"bloom_filter_agg expects 1-3 arguments (hash[, expectedItems[, numBits]]), got ${children.length}")
    }
  )
}
