package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** Registry shim for Spark's own `BloomFilterMightContain`.
  *
  * Spark ships the expression (it is how AQE's runtime row-level filtering
  * prunes a shuffle side) and registers its builder `bloom_filter_agg`, but
  * leaves the probe side OFF the public function registry — it is only ever
  * constructed by the `InjectRuntimeFilter` rule. Registering it as
  * `might_contain(bloom binary, xxhash64 bigint) -> boolean` lets
  * [[graft.operators.BloomJoin]] build the same map-side pruning plan
  * deliberately, for joins the optimizer rule would not rewrite.
  *
  * The expression itself enforces that the bloom argument is a literal or a
  * scalar subquery (never a per-row value), so misuse fails at analysis, not
  * at runtime.
  */
object MightContain {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"might_contain expects (bloom binary, hash bigint), got ${children.length} arguments")
      BloomFilterMightContain(children.head, children(1))
    }
  )
}
