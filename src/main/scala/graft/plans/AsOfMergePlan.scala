package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator as-of join: the custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` tier of the extension ladder, for the one relational operator
  * the reference's attribution analyses need (latest prior right row per
  * left row — q4_streaming.ipynb's click-before-purchase question) that
  * Spark has no built-in node for.
  *
  * The compositional form ([[graft.operators.AsOfJoin.asof]]) answers it
  * with union + running-`last()` window: ONE exchange over left+right
  * combined, but the sort run and the window frame state carry BOTH sides
  * through a single operator, and every left column rides the union as a
  * struct. This native operator is the plan a point-lookup merge actually
  * wants:
  *
  *   - each side keeps its own exchange+sort on (key, time) — `EnsureRequirements`
  *     plans them exactly like a sort-merge join's children, co-partitioned
  *     via the standard [[ClusteredDistribution]] pair, so AQE coalesces
  *     them together;
  *   - the merge itself is a streamed single-pass zip of the two sorted
  *     runs: O(|left| + |right|) per partition, ONE buffered right row
  *     (`lastMatch`) of state, no window frame, no union, no struct boxing;
  *   - output rows are left rows with the payload appended — left columns
  *     never traverse a shuffle twice.
  *
  * Semantics (backward as-of, left outer): for each left row, the latest
  * right row on the same key with `right.time < left.time` (`strict`) or
  * `<= ` (non-strict). SQL equi-join null semantics: a NULL in any key
  * column matches nothing; a NULL left time matches nothing; NULL-time
  * right rows are skipped. Ties among right rows at the admissible boundary
  * time resolve to the last row in sort order — the same row the running
  * `last()` of the compositional form picks, and DuckDB `ASOF JOIN`'s
  * choice on tie-free time columns (the oracle fixture's ns timestamps).
  *
  * At 100 TB: this is the sort-merge-join cost model — two key-partitioned
  * sorts and a streamed merge with O(1) state — where the window form pays
  * the same exchanges plus a combined sort run and per-key frame state.
  * Skew behaves like any key-partitioned sort (one task per hot key's run).
  *
  * Plan-barrier caveat (documented contract): Catalyst's pruning/pushdown
  * rules don't see through a foreign node, so pre-select and pre-filter
  * both inputs ([[graft.operators.AsOfJoin.asofMerge]] pre-projects the
  * right side to keys+time+payload). The one rewrite that is always safe —
  * a deterministic filter on left-side columns commutes with the join
  * because output rows map 1:1 to left rows — ships as
  * [[PushLeftFilterThroughAsOf]], injected as an optimizer rule.
  */
case class AsOfJoinNode(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    strict: Boolean,
    left: LogicalPlan,
    right: LogicalPlan)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfMergeExec]]; everything else falls
  * through to Spark's own strategies.
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lt, rt, payload, strict, l, r) =>
      AsOfMergeExec(lk, rk, lt, rt, payload, strict, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Pushes the left-side conjuncts of a deterministic filter below an
  * [[AsOfJoinNode]]: each output row corresponds 1:1 to a left row and its
  * match depends only on that row's own key and time, so dropping other
  * left rows can never change a surviving row's payload. Right-side or
  * mixed conjuncts stay above the join (a right-side filter CAN change
  * matches). Runs to fixpoint with the standard operator-optimization
  * batch, handing the pushed predicate to the scan's own pushdown rules.
  */
class PushLeftFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Physical backward as-of merge. Children arrive hash-partitioned on the
  * key and sorted by (key, time) — declared, not hand-built, so
  * `EnsureRequirements` reuses any existing layout (a bucketed state table
  * on the key satisfies the distribution with zero exchange, the same
  * contract the bucketed CDC/PageRank tables exploit).
  */
case class AsOfMergeExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // left rows pass through in their sorted order, one output row each
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val (lOut, rOut) = (left.output, right.output)
    val (lKeys, rKeys, lTime, rTime) = (leftKeys, rightKeys, leftTime, rightTime)
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val resultAttrs = output
    val strictJoin = strict

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) { (lIter, rIter) =>
      val keyProjL = UnsafeProjection.create(lKeys, lOut)
      val keyProjR = UnsafeProjection.create(rKeys, rOut)
      val timeProjL = UnsafeProjection.create(Seq(lTime), lOut)
      val timeProjR = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // right attrs widened to nullable: unmatched left rows project the
      // all-null placeholder, which a non-nullable binding would read past
      val resultProj = UnsafeProjection.create(resultAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      def advanceRight(): Unit = { rHead = if (rIter.hasNext) rIter.next() else null }
      // O(1) merge state: the latest admissible right row and its key
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = keyProjL(lRow)
        val matched: InternalRow =
          if (lKey.anyNull) nullRight // NULL key matches nothing, consumes nothing
          else {
            if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
              lastMatch = null
              lastMatchKey = null
            }
            val lt = timeProjL(lRow)
            if (lt.isNullAt(0)) nullRight // NULL left time matches nothing; same-key
            else {                        // real-time rows sort after and re-advance
              var done = false
              while (!done && rHead != null) {
                val rKey = keyProjR(rHead)
                if (rKey.anyNull) advanceRight()
                else {
                  val c = keyOrd.compare(rKey, lKey)
                  if (c > 0) done = true
                  else if (c < 0) advanceRight()
                  else {
                    val rt = timeProjR(rHead)
                    if (rt.isNullAt(0)) advanceRight()
                    else {
                      val ct = timeOrd.compare(rt, lt)
                      if (ct < 0 || (!strictJoin && ct == 0)) {
                        lastMatch = rHead.copy() // buffers survive cursor advance
                        lastMatchKey = rKey.copy().asInstanceOf[UnsafeRow]
                        advanceRight()
                      } else done = true
                    }
                  }
                }
              }
              if (lastMatch == null) nullRight else lastMatch
            }
          }
        numOutputRows += 1
        resultProj(joined(lRow, matched))
      }
    }
  }
}
