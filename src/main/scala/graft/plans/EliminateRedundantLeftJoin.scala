package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Join elimination for redundant left-outer joins — an optimization the
  * big warehouses (Trino, BigQuery, SQL Server) perform and Spark's
  * optimizer does not: drop a LEFT OUTER join entirely when nothing above
  * it reads the right side and the join provably cannot change the left
  * side's cardinality.
  *
  * Why this matters: the semantic-layer pattern. Teams publish WIDE views
  * that pre-join every dimension ("orders enriched with customer stats"),
  * and most queries over the view touch a handful of fact columns. Without
  * elimination every such query still pays the dim build + join shuffle for
  * dimensions it never reads; with it, the view is free abstraction.
  *
  * Soundness — the rewrite fires only when ALL of:
  *   - the join is LEFT OUTER with a deterministic condition: left rows are
  *     never dropped, whatever the condition does;
  *   - the parent is a schema-truncating node (Project / Aggregate) whose
  *     references all resolve on the LEFT output — the right side's columns
  *     are provably dead above the join;
  *   - the right side is an Aggregate whose grouping expressions are all
  *     covered by the equi-join keys (matched through pass-through
  *     attributes AND aliases, the shape a renamed dim key leaves after
  *     CollapseProject), or a global Aggregate (one row) — so at most ONE
  *     right row can match any left row and the join cannot duplicate.
  *
  * Under those three facts the join's output restricted to left columns IS
  * the left relation, row for row, so the parent re-parents onto the left
  * child. Extra conjuncts in the condition (range predicates, left-only
  * predicates) only reduce matches — match count ≤ 1 still holds, and a
  * left outer join keeps its left rows regardless of matching, so they
  * don't block elimination.
  *
  * Conservative by construction: any shape not matching the proof —
  * inner/semi joins, non-aggregate right sides, expression grouping keys,
  * parents exposing right columns (e.g. Filter, which passes the full
  * schema through) — is left untouched.
  */
class EliminateRedundantLeftJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** The equi-join's right-side key attributes. */
  private def rightKeysOf(j: Join): Seq[Attribute] =
    splitConjunctivePredicates(j.condition.get).collect {
      case EqualTo(a: Attribute, b: Attribute)
        if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) => b
      case EqualTo(a: Attribute, b: Attribute)
        if j.left.outputSet.contains(b) && j.right.outputSet.contains(a) => a
    }

  /** True when the right side emits at most one row per join-key value. */
  private def uniqueOnKeys(j: Join): Boolean = j.right match {
    case agg: Aggregate =>
      val keyIds = rightKeysOf(j).map(_.exprId).toSet
      agg.groupingExpressions.isEmpty || // global aggregate: one row total
        agg.groupingExpressions.forall(g => agg.aggregateExpressions.exists {
          case a: Attribute => keyIds.contains(a.exprId) && a.semanticEquals(g)
          case al @ Alias(child, _) => keyIds.contains(al.exprId) && child.semanticEquals(g)
          case _ => false
        })
    case _ => false
  }

  private def eligible(j: Join, parentRefs: org.apache.spark.sql.catalyst.expressions.AttributeSet): Boolean =
    j.joinType == LeftOuter && j.condition.exists(_.deterministic) &&
      parentRefs.subsetOf(j.left.outputSet) && uniqueOnKeys(j)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: Join) if eligible(j, p.references) =>
      p.copy(child = j.left)
    case a @ Aggregate(_, _, j: Join, _) if eligible(j, a.references) =>
      a.copy(child = j.left)
  }
}
