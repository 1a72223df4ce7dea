package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Expression, GreaterThan, If, IntegerLiteral, LambdaFunction, LessThan, NamedLambdaVariable, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: `size(array_intersect(a, b))` → [[SortedOverlapCount]]
  * when BOTH inputs are provably sorted-ascending, duplicate-free long
  * arrays with no null elements — i.e. the expression tree itself is
  * `array_sort(array_distinct(_))` with the default comparator over
  * `array<bigint> NOT NULL` elements. Under exactly those conditions the
  * two-pointer merge count is semantics-identical to the composed form
  * (duplicates would make the merge over-count; a custom comparator could
  * sort descending; null elements read as garbage longs), so the guard is
  * the proof, not a heuristic.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) so user-level
  * SQL or DataFrame code written in the natural composed form gets the
  * allocation-free fast path without knowing the engine function exists —
  * the same pattern Spark itself uses for `ReplaceExpressions`-style
  * rewrites. `legacySizeOfNull` must be off: legacy `size(NULL) = -1`
  * differs from the expression's null-in → null-out.
  */
object RewriteSortedOverlap extends Rule[LogicalPlan] {

  /** The analyzed form of [[ArraySort.defaultComparator]] — its lambda
    * variables get fresh exprIds at analysis time, so the check is
    * structural: `if (l < r) -1 else if (l > r) 1 else 0` over exactly the
    * lambda's own two arguments, in order (ascending).
    */
  // NOTE: this matches the post-NullPropagation folded shape (the raw
  // default comparator carries IsNull branches that fold away for
  // containsNull=false elements, and the injected rule runs in the same
  // fixed-point batch). If a Spark upgrade reshapes the default comparator
  // the rewrite stops firing — by design it fails CLOSED (composed form
  // keeps running, just slower) and the pinned PipelineSpec test turns red.
  private def isDefaultAscComparator(f: Expression): Boolean = f match {
    case LambdaFunction(
        If(LessThan(a1: NamedLambdaVariable, b1: NamedLambdaVariable), IntegerLiteral(-1),
          If(GreaterThan(a2: NamedLambdaVariable, b2: NamedLambdaVariable),
            IntegerLiteral(1), IntegerLiteral(0))),
        Seq(l: NamedLambdaVariable, r: NamedLambdaVariable), _) =>
      a1.exprId == l.exprId && b1.exprId == r.exprId &&
        a2.exprId == l.exprId && b2.exprId == r.exprId
    case _ => false
  }

  private def sortedDistinctLongs(e: Expression): Boolean = e match {
    case ArraySort(ArrayDistinct(_), f, _) =>
      isDefaultAscComparator(f) &&
        (e.dataType match {
          case ArrayType(LongType, containsNull) => !containsNull
          case _ => false
        })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), legacySizeOfNull)
        if !legacySizeOfNull && sortedDistinctLongs(a) && sortedDistinctLongs(b) =>
      SortedOverlapCount(a, b)
  }
}
