package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Cast, Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType, StringType}

/** Optimizer rule: `size(array_intersect(x, y))` → the allocation-free
  * [[SortedIntersectCount]] merge walk, WHEN both sides are provably
  * sorted-distinct string arrays — i.e. built by [[ShingleArray]] (sorted
  * distinct by construction) or by the literal `sort_array(array_distinct
  * (...), asc)` pattern over null-free string arrays. SQL users writing
  * the portable builtin formulation then get the kernel the Column-API
  * dedup pipelines call directly; anything whose ordering cannot be
  * proven is left untouched.
  *
  * Guards mirror the kernel's preconditions exactly: ascending sort (the
  * SortArray flag must be a literal true), element type string, element
  * nullability false (a null element would NPE the comparator — and
  * `array_distinct` preserves the child's element nullability), and the
  * non-legacy `size` (legacy size returns -1 for NULL input; the kernel
  * propagates NULL).
  */
object RewriteSortedIntersectCount extends Rule[LogicalPlan] {

  private def sortedDistinctStrings(e: Expression): Boolean = e match {
    case ShingleArray(_, _) => true
    case SortArray(ArrayDistinct(child), Literal(true, BooleanType)) =>
      child.dataType match {
        case ArrayType(StringType, containsNull) => !containsNull
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(l, r), false)
        if sortedDistinctStrings(l) && sortedDistinctStrings(r) =>
      Cast(SortedIntersectCount(l, r), IntegerType)
  }
}
