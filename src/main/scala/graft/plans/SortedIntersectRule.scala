package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

import graft.functions.SortedIntersectCount

/** Optimizer rule: allocation-free intersection COUNTS over provably
  * sorted sets.
  *
  * Users naturally write `size(array_intersect(a, b))` — which builds an
  * OpenHashSet of one side plus the intersection ARRAY per row, only to
  * take its length (allocation-bound on verify joins that run it millions
  * of times). When both inputs are SYNTACTICALLY `sort_array(
  * array_distinct(x))` ascending over `array<long>` without nulls, the
  * sorted-set precondition of the zero-allocation two-pointer kernel
  * ([[graft.functions.SortedIntersectCount]] — q98's verify kernel) is
  * established by the matched expression itself, and the rule rewrites
  *
  *   size(array_intersect(sa, sb))  ⟶  int(sorted_intersect_count(sa, sb))
  *
  * Null semantics are preserved (both forms are null iff an input array
  * is null — the rule fires only on the non-legacy `size`, whose null
  * result is null, matching the kernel's null-safe eval). `array_intersect`
  * emits distinct elements, so on distinct inputs its size equals the
  * merge count exactly (fuzz-proven in SortedIntersectCountSpec). The
  * rewritten form contains no `Size(ArrayIntersect(...))`, so the rule is
  * fixpoint-safe.
  */
object SortedIntersectRule extends Rule[LogicalPlan] {

  private val LongSet = ArrayType(LongType, containsNull = false)

  private def sortedSet(e: Expression): Boolean = e match {
    case SortArray(ArrayDistinct(_), Literal(true, _)) => e.dataType == LongSet
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(l, r), legacySizeOfNull)
        if !legacySizeOfNull && sortedSet(l) && sortedSet(r) =>
      Cast(SortedIntersectCount(l, r), IntegerType)
  }
}
