package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded-threshold rewrite of Levenshtein predicates.
  *
  * Users naturally write `levenshtein(a, b) <= k` — which evaluates the full
  * O(|a|·|b|) dynamic program for every candidate pair, even when the
  * distance blows past `k` in the first few rows of the DP matrix. Spark's
  * 3-arg `levenshtein(a, b, k)` runs the banded O(k·len) DP, bails out the
  * moment the band exceeds `k` (returning -1), and short-circuits on a
  * length-difference > k without touching the matrix at all.
  *
  * This rule rewrites the naive predicate into the banded form wherever it
  * appears (filters, join conditions, projected booleans):
  *
  *   levenshtein(a, b) <= k   ⟶   levenshtein(a, b, k) >= 0     (k >= 1)
  *   levenshtein(a, b) <= 0   ⟶   a = b
  *   levenshtein(a, b) <  k   ⟶   levenshtein(a, b, k-1) >= 0
  *
  * NULL semantics are preserved: both sides yield NULL iff an input is NULL
  * (and `a = b` is exactly distance-0 under three-valued logic). The
  * rewritten form never matches the patterns again (threshold is Some),
  * so the rule is fixpoint-safe. In a blocked fuzzy join (see
  * [[graft.operators.FuzzyJoin]]) this turns the per-candidate verify cost
  * from O(len²) into O(k·len) — the difference between a linkage bounded by
  * candidate count and one bounded by string length at 100 TB.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      banded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
      banded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      banded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 1 =>
      banded(l, r, k - 1)
  }

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    if (k == 0) EqualTo(l, r)
    else GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))
}
