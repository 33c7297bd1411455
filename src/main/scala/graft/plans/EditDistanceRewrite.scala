package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound levenshtein comparisons.
  *
  * `levenshtein(a, b) <= k` (and `< k`, and the mirrored
  * `k >= levenshtein(a, b)`) with a literal bound rewrites to
  *
  *   abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * Two independent wins, both semantics-preserving:
  *   - the length guard short-circuits the DP entirely for pairs whose
  *     sizes alone put the threshold out of reach (edit distance is
  *     lower-bounded by the length difference) — on a blocked
  *     candidate join most pairs die on this two-instruction check;
  *   - the surviving pairs run Spark's THRESHOLDED 3-arg levenshtein
  *     (returns -1 past the bound), a banded O(k·min(|a|,|b|)) DP
  *     instead of the full O(|a|·|b|) table.
  *
  * Null semantics are identical (a null side nulls both forms), and
  * the rewrite output contains no un-thresholded levenshtein, so the
  * rule is a no-op at fixpoint. Users keep writing the natural
  * 2-arg predicate; the extension provides the bounded plan — the same
  * contract as [[TopKRewrite]].
  */
object EditDistanceRewrite extends Rule[LogicalPlan] {

  private def guard(a: Expression, b: Expression, k: Int): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(k)),
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0)))

  private def rewrite(e: Expression): Expression = e.transformUp {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
      if k >= 0 => guard(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
      if k >= 1 => guard(a, b, k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
      if k >= 0 => guard(a, b, k)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
    case j @ Join(_, _, _, Some(cond), _) =>
      j.copy(condition = Some(rewrite(cond)))
  }
}
