package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded `levenshtein(a, b) <= n`
  * comparisons into the threshold form `levenshtein(a, b, n)`, which
  * runs Spark's banded O(len·n) DP and bails out early instead of
  * filling the full O(len²) table per pair.
  *
  * The engine's own operators call the threshold variant directly
  * (ops.Dedup.editDistancePairs); this rule extends the same win to
  * any user-written SQL/DSL predicate — the "drop to a custom
  * Rule[LogicalPlan] where built-ins can't express it" extension point
  * (SURVEY §2.10), registered through GraftExtensions /
  * GraftFunctions.registerAll.
  *
  * Soundness: `levenshtein(a, b, n)` returns the exact distance when
  * it is ≤ n and −1 otherwise, so `lev(a,b) ≤ n  ≡  0 ≤ lev(a,b,n) ≤ n`
  * for non-null inputs, and both sides are null on null input. Bounds
  * must be non-negative literals (a negative n keeps the unbounded
  * form, which then never matches anyway).
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(lev @ Levenshtein(_, _, None), Literal(n: Int, IntegerType))
        if n >= 0 => bounded(lev, n)
    case GreaterThanOrEqual(Literal(n: Int, IntegerType), lev @ Levenshtein(_, _, None))
        if n >= 0 => bounded(lev, n)
    case LessThan(lev @ Levenshtein(_, _, None), Literal(n: Int, IntegerType))
        if n >= 1 => bounded(lev, n - 1)
    case GreaterThan(Literal(n: Int, IntegerType), lev @ Levenshtein(_, _, None))
        if n >= 1 => bounded(lev, n - 1)
  }

  private def bounded(lev: Levenshtein, n: Int): Expression = {
    // the threshold variant never returns a value above n, so `t >= 0`
    // alone is the full predicate — a second `t <= n` conjunct would
    // re-evaluate the banded DP per row absent CSE
    val t = Levenshtein(lev.left, lev.right, Some(Literal(n)))
    GreaterThanOrEqual(t, Literal(0))
  }
}
