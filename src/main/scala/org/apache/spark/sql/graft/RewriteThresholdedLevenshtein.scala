package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound-compare of an UNthresholded levenshtein
  *
  *   levenshtein(a, b) <= k      (and the <, >=-reversed spellings)
  *
  * becomes a compare of the THRESHOLDED form
  *
  *   levenshtein(a, b, k) >= 0
  *
  * Spark's 3-arg levenshtein runs the banded O(k·len) DP with early
  * exit and returns −1 above the bound, versus the full O(len²) matrix
  * for the 2-arg form — the predicate answer is identical (distance
  * ≤ k ⟺ banded result ≥ 0; nulls propagate to null either way), so
  * the rewrite is unconditionally sound and always on. Fires wherever
  * the comparison appears (filters — including after predicate
  * pushdown substitutes a projected alias — join conditions, CASE
  * arms); a full-distance projection of the same expression is
  * untouched and, below a rewritten filter, now only evaluates for
  * surviving rows.
  *
  * This is the optimization a fuzzy-dedup verify stage
  * (t5_edit_pairs, Dedup.editDistancePairs) wants on its hot
  * predicate; the operator code already spells the thresholded form
  * explicitly — the rule catches the ad-hoc queries that don't. */
object RewriteThresholdedLevenshtein extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(l, r, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 => banded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(l, r, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 1 => banded(l, r, k - 1)
    }
}
