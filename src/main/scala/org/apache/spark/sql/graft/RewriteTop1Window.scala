package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite the top-1-per-key window pattern
  *
  *   Filter(rn = 1, Window([rn := row_number() over (partition p order o ASC…)], child))
  *
  * into a sort-free aggregation
  *
  *   Project(fields of _top, rn := 1,
  *     Aggregate(p, [_top := min_by(struct(child.*), struct(o…))], child))
  *
  * eliminating the per-group sort and the Window exec entirely — shuffle
  * carries one pre-aggregated row per key per mapper (partial min_by).
  *
  * Spark itself cannot do this rewrite: with duplicate order keys,
  * row_number picks a sort-stable winner while min_by picks an
  * aggregation-order winner — both nondeterministic, but not provably
  * identical. The rule is therefore gated behind
  * `spark.graft.rewriteTop1Window=true`, a user contract that order
  * keys are unique per partition (the same contract that makes the
  * original query deterministic at all). Applies only to row_number,
  * rn = 1, and all-ascending order keys (struct comparison then matches
  * the multi-key sort order, nulls-first in both).
  */
object RewriteTop1Window extends Rule[LogicalPlan] {

  private def isEnabled: Boolean =
    conf.getConfString("spark.graft.rewriteTop1Window", "false") == "true"

  private def isEqOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!isEnabled) plan
    else plan.transformUp {
      case Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partSpec, orderSpec, child0, _))
          if isEqOne(cond, alias.toAttribute) &&
            orderSpec.nonEmpty &&
            orderSpec.forall(_.direction == Ascending) =>
        // InferWindowGroupLimit may already have inserted a per-group
        // limiter below the Window; it only pre-prunes, keep it.
        val child = child0
        val payload = CreateStruct(child.output)
        val ordKey =
          if (orderSpec.length == 1) orderSpec.head.child
          else CreateStruct(orderSpec.map(_.child))
        val top = Alias(
          AggregateExpression(MinBy(payload, ordKey), Complete,
            isDistinct = false), "_top")()
        val agg = Aggregate(partSpec, Seq(top), child)
        // Rebuild the Filter's output schema (child.* :+ rn) with the
        // ORIGINAL expression ids so downstream references still bind.
        val rebuilt = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(top.toAttribute, i, Some(a.name)), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        } :+ Alias(Literal(1), alias.name)(exprId = alias.exprId)
        Project(rebuilt, agg)
    }
}
