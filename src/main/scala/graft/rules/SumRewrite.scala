package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** The reference's SUM_REWRITER optimizer pass
  * (/root/reference/src/optimizer/sum_rewriter.cpp) as a Catalyst rule:
  *
  *   sum(x + c)  →  sum(x) + c * count(x)
  *
  * Why it helps: the rewritten form aggregates the raw column, so an
  * aggregation that also computes `sum(x)`/`count(x)` shares work, and
  * the per-row Add disappears from the (hot) update loop in exchange for
  * one final-stage multiply-add per group.
  *
  * Restricted to double arithmetic with a foldable addend and
  * non-distinct, unfiltered aggregates — the cases where the algebra is
  * exact (null rows are skipped identically on both sides: count(x)
  * counts exactly the rows sum(x+c) would have accumulated).
  *
  * Inject with `graft.GraftExtensions` (spark.sql.extensions).
  */
object SumRewrite extends Rule[LogicalPlan] {

  private def rewrite(ae: AggregateExpression): Option[Expression] = ae match {
    case AggregateExpression(Sum(Add(x, c, _), evalMode), mode, false, None, _)
        if c.foldable && x.dataType == DoubleType && c.dataType == DoubleType =>
      val sumX = ae.copy(aggregateFunction = Sum(x, evalMode),
        resultId = NamedExpression.newExprId)
      val cntX = AggregateExpression(Count(Seq(x)), mode, isDistinct = false,
        None, NamedExpression.newExprId)
      Some(Add(sumX, Multiply(c, Cast(cntX, DoubleType))))
    case AggregateExpression(Sum(Add(c, x, _), evalMode), mode, false, None, _)
        if c.foldable && x.dataType == DoubleType && c.dataType == DoubleType =>
      val sumX = ae.copy(aggregateFunction = Sum(x, evalMode),
        resultId = NamedExpression.newExprId)
      val cntX = AggregateExpression(Count(Seq(x)), mode, isDistinct = false,
        None, NamedExpression.newExprId)
      Some(Add(sumX, Multiply(c, Cast(cntX, DoubleType))))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case ae: AggregateExpression => rewrite(ae).getOrElse(ae)
      }
  }
}
