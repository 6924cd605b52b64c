package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the standard top-n idiom
  *
  *   Filter(row_number <= k, Window(single row_number over (PARTITION
  *   BY … ORDER BY …)))
  *
  * into the bounded-heap operator — `Window(rn, TopKPerKeyNode(…))` —
  * so ANY query written against plain DataFrame windows gets the
  * sort-free partial/final top-k plan with no code changes. The Window
  * stays (downstream may project the rank), but now computes over at
  * most keys×k rows: for each key the pruned rows are exactly the
  * first k under the total order, so their re-computed row_numbers are
  * identical to the original ranks and the rank predicate is provably
  * satisfied — it is dropped, which also keeps Spark's own
  * InferWindowGroupLimit from re-matching the shape. Windows with more
  * than one window expression (e.g. a sum over the whole partition
  * alongside the rank) are NOT rewritten — those need every row.
  * An empty PARTITION BY (global top-n) rewrites too: the final stage
  * declares AllTuples, so each input partition contributes at most k
  * rows to a single-partition merge — strictly better than the window
  * plan, which moves EVERY row to one partition before ranking.
  *
  * Spark 3.5+ ships WindowGroupLimit for this pattern, but its
  * physical form still sorts each group; this rewrite removes the sort
  * entirely (TopKSpec/QueryPackSpec assert the plan). Correctness is
  * gated end-to-end: with GraftExtensions active in Verify, q34/q40/q41
  * flow through this rewrite and still hash-match their DuckDB oracles.
  */
object RankFilterToTopK extends Rule[LogicalPlan] with PredicateHelper {

  // Limits are computed in Long so `rn < Int.MinValue` cannot wrap to
  // Int.MaxValue; non-positive k yields None, leaving the (always-false)
  // filter in place untouched.
  private def fit(k: Long): Option[Int] =
    if (k >= 1 && k <= Int.MaxValue) Some(k.toInt) else None

  private def limit(cond: Expression, rn: AttributeReference): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn.exprId => fit(k.toLong)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn.exprId => fit(k.toLong - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn.exprId && k == 1 => Some(1)
    case EqualTo(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn.exprId && k == 1 => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn.exprId => fit(k.toLong)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn.exprId => fit(k.toLong - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, order, child, _))
        if order.nonEmpty && !child.isInstanceOf[TopKPerKeyNode] =>
      val rn = alias.toAttribute.asInstanceOf[AttributeReference]
      val (rankConds, others) = splitConjunctivePredicates(cond)
        .partition(c => limit(c, rn).isDefined)
      val ks = rankConds.flatMap(c => limit(c, rn))
      if (ks.isEmpty || others.exists(_.references.contains(rn))) f
      else {
        val pruned = w.copy(child = TopKPerKeyNode(part, order, ks.min, child))
        others.reduceOption(And).map(Filter(_, pruned)).getOrElse(pruned)
      }
  }
}
