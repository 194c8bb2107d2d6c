package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Fold `FIRST/LAST/ANY_VALUE(k)` where `k` is one of the grouping
  * expressions into a plain reference to the key.
  *
  * YQL's SOME() lowers to any_value → First; a query spelling
  * `SOME(key)` next to numeric aggregates drags a string-typed
  * aggregation buffer into the plan, and HashAggregateExec refuses any
  * buffer with a non-mutable (string) field — the WHOLE aggregate
  * falls back to SortAggregateExec: a full sort of the input plus
  * interpreted (non-codegen) per-row update of every other aggregate
  * in the list. Folding the witness to the key restores hash
  * aggregation + whole-stage codegen for the rest.
  *
  * Correctness: within a group, every row's `k` equals the group key,
  * so first/last/any witness ≡ k; with ignoreNulls the aggregate is
  * null only when every `k` in the group is null, i.e. the key itself
  * is null — the same value. Filtered (`FILTER (WHERE ...)`) and
  * distinct forms are left alone (an all-filtered group yields null,
  * which the key reference would not).
  */
object FoldFirstOfGroupKey extends Rule[LogicalPlan] {

  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(FoldFirstOfGroupKey))
      spark.experimental.extraOptimizations = existing :+ FoldFirstOfGroupKey
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupingExprs, aggExprs, _, _)
        if groupingExprs.nonEmpty &&
          // grouping expressions must be deterministic to substitute
          // one evaluation site for another
          groupingExprs.forall(_.deterministic) =>
      var changed = false
      val newAggs = aggExprs.map { ne =>
        ne.transformDown {
          case AggregateExpression(f, _, false, None, _)
              if witnessOfKey(f, groupingExprs).isDefined =>
            changed = true
            witnessOfKey(f, groupingExprs).get
        }.asInstanceOf[NamedExpression]
      }
      if (changed) agg.copy(aggregateExpressions = newAggs) else agg
  }

  /** The grouping expression a first/last/any witness collapses to. */
  private def witnessOfKey(f: AggregateFunction,
      groupingExprs: Seq[Expression]): Option[Expression] = {
    val child = f match {
      case First(c, _) => Some(c)
      case Last(c, _) => Some(c)
      case _ => None
    }
    child.flatMap(c => groupingExprs.find(_.semanticEquals(c)))
  }
}
