package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Push GROUP BY below JOIN — eager aggregation on the foreign side
  * (reference push_down_group_by.cpp:64, applied into
  * TJoinClause::GroupClause, query.h:360).
  *
  * `Aggregate(G, aggs, Join(L, R, L.k = R.k))` where every aggregate is
  * a non-distinct min/max/sum over R-only columns and G references only
  * L, rewrites to
  * `Aggregate(G, aggs', Join(L, Aggregate(R.k, partials, R)))`:
  * per-key partials on R, then sum-of-sums / min-of-mins after the
  * join. Correct because for each left row the joined contribution
  * collapses to one pre-aggregated row per key — Yan-Larson eager
  * aggregation, restricted to the same decomposable set the reference
  * allows (min/max/sum; count/avg excluded, matching
  * `isAggregateFunctionGood`).
  *
  * At scale this joins L against |distinct keys of R| rows instead of
  * |R| rows — on a large foreign table the join input shrinks by the
  * key fan-in before it ever shuffles.
  */
object PushDownGroupBy {

  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[PushAggThroughJoinRule.type]))
      spark.experimental.extraOptimizations = existing :+ PushAggThroughJoinRule
  }

  object PushAggThroughJoinRule extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(_, _, join: Join, _) =>
        rewrite(agg, join).getOrElse(agg)
      // column pruning typically leaves an attribute-only Project
      // between the aggregate and the join; it would keep projecting
      // right-side columns the partial aggregate no longer produces, so
      // the rewrite drops it (it only pruned, never renamed)
      case agg @ Aggregate(_, _, Project(list, join: Join), _)
          if list.forall(_.isInstanceOf[Attribute]) =>
        rewrite(agg, join).getOrElse(agg)
    }

    private def rewrite(agg: Aggregate, join: Join): Option[LogicalPlan] = {
      val Join(left, right, joinType, condOpt, hint) = join
      if (joinType != Inner && joinType != LeftOuter) return None
      val cond = condOpt.getOrElse(return None)

      // equi-join on attributes only, one side each
      val conjuncts = splitConjunctive(cond)
      val keyPairs = conjuncts.map {
        case EqualTo(a: Attribute, b: Attribute)
            if left.outputSet.contains(a) && right.outputSet.contains(b) =>
          (a, b)
        case EqualTo(b: Attribute, a: Attribute)
            if left.outputSet.contains(a) && right.outputSet.contains(b) =>
          (a, b)
        case _ => return None
      }
      val rightKeys = keyPairs.map(_._2).distinct

      // idempotence: if the right side is already aggregated by exactly
      // the join keys, a second push gains nothing (and the rule would
      // otherwise re-fire on its own output forever)
      right match {
        case Aggregate(ge, _, _, _)
            if ge.length == rightKeys.length &&
              rightKeys.forall(k => ge.exists(_.semanticEquals(k))) =>
          return None
        case _ =>
      }

      // group keys must not touch the foreign side
      if (agg.groupingExpressions.exists(_.references.exists(right.outputSet.contains)))
        return None

      // collect every aggregate call; all must be pushable min/max/sum
      // over foreign-only arguments
      val aggCalls = agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
      if (aggCalls.isEmpty) return None
      val pushable = aggCalls.forall { ae =>
        def okArg(e: Expression): Boolean =
          e.references.nonEmpty && e.references.subsetOf(right.outputSet)
        val argOk = ae.aggregateFunction match {
          case Sum(e, _) => okArg(e)
          case Min(e) => okArg(e)
          case Max(e) => okArg(e)
          case _ => false
        }
        argOk && !ae.isDistinct && ae.filter.isEmpty
      }
      if (!pushable) return None

      // one partial per distinct aggregate call
      val partials = aggCalls.distinct.map { ae =>
        ae -> Alias(ae, "_pushed")()
      }
      val partialAgg = Aggregate(
        rightKeys,
        (rightKeys: Seq[NamedExpression]) ++ partials.map(_._2),
        right)

      val newJoin = Join(left, partialAgg, joinType, condOpt, hint)

      // re-aggregate the partials: sum-of-sums, min-of-mins, max-of-maxes
      val replaced = agg.aggregateExpressions.map { ne =>
        ne.transformDown {
          case ae: AggregateExpression =>
            val partialAttr =
              partials.find(p => p._1.semanticEquals(ae)).get._2.toAttribute
            val refolded = ae.aggregateFunction match {
              case _: Sum => ae.copy(aggregateFunction = Sum(partialAttr))
              case _: Min => ae.copy(aggregateFunction = Min(partialAttr))
              case _: Max => ae.copy(aggregateFunction = Max(partialAttr))
              case other => throw new IllegalStateException(other.toString)
            }
            // sum can widen (decimal precision) on the second fold —
            // pin the original type
            if (refolded.dataType == ae.dataType) refolded
            else Cast(refolded, ae.dataType)
        }.asInstanceOf[NamedExpression]
      }
      Some(agg.copy(aggregateExpressions = replaced, child = newJoin))
    }

    private def splitConjunctive(e: Expression): Seq[Expression] = e match {
      case And(l, r) => splitConjunctive(l) ++ splitConjunctive(r)
      case other => Seq(other)
    }
  }
}
