package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared plan-introspection helper for specs.
  *
  * Under AQE the top of `df.queryExecution.executedPlan` is an
  * `AdaptiveSparkPlanExec` whose inner tree is only final after the
  * frame has actually run — collecting nodes from an unexecuted frame
  * sees a placeholder and misses scans. Specs must execute first (an
  * action), then walk with this helper, which unwraps adaptive plans
  * and materialized query stages recursively.
  */
object PlanTest {
  /** Every physical node under `plan`, descending through AQE wrappers
    * and query stages. */
  def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case p                        => p.children
    }
    plan +: kids.flatMap(allNodes)
  }

  /** Final physical nodes of an ALREADY-EXECUTED frame (call an action
    * such as `.collect()`/`.head` first, or the adaptive plan is not
    * final). */
  def finalNodes(df: DataFrame): Seq[SparkPlan] =
    allNodes(df.queryExecution.executedPlan)
}
