package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Plan-structure traversal for plan-shape specs: walks an executed plan
  * INCLUDING the subtrees Spark hides behind leaf wrappers (adaptive
  * plans, materialized query stages, reused exchanges), so assertions can
  * match on node TYPES and their fields — stable API — instead of
  * rendered plan strings, whose wording can change across Spark upgrades
  * without any behavior change. */
object PlanNodes {

  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val hidden = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case _                        => Seq.empty
    }
    Seq(p) ++ hidden ++ p.children.flatMap(flatten)
  }
}
