package org.apache.spark.sql

import org.apache.spark.sql.execution.{CollectMetricsExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Reader for in-plan `observe()` metrics that works with AQE enabled.
  *
  * This build's `QueryExecution.observedMetrics` collects CollectMetricsExec
  * nodes by pattern-matching over `executedPlan` — but with adaptive
  * execution on, `executedPlan` is an `AdaptiveSparkPlanExec` LEAF wrapper
  * and the traversal never reaches the metric nodes inside it (verified
  * empirically: the same query reports its metrics with AQE off and an
  * empty map with AQE on). This walker descends through adaptive plans,
  * materialized query stages, and cached relations, then reads each metric
  * node's accumulated row. Lives in the spark.sql package for access to the
  * `private[sql]` pieces (`collectedMetrics`, stage internals).
  */
object GraftObservedMetrics {

  /** All named observations of `df`'s last execution, by observation name.
    * Call AFTER an action; metric rows accumulate per executed node.
    */
  def of(df: DataFrame): Map[String, Row] = walk(df.queryExecution.executedPlan)

  private def walk(plan: SparkPlan): Map[String, Row] =
    plan.collectWithSubqueries {
      case c: CollectMetricsExec => Map(c.name -> c.collectedMetrics)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case t: InMemoryTableScanExec => walk(t.relation.cachedPlan)
    }.foldLeft(Map.empty[String, Row])(_ ++ _)
}
