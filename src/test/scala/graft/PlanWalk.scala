package graft

import org.apache.spark.sql.execution.SparkPlan

/** Test alias for the executed-plan flattener ([[Metrics.allNodes]]). */
object PlanWalk {
  def allNodes(p: SparkPlan): Seq[SparkPlan] = Metrics.allNodes(p)
}
