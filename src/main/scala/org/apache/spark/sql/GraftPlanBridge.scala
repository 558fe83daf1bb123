package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Spark 4 moved DataFrame-from-LogicalPlan construction and the
  * extra-strategies hook behind `private[sql]` / classic-only surfaces.
  * This bridge exposes exactly what graft's custom plan nodes need:
  * wrapping a custom logical operator in a DataFrame, reading a frame's
  * analyzed plan, and registering a planner strategy on a live session
  * (the `withExtensions` path is [[graft.GraftExtensions]]; this runtime
  * path serves sessions that already exist).
  */
object GraftPlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently append a planner strategy to the session's experimental
    * strategy list (public ExperimentalMethods surface, classic session).
    * Synchronized on the experimental object: the check-then-append is not
    * atomic, and two threads' first TopK.perKey calls on one session must
    * not register the strategy twice. */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.exists(_.getClass == s.getClass))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
