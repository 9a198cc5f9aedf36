package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors — the standard shim
  * every Spark extension library ships to turn an injected custom
  * [[LogicalPlan]] into a user-facing DataFrame. Nothing else from the
  * internal surface is exposed.
  */
object Bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Whether a planner strategy of the given class is active. */
  def hasStrategy(spark: SparkSession, clazz: Class[_]): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.planner.extraPlanningStrategies
      .exists(s => clazz.isAssignableFrom(s.getClass))
}
