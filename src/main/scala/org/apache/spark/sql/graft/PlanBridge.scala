package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** The one sanctioned crossing point between graft's custom logical
  * plans and Spark's `private[sql]` plan-to-DataFrame machinery. Lives
  * under `org.apache.spark.sql` solely for access; contains no logic —
  * every graft operator keeps its code in `graft.*` and calls through
  * here. (Same technique every Spark-native library — Delta, Iceberg,
  * Sedona — uses to materialize custom `LogicalPlan` nodes.)
  */
object PlanBridge {

  /** Wrap a (resolved) logical plan as a DataFrame — analyzer,
    * optimizer, and planner all run over it, so injected nodes see the
    * full Catalyst pipeline including `experimental.extraStrategies`.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes —
    * what custom nodes must reference).
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed

  /** Idempotently add a planner strategy to the session (synchronized —
    * the read-check-append on `extraStrategies` is not atomic, and gate
    * queries may build plans concurrently).
    */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit =
    PlanBridge.synchronized {
      val exp = spark.asInstanceOf[ClassicSparkSession].experimental
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
}
