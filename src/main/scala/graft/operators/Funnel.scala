package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-conversion funnel over an event log: for each user, the
  * timestamp of their first stage-1 event, the first stage-2 event
  * within `withinSeconds` AFTER that, the first stage-3 event within
  * `withinSeconds` after THAT, and so on — the classic
  * product-analytics funnel (each stage must follow the previous one,
  * inside a conversion window), which the reference has no analogue
  * for and Spark has no built-in for.
  *
  * Plan: one filtered min-aggregate per stage, each joined back to the
  * previous stage's frontier. The event table is scanned once per
  * stage with the stage's type filter pushed to the scan; every
  * aggregate and join keys on the user column, so they share one
  * shuffle partitioning, and the frontier (one row per user that
  * reached the stage — users, not events) is orders of magnitude
  * smaller than the log, so AQE broadcasts it when it fits. Nothing
  * driver-side, no window over the full log.
  */
object Funnel {

  /** One row per user that reached stage 1, with columns
    * `t1 .. t<n>` — the conversion timestamp per stage, null from the
    * first stage the user did not reach in order within the window.
    */
  def stages(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stageTypes: Seq[String], withinSeconds: Long): DataFrame = {
    require(stageTypes.nonEmpty, "at least one funnel stage required")
    val first = events.filter(col(typeCol) === stageTypes.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    stageTypes.zipWithIndex.drop(1).foldLeft(first) { case (prev, (st, i)) =>
      val prevTs = col(s"t$i")
      val nextTs = s"t${i + 1}"
      val next = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol))
        .join(prev.select(col(userCol), prevTs), Seq(userCol))
        .filter(col(tsCol) > prevTs &&
          col(tsCol) <= prevTs + expr(s"INTERVAL $withinSeconds SECONDS"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(nextTs))
      prev.join(next, Seq(userCol), "left")
    }
  }

  /** Stage-reach counts derived from [[stages]]: (stage index, stage
    * name, users reaching it in order within the window).
    */
  def counts(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stageTypes: Seq[String], withinSeconds: Long): DataFrame = {
    val wide = stages(events, userCol, tsCol, typeCol, stageTypes, withinSeconds)
    val aggs = stageTypes.indices.map(i =>
      count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val one = wide.agg(aggs.head, aggs.tail: _*)
    val perStage = stageTypes.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage"), lit(st).as("stage_type"),
        col(s"n${i + 1}").as("users"))
    }
    one.select(explode(array(perStage: _*)).as("s"))
      .select(col("s.stage"), col("s.stage_type"), col("s.users"))
  }
}
