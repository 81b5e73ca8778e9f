package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event correlation (attribution) join: match each left
  * event (impression/view) to right events (clicks) with the same key
  * arriving inside `(leftTs, leftTs + within]`.
  *
  * Built on Spark's native stream-stream join — the one operator shape
  * where Structured Streaming manages BOTH sides' state stores: each
  * side is watermarked, and the time-interval join condition gives the
  * engine the bound it needs to evict a buffered row once the other
  * side's watermark passes its match window (Spark's
  * StreamingSymmetricHashJoinExec derives the state watermark from
  * exactly this conjunction). Without the interval condition the state
  * grows forever; with it, state is O(events inside the join window) —
  * the 100 TB stream requirement.
  *
  * The left-outer variant additionally emits unmatched left rows
  * (impressions that never converted) once the watermark proves no
  * match can still arrive — the streaming analogue of the batch
  * attribution anti-join.
  */
object StreamingJoin {

  /** `left`/`right` are STREAMING frames carrying `keyCol` and their
    * event-time columns. Watermarks are applied here (callers pass raw
    * streams): `delay` bounds disorder on both sides. Output columns:
    * key, left_ts, right_ts, lag_ms.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      within: String, delay: String = "0 seconds",
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"stream-stream interval join supports inner/left_outer, got $joinType")
    val l = left
      .select(col(keyCol).as("key"), col(leftTsCol).as("left_ts"))
      .withWatermark("left_ts", delay)
    val r = right
      .select(col(keyCol).as("r_key"), col(rightTsCol).as("right_ts"))
      .withWatermark("right_ts", delay)
    l.join(r,
        col("key") === col("r_key") &&
          col("right_ts") > col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr(s"INTERVAL $within"),
        joinType)
      .select(col("key"), col("left_ts"), col("right_ts"),
        (unix_millis(col("right_ts")) - unix_millis(col("left_ts")))
          .as("lag_ms"))
  }
}
