package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-window aggregations over the event stream — written against a
  * plain DataFrame so the SAME code runs in batch (for the DuckDB oracle)
  * and in Structured Streaming (readStream → these transforms →
  * writeStream with a watermark; see [[StreamingIngest]]).
  *
  * Sums go through exact decimal (partition-order independent) and
  * surface as double.
  */
object EventWindows {

  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(18, 2))).cast("double").as("total_value")

  /** Tumbling windows: one hash aggregate, window assignment is a pure
    * projection (no shuffle beyond the groupBy).
    */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum("value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Sliding windows (width > slide ⇒ each event lands in width/slide
    * windows — Spark expands them in the projection, still one shuffle).
    */
  def sliding(
      events: DataFrame,
      width: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))

  /** Session windows per user: a session extends while consecutive events
    * arrive within `gap`; closes at last_ts + gap. In streaming this is
    * the state-store-backed session_window; in batch Spark rewrites it to
    * a sort-based aggregation within each user partition.
    */
  def sessions(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), dsum("value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("total_value"))
}
