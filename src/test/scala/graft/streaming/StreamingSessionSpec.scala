package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sessionization via Spark's native `session_window`
  * aggregate — the stateful counterpart of the batch
  * [[EventWindows]] sessionization gate: sessions EXTEND while events
  * keep arriving within the gap, MERGE when a late-but-in-watermark
  * event bridges two open sessions, and finalize (Append mode emits
  * them) only once the watermark passes the session end — the state
  * lifecycle a 100 TB clickstream needs.
  */
class StreamingSessionSpec extends SparkSpec {

  private def ev(u: Long, ms: Long) = (u, new Timestamp(ms))

  test("sessions extend within the gap, split beyond it, emit on watermark") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(Long, Timestamp)](s)
    val q = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"))
      .writeStream.format("memory").queryName("ssw")
      .outputMode("append").start()
    try {
      val t0 = 1000000L
      val m = 60000L
      // one burst, then a gap > 10 min, then a second burst
      in.addData(ev(1, t0), ev(1, t0 + 2 * m), ev(1, t0 + 4 * m))
      in.addData(ev(1, t0 + 30 * m), ev(1, t0 + 31 * m))
      // advance watermark far past both sessions so they finalize
      in.addData(ev(9, t0 + 600 * m))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, start, end, n_events FROM ssw WHERE user_id = 1 " +
          "ORDER BY start")
        .collect().map(r => (r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3)))
      assert(rows.length == 2, s"expected 2 sessions, got ${rows.toSeq}")
      // first session: 3 events, ends 10 min after its last event
      assert(rows(0) == ((t0, t0 + 4 * m + 10 * m, 3L)))
      // second session: 2 events
      assert(rows(1) == ((t0 + 30 * m, t0 + 31 * m + 10 * m, 2L)))
    } finally q.stop()
  }

  test("a bridging event merges two would-be sessions") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(Long, Timestamp)](s)
    val q = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 hour") // tolerate the bridge arriving late
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .writeStream.format("memory").queryName("ssw_merge")
      .outputMode("append").start()
    try {
      val t0 = 1000000L
      val m = 60000L
      // two bursts 15 min apart (would be separate sessions)...
      in.addData(ev(1, t0), ev(1, t0 + 15 * m))
      q.processAllAvailable()
      // ...then a LATE event between them bridges the gap
      in.addData(ev(1, t0 + 7 * m))
      // advance the watermark (past all + 1h delay) to finalize
      in.addData(ev(9, t0 + 1000 * m))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT n_events FROM ssw_merge WHERE user_id = 1")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(3L), s"expected one merged 3-event session, got $rows")
    } finally q.stop()
  }
}
