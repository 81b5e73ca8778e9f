package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// top-level: an inner case class defeats encoder codegen (outer-pointer
// constructor), falling back to interpreted projections
case class StreamingJoinEv(user_id: Long, ts: Timestamp)

class StreamingJoinSpec extends SparkSpec {

  private type Ev = StreamingJoinEv
  private def Ev(u: Long, ts: Timestamp) = StreamingJoinEv(u, ts)

  private def rows(name: String): Seq[(Long, Long, Option[Long])] =
    spark.sql(s"SELECT key, left_ts, right_ts FROM $name")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.getTimestamp(2)).map(_.getTime)))
      .toSeq.sortBy(x => (x._1, x._2, x._3.getOrElse(0L)))

  test("inner interval join matches only clicks inside the window") {
    val s = spark
    import s.implicits._
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    val q = StreamingJoin.intervalJoin(
        views.toDF(), clicks.toDF(), "user_id", "ts", "ts", within = "10 minutes")
      .writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      val t0 = 1000000L
      views.addData(Ev(1, new Timestamp(t0)), Ev(2, new Timestamp(t0)))
      // u1 clicks in-window; u2 clicks too late; u3 clicks with no view
      clicks.addData(Ev(1, new Timestamp(t0 + 60000)),
        Ev(2, new Timestamp(t0 + 601000)),
        Ev(3, new Timestamp(t0 + 1000)))
      q.processAllAvailable()
      assert(rows("ssj_inner") == Seq((1L, t0, Some(t0 + 60000))))
      // a second in-window click for u1 joins too (all matches, not first)
      clicks.addData(Ev(1, new Timestamp(t0 + 120000)))
      q.processAllAvailable()
      assert(rows("ssj_inner") ==
        Seq((1L, t0, Some(t0 + 60000)), (1L, t0, Some(t0 + 120000))))
    } finally q.stop()
  }

  test("batch and streaming interval joins agree on shared input") {
    val s = spark
    import s.implicits._
    // deterministic corpus: 40 views, clicks at varying lags (some
    // in-window, some past it, some with no view)
    val t0 = 1000000L
    val views = (1L to 40L).map(u => Ev(u, new Timestamp(t0 + u * 1000)))
    val clicks = (1L to 50L).map { u =>
      Ev(u, new Timestamp(t0 + u * 1000 + (u % 13) * 90000))
    }
    // BATCH path: withWatermark is a no-op on batch frames, so the
    // exact operator code runs as a plain range-predicate join
    val batch = StreamingJoin.intervalJoin(
        views.toDF("user_id", "ts"), clicks.toDF("user_id", "ts"),
        "user_id", "ts", "ts", within = "10 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.getTimestamp(2)).map(_.getTime)))
      .toSeq.sortBy(x => (x._1, x._2, x._3.getOrElse(0L)))
    val vs = MemoryStream[Ev](s)
    val cs = MemoryStream[Ev](s)
    val q = StreamingJoin.intervalJoin(
        vs.toDF(), cs.toDF(), "user_id", "ts", "ts", within = "10 minutes")
      .writeStream.format("memory").queryName("ssj_batch_eq")
      .outputMode("append").start()
    try {
      vs.addData(views)
      cs.addData(clicks)
      q.processAllAvailable()
      assert(batch.nonEmpty)
      assert(rows("ssj_batch_eq") == batch)
    } finally q.stop()
  }

  test("left-outer emits unmatched views once the watermark passes the window") {
    val s = spark
    import s.implicits._
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    val q = StreamingJoin.intervalJoin(
        views.toDF(), clicks.toDF(), "user_id", "ts", "ts",
        within = "10 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      val t0 = 1000000L
      views.addData(Ev(1, new Timestamp(t0)), Ev(2, new Timestamp(t0)))
      clicks.addData(Ev(1, new Timestamp(t0 + 5000)))
      q.processAllAvailable()
      assert(rows("ssj_outer") == Seq((1L, t0, Some(t0 + 5000))))
      // advance both watermarks far past u2's window -> null-padded row
      views.addData(Ev(9, new Timestamp(t0 + 3600000)))
      clicks.addData(Ev(9, new Timestamp(t0 + 3600000)))
      q.processAllAvailable()
      // one more batch so the outer-side eviction lands in the sink
      views.addData(Ev(10, new Timestamp(t0 + 7200000)))
      clicks.addData(Ev(10, new Timestamp(t0 + 7200000)))
      q.processAllAvailable()
      val got = rows("ssj_outer")
      assert(got.contains((2L, t0, None)), s"expected unmatched view row, got $got")
    } finally q.stop()
  }
}
