package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingFunnelSpec extends SparkSpec {

  private val stages = Seq("view", "click", "purchase")

  private def ev(u: Long, ms: Long, t: String) =
    StreamingFunnel.FunnelEvent(u, new Timestamp(ms), t)

  private def start(name: String, withinMs: Long = 3600000L) = {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingFunnel.FunnelEvent](s)
    val q = StreamingFunnel.stageHits(
        in.toDS().withWatermark("ts", "0 seconds"), stages, withinMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .start()
    (in, q)
  }

  private def hits(name: String): Seq[(Long, Int, Long)] =
    spark.sql(s"SELECT user_id, stage, ts FROM $name ORDER BY user_id, stage")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2).getTime))
      .toSeq

  test("in-order events advance the funnel; completion emits all hits") {
    val t0 = 1000000L
    val (in, q) = start("sf_inorder")
    try {
      in.addData(ev(1, t0, "view"), ev(1, t0 + 1000, "click"))
      q.processAllAvailable()
      assert(hits("sf_inorder") == Seq((1L, 1, t0), (1L, 2, t0 + 1000)))
      in.addData(ev(1, t0 + 2000, "purchase"))
      q.processAllAvailable()
      assert(hits("sf_inorder") ==
        Seq((1L, 1, t0), (1L, 2, t0 + 1000), (1L, 3, t0 + 2000)))
    } finally q.stop()
  }

  test("in-batch disorder is sorted; pre-view clicks don't count") {
    val t0 = 1000000L
    val (in, q) = start("sf_disorder")
    try {
      // arrival order scrambled within the batch; the click BEFORE the
      // view must not advance, the one after must
      in.addData(ev(1, t0 + 5000, "click"), ev(1, t0, "click"),
        ev(1, t0 + 1000, "view"))
      q.processAllAvailable()
      assert(hits("sf_disorder") == Seq((1L, 1, t0 + 1000), (1L, 2, t0 + 5000)))
    } finally q.stop()
  }

  test("stage must land inside the per-hop window") {
    val t0 = 1000000L
    val (in, q) = start("sf_window", withinMs = 1000L)
    try {
      in.addData(ev(1, t0, "view"), ev(1, t0 + 2000, "click"))
      q.processAllAvailable()
      // click 2 s after view, window 1 s → no stage-2 hit
      assert(hits("sf_window") == Seq((1L, 1, t0)))
    } finally q.stop()
  }

  test("completed users hold no state: extra purchases emit nothing") {
    val t0 = 1000000L
    val (in, q) = start("sf_done")
    try {
      in.addData(ev(1, t0, "view"), ev(1, t0 + 1, "click"),
        ev(1, t0 + 2, "purchase"))
      q.processAllAvailable()
      in.addData(ev(1, t0 + 3000, "purchase"), ev(1, t0 + 4000, "click"))
      q.processAllAvailable()
      assert(hits("sf_done").map(_._2) == Seq(1, 2, 3))
    } finally q.stop()
  }

  test("watermark expiry evicts mid-funnel state; next view restarts") {
    val t0 = 1000000L
    val (in, q) = start("sf_expire", withinMs = 60000L)
    try {
      in.addData(ev(1, t0, "view"))
      q.processAllAvailable()
      // another user far in the future pushes the watermark past
      // t0+window → user 1's state evicts inside processAllAvailable
      in.addData(ev(99, t0 + 10000000L, "view"))
      q.processAllAvailable()
      // user 1 restarts: a fresh view (inside the new watermark) emits
      // a NEW stage-1 hit; their old funnel never advances
      in.addData(ev(1, t0 + 10000001L, "view"),
        ev(1, t0 + 10002000L, "click"))
      q.processAllAvailable()
      val got = hits("sf_expire").filter(_._1 == 1L)
      assert(got == Seq((1L, 1, t0), (1L, 1, t0 + 10000001L),
        (1L, 2, t0 + 10002000L)))
    } finally q.stop()
  }

  test("streaming hits equal the batch funnel on in-order data") {
    val s = spark
    import s.implicits._
    val t0 = 1000000L
    val data = Seq(
      ev(1, t0, "view"), ev(1, t0 + 1000, "click"), ev(1, t0 + 2000, "purchase"),
      ev(2, t0, "view"), ev(2, t0 + 1000, "purchase"), // skips click
      ev(3, t0 + 500, "click"), ev(3, t0 + 600, "view"), ev(3, t0 + 700, "click"))
    val (in, q) = start("sf_batch_eq")
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      val streamed = hits("sf_batch_eq")
        .map { case (u, st, ts) => (u, st) -> ts }.toMap
      val batch = graft.operators.Funnel.stages(
          data.toDF(), "user_id", "ts", "event_type", stages, 3600L)
        .collect().flatMap { r =>
          (1 to 3).flatMap { i =>
            Option(r.getTimestamp(i)).map(ts => (r.getLong(0), i) -> ts.getTime)
          }
        }.toMap
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
