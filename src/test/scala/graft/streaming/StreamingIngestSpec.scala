package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

class StreamingIngestSpec extends SparkSpec {

  test("custom harvest source streams deterministic micro-batches") {
    val q = spark.readStream
      .format(classOf[HarvestSourceProvider].getName)
      .option("recordsPerBatch", "100")
      .option("maxRecords", "300")
      .load()
      .writeStream.format("memory").queryName("harvest_raw")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM harvest_raw").collect().head.getLong(0)
      assert(n == 300)
      val statuses = spark.sql(
        "SELECT status, count(*) FROM harvest_raw GROUP BY status")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(statuses("deleted") == 43) // i % 7 == 0 for i in [0, 300)
      assert(statuses("updated") == 257)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains everything available, not one page") {
    val q = spark.readStream
      .format(classOf[HarvestSourceProvider].getName)
      .option("recordsPerBatch", "100")
      .option("maxRecords", "350")
      .load()
      .writeStream.format("memory").queryName("harvest_availnow")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val n = spark.sql("SELECT count(*) FROM harvest_availnow")
        .collect().head.getLong(0)
      assert(n == 350) // allAvailable limit honored — not just recordsPerBatch
    } finally q.stop()
  }

  test("streaming upsert keeps latest-by-timestamp per key incl. tombstones") {
    val q = StreamingIngest.runToMemory(spark, "harvest_upsert",
      recordsPerBatch = 100, maxRecords = 500)
    try {
      q.processAllAvailable()
      // memory sink in Update mode appends each emission; resolve to the
      // final state per key exactly as a downstream MERGE would
      val finalState = StreamingIngest.latestByKeyBatch(
        spark.sql("SELECT * FROM harvest_upsert"))
      assert(finalState.count() == 250) // ids cycle mod 250
      // id "study_0" was written at i = 0 and i = 250: latest is i = 250
      val s0 = finalState.filter("study_id = 'study_0'").collect().head
      assert(s0.getAs[String]("title") == "Title of study_0 at 250")
      // i = 250 is not divisible by 7 → live; its delete at i = 0 superseded
      assert(s0.getAs[String]("status") == "updated")
      // a key whose LAST write is a delete stays tombstoned:
      // study_203 written at i = 203 and i = 453; 453 % 7 == (447+6)... check 203+250=453, 453/7=64.71 → not deleted; pick one:
      // i = 252 → id study_2, 252 % 7 == 0 → deleted at second write
      val s2 = finalState.filter("study_id = 'study_2'").collect().head
      assert(s2.getAs[String]("status") == "deleted")
      assert(s2.getAs[String]("title") == "Title of study_2 at 252")
    } finally q.stop()
  }

  test("idle keys are evicted from upsert state after the TTL") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def upd(id: String, t: Long) = StreamingIngest.StudyUpdate(
      id, "updated", new java.sql.Timestamp(t), "http://u", s"$id@$t")
    // ProcessingTimeTimeout makes the engine self-schedule batches to
    // advance the timeout clock, so processAllAvailable races the batch
    // storm — poll the sink instead of synchronizing on it. Under a
    // loaded JVM (full suite) the self-scheduled empty batches can
    // starve, so the poll also NUDGES the stream with an unrelated key:
    // every batch that processes data re-evaluates timed-out state.
    val in = MemoryStream[StreamingIngest.StudyUpdate](s)
    def eventually(what: String)(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 120000
      var i = 0
      while (!cond && System.currentTimeMillis < deadline) {
        Thread.sleep(100)
        i += 1
        if (i % 10 == 0) in.addData(upd("b", 2000L + i))
      }
      assert(cond, what)
    }
    val q = StreamingIngest.latestByKeyStreaming(in.toDS(),
        idleTimeout = Some("1 millisecond"))
      .writeStream.format("memory").queryName("upsert_ttl")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      def rowsForA = spark.sql(
        "SELECT title FROM upsert_ttl WHERE study_id = 'a'")
        .collect().map(_.getString(0)).toSeq
      in.addData(upd("a", 1000L))
      eventually("first emission for a")(rowsForA.count(_ == "a@1000") == 1)
      // the TTL lapses; the next self-scheduled batch evicts a and
      // re-emits its latest row once on the way out
      eventually("eviction re-emission")(rowsForA.count(_ == "a@1000") == 2)
      // state is gone: an OLDER update for a now resolves against nothing
      // and is emitted — the documented TTL trade-off (sink-side
      // compaction remains the authority)
      in.addData(upd("a", 500L))
      eventually("stale resurrect emission")(rowsForA.contains("a@500"))
    } finally q.stop()
  }

  test("event-time TTL evicts deterministically with the watermark — no polling") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def upd(id: String, t: Long) = StreamingIngest.StudyUpdate(
      id, "updated", new java.sql.Timestamp(t), "http://u", s"$id@$t")
    val t0 = 1000000L
    val in = MemoryStream[StreamingIngest.StudyUpdate](s)
    val q = StreamingIngest.latestByKeyStreamingEventTtl(
        in.toDS().withWatermark("updated", "0 seconds"),
        ttlMillis = 60000L) // TTL = 1 minute of EVENT time
      .writeStream.format("memory").queryName("upsert_event_ttl")
      .outputMode("update")
      .start()
    try {
      def rowsForA = spark.sql(
        "SELECT title FROM upsert_event_ttl WHERE study_id = 'a'")
        .collect().map(_.getString(0)).toSeq
      // batch 1: a arrives; watermark after the batch = t0
      in.addData(upd("a", t0))
      q.processAllAvailable()
      assert(rowsForA == Seq(s"a@$t0"))
      // batch 2: b at t0+5min advances the watermark past a's deadline;
      // the engine immediately runs the watermark-change follow-up batch
      // whose timeout sweep evicts a — all within processAllAvailable,
      // so the re-emission is visible synchronously, exactly once
      in.addData(upd("b", t0 + 300000L))
      q.processAllAvailable()
      assert(rowsForA == Seq(s"a@$t0", s"a@$t0"), "eviction re-emission")
      // further data does NOT re-evict (state is gone, nothing re-emits)
      in.addData(upd("c", t0 + 300001L))
      q.processAllAvailable()
      assert(rowsForA == Seq(s"a@$t0", s"a@$t0"), "no repeat emission")
    } finally q.stop()
  }

  test("batch latest-by-key matches streaming resolution") {
    val s = spark
    import s.implicits._
    val batch = s.createDataset((0L until 500L).map { i =>
      val (id, status, us, url, t) = HarvestSource.record(i)
      StreamingIngest.StudyUpdate(id, status,
        new java.sql.Timestamp(us / 1000), url, t)
    }).toDF()
    val resolved = StreamingIngest.latestByKeyBatch(batch)
    assert(resolved.count() == 250)
    assert(resolved.filter("status = 'deleted'").count() ==
      (250L until 500L).count(i => i % 7 == 0))
  }

  test("streaming exact dedup suppresses duplicate content within the watermark") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(java.sql.Timestamp, String)](s)
    val q = graft.operators.Dedup.streamingExact(
        in.toDF().toDF("ts", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append")
      .start()
    try {
      def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
      in.addData((ts(0), "aa bb"), (ts(1), "aa bb"), (ts(1), "cc dd"))
      q.processAllAvailable()
      // duplicate across batches, still within the 10-minute horizon
      in.addData((ts(2), "aa bb"), (ts(3), "ee ff"))
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM stream_dedup")
        .collect().map(_.getString(0)).toSeq.sorted
      assert(texts == Seq("aa bb", "cc dd", "ee ff"))
    } finally q.stop()
  }

  test("windowed harvest counts with watermark run in streaming mode") {
    val stream = StreamingIngest.harvestStream(spark,
      recordsPerBatch = 120, maxRecords = 240)
    val q = StreamingIngest.windowedHarvestCounts(stream)
      .writeStream.format("memory").queryName("harvest_windows")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // append mode only emits FINALIZED windows (watermark passed); with
      // 240 one-second-spaced records = 4 minutes of event time and a
      // 10-minute watermark, only windows the final watermark passed — at
      // least assert the query ran and produced a valid schema
      val cols = spark.sql("SELECT * FROM harvest_windows").columns.toSeq
      assert(cols == Seq("window_start", "base_url", "harvested"))
    } finally q.stop()
  }
}
