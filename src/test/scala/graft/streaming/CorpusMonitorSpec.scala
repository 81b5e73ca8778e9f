package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusMonitorSpec extends SparkSpec {

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val rows = Seq(
    // window 10:00: two english docs (one low quality), one german
    (ts(1), "the quick brown fox jumps over the lazy dog and runs on"),
    (ts(2), "!!! ??? ... !!!"),
    (ts(3), "der hund und die katze sind im haus mit dem mann"),
    // window 10:30: one english doc
    (ts(31), "a tale of two cities was published in the year with many pages"))

  test("streaming windows emit per-language quality aggregates") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(java.sql.Timestamp, String)](s)
    val q = CorpusMonitor.qualityByWindow(
        in.toDF.toDF("ts", "text"), "ts", "text",
        windowDuration = "30 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("corpus_monitor")
      .outputMode("complete").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("corpus_monitor")
        .orderBy("window_start", "lang_pred")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      // 10:00 window: en + de + und (the junk doc); 10:30 window: en
      assert(got.length == 4)
      assert(got.count(_._1 == ts(0)) == 3)
      assert(got.count(_._1 == ts(30)) == 1)
      val en1000 = spark.table("corpus_monitor")
        .filter(col("lang_pred") === "en" &&
          col("window_start") === ts(0)).collect().head
      assert(en1000.getLong(2) >= 1) // at least the good english doc
    } finally q.stop()
  }

  test("batch and streaming produce identical aggregates") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batch = CorpusMonitor.qualityByWindow(
        rows.toDF("ts", "text"), "ts", "text", windowDuration = "30 minutes")
      .orderBy("window_start", "lang_pred")
      .collect().map(_.toSeq).toSeq
    val in = MemoryStream[(java.sql.Timestamp, String)](s)
    val q = CorpusMonitor.qualityByWindow(
        in.toDF.toDF("ts", "text"), "ts", "text",
        windowDuration = "30 minutes")
      .writeStream.format("memory").queryName("corpus_monitor_b")
      .outputMode("complete").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("corpus_monitor_b")
        .orderBy("window_start", "lang_pred")
        .collect().map(_.toSeq).toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("blocklist monitor: streaming windows emit hit stats under a watermark") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pats = Seq("spam", "junk")
    val docs = Seq(
      (1L, ts(1), "clean text here"),
      (2L, ts(2), "spam spam and more junk"),   // 3 hits, flagged
      (3L, ts(31), "junk only"),                // next window, 1 hit
      (4L, ts(32), "nothing bad"))
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](s)
    val q = CorpusMonitor.blocklistByWindow(
        in.toDF.toDF("doc_id", "ts", "text"), "ts", "text", "doc_id", pats,
        windowDuration = "30 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("blocklist_monitor")
      .outputMode("complete").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("blocklist_monitor")
        .orderBy("window_start").collect()
      assert(got.length == 2)
      val w1 = got(0)
      assert(w1.getAs[Long]("n_docs") == 2 &&
        w1.getAs[Long]("n_flagged") == 1 &&
        w1.getAs[Long]("total_hits") == 3 &&
        w1.getAs[Long]("max_hits") == 3)
      assert(w1.getAs[Double]("flagged_share") == 0.5)
      val w2 = got(1)
      assert(w2.getAs[Long]("n_docs") == 2 &&
        w2.getAs[Long]("n_flagged") == 1 &&
        w2.getAs[Long]("total_hits") == 1)
    } finally q.stop()
  }

  test("blocklist monitor: batch and streaming produce identical windows") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pats = Seq("the", "und")
    val docs = rows.zipWithIndex.map { case ((t, text), i) => (i.toLong, t, text) }
    val batch = CorpusMonitor.blocklistByWindow(
        docs.toDF("doc_id", "ts", "text"), "ts", "text", "doc_id", pats,
        windowDuration = "30 minutes")
      .orderBy("window_start").collect().map(_.toSeq).toSeq
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](s)
    val q = CorpusMonitor.blocklistByWindow(
        in.toDF.toDF("doc_id", "ts", "text"), "ts", "text", "doc_id", pats,
        windowDuration = "30 minutes")
      .writeStream.format("memory").queryName("blocklist_monitor_b")
      .outputMode("complete").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table("blocklist_monitor_b")
        .orderBy("window_start").collect().map(_.toSeq).toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("low-quality share flags a bad batch inside its window") {
    val s = spark
    import s.implicits._
    val junk = Seq(
      (ts(1), "!!! ??? ..."), (ts(2), "%%% &&& ***"), (ts(3), "@@@ ###"))
    val out = CorpusMonitor.qualityByWindow(
        junk.toDF("ts", "text"), "ts", "text", windowDuration = "30 minutes")
      .collect()
    assert(out.forall(_.getAs[Double]("low_quality_share") == 1.0))
  }

  test("windowed digest: batch and streaming agree, and match merkleDigest per window") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Seq(
      (ts(1), 1L, "alpha body"), (ts(2), 2L, "beta body"),
      (ts(31), 3L, "gamma body"), (ts(32), 4L, "delta body"))
    val batch = CorpusMonitor.digestByWindow(
        docs.toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
        nBuckets = 4, windowDuration = "30 minutes")
      .orderBy("window_start", "bucket")
      .collect().map(_.toSeq).toSeq
    // each window's digests equal the plain batch digest of its docs
    val w1 = graft.operators.DataProfile.merkleDigest(
        docs.take(2).map(d => (d._2, d._3)).toDF("doc_id", "text"),
        "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    batch.filter(_.head == ts(0)).foreach { row =>
      assert(w1(row(1).asInstanceOf[Long]) == row(3).asInstanceOf[String])
    }
    val in = MemoryStream[(java.sql.Timestamp, Long, String)](s)
    val q = CorpusMonitor.digestByWindow(
        in.toDF.toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
        nBuckets = 4, windowDuration = "30 minutes")
      .writeStream.format("memory").queryName("digest_monitor")
      .outputMode("complete").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table("digest_monitor")
        .orderBy("window_start", "bucket")
        .collect().map(_.toSeq).toSeq
      assert(stream == batch)
    } finally q.stop()
  }
}
