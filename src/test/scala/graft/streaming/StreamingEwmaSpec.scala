package graft.streaming

import graft.SparkSpec
import graft.operators.EventSequences
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch ≡ streaming for the last-k EWMA level: after any sequence of
  * micro-batches, each key's LATEST emitted level must equal the
  * batch operator run over the same accumulated rows — including
  * in-batch disorder and late arrivals, which the bounded buffer
  * re-sorts by (ts, tie).
  */
class StreamingEwmaSpec extends SparkSpec {

  private def batchLevels(rows: Seq[StreamingEwma.Ev]): Map[Long, (Long, Double)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
    EventSequences.ewmaLast(df, "user_id", "ts", "tie", "value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
  }

  test("streaming level equals batch ewmaLast on the same rows") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingEwma.Ev](s)
    val q = StreamingEwma.levels(in.toDS())
      .writeStream.format("memory").queryName("sewma1")
      .outputMode("update").start()
    try {
      val b1 = (1 to 15).map(i =>
        StreamingEwma.Ev(1L, 1000L * i, i.toLong, i * 1.5))
      val b2 = (16 to 30).map(i =>
        StreamingEwma.Ev(1L, 1000L * i, i.toLong, i * 1.5)) ++
        Seq(StreamingEwma.Ev(2L, 500L, 1L, 42.0))
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      // memory sink in update mode appends each emission; take the
      // last row per user (max n_used is the latest for user 1)
      val rows = s.sql(
          "SELECT user_id, n_used, ewma FROM sewma1").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val latest1 = rows.filter(_._1 == 1L).maxBy(_._2)
      val latest2 = rows.filter(_._1 == 2L).maxBy(_._2)
      val expect = batchLevels(b1 ++ b2)
      assert(latest1._2.toLong == expect(1L)._1)
      assert(math.abs(latest1._3 - expect(1L)._2) < 5e-7)
      assert(latest2._2.toLong == expect(2L)._1)
      assert(math.abs(latest2._3 - expect(2L)._2) < 5e-7)
    } finally q.stop()
  }

  test("late and disordered arrivals: buffer re-sorts, level matches batch") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingEwma.Ev](s)
    val q = StreamingEwma.levels(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("sewma2")
      .outputMode("update").start()
    try {
      // batch 1 delivers the NEWEST event first; batch 2 delivers an
      // older event that must displace nothing but re-rank the buffer
      in.addData(StreamingEwma.Ev(7L, 5000L, 3L, 10.0),
        StreamingEwma.Ev(7L, 1000L, 1L, 99.0))
      q.processAllAvailable()
      in.addData(StreamingEwma.Ev(7L, 3000L, 2L, 50.0))
      q.processAllAvailable()
      val last = s.sql("SELECT n_used, ewma FROM sewma2").collect()
        .map(r => (r.getInt(0), r.getDouble(1))).maxBy(_._1)
      val expect = batchLevels(Seq(
        StreamingEwma.Ev(7L, 5000L, 3L, 10.0),
        StreamingEwma.Ev(7L, 1000L, 1L, 99.0),
        StreamingEwma.Ev(7L, 3000L, 2L, 50.0)))
      // k=3 for the stream; batch default k=20 uses all 3 rows too
      assert(last._1.toLong == expect(7L)._1)
      assert(math.abs(last._2 - expect(7L)._2) < 5e-7)
    } finally q.stop()
  }

  test("state is bounded at k entries per key") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingEwma.Ev](s)
    val q = StreamingEwma.levels(in.toDS(), k = 5)
      .writeStream.format("memory").queryName("sewma3")
      .outputMode("update").start()
    try {
      in.addData((1 to 100).map(i =>
        StreamingEwma.Ev(1L, 1000L * i, i.toLong, 1.0)): _*)
      q.processAllAvailable()
      val last = s.sql("SELECT n_used FROM sewma3").collect()
        .map(_.getInt(0)).max
      assert(last == 5)   // never more than k rows of state used
    } finally q.stop()
  }
}
