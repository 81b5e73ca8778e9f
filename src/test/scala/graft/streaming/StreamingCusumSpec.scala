package graft.streaming

import graft.SparkSpec
import graft.operators.EventSequences
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch ≡ streaming for the CUSUM drift monitor: after any micro-
  * batch split of an in-order stream, the per-event emissions must
  * equal [[EventSequences.cusumDrift]] over the same accumulated rows
  * row-for-row — statistic AND flag — including in-batch disorder,
  * which the state transition re-sorts by (ts, tie).
  */
class StreamingCusumSpec extends SparkSpec {

  private def batch(rows: Seq[StreamingCusum.Ev]): Map[Long, (Long, Boolean)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumnRenamed("tie", "event_id")
    EventSequences.cusumDrift(df, valueCol = "value")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
  }

  test("per-event cusum and flag equal the batch recursion across splits") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingCusum.Ev](s)
    val q = StreamingCusum.detect(in.toDS())
      .writeStream.format("memory").queryName("scusum1")
      .outputMode("update").start()
    try {
      // user 1 drifts upward mid-stream; user 2 stays flat
      val vals1 = Seq(10.0, 10.0, 30.0, 80.0, 90.0, 100.0)
      val b1 = vals1.take(3).zipWithIndex.map { case (v, i) =>
        StreamingCusum.Ev(1L, 1000L * (i + 1), (i + 1).toLong, v)
      } ++ Seq(StreamingCusum.Ev(2L, 500L, 50L, 5.0))
      val b2 = vals1.drop(3).zipWithIndex.map { case (v, i) =>
        StreamingCusum.Ev(1L, 1000L * (i + 4), (i + 4).toLong, v)
      } ++ Seq(StreamingCusum.Ev(2L, 600L, 51L, 5.0))
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      val got = s.sql("SELECT tie, cusum_fp, drift FROM scusum1").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      val expect = batch(b1 ++ b2)
      assert(got == expect)
      assert(got.values.exists(_._2), "the drift never fired")
      assert(!got(50L)._2 && !got(51L)._2, "flat user must not flag")
    } finally q.stop()
  }

  test("in-batch disorder is re-sorted; state carries exactly across batches") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingCusum.Ev](s)
    val q = StreamingCusum.detect(in.toDS())
      .writeStream.format("memory").queryName("scusum2")
      .outputMode("update").start()
    try {
      // batch 1 delivered out of order; batch 2 continues in order
      val b1 = Seq(
        StreamingCusum.Ev(7L, 3000L, 3L, 50.0),
        StreamingCusum.Ev(7L, 1000L, 1L, 10.0),
        StreamingCusum.Ev(7L, 2000L, 2L, 10.0))
      val b2 = Seq(StreamingCusum.Ev(7L, 4000L, 4L, 60.0))
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      val got = s.sql("SELECT tie, cusum_fp FROM scusum2").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = batch(b1 ++ b2).map { case (k, v) => k -> v._1 }
      assert(got == expect)
    } finally q.stop()
  }
}
