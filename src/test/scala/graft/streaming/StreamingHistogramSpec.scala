package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch ≡ streaming for the pinned-domain histogram quantiles:
  * after any micro-batch sequence, each key's latest emitted rows
  * equal the batch replay over the accumulated rows — including
  * out-of-domain values, which both faces clamp into the edge bins.
  */
class StreamingHistogramSpec extends SparkSpec {

  test("streaming quantiles equal the batch replay after two batches") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingHistogram.Obs](s)
    val q = StreamingHistogram.quantiles(in.toDS(), lo = 0L, hi = 999L,
        bins = 10, percentiles = Seq(50, 99))
      .writeStream.format("memory").queryName("shist1")
      .outputMode("update").start()
    try {
      val b1 = (1L to 500L).map(v => StreamingHistogram.Obs("a", v))
      val b2 = (501L to 1000L).map(v => StreamingHistogram.Obs("a", v)) ++
        Seq(StreamingHistogram.Obs("b", -5L), // clamps to bin 0
          StreamingHistogram.Obs("b", 5000L)) // clamps to the top bin
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      // update-mode memory sink appends; latest per (key, p) = max cum
      val streamed = s.sql("SELECT key, p, bin, lo_edge, cum_count FROM shist1")
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._3) }
      val batch = StreamingHistogram.batchQuantiles(
          (b1 ++ b2).toDF(), "key", "value", lo = 0L, hi = 999L,
          bins = 10, percentiles = Seq(50, 99))
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(streamed.size == batch.size)
      batch.foreach { case (k, v) =>
        assert(streamed(k) == v, s"key/p $k: streaming ${streamed(k)} vs batch $v")
      }
    } finally q.stop()
  }

  test("state stays O(bins): one histogram row group per key") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[StreamingHistogram.Obs](s)
    val q = StreamingHistogram.quantiles(in.toDS(), lo = 0L, hi = 99L,
        bins = 4, percentiles = Seq(50))
      .writeStream.format("memory").queryName("shist2")
      .outputMode("update").start()
    try {
      (1 to 5).foreach { round =>
        in.addData((1L to 200L).map(v =>
          StreamingHistogram.Obs(s"k${v % 3}", v)): _*)
        q.processAllAvailable()
      }
      val progress = q.lastProgress
      val stateRows = progress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 3L, s"state rows: $stateRows (one per key)")
    } finally q.stop()
  }

  test("batch bins are exact Long division beyond 2^53 (streaming parity)") {
    val s = spark
    import s.implicits._
    // domain [0, 2^60): width = 2^54. v = 37·2^54 − 1 belongs in bin 36,
    // but v.toDouble rounds UP to 37·2^54 (double spacing is 2048 at
    // this magnitude), so a double division + truncating cast yields 37
    // — the one-off-bin drift the exact `div` arithmetic must not have
    val hi = (1L << 60) - 1
    val width = hi / 64 + 1 // = 2^54, the operator's own width formula
    val v = 37L * width - 1
    val batch = StreamingHistogram.batchQuantiles(
        Seq(("a", v)).toDF("key", "value"), "key", "value",
        lo = 0L, hi = hi, bins = 64, percentiles = Seq(50))
      .collect()(0)
    assert(batch.getLong(2) == 36L, s"bin drifted: $batch")
    assert(batch.getLong(3) == 36L * width) // lo_edge from the same bin
    // and the streaming side's Long arithmetic agrees by construction
    assert((v - 0L) / width == 36L)
  }
}
