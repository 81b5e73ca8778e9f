package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of
  * [[graft.operators.Profiling.histogramQuantiles]]: per key, an
  * equi-width histogram over a FIXED integer domain, re-emitted with
  * its quantile edges whenever a micro-batch touches the key — the
  * online latency/size-distribution monitor ("p99 doc length per
  * source, updated as the crawl lands").
  *
  * The batch operator derives min/max from the data; a stream cannot
  * (state would depend on arrival order relative to emissions), so
  * the streaming contract pins the domain [lo, hi] up front — the
  * standard monitoring setup — and clamps outliers into the edge
  * bins. State per key is the bins-long count array and NOTHING else:
  * O(bins) regardless of stream length, merges by addition, exactly
  * the mergeable-sketch property the batch doc promises. On any
  * prefix of the stream the emitted cumulative counts equal the batch
  * histogram of the same rows over the same pinned domain
  * (StreamingHistogramSpec locks the equivalence).
  */
object StreamingHistogram {

  final case class Obs(key: String, value: Long)

  /** Keyed state: per-bin counts. Public for the state encoder. */
  final case class HistState(counts: Array[Long])

  final case class QuantRow(
      key: String, p: Long, bin: Long, lo_edge: Long, cum_count: Long)

  /** Per-key streaming quantiles over the pinned domain [lo, hi]
    * with `bins` equal widths (width = (hi−lo) div bins + 1, the
    * batch operator's exact contract on the same bounds).
    */
  def quantiles(
      obs: Dataset[Obs], lo: Long, hi: Long, bins: Int = 64,
      percentiles: Seq[Int] = Seq(50, 99)): Dataset[QuantRow] = {
    require(hi > lo && bins >= 2 && percentiles.nonEmpty)
    val width = (hi - lo) / bins + 1
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], state: GroupState[HistState]) =>
          val counts = state.getOption.map(_.counts)
            .getOrElse(Array.fill(bins)(0L))
          it.foreach { o =>
            val clamped = math.min(math.max(o.value, lo), hi)
            counts(((clamped - lo) / width).toInt) += 1L
          }
          state.update(HistState(counts))
          val cum = counts.scanLeft(0L)(_ + _).tail
          val n = cum.last
          Iterator.tabulate(percentiles.size) { i =>
            val p = percentiles(i)
            val bin = cum.indexWhere(c => c * 100 >= n * p)
            QuantRow(key, p.toLong, bin.toLong, lo + bin * width, cum(bin))
          }
      }
  }

  /** Batch replay of the same pinned-domain contract (for the
    * equivalence spec and for backfills): identical bin assignment,
    * cumulative counts, and first-bin-reaching-ceil(p·N/100) pick.
    */
  def batchQuantiles(
      df: DataFrame, keyCol: String, valueCol: String, lo: Long, hi: Long,
      bins: Int = 64, percentiles: Seq[Int] = Seq(50, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(hi > lo && bins >= 2 && percentiles.nonEmpty)
    val width = (hi - lo) / bins + 1
    val binned = df
      .select(col(keyCol).cast("string").as("key"),
        least(greatest(col(valueCol).cast("long"), lit(lo)), lit(hi))
          .as("_v"))
      // exact Long division (`div`), matching the streaming side's
      // `(clamped - lo) / width` Long arithmetic — a double division
      // with a truncating cast can disagree by one bin for domains
      // wider than ~2^53 and break the batch ≡ streaming contract
      // (the clamped value is >= lo, so truncation == floor here)
      .select(col("key"), expr(s"(_v - ${lo}L) div ${width}L").as("bin"))
      .groupBy(col("key"), col("bin")).agg(count(lit(1)).as("_n"))
    val cum = binned.withColumn("cum_count",
        sum(col("_n")).over(Window.partitionBy(col("key"))
          .orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_N",
        sum(col("_n")).over(Window.partitionBy(col("key"))))
    val ps = percentiles.map(p =>
      cum.filter(col("cum_count") * 100 >= col("_N") * p)
        .groupBy(col("key"))
        .agg(min(col("bin")).as("bin"))
        .join(cum, Seq("key", "bin"))
        .select(col("key"), lit(p.toLong).as("p"), col("bin"),
          (lit(lo) + col("bin") * width).as("lo_edge"), col("cum_count")))
    ps.reduce(_ unionByName _)
  }
}
