package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live ingest-quality monitoring — the streaming face of the corpus
  * profile (`pipeline_profile`): as documents arrive, per event-time
  * window and predicted language, report volume and quality so a
  * pipeline operator sees a bad crawl batch (wrong language mix,
  * quality collapse, token-length drift) within one window delay
  * instead of at the next offline profile run.
  *
  * All metrics are codegen'd column expressions over the stream — the
  * aggregation state per (window, language) is a handful of sums, and
  * the watermark bounds it: closed windows are emitted and dropped.
  * Works identically on a batch frame (the spec asserts batch ≡
  * streaming results), so backfills reuse the same code.
  */
object CorpusMonitor {

  /** Per (tumbling event-time window, predicted language): doc count,
    * mean/max token count, mean quality, low-quality share (< 0.5).
    *
    * Means are computed from partition-order-INDEPENDENT sums (exact
    * integer sums for token/flag counts, a DECIMAL(18,6) sum for the
    * 6-dp quality score) so the batch path hash-matches a DuckDB
    * oracle and batch ≡ streaming holds bit for bit — plain
    * `avg(double)` accumulates in partition order and flips last bits
    * across runs.
    */
  def qualityByWindow(
      docs: DataFrame, tsCol: String, textCol: String,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val enriched = docs
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
    val withMark =
      if (enriched.isStreaming) enriched.withWatermark(tsCol, watermarkDelay)
      else enriched
    val n = count(lit(1))
    withMark
      .groupBy(window(col(tsCol), windowDuration), col("lang_pred"))
      .agg(
        n.as("n_docs"),
        round(sum(col("n_tokens")).cast("double") / n, 6).as("avg_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        round(sum(col("quality").cast("decimal(18,6)")).cast("double") / n, 6)
          .as("avg_quality"),
        round(sum(when(col("quality") < 0.5, 1L).otherwise(0L))
          .cast("double") / n, 6).as("low_quality_share"))
      .select(
        col("window.start").as("window_start"),
        col("lang_pred"), col("n_docs"), col("avg_tokens"),
        col("max_tokens"), col("avg_quality"), col("low_quality_share"))
  }

  /** The safety face of the monitor: per tumbling event-time window,
    * blocklist-hit statistics from ONE broadcast-automaton pass
    * ([[graft.operators.Blocklist.flagMatchesWithTs]]) — doc count,
    * flagged docs (≥1 pattern present), flagged share, total and max
    * occurrence counts. The kernel is stateless and scan-local, so the
    * identical code runs on a stream under a watermark (state per
    * window is five sums, dropped when the watermark closes it); batch
    * ≡ streaming is spec-asserted and the batch face sits under the
    * DuckDB oracle (events_blocklist_monitor), composed there with
    * [[graft.operators.EventSequences.zscoreAnomalies]] to flag
    * hit-volume outlier windows — the "a spam burst landed in this
    * hour" alert.
    *
    * The share is computed from exact integer sums in one fixed double
    * association (the [[qualityByWindow]] discipline), so cross-engine
    * hashes match.
    */
  def blocklistByWindow(
      docs: DataFrame, tsCol: String, textCol: String, idCol: String,
      patterns: Seq[String], windowDuration: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val flagged = graft.operators.Blocklist.flagMatchesWithTs(
      docs, textCol, idCol, tsCol, patterns)
    val withMark =
      if (flagged.isStreaming) flagged.withWatermark(tsCol, watermarkDelay)
      else flagged
    val n = count(lit(1))
    val nFlagged = sum(when(col("n_patterns") > 0, 1L).otherwise(0L))
    withMark
      .groupBy(window(col(tsCol), windowDuration))
      .agg(
        n.as("n_docs"),
        nFlagged.as("n_flagged"),
        round(nFlagged.cast("double") / n, 6).as("flagged_share"),
        sum(col("n_hits")).as("total_hits"),
        max(col("n_hits")).as("max_hits"))
      .select(
        col("window.start").as("window_start"),
        col("n_docs"), col("n_flagged"), col("flagged_share"),
        col("total_hits"), col("max_hits"))
  }

  /** The versioning face of the monitor: per tumbling event-time
    * window and digest bucket, the same order-independent md5-contract
    * digest as [[graft.operators.DataProfile.merkleDigest]] — so an
    * ingest stream continuously emits the per-window dataset
    * fingerprints a downstream consumer compares against its own copy
    * (did yesterday's partition change under me?). The accumulators
    * are commutative integer/decimal sums, so streaming state per
    * (window, bucket) is three values and batch ≡ streaming holds bit
    * for bit; the batch face sits under the DuckDB oracle
    * (`io_merkle_window`).
    */
  def digestByWindow(
      docs: DataFrame, tsCol: String, idCol: String, contentCol: String,
      nBuckets: Int, windowDuration: String = "1 day",
      watermarkDelay: String = "1 day"): DataFrame = {
    import graft.operators.DataProfile
    val withMark =
      if (docs.isStreaming) docs.withWatermark(tsCol, watermarkDelay)
      else docs
    withMark
      .select(col(tsCol),
        DataProfile.digestBucket(idCol, nBuckets).as("bucket"),
        DataProfile.digestSlice(idCol, contentCol, 1).as("_h1"),
        DataProfile.digestSlice(idCol, contentCol, 16).as("_h2"))
      .groupBy(window(col(tsCol), windowDuration), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_h1")).as("_s1"), sum(col("_h2")).as("_s2"))
      .select(col("window.start").as("window_start"), col("bucket"),
        col("n_rows"), DataProfile.digestHex.as("digest"))
  }
}
