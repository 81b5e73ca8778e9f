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
}
