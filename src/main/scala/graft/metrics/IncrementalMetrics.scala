package graft.metrics

import graft.schema.RecordStatus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The /metrics gauges (A1/A2/A4 — `records_total`,
  * `records_total_without_deleted`, per-publisher counts) maintained
  * INCREMENTALLY from a [[graft.sources.TxTable]] typed change feed,
  * instead of recounted from the corpus per scrape.
  *
  * [[MetricsJob.run]] is one hash aggregate — already the right shape
  * for a scrape — but at 100 TB "one aggregate" still reads the whole
  * table, and /metrics is polled continuously while harvests land.
  * The counts are pure sums of per-row ±1 contributions, so they fold
  * from row-level change events exactly:
  *
  *  - `insert` / `update_postimage` rows contribute +1 to their
  *    publisher (and +1 live when status ≠ deleted);
  *  - `delete` / `update_preimage` rows contribute −1 symmetrically —
  *    an update thus MOVES its contribution atomically when the
  *    publisher or status changed (and cancels to zero when not).
  *
  * Each applied batch costs one aggregate over the BATCH (KB for a
  * harvest upsert), never the corpus; the state is publisher-bounded
  * — the same size class [[MetricsJob.run]] already collects. Counts
  * are exact integers, the fold is commutative addition, and
  * [[bootstrap]] re-anchors after a feed gap (e.g. a
  * [[graft.sources.TxTable.VacuumedVersionException]]).
  *
  * Reference contrast: `cdcagg_oai/metrics.py:148-201` recounts with
  * 2 + 2·N queries per scrape; the batch-fold here is the design that
  * serves the same gauges with work proportional to CHANGE volume.
  */
object IncrementalMetrics {

  /** Per-publisher (records, recordsWithoutDeleted); `None` keys a
    * null publisher (counted in totals, dropped from named gauges —
    * [[MetricsJob.run]]'s convention).
    */
  final case class CountsState(counts: Map[Option[String], (Long, Long)]) {
    def toAggMetrics: AggMetrics = {
      val total = counts.values.map(_._1).sum
      val live = counts.values.map(_._2).sum
      val named = counts.collect {
        case (Some(u), (n, l)) if n > 0 => PublisherCounts(u, n, l)
      }.toSeq.sortBy(_.baseUrl)
      AggMetrics(total, live, named.size.toLong, named)
    }
  }

  // MetricsJob.run's liveness rule exactly: a null status is NOT live
  // (the `when` condition is null, so the row is not counted)
  private def liveCond = col("_metadata.status") =!= RecordStatus.Deleted

  /** Exact counts at one snapshot — the anchor a consumer folds
    * subsequent change batches into.
    */
  def bootstrap(studies: DataFrame): CountsState = CountsState(
    studies.groupBy(col("_direct_base_url").as("pub"))
      .agg(count(lit(1)).as("n"), count(when(liveCond, 1)).as("l"))
      .collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2))))
      .toMap)

  /** Fold one typed change batch (the
    * [[graft.sources.TxTable.readChangesTyped]] shape) into the
    * state: one aggregate over the batch, a publisher-bounded driver
    * fold, zero corpus reads.
    */
  def applyTyped(state: CountsState, events: DataFrame): CountsState = {
    val deltas = events
      .filter(col("_change_type").isin(
        "insert", "delete", "update_preimage", "update_postimage"))
      .select(col("_direct_base_url").as("pub"),
        when(col("_change_type").isin("insert", "update_postimage"),
          lit(1L)).otherwise(lit(-1L)).as("sign"),
        liveCond.as("liveRow"))
      .groupBy("pub")
      .agg(sum(col("sign")).as("dn"),
        sum(when(col("liveRow"), col("sign")).otherwise(lit(0L))).as("dl"))
      .collect()
    val folded = deltas.foldLeft(state.counts) { (m, r) =>
      val k = Option(r.getString(0))
      val next = {
        val (n0, l0) = m.getOrElse(k, (0L, 0L))
        (n0 + r.getLong(1), l0 + r.getLong(2))
      }
      if (next == (0L, 0L)) m - k else m + (k -> next)
    }
    CountsState(folded)
  }
}
