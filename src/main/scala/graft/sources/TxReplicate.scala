package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-bounded CDC apply: mirror a change-feed-enabled [[TxTable]]
  * into a replica with per-version work proportional to the CHANGE
  * BATCH, never the replica.
  *
  * The obvious apply — [[TxTable.mergeInto]] per version (the
  * `io_tx_cdc_replicate` gate) — is correct but rewrites the entire
  * replica on every applied version, because merge is read-modify-
  * write over the whole table; at 100 TB that prices a KB-sized
  * harvest batch at a full-table write. This apply decomposes each
  * typed event batch into the two delta-bounded primitives instead:
  *
  *  - `delete` + `update_preimage` events contribute their KEYS
  *    (collected to the driver — bounded by the batch, the same size
  *    class as the position lists [[TxTable.deleteWhere]] already
  *    writes) and mask via the deletion-vector path: one stats-pruned
  *    matching scan (the `In(key, …)` predicate pushes to parquet, so
  *    a key-clustered replica opens only overlapping row groups), a
  *    KB-scale position write, zero data-file rewrites;
  *  - `insert` + `update_postimage` events APPEND — work bounded by
  *    the batch rows.
  *
  * An update therefore lands as DV-mask(preimage) + append(postimage)
  * — two replica commits per applied version, converging to the same
  * state the merge apply reaches (`io_tx_cdc_replicate_dv` pins both
  * against the same oracle). The replica's version NUMBERS are not
  * parity with the source's; state is.
  *
  * Redelivery safety: delete-by-key is NOT idempotent on its own (a
  * re-run's mask would catch the postimage rows the first run already
  * appended), so [[applyTyped]] takes the source version as an
  * exactly-once batch id — the append half routes through
  * [[TxTable.addStreamingBatch]], whose per-stream high-water header
  * commits WITH the rows, and a batch at or below the high-water is
  * skipped wholesale before any delete runs. The high-water advances
  * even for delete-only batches (an empty streaming append is a
  * header-only commit), so no replayed batch can reach its delete.
  *
  * Contract: the source versions applied must carry row-accurate
  * typed events ([[TxTable.readChangesTyped]] throws on
  * non-representable rewrites), keys are unique per row (the
  * [[TxTable.mergeInto]] invariant), and one mirror consumer writes
  * the replica at a time.
  */
object TxReplicate {

  /** Apply ONE typed event batch (the `readChangesTyped` shape) to
    * the replica at `root`, exactly once under `(streamId, batchId)`
    * (use the source version as the batch id). Returns the number of
    * replica commits made (0 for an empty or already-applied batch).
    */
  def applyTyped(
      spark: SparkSession, root: String, keyCol: String,
      events: DataFrame, streamId: String, batchId: Long): Int = {
    val applied = TxTable.latestSnapshot(spark, root)
      .headers.get(s"stream:$streamId").map(_.toLong)
    if (applied.exists(_ >= batchId)) return 0
    val gone = events
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col(keyCol)).distinct()
      .collect().map(_.get(0)).toSeq // bounded by the change batch
    val add = events
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type", "_commit_version")
    var commits = 0
    if (gone.nonEmpty) {
      TxTable.deleteWhere(spark, root, col(keyCol).isInCollection(gone))
      commits += 1
    }
    // always runs (even with zero add rows): the high-water header
    // must advance so a redelivered batch skips before its delete
    if (TxTable.addStreamingBatch(add, root, streamId, batchId).isDefined)
      commits += 1
    commits
  }

  /** Bootstrap-plus-tail mirror: create the replica from the source's
    * `fromVersion` snapshot (one table-sized copy — the only
    * table-bounded step) and apply every later version's typed feed
    * delta-boundedly. Returns the source version mirrored up to.
    */
  def mirror(
      spark: SparkSession, srcRoot: String, dstRoot: String,
      keyCol: String, fromVersion: Long = 0L): Long = {
    TxTable.create(
      TxTable.readVersion(spark, srcRoot, fromVersion), dstRoot)
    val vs = TxTable.versions(spark, srcRoot).filter(_ > fromVersion)
    vs.foreach { v =>
      applyTyped(spark, dstRoot, keyCol,
        TxTable.readChangesTyped(spark, srcRoot, v - 1L, v),
        streamId = "mirror", batchId = v)
    }
    vs.lastOption.getOrElse(fromVersion)
  }
}
