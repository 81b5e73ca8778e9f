package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest of harvested study updates (SURVEY.md §2.6 streaming
  * note): upsert-with-tombstone semantics — soft deletes are rows with
  * status=deleted, and late/duplicate updates resolve last-writer-wins on
  * the `updated` timestamp.
  */
object StreamingIngest {

  final case class StudyUpdate(
      study_id: String, status: String, updated: Timestamp,
      base_url: String, title: String)

  /** Open the custom harvest source as an unbounded stream. */
  def harvestStream(
      spark: SparkSession,
      recordsPerBatch: Int = 100,
      maxRecords: Long = 1000,
      partitions: Int = 4): DataFrame =
    spark.readStream
      .format(classOf[HarvestSourceProvider].getName)
      .option("recordsPerBatch", recordsPerBatch.toString)
      .option("maxRecords", maxRecords.toString)
      .option("partitions", partitions.toString)
      .load()

  /** Batch upsert resolution: latest row per key by (updated, then status
    * as tiebreak for determinism). One shuffle on the key — the same plan
    * a periodic compaction job runs over the raw harvest log.
    */
  def latestByKeyBatch(updates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("study_id"))
      .orderBy(col("updated").desc, col("status").desc)
    updates.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Streaming upsert resolution via keyed state: keeps the
    * latest-by-timestamp update per study and emits it whenever it
    * changes. State size = one row per RECENTLY-ACTIVE key, bounded by
    * `idleTimeout`: a key idle that long (WALL-CLOCK — processing-time
    * timeout) is evicted, its latest row re-emitted once on the way out.
    *
    * `idleTimeout` defaults to None (state-bounding is an explicit
    * opt-in): eviction re-emissions can resurrect a stale older update
    * arriving after the TTL, which is safe only over an idempotent
    * MERGE-style sink where the downstream compaction
    * ([[latestByKeyBatch]], the sink-side MERGE authority) resolves it.
    * Opt in at 100 TB — without eviction, state grows one entry per key
    * forever. For a DETERMINISTICALLY testable TTL driven by event time
    * instead of the wall clock, use [[latestByKeyStreamingEventTtl]].
    */
  def latestByKeyStreaming(
      updates: Dataset[StudyUpdate],
      idleTimeout: Option[String] = None): Dataset[StudyUpdate] = {
    import updates.sparkSession.implicits._
    val timeoutConf = idleTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    updates
      .groupByKey(_.study_id)
      .mapGroupsWithState[StudyUpdate, StudyUpdate](timeoutConf) {
        (_: String, rows: Iterator[StudyUpdate], state: GroupState[StudyUpdate]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val incoming = rows.maxBy(_.updated.getTime)
            val best = state.getOption match {
              case Some(cur) if cur.updated.getTime >= incoming.updated.getTime => cur
              case _ => incoming
            }
            state.update(best)
            idleTimeout.foreach(state.setTimeoutDuration)
            best
          }
      }
  }

  /** Event-time TTL variant of [[latestByKeyStreaming]]: state eviction
    * is driven by the WATERMARK, not the wall clock — a key is evicted
    * once the watermark passes its newest update plus `ttlMillis`.
    * Because the watermark only advances with data, eviction is
    * DETERMINISTIC under synchronous drives (`processAllAvailable`):
    * no self-scheduled batch storm, no racing the timeout clock — the
    * property that makes TTL behaviour unit-testable, and the semantics
    * a replayed/backfilled stream wants anyway (idle wall-clock time
    * during a replay must not evict live keys).
    *
    * `updates` must carry a watermark on `updated` (set by the caller
    * via `withWatermark`) — EventTimeTimeout requires one.
    */
  def latestByKeyStreamingEventTtl(
      updates: Dataset[StudyUpdate],
      ttlMillis: Long = 30L * 60 * 1000): Dataset[StudyUpdate] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.study_id)
      .mapGroupsWithState[StudyUpdate, StudyUpdate](
        GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[StudyUpdate], state: GroupState[StudyUpdate]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val incoming = rows.maxBy(_.updated.getTime)
            val best = state.getOption match {
              case Some(cur) if cur.updated.getTime >= incoming.updated.getTime => cur
              case _ => incoming
            }
            state.update(best)
            // evict when the watermark passes newest-update + TTL; the
            // max() keeps the timestamp legal (strictly beyond the
            // current watermark) for late-but-admitted rows
            state.setTimeoutTimestamp(
              math.max(best.updated.getTime + ttlMillis,
                state.getCurrentWatermarkMs() + 1))
            best
          }
      }
  }

  /** Continuous harvest → upsert → in-memory table, for drive/testing.
    * Returns the query; caller calls processAllAvailable + stop. TTL is
    * OFF here: ProcessingTimeTimeout makes the engine self-schedule
    * batches to advance the timeout clock, which races
    * processAllAvailable — the synchronous drive path needs NoTimeout
    * (production writers pair the TTL with a real trigger interval and
    * never block on processAllAvailable).
    */
  def runToMemory(
      spark: SparkSession,
      sinkName: String,
      recordsPerBatch: Int = 100,
      maxRecords: Long = 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val updates = harvestStream(spark, recordsPerBatch, maxRecords)
      .as[StudyUpdate]
    latestByKeyStreaming(updates, idleTimeout = None)
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(OutputMode.Update)
      .start()
  }

  /** Streaming windowed counts with a watermark — the harvest-rate
    * monitoring job (late records beyond the watermark are dropped from
    * the aggregate, bounding state).
    */
  def windowedHarvestCounts(updates: DataFrame, watermark: String = "10 minutes"): DataFrame =
    updates
      .withWatermark("updated", watermark)
      .groupBy(window(col("updated"), "1 minute"), col("base_url"))
      .agg(count(lit(1)).as("harvested"))
      .select(col("window.start").as("window_start"), col("base_url"),
        col("harvested"))
}
