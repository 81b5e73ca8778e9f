package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming ordered-conversion funnel — the incremental counterpart of
  * [[graft.operators.Funnel]]: each user advances a per-key stage
  * machine (stage i+1 must occur strictly after stage i and within
  * `withinMillis` of it), and every advancement emits a
  * [[StreamingFunnel.StageHit]] row as it happens.
  *
  * State is ONE (stage, timestamp) pair per in-flight user, and it is
  * evicted deterministically by the WATERMARK: once a user can no
  * longer advance (conversion window expired) or has completed the
  * final stage, the state is removed — so state size tracks users
  * inside their conversion window, not users ever seen. That is the
  * 100 TB requirement: an unbounded funnel over months of events keeps
  * hours of state.
  *
  * Within a micro-batch, a user's events are processed in event-time
  * order, so in-batch disorder is harmless; ACROSS batches
  * advancement is monotone (an earlier-stage event arriving after the
  * stage advanced is ignored), and events older than the watermark
  * are dropped before the state machine sees them — the same
  * trade-off every watermark-bounded streaming aggregate makes.
  *
  * A user whose window expires restarts from stage 0 on their next
  * first-stage event — a NEW conversion attempt, which emits its own
  * stage hits (downstream dedups per attempt if it wants at-most-one).
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** One row per stage ADVANCEMENT: `stage` is 1-based, `ts` the event
    * time that completed it.
    */
  final case class StageHit(user_id: Long, stage: Int, stage_type: String,
      ts: Timestamp)

  /** Keyed state: the user's current stage and its event time (public —
    * the state encoder's generated code instantiates it).
    */
  final case class FunnelState(stage: Int, stageTsMs: Long)

  /** `events` must carry a watermark on `ts` (EventTimeTimeout needs
    * one). Emits stage hits in Append mode.
    */
  def stageHits(
      events: Dataset[FunnelEvent],
      stageTypes: Seq[String],
      withinMillis: Long): Dataset[StageHit] = {
    require(stageTypes.nonEmpty, "at least one funnel stage required")
    import events.sparkSession.implicits._
    val nStages = stageTypes.size
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // conversion window expired with no further advancement
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val hits = Seq.newBuilder[StageHit]
            // event-time order inside the batch; ties keep first-seen
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              if (cur.stage < nStages &&
                  e.event_type == stageTypes(cur.stage) &&
                  (cur.stage == 0 ||
                    (e.ts.getTime > cur.stageTsMs &&
                      e.ts.getTime <= cur.stageTsMs + withinMillis))) {
                cur = FunnelState(cur.stage + 1, e.ts.getTime)
                hits += StageHit(uid, cur.stage, stageTypes(cur.stage - 1), e.ts)
              }
            }
            if (cur.stage >= nStages) {
              // funnel complete — nothing more can advance
              state.remove()
            } else if (cur.stage > 0) {
              state.update(cur)
              // no advancement possible once the watermark passes the
              // conversion deadline; max() keeps the timestamp legal
              // (strictly beyond the current watermark)
              state.setTimeoutTimestamp(
                math.max(cur.stageTsMs + withinMillis,
                  state.getCurrentWatermarkMs() + 1))
            }
            // users still at stage 0 keep no state at all
            hits.result().iterator
          }
      }
  }
}
