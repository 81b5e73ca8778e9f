package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of
  * [[graft.operators.EventSequences.ewmaLast]]: each key's
  * renormalized last-k EWMA level, re-emitted whenever a micro-batch
  * touches the key — the online-feature face of the batch operator
  * ("user's recent spend level", served fresh).
  *
  * State per key is the top-k (ts, tie, value) buffer and NOTHING
  * else — bounded regardless of stream length, the unbounded-stream
  * requirement. Every emission recomputes the level from the buffer
  * with the SAME newest-first weight fold and exact dyadic weight
  * chain as the batch operator, so on any prefix of the stream the
  * emitted level equals the batch answer over the same rows
  * (StreamingEwmaSpec locks batch ≡ streaming, including late and
  * in-batch-disordered arrivals, which the buffer re-sorts).
  */
object StreamingEwma {

  final case class Ev(user_id: Long, ts_us: Long, tie: Long, value: Double)

  /** Keyed state: newest-first buffer, at most k entries. Public for
    * the state encoder, like [[StreamingFunnel.FunnelState]].
    */
  final case class EwmaBuf(top: Seq[(Long, Long, Double)])

  final case class Level(user_id: Long, n_used: Int, ewma: Double)

  def levels(
      events: Dataset[Ev], beta: Double = 0.75,
      k: Int = 20): Dataset[Level] = {
    require(k >= 1 && k <= 64, s"window k=$k out of range")
    val weights = Array.iterate(1.0, k)(_ * beta)
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[EwmaBuf]) =>
          val prev = state.getOption.map(_.top).getOrElse(Seq.empty)
          val merged = (prev ++ it.map(e => (e.ts_us, e.tie, e.value)))
            .sortBy(t => (-t._1, -t._2))
            .take(k)
          state.update(EwmaBuf(merged))
          // identical fold to the batch operator: newest first,
          // term_i = v_i · β^i, renormalized by the realized mass
          var s = 0.0
          var i = 0
          merged.foreach { t => s += t._3 * weights(i); i += 1 }
          var ws = 0.0
          (0 until merged.size).foreach(j => ws += weights(j))
          Iterator.single(Level(user, merged.size, s / ws))
      }
  }
}
