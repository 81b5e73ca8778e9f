package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of
  * [[graft.operators.EventSequences.cusumDrift]]: the one-sided CUSUM
  * drift monitor as an online face — every event is emitted with its
  * running statistic and flag as the micro-batch that carries it
  * arrives, instead of in a nightly batch window.
  *
  * State per key is THREE LONGS (baseline target, cumulative sum,
  * running minimum) — O(1) regardless of stream length, the
  * unbounded-stream requirement; no buffer, no event history. The
  * recursion is the exact integer fixed-point of the batch operator:
  *
  *   p_i    = p_{i−1} + (y_i − target − slack)
  *   pmin_i = min(pmin_{i−1}, p_i)       (pmin_0 = 0)
  *   cusum  = p_i − pmin_i, drift ⇔ cusum > threshold
  *
  * so on any IN-ORDER prefix of the stream the emissions equal the
  * batch answer over the same rows row-for-row
  * (StreamingCusumSpec locks batch ≡ streaming across micro-batch
  * splits). Within a micro-batch, rows are re-sorted by (ts, tie);
  * cross-batch late data would rewrite history and is out of contract
  * — exactly the watermark-drop stance the other streaming faces
  * take.
  */
object StreamingCusum {

  final case class Ev(user_id: Long, ts_us: Long, tie: Long, value: Double)

  /** Keyed state — three longs. Public for the state encoder. */
  final case class CusumState(target: Long, p: Long, pmin: Long)

  final case class Out(user_id: Long, tie: Long, value_fp: Long,
      cusum_fp: Long, drift: Boolean)

  def detect(
      events: Dataset[Ev], slackFp: Long = 50000L,
      thresholdFp: Long = 500000L): Dataset[Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[CusumState]) =>
          val evs = it.toArray.sortBy(e => (e.ts_us, e.tie))
          var st = state.getOption.orNull
          val out = new scala.collection.mutable.ArrayBuffer[Out](evs.length)
          evs.foreach { e =>
            // same fixed-point scaling as the batch operator
            val y = BigDecimal(e.value)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .*(10000).toLongExact
            val target = if (st == null) y else st.target
            val p = (if (st == null) 0L else st.p) + (y - target - slackFp)
            val pmin = math.min(if (st == null) 0L else st.pmin, p)
            st = CusumState(target, p, math.min(0L, pmin))
            val cusum = p - st.pmin
            out += Out(user, e.tie, y, cusum, cusum > thresholdFp)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }
}
