package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a custom typed [[Aggregator]] — the
  * §7.3 "custom Aggregator" path, and the at-scale alternative to the
  * ranked-window top-k (`row_number over partitionBy.orderBy`):
  *
  *  - the window plan SORTS every group's complete row set (a full
  *    shuffle of the table followed by a per-partition sort);
  *  - this aggregator's state never exceeds k entries, it partially
  *    aggregates MAP-SIDE (the shuffle carries at most k rows per
  *    group per input partition, not the group's rows), and merge is
  *    a k-bounded insertion — at 100 TB the shuffle volume drops from
  *    the table to #groups × k × #partitions.
  *
  * Ordering is (score desc, id asc) — the deterministic tiebreak the
  * window variant uses, so the two plans are result-identical (the
  * `topk_per_group_agg` gate pins this against the same oracle as the
  * window gate `topk_per_group`).
  */
object TopKAggregator {

  /** Aggregation state and result: parallel arrays sorted by
    * (score desc, id asc), length ≤ k. Array-backed so the buffer
    * encodes as two primitive arrays (no per-entry object rows).
    */
  final case class TopBuf(scores: Array[Double], ids: Array[Long])

  /** Aggregator over (group, score, id) tuples; `finish` returns the
    * final k-bounded buffer (explode `ids` for ranked rows).
    */
  def topK(k: Int): Aggregator[(String, Double, Long), TopBuf, TopBuf] = {
    require(k > 0, s"k must be positive, got $k")
    new Aggregator[(String, Double, Long), TopBuf, TopBuf] {

      private def insert(buf: TopBuf, score: Double, id: Long): TopBuf = {
        val n = buf.ids.length
        // position of the new entry in (score desc, id asc) order
        var p = 0
        while (p < n && (buf.scores(p) > score ||
            (buf.scores(p) == score && buf.ids(p) < id))) p += 1
        if (p >= k) buf // below the cut — state unchanged
        else {
          val m = math.min(n + 1, k)
          val ss = new Array[Double](m)
          val is = new Array[Long](m)
          System.arraycopy(buf.scores, 0, ss, 0, p)
          System.arraycopy(buf.ids, 0, is, 0, p)
          ss(p) = score; is(p) = id
          val tail = m - p - 1
          if (tail > 0) {
            System.arraycopy(buf.scores, p, ss, p + 1, tail)
            System.arraycopy(buf.ids, p, is, p + 1, tail)
          }
          TopBuf(ss, is)
        }
      }

      def zero: TopBuf = TopBuf(Array.empty, Array.empty)

      def reduce(buf: TopBuf, in: (String, Double, Long)): TopBuf =
        insert(buf, in._2, in._3)

      def merge(a: TopBuf, b: TopBuf): TopBuf = {
        var acc = a
        var i = 0
        while (i < b.ids.length) {
          acc = insert(acc, b.scores(i), b.ids(i)); i += 1
        }
        acc
      }

      def finish(buf: TopBuf): TopBuf = buf

      def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
      def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    }
  }
}
