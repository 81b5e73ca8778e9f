package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact φ-heavy hitters (all items with frequency > φ·N) with BOUNDED
  * memory — the two-pass Misra–Gries scheme every large-scale frequency
  * pipeline uses when the item domain (tokens, URLs, hosts, n-grams) is
  * too large to hash-aggregate exactly in one shot:
  *
  *  1. candidate pass: each partition builds a Misra–Gries summary of
  *     k = ⌈1/φ⌉ counters; summaries merge associatively (counter-wise
  *     sum, then decrement-all by the (k+1)-th largest and drop ≤0 —
  *     Agarwal et al., "Mergeable Summaries", PODS'12). The MG guarantee
  *     survives merging: every item with true count > N/k is present in
  *     the merged summary, so candidates ⊇ true heavy hitters.
  *  2. verify pass: exact counts for the ≤k candidates via a BROADCAST
  *     membership filter + hash aggregate, emit those strictly > φ·N.
  *
  * The output is EXACT (oracle-matchable) — approximation only ever
  * widens the candidate set, never the answer. Scale: pass 1 moves
  * k counters per partition (no shuffle of the item stream at all,
  * summaries fold on the driver — 1000 executors × k≈30 entries is
  * kilobytes); pass 2 is one map-side-combined aggregate over rows that
  * survive a broadcast hash filter, shuffling ≤k distinct keys.
  *
  * Reference scope: the aggregator's per-publisher counts
  * (cdcagg_oai metrics) are full-domain GROUP BYs; this is the
  * bounded-domain variant the 100 TB token/host statistics need.
  */
object HeavyHitters {

  /** Misra–Gries summary update: one item into a k-counter map (shared
    * with the streaming monitor in [[graft.streaming]]).
    */
  private[graft] def mgAdd(m: scala.collection.mutable.LinkedHashMap[String, Long],
      item: String, k: Int): Unit = {
    m.get(item) match {
      case Some(c) => m.update(item, c + 1)
      case None if m.size < k => m.update(item, 1L)
      case None =>
        // decrement every counter; evict the zeroed ones
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        m.foreach { case (key, c) =>
          if (c == 1) dead += key else m.update(key, c - 1)
        }
        dead.foreach(m.remove)
    }
  }

  /** Mergeable-summaries combine: sum counters, then if > k survive,
    * subtract the (k+1)-th largest count from all and drop ≤0.
    */
  private[graft] def mgMerge(
      a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = scala.collection.mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (key, c) =>
      sum.update(key, sum.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum.toMap
    else {
      val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.iterator.map { case (key, c) => key -> (c - cut) }
        .filter(_._2 > 0).toMap
    }
  }

  /** Per-partition MG summaries + the exact total item count, in ONE
    * pass (nulls skipped). Fusing the N-count into the summary pass
    * keeps the operator at two scans total.
    */
  private[operators] def mgCandidates(
      items: DataFrame, itemCol: Column, k: Int): (Map[String, Long], Long) = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(itemCol.cast("string"))
      .as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        var n = 0L
        it.foreach { s => if (s != null) { mgAdd(m, s, k); n += 1 } }
        Iterator.single((m.toMap, n))
      }
      .rdd
      // treeAggregate, not treeReduce: an empty input (zero partitions)
      // must fold to the empty summary, not throw
      .treeAggregate((Map.empty[String, Long], 0L))(
        (x, y) => (mgMerge(x._1, y._1, k), x._2 + y._2),
        (x, y) => (mgMerge(x._1, y._1, k), x._2 + y._2),
        depth = 2)
  }

  /** Exact heavy hitters: (item, cnt) for every item with cnt > φ·N,
    * descending by count then item. `items` is one item per row (explode
    * upstream for token streams).
    */
  def heavyHitters(
      items: DataFrame, itemCol: Column, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val k = math.ceil(1.0 / phi).toInt
    val base = items.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
    val (summary, n) = mgCandidates(base, col("item"), k)
    if (n == 0) return base.groupBy("item").agg(count("*").as("cnt"))
    val candidates = summary.keys.toSeq
    // candidates ⊆ k entries — always broadcastable
    base
      .filter(col("item").isin(candidates: _*))
      .groupBy("item")
      .agg(count("*").as("cnt"))
      .filter(col("cnt") > lit(phi * n))
      .orderBy(col("cnt").desc, col("item"))
  }
}
