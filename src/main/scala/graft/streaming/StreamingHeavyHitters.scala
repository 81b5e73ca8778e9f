package graft.streaming

import graft.operators.HeavyHitters
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming φ-heavy-hitter monitor: the incremental counterpart of
  * [[graft.operators.HeavyHitters]] — each hash-range partition of the
  * item stream keeps ONE Misra–Gries summary of k = ⌈1/φ⌉ counters in
  * keyed state and re-emits its candidate set every micro-batch.
  *
  * Guarantee carried over from batch MG: an item's occurrences all hash
  * to one group, so its group-local count IS its global count, and any
  * item with count > n_group/k ≥ requirement survives in its group's
  * summary — the union of group summaries is always a superset of the
  * true φ-heavy hitters over the stream so far. Counter values are the
  * usual MG lower bounds (true count − n_group/k ≤ counter ≤ true).
  *
  * State is k counters × numGroups TOTAL regardless of stream length —
  * the 100 TB/unbounded-stream requirement. numGroups spreads summary
  * updates across executors (pick ≥ cluster parallelism); exact
  * verification of the candidates, when needed, is a batch job over
  * the archived stream ([[HeavyHitters.heavyHitters]]'s second pass).
  */
object StreamingHeavyHitters {

  /** One group's current summary entry: MG counter `cnt_lb` for `item`,
    * with `n_group` items observed by that group so far (the bound's
    * denominator).
    */
  final case class HitRow(group: Int, item: String, cnt_lb: Long, n_group: Long)

  /** Keyed state (public — the state encoder's generated code
    * instantiates it, like [[StreamingFunnel.FunnelState]]).
    */
  final case class MgState(counts: Map[String, Long], seen: Long)

  /** BATCH contract of [[monitor]]: the same hash-group → per-group
    * Misra–Gries candidate machinery, run as one batch pass and then
    * verified exactly — output is the EXACT φ-heavy-hitter set
    * (item, cnt), cnt > φ·N, descending. The group-local MG COUNTERS
    * are processing-order-dependent (so not gateable), but the
    * candidate-superset guarantee is order-free and exact verification
    * collapses it to a deterministic answer — which is what anchors
    * the streaming monitor to the DuckDB oracle (the CorpusMonitor
    * pattern; StreamingHeavyHittersSpec locks streaming candidates +
    * verify ≡ this).
    *
    * Scale shape: summaries build per (partition × group) and merge by
    * group key — the item stream itself never shuffles; only
    * numGroups × k counter entries move. Verification is the usual
    * broadcast-membership filter + one ≤(numGroups·k)-key aggregate.
    */
  def heavyHittersViaGroups(
      items: Dataset[String], phi: Double,
      numGroups: Int = 32): org.apache.spark.sql.DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    require(numGroups > 0, s"numGroups must be positive, got $numGroups")
    val k = math.ceil(1.0 / phi).toInt
    val spark = items.sparkSession
    import spark.implicits._
    val perGroup = items.mapPartitions { it =>
      val ms = Array.fill(numGroups)(
        scala.collection.mutable.LinkedHashMap.empty[String, Long])
      val ns = new Array[Long](numGroups)
      it.foreach { s =>
        if (s != null) {
          val g = java.lang.Math.floorMod(
            scala.util.hashing.MurmurHash3.stringHash(s), numGroups)
          HeavyHitters.mgAdd(ms(g), s, k)
          ns(g) += 1
        }
      }
      (0 until numGroups).iterator.filter(ns(_) > 0)
        .map(g => (g, ms(g).toMap, ns(g)))
    }
      .rdd.map { case (g, m, n) => (g, (m, n)) }
      .reduceByKey((a: (Map[String, Long], Long), b: (Map[String, Long], Long)) =>
        (HeavyHitters.mgMerge(a._1, b._1, k), a._2 + b._2))
      .collect() // ≤ numGroups rows of ≤ k counters — bounded
    val candidates = perGroup.iterator
      .flatMap(_._2._1.keysIterator).distinct.toSeq
    val n = perGroup.iterator.map(_._2._2).sum
    val base = items.toDF("item")
    // n == 0 means zero non-null items: the answer is EMPTY (not the
    // unfiltered group-by, which would emit a spurious (null, cnt) row
    // for an all-null input); keep the aggregate so the schema matches
    if (n == 0)
      return base.filter(col("item").isNotNull)
        .groupBy("item").agg(count("*").as("cnt"))
    base
      .filter(col("item").isNotNull && col("item").isin(candidates: _*))
      .groupBy("item")
      .agg(count("*").as("cnt"))
      .filter(col("cnt") > lit(phi * n))
      .orderBy(col("cnt").desc, col("item"))
  }

  /** `items`: a streaming Dataset of raw items (tokens, hosts, ids).
    * Update output mode — each batch re-emits the summaries of the
    * groups it touched.
    */
  def monitor(
      items: Dataset[String], phi: Double,
      numGroups: Int = 32): Dataset[HitRow] = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    require(numGroups > 0, s"numGroups must be positive, got $numGroups")
    val k = math.ceil(1.0 / phi).toInt
    import items.sparkSession.implicits._
    items
      .groupByKey(s => java.lang.Math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(s), numGroups))
      .flatMapGroupsWithState[MgState, HitRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: Int, rows: Iterator[String], state: GroupState[MgState]) =>
          val prior = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          m ++= prior.counts
          var n = prior.seen
          rows.foreach { s =>
            if (s != null) { HeavyHitters.mgAdd(m, s, k); n += 1 }
          }
          state.update(MgState(m.toMap, n))
          m.iterator.map { case (item, c) => HitRow(group, item, c, n) }
      }
  }
}
