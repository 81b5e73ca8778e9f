package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over a bounded graph (the near-dup similarity
  * graph, a domain-link graph, ...) — the centrality signal data
  * curation pipelines use to pick canonical survivors and weight
  * sources. Brin & Page 1998 power iteration, damping d = 0.85.
  *
  * ALL arithmetic is 64-bit integer at a fixed 1e12 scale: rank_fp =
  * floor(rank · 1e12). Integer sums are order-independent and
  * engine-identical, so a fixed iteration count is EXACTLY reproducible
  * by unrolled SQL (`//` in DuckDB, `div` in Spark) — no float-sum
  * nondeterminism, no decimal-division scale-rule mismatch. The
  * truncation bias per step is < 1e-12 · degree, orders below any
  * ranking decision.
  *
  * Dangling mass (nodes with no out-edges keep their rank out of
  * circulation) is dropped by default, the standard simplification for
  * similarity graphs where isolated nodes are the common case and only
  * relative order within components matters; [[pagerankDangling]] is
  * the opt-in full recurrence that redistributes it uniformly each
  * round (link graphs with meaningful sinks).
  *
  * Scale: the edge list is hash-partitioned by src and materialized
  * ONCE; per-round degree rates live on the NODE-scale frame (never
  * attached per edge — an |E|-row join with a materialized copy was
  * measured 61 s of a 74 s rehearsal before this shape), and the
  * edge-side join is pinned to a shuffled-hash build on the node frame
  * (`hint("shuffle_hash")`) so no round ever re-sorts the edges —
  * checkpointed ranks have unknown stats, which otherwise flips rounds
  * 2+ to sort-merge (measured 2 s → 25 s per round). Each round's
  * shuffles move node-scale rows only (rates + the dst partial-agg
  * output). Ranks are checkpointed per round so the plan does not grow
  * with the iteration count.
  *
  * Reference scope: extension surface (SURVEY.md §2.6) — the reference
  * has no graph operators.
  */
object PageRank {

  val Scale: Long = 1000000000000L

  /** (id, rank_fp) for EVERY node in `nodes` — total assignment, like
    * a cluster labelling. `edges` is directed (src, dst); symmetrize
    * before calling for an undirected graph.
    *
    * rank⁰ = SCALE div N;
    * rankⁱ⁺¹(v) = (15·SCALE) div (100·N)
    *            + (85 · Σ_{u→v} (rankⁱ(u) div deg(u))) div 100.
    */
  def pagerank(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iterations: Int = 3): DataFrame = {
    val n0 = nodes.select(col(idCol)).distinct().materialized
    val nCount = n0.count()
    require(nCount > 0, "graph must have at least one node")
    val n = n0.select(col(idCol).as("id"),
      lit(Scale / nCount).as("r0"),
      lit((15L * Scale) / (100L * nCount)).as("base"))
    power(n, edges, srcCol, dstCol, iterations)
      .select(col("id").as(idCol), col("r").as("rank_fp"))
  }

  /** PERSONALIZED PageRank: teleport lands only on `seeds` (a trusted
    * domain list, a curated source set), so rank measures proximity to
    * the seed set through the graph — the trust-propagation weighting
    * (TrustRank, Gyöngyi et al. 2004). Same fixed-point contract:
    * rank⁰ = SCALE div |S| on seeds else 0, and the teleport term
    * (15·SCALE) div (100·|S|) is added on seed nodes only. Non-seed
    * components hold rank 0 — reachability from the seeds IS the
    * signal.
    */
  def pagerankPersonalized(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, seeds: DataFrame,
      iterations: Int = 3): DataFrame = {
    val n0 = nodes.select(col(idCol)).distinct().materialized
    val seedIds = seeds.select(col(idCol)).distinct()
    val flagged = n0.join(
        seedIds.withColumn("_seed", lit(true)), Seq(idCol), "left")
      .materialized
    val sCount = flagged.filter(col("_seed")).count()
    require(sCount > 0, "at least one seed must be a graph node")
    val n = flagged.select(col(idCol).as("id"),
      when(col("_seed"), lit(Scale / sCount)).otherwise(lit(0L)).as("r0"),
      when(col("_seed"), lit((15L * Scale) / (100L * sCount)))
        .otherwise(lit(0L)).as("base"))
    power(n, edges, srcCol, dstCol, iterations)
      .select(col("id").as(idCol), col("r").as("rank_fp"))
  }

  /** Edge-WEIGHTED PageRank: rank flows proportional to integer edge
    * weights (e.g. round(jaccard·1e6) on a similarity graph — stronger
    * near-dups pull more rank, the refinement that makes centrality a
    * better canonical-survivor signal than degree alone). Same
    * fixed-point contract with per-source rate = rank div Σw and
    * per-edge contribution rate·w: the rate truncates BEFORE the weight
    * scaling, so the per-edge truncation bias is < w·1e-12 — identical
    * on both engines, orders below ranking decisions. Weights must be
    * positive longs; per-edge products stay under 2^63 because
    * rate ≤ SCALE and Σ_out w ≥ w.
    */
  def pagerankWeighted(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, weightCol: String,
      iterations: Int = 3): DataFrame = {
    val n0 = nodes.select(col(idCol)).distinct().materialized
    val nCount = n0.count()
    require(nCount > 0, "graph must have at least one node")
    // the contract says "weights must be positive longs" — enforce it:
    // a zero/negative (or null) weight silently corrupts Σ_out w and
    // every downstream rate. One edge-scale aggregate, once.
    val badW = edges
      .filter(col(weightCol).isNull || col(weightCol).cast("long") <= 0L)
      .limit(1).count()
    require(badW == 0L,
      s"edge weights in '$weightCol' must be positive non-null longs")
    val n = n0.select(col(idCol).as("id"),
      lit(Scale / nCount).as("r0"),
      lit((15L * Scale) / (100L * nCount)).as("base"))
    power(n, edges, srcCol, dstCol, iterations, Some(weightCol))
      .select(col("id").as(idCol), col("r").as("rank_fp"))
  }

  /** PageRank WITH dangling-mass redistribution — the full Brin & Page
    * recurrence for link graphs where sinks are meaningful (a source-
    * authority graph with many leaf domains): each round the rank held
    * by out-degree-0 nodes is collected and redistributed uniformly,
    * so no mass leaves circulation and sink-heavy regions are not
    * systematically under-ranked.
    *
    * rankⁱ⁺¹(v) = (15·SCALE) div (100·N)
    *            + (85 · (Σ_{u→v} (rankⁱ(u) div deg(u)) + Dⁱ div N)) div 100
    * with Dⁱ = Σ_{deg(u)=0} rankⁱ(u) — an exact integer sum, so the
    * fixed-point / unrolled-SQL oracle property is preserved. Cost over
    * [[pagerank]]: ONE node-scale aggregate per round (the dangling
    * sum); the edge-side plan is identical.
    */
  def pagerankDangling(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iterations: Int = 3): DataFrame = {
    val n0 = nodes.select(col(idCol)).distinct().materialized
    val nCount = n0.count()
    require(nCount > 0, "graph must have at least one node")
    val n = n0.select(col(idCol).as("id"),
      lit(Scale / nCount).as("r0"),
      lit((15L * Scale) / (100L * nCount)).as("base"))
    power(n, edges, srcCol, dstCol, iterations, None, Some(nCount))
      .select(col("id").as(idCol), col("r").as("rank_fp"))
  }

  /** Weighted edges AND dangling-mass redistribution together — the
    * full recurrence for a weighted link graph with sinks (authority
    * over a similarity-weighted domain graph). Orthogonal composition
    * of [[pagerankWeighted]]'s rate·w flow and [[pagerankDangling]]'s
    * per-round redistribution; unit weights reproduce
    * [[pagerankDangling]] exactly (spec-locked).
    */
  def pagerankWeightedDangling(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, weightCol: String,
      iterations: Int = 3): DataFrame = {
    val n0 = nodes.select(col(idCol)).distinct().materialized
    val nCount = n0.count()
    require(nCount > 0, "graph must have at least one node")
    val badW = edges
      .filter(col(weightCol).isNull || col(weightCol).cast("long") <= 0L)
      .limit(1).count()
    require(badW == 0L,
      s"edge weights in '$weightCol' must be positive non-null longs")
    val n = n0.select(col(idCol).as("id"),
      lit(Scale / nCount).as("r0"),
      lit((15L * Scale) / (100L * nCount)).as("base"))
    power(n, edges, srcCol, dstCol, iterations, Some(weightCol), Some(nCount))
      .select(col("id").as(idCol), col("r").as("rank_fp"))
  }

  /** The shared damped power loop over a node frame carrying each
    * node's initial rank (`r0`) and per-round additive teleport term
    * (`base`). With a weight column, out-mass splits proportional to
    * the weights (weight 1 everywhere ≡ the unweighted recurrence).
    * Returns (id, r) after `iterations` rounds.
    */
  private def power(
      n: DataFrame, edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, weightCol: Option[String] = None,
      danglingN: Option[Long] = None): DataFrame = {
    require(iterations >= 1, "at least one power iteration")
    // one shuffle + one materialization of the edge list, partitioned
    // by src — every round's build-side join and the degree aggregate
    // reuse this layout
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        weightCol.map(w => col(w).cast("long")).getOrElse(lit(1L)).as("w"))
      .repartition(col("src"))
      .materialized
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("deg"))
      .materialized
    var ranks = n.select(col("id"), col("r0").as("r"))
    var i = 0
    while (i < iterations) {
      // per-source emission rate on the NODE-scale frame
      val rates = ranks.select(col("id").as("src"), col("r"))
        .join(deg, "src")
        .select(col("src"), expr("r div deg").as("rate"))
      val inMass = e.join(rates.hint("shuffle_hash"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("rate") * col("w")).as("m"))
      // opt-in dangling redistribution: the rank held by out-degree-0
      // nodes (node-scale left-anti + 1-row exact integer aggregate,
      // `D div N` the same 64-bit floor division the unrolled SQL
      // replays) joins back as a broadcast 1-row frame — fully
      // IN-PLAN, so each round stays one job with no driver-side
      // collect/sync point between rounds
      val dangling = danglingN.map { nTotal =>
        ranks
          .join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0L)).as("dmass"))
          .select(expr(s"dmass div ${nTotal}L").as("dshare"))
      }
      val withMass = n.select(col("id"), col("base"))
        .join(inMass.withColumnRenamed("dst", "id"), Seq("id"), "left")
      ranks = dangling.fold(withMass.withColumn("dshare", lit(0L))) { d =>
          withMass.crossJoin(broadcast(d))
        }
        .select(col("id"),
          (col("base") +
            expr("85 * (coalesce(m, 0L) + dshare) div 100")).as("r"))
        .materialized
      i += 1
    }
    ranks
  }
}
