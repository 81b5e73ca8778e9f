package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural graph metrics over the pair graphs the pipeline already
  * builds (near-dup pairs, ER candidate pairs, domain links): local
  * clustering via triangle counts, link prediction via neighbor-set
  * Jaccard, and HITS hubs/authorities. Complements [[PageRank]]
  * (global centrality) and [[ConnectedComponents]] (reachability).
  *
  * Scale discipline shared by all three: shuffles carry (long, long)
  * edge rows and node-scale aggregates only; triangle/wedge generation
  * is bounded by degree-ordered orientation (the standard compact-
  * forward bound of O(m^1.5) wedges instead of Σ deg² — Latapy 2008);
  * HITS is all-64-bit-integer fixed point like [[PageRank]], so a
  * fixed iteration count is exactly reproducible by unrolled SQL.
  *
  * Reference scope: extension surface (SURVEY.md §2.6) — the reference
  * has no graph operators.
  */
object GraphMetrics {

  /** Discrete power-law exponent MLE (Clauset–Shalizi–Newman eq. 3.7
    * continuous approximation): α = 1 + n / Σ ln(d_i/(dmin−½)) over
    * degrees ≥ dmin — "how heavy is this graph's hub tail", the
    * one-number scale-free diagnostic next to the degree histogram.
    * Degrees are exact ints from one edge aggregate; the log fold runs
    * in sorted (degree, node) order so the float sum is deterministic
    * and replayable. Degree-domain-bounded work after the aggregate.
    */
  def powerLawAlpha(
      edges: org.apache.spark.sql.DataFrame, srcCol: String,
      dstCol: String, dmin: Long = 2L): org.apache.spark.sql.DataFrame = {
    require(dmin >= 1, s"dmin must be >= 1, got $dmin")
    val deg = edges
      .select(col(srcCol).as("_n"))
      .unionByName(edges.select(col(dstCol).as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
      .filter(col("_d") >= dmin)
      // degree-domain pre-aggregate: the fold frame is |distinct
      // degrees|, not |nodes|
      .groupBy(col("_d")).agg(count(lit(1)).as("_m"))
    deg.agg(
      sum(col("_m")).as("n_nodes"),
      Numerics.roundz(
        lit(1.0) + sum(col("_m")).cast("double") /
          aggregate(
            array_sort(collect_list(struct(col("_d"), col("_m")))),
            lit(0.0),
            (acc, s) => acc + s.getField("_m").cast("double") *
              log(s.getField("_d").cast("double") /
                (lit(dmin.toDouble) - 0.5))),
        6).as("alpha"))
  }

  /** (node, triangles) for every endpoint of `edges` — the per-node
    * triangle participation count (local clustering numerator, a spam/
    * template-farm signal on near-dup graphs: organic near-dup pairs
    * are sparse, template families are cliques).
    *
    * `edges` is an undirected pair list (one row per edge, any
    * orientation; duplicates and self-loops are dropped). Each
    * triangle is enumerated exactly once from its lowest-(degree, id)
    * corner: orienting every edge from lower to higher (deg, id) rank
    * makes wedge fan-out per node ≤ its ORIENTED out-degree, which the
    * orientation bounds by O(√m) on any graph — hubs never explode the
    * wedge join (the same reason ER blocking needed a cap; here the
    * orientation IS the cap, with no approximation).
    */
  def triangleCounts(
      edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .materialized
    val sym = canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src is the lower-ranked endpoint
    val oriented = sym
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u").as("src"), col("v").as("dst"))
      .materialized
    // wedges from the shared lowest-rank corner; close over the
    // undirected edge set (id-ordered pair lookup against canon)
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("c"),
        col("x.dst").as("d1"), col("y.dst").as("d2"))
    val tri = wedges.join(canon,
        least(col("d1"), col("d2")) === col("u") &&
          greatest(col("d1"), col("d2")) === col("v"))
      .select(col("c"), col("d1"), col("d2"))
    val corners = tri.select(explode(array(col("c"), col("d1"), col("d2")))
      .as("id"))
    val counts = corners.groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.select(col("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id").as("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Link prediction / second-order similarity: for every node pair
    * sharing at least `minCommon` neighbors, the Jaccard of their
    * neighbor SETS — common / (deg_a + deg_b − common) — the classic
    * "you share most of your near-dup partners" signal that catches
    * pairs the direct edge missed. Output (id_a, id_b, common,
    * jaccard) with id_a < id_b, 6-dp round.
    *
    * The wedge join fans out Σ_v deg(v)² over wedge CENTERS — the
    * quadratic-hub hazard ([[EntityResolution]]'s Zipf-block problem
    * in graph form). `maxDegree` is the built-in mitigation: nodes
    * whose full-graph degree exceeds it are EXCLUDED (with all their
    * edges) and the similarity runs on the remaining subgraph, degrees
    * recomputed there so numerator and denominator stay consistent.
    * On a near-dup pair graph the hubs are template cliques — every
    * pair inside one is already a DIRECT near-dup, so second-order
    * similarity over them is pure cost with no signal (a 780-clique
    * alone contributes ~10⁸ wedges; measured 16.6 s → 0.9 s at cap 64
    * on the sf0.1 pair graph). Default keeps the exact all-node
    * semantics for degree-bounded graphs.
    */
  def neighborJaccard(
      edges: DataFrame, aCol: String, bCol: String,
      minCommon: Long = 1L, maxDegree: Long = Long.MaxValue): DataFrame = {
    val canon0 = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val canon =
      if (maxDegree == Long.MaxValue) canon0
      else {
        val sym0 = canon0.unionByName(
          canon0.select(col("v").as("u"), col("u").as("v")))
        // node-scale survivor list; hubs are few, the semi-joins
        // broadcast
        val keep = sym0.groupBy(col("u").as("id"))
          .agg(count(lit(1)).as("d"))
          .filter(col("d") <= maxDegree)
          .select("id")
        canon0
          .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
      }
    val sym = canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      .materialized
    val deg = sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    val common = sym.as("x").join(sym.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("id_a"), col("y.v").as("id_b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    common
      .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
      .select(col("id_a"), col("id_b"), col("common"),
        round(col("common") / (col("da") + col("db") - col("common")), 6)
          .as("jaccard"))
  }

  /** R-round k-core peel: repeatedly drop nodes whose degree in the
    * CURRENT subgraph is below `k` (degrees recomputed each round on
    * the surviving edges), a fixed number of rounds — the dense-core
    * extractor (template-farm cliques, collusion rings) whose
    * fixed-round form keeps the unrolled-SQL oracle property
    * (fixpoint iteration has a data-dependent round count; R rounds of
    * peeling is the deterministic prefix, and R ≥ graph diameter
    * reaches the true k-core). Output (node, deg): the survivors of
    * round R with the degree that justified keeping them.
    *
    * Per round: one node-scale degree aggregate + two semi-joins
    * filtering the edge list; edges are re-checkpointed per round so
    * the plan stays flat, and edge rows only ever shrink.
    */
  def kCorePeel(
      edges: DataFrame, aCol: String, bCol: String,
      k: Long, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "at least one peel round")
    require(k >= 1, "k must be positive")
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var e = canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .materialized
    var keep: DataFrame = null
    var i = 0
    while (i < rounds) {
      keep = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .materialized
      val ids = keep.select(col("node"))
      e = e
        .join(ids.withColumnRenamed("node", "u").hint("shuffle_hash"), "u",
          "left_semi")
        .join(ids.withColumnRenamed("node", "v").hint("shuffle_hash"), "v",
          "left_semi")
        .materialized
      i += 1
    }
    keep
  }

  /** Bounded-depth BFS from a seed set: (node, dist) for every node
    * within `maxDepth` hops of any seed over the UNDIRECTED graph —
    * trust-frontier labelling (how far does a document sit from the
    * curated set), the reachability complement to
    * [[PageRank.pagerankPersonalized]]'s continuous proximity. Seeds
    * not in the edge set still label themselves at dist 0.
    *
    * Round r: the unlabelled neighbors of the r−1 frontier join in at
    * dist r — one frontier-keyed join + anti-join per round, both
    * node-scale; the labelled set is re-checkpointed so rounds stay
    * O(frontier), the textbook pregel-without-pregel shape.
    */
  def bfsLayers(
      edges: DataFrame, aCol: String, bCol: String,
      seeds: DataFrame, seedCol: String, maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be at least 1")
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .materialized
    var labelled = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .materialized
    var frontier = labelled.select(col("node"))
    var d = 1L
    while (d <= maxDepth) {
      val next = sym
        .join(frontier.withColumnRenamed("node", "u").hint("shuffle_hash"),
          "u", "left_semi")
        .select(col("v").as("node"))
        .distinct()
        .join(labelled.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
        .materialized
      labelled = labelled.unionByName(next).materialized
      frontier = next.select(col("node"))
      d += 1L
    }
    labelled
  }

  /** HITS fixed-point scale: 1e9 (not [[PageRank.Scale]]'s 1e12) so the
    * un-normalized half-step sums stay under 2^63 out to ~10⁹-edge
    * graphs (Σ over edges of scores ≤ m · 1e9).
    */
  val HitsScale: Long = 1000000000L

  /** (node, auth_fp, hub_fp): Kleinberg's HITS over a DIRECTED edge
    * list, all-integer fixed point. Per round: authority = in-edge sum
    * of hub scores, renormalized to total ≈ [[HitsScale]] by the exact
    * integer contraction x div max(1, Σx div SCALE); then hubs from
    * the new authorities symmetrically. Normalization keeps magnitudes
    * bounded without products (no overflow at any graph size the edge
    * bound admits), and every step is order-independent 64-bit integer
    * arithmetic — a fixed iteration count is EXACTLY reproducible by
    * unrolled SQL, the [[PageRank]] oracle discipline.
    *
    * Nodes = distinct edge endpoints; sources hold authority 0, sinks
    * hub 0 — genuinely directional, unlike rank on a symmetrized graph.
    * Scale shape: edges hash-partitioned by the probe key and
    * materialized once; each half-round joins the touched-node score
    * frame (`shuffle_hash` pin — checkpointed scores have no stats) and
    * runs one 1-row total aggregate folded back in-plan as a broadcast
    * cross join (no driver sync between rounds). Zero-score nodes ride
    * NO round: a zero contributes 0 to every edge sum and to the
    * contraction total, and 0 div q = 0, so dropping absent rows is
    * value-identical — the per-round frames are mass-receiving nodes
    * only, and sources/sinks re-enter as coalesced zeros in the final
    * node-scale join (was: a node-scale left join + checkpoint per
    * half-step, and the edge join evaluated twice per half-step — once
    * under the q aggregate, once under the checkpoint; checkpointing
    * the mass frame instead runs it once).
    */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "at least one HITS iteration")
    val eBySrc = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .materialized
    // second layout keyed by dst so NEITHER half-step ever re-shuffles
    // the edge list (each round joins each layout once)
    val eByDst = eBySrc.repartition(col("dst")).materialized
    val nodes = eBySrc.select(col("src").as("id"))
      .unionByName(eBySrc.select(col("dst").as("id")))
      .distinct()
      .materialized
    val nCount = nodes.count()
    require(nCount > 0, "graph must have at least one edge")

    // one half-step: scores flow across `flow` (probe-keyed), land on
    // the opposite endpoint, renormalize by the exact contraction
    def halfStep(
        scores: DataFrame, flowKey: String, landKey: String): DataFrame = {
      val e = if (flowKey == "src") eBySrc else eByDst
      val mass = e
        .join(scores.select(col("id").as(flowKey), col("s"))
          .hint("shuffle_hash"), flowKey)
        .groupBy(col(landKey).as("id"))
        .agg(sum(col("s")).as("v"))
        .materialized
      val q = mass.agg(
        greatest(expr(s"sum(v) div ${HitsScale}L"), lit(1L)).as("q"))
      mass.crossJoin(broadcast(q))
        .select(col("id"), expr("v div q").as("s"))
    }

    var hubs = nodes.select(col("id"), lit(HitsScale / nCount).as("s"))
    var auths = hubs
    var i = 0
    while (i < iterations) {
      auths = halfStep(hubs, "src", "dst")
      hubs = halfStep(auths, "dst", "src")
      i += 1
    }
    nodes
      .join(auths.select(col("id"), col("s").as("auth_fp")),
        Seq("id"), "left")
      .join(hubs.select(col("id"), col("s").as("hub_fp")),
        Seq("id"), "left")
      .select(col("id").as("node"),
        coalesce(col("auth_fp"), lit(0L)).as("auth_fp"),
        coalesce(col("hub_fp"), lit(0L)).as("hub_fp"))
  }

  /** Newman modularity of a node partition over an undirected graph:
    *
    *   Q = (internal edges)/m − Σ_c (d_c / 2m)²
    *
    * — the standard "is this partition better than chance" score for a
    * community assignment (here: how assortative the near-dup graph is
    * under a label like language or source). One row out:
    * (n_edges, n_communities, internal_edges, modularity).
    *
    * Scale shape: an edge-scale label join (two hash joins against the
    * node-scale label frame), then community-scale aggregates. The
    * Σ d_c² term accumulates in decimal(38,0) — exact at any degree
    * mass, converted to double ONCE at the end, so the score is
    * partition-order-independent on both engines (the ARI lesson).
    * Nodes missing a label drop with their edges (inner join, loud in
    * n_edges).
    */
  def modularity(
      edges: DataFrame, aCol: String, bCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val lbl = labels.select(col(idCol).cast("long").as("id"),
      col(labelCol).as("c"))
    val labeled = canon
      .join(lbl.select(col("id").as("u"), col("c").as("cu")), "u")
      .join(lbl.select(col("id").as("v"), col("c").as("cv")), "v")
      .materialized
    val edgeAgg = labeled.agg(
      count(lit(1)).as("m"),
      sum(when(col("cu") === col("cv"), 1L).otherwise(0L)).as("internal"))
    val dc = labeled.select(col("cu").as("c"))
      .unionByName(labeled.select(col("cv").as("c")))
      .groupBy("c").agg(count(lit(1)).as("dc"))
    val dcAgg = dc.agg(
      count(lit(1)).as("n_communities"),
      sum(col("dc").cast("decimal(18,0)") * col("dc").cast("decimal(18,0)"))
        .as("sum_dc2"))
    edgeAgg.crossJoin(dcAgg)
      .select(col("m").as("n_edges"),
        col("n_communities").cast("long").as("n_communities"),
        col("internal").as("internal_edges"),
        Numerics.roundz(col("internal").cast("double") / col("m") -
          col("sum_dc2").cast("double") /
            (lit(4.0) * col("m") * col("m")), 6).as("modularity"))
  }

  /** Synchronous label-propagation community detection (Raghavan 2007,
    * made deterministic): every node starts labeled with its own id;
    * each round EVERY node simultaneously adopts the most frequent
    * label among its neighbors, ties broken by smallest label, isolated
    * nodes keeping their current label. A fixed iteration count with
    * the deterministic tie-break makes the result exactly reproducible
    * by unrolled SQL — the same discipline as [[PageRank]]/[[GraphMetrics.hits]],
    * with a vote-count window rank in place of the integer fixed point.
    *
    * Communities differ from [[ConnectedComponents]]: a long chain is
    * ONE component but fragments into several communities — LPA is the
    * density signal (template families, topic pockets) where components
    * are the reachability signal.
    *
    * Scale: the symmetrized edge list is materialized once; each round
    * shuffles (dst, label, count) vote rows — bounded by |E|, carried
    * as longs — and the per-dst argmax is one window over the vote
    * aggregate's own partitioning. Labels are node-scale, joined to the
    * edge list with a shuffled-hash build ([[PageRank]]'s pin: the
    * checkpointed label frame has unknown stats, and sort-merge would
    * re-sort the edges every round); per-round checkpoint keeps the
    * plan flat in the iteration count.
    */
  def labelPropagation(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val e = canon.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(canon.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src"))
      .materialized
    var labels = nodes
      .select(col(idCol).cast("long").as("id"),
        col(idCol).cast("long").as("label"))
      .materialized
    var i = 0
    while (i < iterations) {
      val votes = e
        .join(labels.withColumnRenamed("id", "src").hint("shuffle_hash"),
          "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      // per-dst argmax as max(struct(count, −label)) — lexicographic
      // struct max IS (count desc, label asc), but as a partial-
      // aggregating hash aggregate instead of a window sort (the window
      // added a per-partition sort on every round's vote frame;
      // measured 92 s → 71 s on the 10× clique-dense rehearsal graph,
      // vs 40 s for 3-round pagerank on the same graph — LPA pays two
      // |E|-bounded aggregates per round to pagerank's one)
      val best = votes
        .groupBy(col("dst"))
        .agg(max(struct(col("c").as("c"), (-col("label")).as("nl")))
          .as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("newl"))
      labels = labels
        .join(best.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("newl"), col("label")).as("label"))
        .materialized
      i += 1
    }
    labels.select(col("id").as(idCol), col("label").as("community"))
  }

  /** One-hop neighbor-degree aggregation — the simplest GNN-style
    * message pass, integer-exact: per node, its neighbor count plus
    * the sum and max of its neighbors' degrees (degree-2 structural
    * features; high nbr_deg_max flags hub-adjacency, nbr_deg_sum /
    * n_neighbors is the mean a float GNN layer would compute).
    * Isolated nodes appear with zeros.
    *
    * Cost: one degree aggregate + one edges⨝degrees hash join keyed
    * by node + one node-scale aggregate — all |E|-bounded, the same
    * per-round shape as pagerank, run once.
    */
  def neighborDegreeAgg(
      nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val sym = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val agg = sym
      .join(deg.select(col("id").as("dst"), col("deg")), Seq("dst"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(col("deg")).as("nbr_deg_sum"),
        max(col("deg")).as("nbr_deg_max"))
    nodes.select(col(idCol).cast("long").as(idCol))
      .join(agg.withColumnRenamed("src", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        coalesce(col("nbr_deg_sum"), lit(0L)).as("nbr_deg_sum"),
        coalesce(col("nbr_deg_max"), lit(0L)).as("nbr_deg_max"))
  }

  /** Bounded-round Bellman–Ford: single/multi-source shortest paths
    * over a WEIGHTED directed edge list with integer weights —
    * distances stay exact longs, so the result is hash-stable under
    * any partitioning. `rounds` bounds the relaxation count: paths of
    * more than `rounds` hops are not discovered (pick rounds ≥
    * diameter for the full answer, or keep it small for a bounded-
    * horizon distance label — the crawl-frontier / trust-propagation
    * use). Unreached nodes are absent from the output.
    *
    * Per round: one shuffle-on-dst aggregate (candidate relaxations,
    * map-side-combined min) + one node-keyed min merge — |E|- then
    * |V|-bounded, the pagerank round shape; edges are materialized
    * once and distance frames per round (lineage truncated through
    * [[Materialize]], so the reliable-checkpoint knob applies).
    */
  def bellmanFord(
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      sources: DataFrame, sourceCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be at least 1")
    val e = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"),
        col(wCol).cast("long").as("w"))
      .filter(col("u") =!= col("v"))
      .repartition(col("u"))
      .materialized
    var dist = sources.select(col(sourceCol).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .materialized
    var r = 0
    while (r < rounds) {
      val relaxed = e
        .join(dist.withColumnRenamed("node", "u").hint("shuffle_hash"), "u")
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node"))
        .agg(min(col("dist")).as("dist"))
        .materialized
      r += 1
    }
    dist
  }

  /** Degree assortativity (Newman 2002): Pearson correlation of the
    * endpoint TOTAL degrees over the edge list — positive when hubs
    * link to hubs (social shape), negative when hubs link to leaves
    * (hub-and-spoke / crawl-frontier shape). Degrees count occurrences
    * at EITHER endpoint, so a directed (non-symmetrized) edge list is
    * safe: a node appearing only as dst still has a degree, and no
    * edge is dropped by the degree joins. For an undirected graph pass
    * both edge directions (each endpoint's total degree then doubles —
    * Pearson correlation is scale-invariant, so the coefficient is
    * unchanged).
    *
    * Everything is exact integers until one final double chain: the
    * degree frame is one count aggregate over the unioned endpoints,
    * each edge picks up its two endpoint degrees via node-scale joins,
    * and the correlation needs only the six sums (M, Σdu, Σdv, Σdu·dv,
    * Σdu², Σdv²) — map-side combined, no sort, no iteration.
    */
  def degreeAssortativity(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
    val deg = e.select(col("_u").as("_n"))
      .unionByName(e.select(col("_v").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
    val sums = e
      .join(deg.select(col("_n").as("_u"), col("_d").as("_du")), Seq("_u"))
      .join(deg.select(col("_n").as("_v"), col("_d").as("_dv")), Seq("_v"))
      .agg(count(lit(1)).as("m_edges"),
        sum(col("_du")).as("_su"), sum(col("_dv")).as("_sv"),
        sum(col("_du") * col("_dv")).as("_suv"),
        sum(col("_du") * col("_du")).as("_squ"),
        sum(col("_dv") * col("_dv")).as("_sqv"))
    sums.select(col("m_edges"),
      Numerics.roundz(
        (col("m_edges") * col("_suv") - col("_su") * col("_sv"))
          .cast("double") /
          (sqrt((col("m_edges") * col("_squ") - col("_su") * col("_su"))
            .cast("double")) *
            sqrt((col("m_edges") * col("_sqv") - col("_sv") * col("_sv"))
              .cast("double"))), 6).as("assortativity"))
  }

  /** Per-node local clustering coefficient 2T/(d(d−1)) — how
    * clique-like each node's neighborhood is (1 inside a template
    * clique, ~0 on an organic near-dup chain), the per-node
    * complement of the global [[triangleCounts]] readout. Nodes with
    * degree < 2 get coefficient 0 by convention. Same cost shape as
    * triangle counting (its degree-oriented wedge join IS the work);
    * the division is one exact-integer ratio per node.
    */
  def localClustering(
      edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("id"))
      .unionByName(canon.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    triangleCounts(edges, aCol, bCol)
      .join(deg, col("node") === col("id"))
      .select(col("node"), col("degree"), col("triangles"),
        Numerics.roundz(
          when(col("degree") < 2, lit(0.0))
            .otherwise((lit(2) * col("triangles")).cast("double") /
              (col("degree") * (col("degree") - 1)).cast("double")),
          6).as("lcc"))
  }

  /** Edge reciprocity of a directed graph: the share of distinct
    * non-loop edges (a, b) whose reverse (b, a) is also present —
    * near 1 for conversational/mutual structure, near 0 for
    * feed-forward flows. One distinct on the edge key and one
    * self-join on the swapped key (both hash-partitioned by the edge
    * pair, never node-fanout), then a 1-row exact ratio.
    */
  def reciprocity(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("string").as("_a"),
        col(dstCol).cast("string").as("_b"))
      .filter(col("_a") =!= col("_b"))
      .distinct()
      .materialized
    val rec = e.as("x").join(e.as("y"),
        col("x._a") === col("y._b") && col("x._b") === col("y._a"))
      .select(col("x._a"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(rec.agg(count(lit(1)).as("n_reciprocal"))))
      .select(col("n_edges"), col("n_reciprocal"),
        Numerics.roundz(col("n_reciprocal").cast("double") /
          col("n_edges").cast("double"), 6).as("reciprocity"))
  }

  /** Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) for each
    * degree threshold: the edge density among nodes of degree > k —
    * rising φ with k means the hubs form their own dense core (the
    * "rich club" of template families / crawl hubs). One degree
    * aggregate, then per threshold a broadcast-membership filter over
    * the canonical edge list and two counts; thresholds are a
    * config-scale constant, so the edge list is scanned |ks| times
    * with no pair blow-up. φ is 0 by convention when N_k < 2.
    */
  def richClub(
      edges: DataFrame, aCol: String, bCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"thresholds: $ks")
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .materialized
    val deg = canon.select(col("u").as("id"))
      .unionByName(canon.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("_d"))
    val rows = ks.map { k =>
      val club = deg.filter(col("_d") > k).select(col("id"))
      val nNodes = club.agg(count(lit(1)).as("n_nodes"))
      val nEdges = canon
        .join(broadcast(club.select(col("id").as("u"))), Seq("u"))
        .join(broadcast(club.select(col("id").as("v"))), Seq("v"))
        .agg(count(lit(1)).as("n_edges"))
      nNodes.crossJoin(broadcast(nEdges))
        .select(lit(k.toLong).as("k"), col("n_nodes"), col("n_edges"),
          Numerics.roundz(
            when(col("n_nodes") < 2, lit(0.0))
              .otherwise((lit(2) * col("n_edges")).cast("double") /
                (col("n_nodes") * (col("n_nodes") - 1)).cast("double")),
            6).as("phi"))
    }
    rows.reduce(_ unionByName _).orderBy("k")
  }

  /** EXACT neighborhood function: (t, nf) for t = 0..maxDepth where
    * nf = Σ_v |{w : dist(v, w) ≤ t}| over the UNDIRECTED graph
    * (symmetrized, self-loops dropped, nodes = edge endpoints) — the
    * ground-truth twin of [[HyperBall.neighborhoodEstimate]]'s HLL
    * estimate (same convention split as dedup_minhash/exact).
    *
    * Scale caveat BY DESIGN: the state is the (src, node) BALL-PAIR
    * frame — node²-bounded — expanded one edge-join + distinct per
    * round. That is exactly the blow-up HyperBall's register frame
    * avoids; this face exists as the oracle for small graphs and the
    * per-round counts stay fully distributed (one count() per round,
    * no row collect).
    */
  def neighborhoodFunction(
      edges: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 4): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .materialized
    var balls = sym.select(col("u").as("src")).distinct()
      .withColumn("node", col("src"))
      .materialized
    val out = Seq.newBuilder[(Int, Long)]
    out += 0 -> balls.count()
    var t = 1
    while (t <= maxDepth) {
      val grown = sym
        .join(balls.withColumnRenamed("node", "u").hint("shuffle_hash"), "u")
        .select(col("src"), col("v").as("node"))
      balls = balls.unionByName(grown).distinct().materialized
      out += t -> balls.count()
      t += 1
    }
    out.result().toDF("t", "nf")
  }

  /** EXACT truncated harmonic centrality, ALL-INTEGER fixed point:
    * (node, h_fp) where h_fp = Σ_{w, 1 ≤ d(v,w) ≤ maxDepth} L / d(v,w)
    * with L = lcm(1..maxDepth) — every term divides exactly, so the
    * per-node sum is order-independent 64-bit arithmetic and the gate
    * hashes bit-for-bit against the SQL replay (the [[PageRank]]
    * oracle discipline). Ground-truth twin of
    * [[HyperBall.harmonicEstimate]]; same node²-bounded ball-pair
    * caveat as [[neighborhoodFunction]] — the register face is the
    * 100 TB path.
    */
  def harmonicScaled(
      edges: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .materialized
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val scale = (1 to maxDepth).foldLeft(1L)((l, t) => l / gcd(l, t) * t)
    var labelled = sym.select(col("u").as("src")).distinct()
      .select(col("src"), col("src").as("node"), lit(0).as("d"))
      .materialized
    var t = 1
    while (t <= maxDepth) {
      val frontier = labelled.filter(col("d") === t - 1)
        .select(col("src"), col("node"))
      val next = sym
        .join(frontier.withColumnRenamed("node", "u").hint("shuffle_hash"),
          "u")
        .select(col("src"), col("v").as("node"))
        .distinct()
        .join(labelled.select("src", "node"), Seq("src", "node"),
          "left_anti")
        .withColumn("d", lit(t))
        .materialized
      labelled = labelled.unionByName(next).materialized
      t += 1
    }
    labelled.filter(col("d") >= 1)
      .groupBy(col("src").as("node"))
      // `div` is Spark's integral division — L/d divides exactly by
      // construction (d | lcm(1..maxDepth)), so h_fp is a pure long sum
      .agg(sum(expr(s"$scale div cast(d as bigint)")).as("h_fp"))
  }
}
