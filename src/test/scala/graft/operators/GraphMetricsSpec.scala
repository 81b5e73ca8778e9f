package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class GraphMetricsSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id_a", "id_b")
  }

  test("triangle counts: one triangle plus a pendant edge") {
    val out = GraphMetrics.triangleCounts(
        edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("triangle counts on K4: every node in 3 triangles") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = GraphMetrics.triangleCounts(k4, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts ignore duplicate/reversed/self edges") {
    val messy = edges((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (2L, 2L))
    val out = GraphMetrics.triangleCounts(messy, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("neighbor jaccard: triangle gives 1/3 everywhere; path gives 1.0") {
    val tri = GraphMetrics.neighborJaccard(
        edges((1L, 2L), (1L, 3L), (2L, 3L)), "id_a", "id_b")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(tri.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(tri.values.forall { case (c, j) => c == 1L && j == 0.333333 })
    val path = GraphMetrics.neighborJaccard(
        edges((1L, 2L), (2L, 3L)), "id_a", "id_b")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(path == Map((1L, 3L) -> ((1L, 1.0)))) // twins: N(1)=N(3)={2}
  }

  test("neighbor jaccard minCommon filters low-overlap pairs") {
    // 1 and 4 share {2,3}; 2 and 3 share {1,4}; every other pair
    // shares at most one neighbor and is cut at minCommon=2
    val g = edges((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (5L, 2L))
    val out = GraphMetrics.neighborJaccard(g, "id_a", "id_b", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 4L, 2L), (2L, 3L, 2L)))
  }

  test("neighbor jaccard maxDegree excludes hubs and recomputes degrees") {
    // hub 9 touches everyone; without it, 1-2-3 is a path through 2.
    // cap 3 drops node 9 (deg 4) and ALL its edges; on the remaining
    // subgraph N(1)={2}, N(3)={2} -> (1,3) jaccard 1.0 — the 1.0 only
    // holds if degrees were recomputed after the hub removal.
    val g = edges((1L, 2L), (2L, 3L), (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))
    val out = GraphMetrics.neighborJaccard(g, "id_a", "id_b",
        minCommon = 1L, maxDegree = 3L)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map((1L, 3L) -> ((1L, 1.0))), s"got $out")
    // default cap = unlimited keeps the exact semantics (hub wedges in)
    val full = GraphMetrics.neighborJaccard(g, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.contains((1L, 4L)), "uncapped keeps hub-mediated pairs")
  }

  test("modularity: hand-computed two-community barbell") {
    val s = spark
    import s.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by one bridge (3,4):
    // m=7, internal=6; degrees: A={2,2,3}=7, B={3,2,2}=7
    // Q = 6/7 - 2*(7/14)^2 = 6/7 - 1/2 = 0.357143
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val lbl = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("id", "c")
    val r = GraphMetrics.modularity(g, "id_a", "id_b", lbl, "id", "c").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((7L, 2L, 6L)))
    assert(r.getDouble(3) == 0.357143, s"got ${r.getDouble(3)}")
  }

  test("modularity: the all-in-one partition scores zero") {
    val s = spark
    import s.implicits._
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L))
    val lbl = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("id", "c")
    // internal/m = 1, sum_dc2 = (2m)^2 -> Q = 1 - 1 = 0
    val r = GraphMetrics.modularity(g, "id_a", "id_b", lbl, "id", "c").head()
    assert(r.getDouble(3) == 0.0)
  }

  test("k-core peel cascades: each round's cuts expose the next") {
    // triangle {1,2,3} with a tail 3—4—5: round 1 cuts 5 (deg 1),
    // which drops 4 to deg 1 for round 2; the triangle survives k=2
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val out = GraphMetrics.kCorePeel(g, "id_a", "id_b", k = 2L, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round only: 5 is gone but 4 still held its pre-cut degree
    val r1 = GraphMetrics.kCorePeel(g, "id_a", "id_b", k = 2L, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(r1 == Set(1L, 2L, 3L, 4L))
  }

  test("bfs layers label min-hop distance, bounded by maxDepth") {
    val s = spark
    import s.implicits._
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
    val seeds = Seq(1L, 99L).toDF("doc_id") // 99: isolated seed
    val out = GraphMetrics.bfsLayers(g, "id_a", "id_b", seeds, "doc_id",
        maxDepth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 99L -> 0L, 2L -> 1L, 3L -> 2L))
    // depth 3 reaches node 4; 5 and 6 stay unreachable
    val d3 = GraphMetrics.bfsLayers(g, "id_a", "id_b", seeds, "doc_id",
        maxDepth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d3 == out + (4L -> 3L))
  }

  test("hits: hand-computed chain, one iteration") {
    // 1→2, 1→3, 2→3: node 1 is the pure hub, node 3 the pure authority
    val out = GraphMetrics.hits(
        edges((1L, 2L), (1L, 3L), (2L, 3L)), "id_a", "id_b", iterations = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val h0 = GraphMetrics.HitsScale / 3 // 333333333
    assert(out(1L) == ((0L, 3 * h0)))
    assert(out(2L) == ((h0, 2 * h0)))
    assert(out(3L) == ((2 * h0, 0L)))
  }

  test("hits respects graph automorphisms; the hub-center dominates") {
    // path 1—2—3 symmetrized: swapping 1 and 3 is an automorphism, so
    // their scores must agree exactly; the center holds the authority
    // mass. (hub ≠ auth at finite k even on symmetric graphs — they
    // are odd vs even powers of A applied to the start vector.)
    val sym = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val out = GraphMetrics.hits(sym, "id_a", "id_b", iterations = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == out(3L))
    assert(out(2L)._1 > out(1L)._1) // center dominates authority
    assert(out.values.forall { case (a, h) => a >= 0L && h >= 0L })
  }

  test("hits renormalization keeps totals near HitsScale across rounds") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val out = GraphMetrics.hits(g, "id_a", "id_b", iterations = 3).collect()
    val ta = out.map(_.getLong(1)).sum
    val th = out.map(_.getLong(2)).sum
    assert(ta > GraphMetrics.HitsScale / 2 && ta <= GraphMetrics.HitsScale * 2)
    assert(th > GraphMetrics.HitsScale / 2 && th <= GraphMetrics.HitsScale * 2)
  }

  test("label propagation: two triangles + bridge, hand-computed rounds") {
    val s = spark
    import s.implicits._
    val nodes = (1L to 7L).toDF("id")
    // triangle {1,2,3}, triangle {4,5,6}, bridge 3—4, isolate 7
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    // synchronous min-tie-break rounds, worked by hand:
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4
    // r2: 1→1 2→1 3→1 4→4 5→3 6→3
    // r3: 1→1 2→1 3→1 4→3 5→3 6→3  (7 keeps 7 throughout)
    val out = GraphMetrics.labelPropagation(nodes, "id", g, "id_a", "id_b",
        iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L, 7L -> 7L))
  }

  test("label propagation round 1 matches the hand computation too") {
    val s = spark
    import s.implicits._
    val nodes = (1L to 6L).toDF("id")
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val out = GraphMetrics.labelPropagation(nodes, "id", g, "id_a", "id_b",
        iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 4L, 6L -> 4L))
  }

  test("label propagation input orientation and duplicates are canonicalized") {
    val s = spark
    import s.implicits._
    val nodes = (1L to 3L).toDF("id")
    // duplicate edges in both orientations + a self-loop must not
    // change the vote counts
    val g = edges((1L, 2L), (2L, 1L), (2L, 1L), (2L, 3L), (3L, 3L))
    val clean = edges((1L, 2L), (2L, 3L))
    val a = GraphMetrics.labelPropagation(nodes, "id", g, "id_a", "id_b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphMetrics.labelPropagation(nodes, "id", clean, "id_a", "id_b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("neighbor degree aggregation: star + isolated node") {
    val s = spark
    import s.implicits._
    // star: 1-2, 1-3, 1-4; node 5 isolated.
    // degrees: 1→3, leaves→1.
    val nodes = (1L to 5L).toDF("id")
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L))
    val out = GraphMetrics.neighborDegreeAgg(nodes, "id", g, "id_a", "id_b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 1L),  // hub sees three degree-1 leaves
      (2L, 1L, 3L, 3L),  // each leaf sees the degree-3 hub
      (3L, 1L, 3L, 3L),
      (4L, 1L, 3L, 3L),
      (5L, 0L, 0L, 0L))) // isolated node appears with zeros
  }

  test("bellmanFord relaxes competing paths to exact min distances") {
    val s = spark
    import s.implicits._
    // 0→1 (w=10) and 0→2 (w=1) → 2→1 (w=2): the 2-hop path wins.
    // 1→3 (w=1): distance to 3 improves only after dist(1) settles —
    // needs 3 rounds, pinning the multi-round propagation.
    val e = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L), (1L, 3L, 1L))
      .toDF("u", "v", "w")
    val src = Seq(Tuple1(0L)).toDF("node0")
    val got = GraphMetrics.bellmanFord(e, "u", "v", "w", src, "node0", 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 0L), (1L, 3L), (2L, 1L), (3L, 4L)))
    // one round: only direct edges from the source relax
    val r1 = GraphMetrics.bellmanFord(e, "u", "v", "w", src, "node0", 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.toSeq == Seq((0L, 0L), (1L, 10L), (2L, 1L)))
  }

  test("bellmanFord multi-source takes the nearest source") {
    val s = spark
    import s.implicits._
    val e = Seq((0L, 5L, 4L), (9L, 5L, 1L)).toDF("u", "v", "w")
    val src = Seq(Tuple1(0L), Tuple1(9L)).toDF("n")
    val got = GraphMetrics.bellmanFord(e, "u", "v", "w", src, "n", 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 0L), (5L, 1L), (9L, 0L)))
  }

  test("powerLawAlpha: uniform degree d gives the closed-form alpha") {
    // a 4-cycle: every node has degree 2 → α = 1 + n/(n·ln(2/1.5))
    val cyc = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val r = GraphMetrics.powerLawAlpha(cyc, "id_a", "id_b").head()
    assert(r.getLong(0) == 4L)
    val expect = 1.0 + 1.0 / math.log(2.0 / 1.5)
    assert(math.abs(r.getDouble(1) - expect) < 1e-6)
    // hub-and-spoke has a heavier tail mix → smaller denominator terms
    // for leaves (degree 1 filtered by dmin=2), only the hub counts
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val r2 = GraphMetrics.powerLawAlpha(star, "id_a", "id_b").head()
    assert(r2.getLong(0) == 1L) // only the hub has degree >= 2
  }
}
