package graft.operators

import graft.SparkSpec

class HyperBallSpec extends SparkSpec {

  import spark.implicits._

  // path graph 1-2-3-4-5 plus an isolated edge 10-11
  private val pathEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    .toDF("a", "b")

  private def exact(edges: org.apache.spark.sql.DataFrame,
      depth: Int): Map[Int, Long] =
    GraphMetrics.neighborhoodFunction(edges, "a", "b", depth)
      .as[(Int, Long)].collect().toMap

  test("exact neighborhood function on a hand graph (BFS ground truth)") {
    val nf = exact(pathEdges, 4)
    // t=0: 7 nodes. t=1: path contributes 3+4+4+4+3=... compute:
    // balls at t=1: node1{1,2}=2, node2{1,2,3}=3, node3{2,3,4}=3,
    // node4{3,4,5}=3, node5{4,5}=2, node10{10,11}=2, node11{10,11}=2 → 17
    // t=2: 1{1,2,3}=3, 2{1..4}=4, 3{1..5}=5, 4{2..5}=4, 5{3,4,5}=3,
    //      10,11 saturated 2+2 → 23
    // t=3: 1{1..4}=4, 2{1..5}=5, 3=5, 4=5, 5{2..5}=4, +4 → 27
    // t=4: path all 5 each for 5 nodes = 25, +4 → 29
    assert(nf === Map(0 -> 7L, 1 -> 17L, 2 -> 23L, 3 -> 27L, 4 -> 29L))
  }

  test("exact nf: symmetrization, self-loops and duplicate edges ignored") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L))
      .toDF("a", "b")
    val nf = exact(messy, 2)
    assert(nf === Map(0 -> 2L, 1 -> 4L, 2 -> 4L))
  }

  test("HyperBall estimate tracks the exact nf within HLL error") {
    // clique of 12 + ring of 8: known saturation behavior
    val clique = for {
      i <- 1L to 12L; j <- (i + 1) to 12L
    } yield (i, j)
    val ring = (0L until 8L).map(i => (100L + i, 100L + (i + 1) % 8))
    val edges = (clique ++ ring).toDF("a", "b")
    val truth = exact(edges, 4)
    val est = HyperBall.neighborhoodEstimate(edges, "a", "b", 4, m = 64)
      .as[(Int, Double)].collect().toMap
    assert(est.keySet === truth.keySet)
    // m=64 → relative standard error ≈ 1.04/8 = 13%; allow 3σ-ish 40%
    for ((t, nf) <- truth) {
      val e = est(t)
      assert(math.abs(e - nf) / nf < 0.4,
        s"t=$t: est $e vs exact $nf")
    }
    // monotone non-decreasing in t (register max only grows)
    val sorted = est.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a2, b2) => b2 >= a2 - 1e-9 })
  }

  test("HyperBall on the disconnected path graph: per-component " +
    "saturation (estimates deterministic across reruns)") {
    val e1 = HyperBall.neighborhoodEstimate(pathEdges, "a", "b", 3, m = 64)
      .as[(Int, Double)].collect().toMap
    val e2 = HyperBall.neighborhoodEstimate(
        pathEdges.repartition(7), "a", "b", 3, m = 64)
      .as[(Int, Double)].collect().toMap
    assert(e1 === e2) // md5 registers + integer micro fixing
    // the isolated pair saturates at t=1 and stops contributing growth
    assert(e1(2) > e1(1))
  }

  test("exact harmonic centrality on the hand path graph " +
    "(all-integer L/d sums)") {
    // L = lcm(1..3) = 6; path 1-2-3-4-5: ends 6+3+2=11, next 12+3+2=17,
    // middle 12+6=18; isolated pair: 6 each
    val h = GraphMetrics.harmonicScaled(pathEdges, "a", "b", maxDepth = 3)
      .as[(Long, Long)].collect().toMap
    assert(h === Map(1L -> 11L, 2L -> 17L, 3L -> 18L, 4L -> 17L,
      5L -> 11L, 10L -> 6L, 11L -> 6L))
  }

  test("HyperBall harmonic estimate tracks the exact values within " +
    "HLL error and is deterministic") {
    val clique = (for { i <- 1L to 10L; j <- (i + 1) to 10L } yield (i, j))
      .toDF("a", "b")
    val exactH = GraphMetrics.harmonicScaled(clique, "a", "b", maxDepth = 3)
      .as[(Long, Long)].collect().toMap // all 9 neighbors at d=1: 9·6=54
    assert(exactH.values.toSet === Set(54L))
    val est = HyperBall.harmonicEstimate(clique, "a", "b", maxDepth = 3,
      m = 64).as[(Long, Long)].collect().toMap
    assert(est.keySet === exactH.keySet)
    // h_fp scale: micro × lcm(1..3) = 1e6 × 6
    for ((n, fp) <- est) {
      val h = fp.toDouble / 6e6
      assert(math.abs(h - 9.0) / 9.0 < 0.4, s"node $n: $h vs 9")
    }
    val est2 = HyperBall.harmonicEstimate(clique.repartition(5), "a", "b",
      maxDepth = 3, m = 64).as[(Long, Long)].collect().toMap
    assert(est === est2)
  }

  test("effective diameter: clique hits q=0.9 at t=1, path needs more") {
    val clique = (for { i <- 1L to 6L; j <- (i + 1) to 6L } yield (i, j))
      .toDF("a", "b")
    assert(HyperBall.effectiveDiameter(clique, "a", "b", maxDepth = 3) === 1)
    val path = (1L to 9L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("a", "b")
    assert(HyperBall.effectiveDiameter(path, "a", "b", maxDepth = 8) >= 3)
  }
}
