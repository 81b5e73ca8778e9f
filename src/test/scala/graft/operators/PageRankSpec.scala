package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: hand-computed integer ranks (the arithmetic is
  * exact, so the assertions are equalities, not tolerances), total
  * assignment, and the plan shape.
  */
class PageRankSpec extends SparkSpec {

  // path graph 1–2–3 (symmetrized) + isolated node 9
  private def nodes = {
    val s = spark
    import s.implicits._
    Seq(1L, 2L, 3L, 9L).toDF("id")
  }
  private def edges = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
  }

  test("two iterations produce the hand-computed exact integer ranks") {
    // N=4: r0 = 250000000000 each, base = 15e12/400 = 37500000000
    // iter1: m = (125e9, 500e9, 125e9) -> r = (143.75e9, 462.5e9, 143.75e9)
    // iter2: m = (231.25e9, 287.5e9, 231.25e9)
    //        -> r = (234.0625e9, 281.875e9, 234.0625e9); isolated keeps base
    val got = PageRank.pagerank(nodes, "id", edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 234062500000L, 2L -> 281875000000L,
      3L -> 234062500000L, 9L -> 37500000000L), s"got $got")
  }

  test("assignment is total and the hub outranks the leaves") {
    val got = PageRank.pagerank(nodes, "id", edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 4, "every node must be ranked")
    assert(got(2L) > got(1L) && got(2L) > got(3L),
      s"degree-2 hub must outrank the path ends: $got")
    assert(got(9L) < got(1L), s"isolated node must rank last: $got")
    assert(got(1L) == got(3L), s"symmetric nodes must tie exactly: $got")
  }

  test("rank mass never exceeds the teleport+damping budget") {
    val got = PageRank.pagerank(nodes, "id", edges, "src", "dst", iterations = 3)
      .agg(sum("rank_fp")).head().getLong(0)
    // dangling (isolated) nodes leak their damped mass by design:
    // total <= SCALE, and >= the pure-teleport floor 0.15*SCALE
    assert(got <= PageRank.Scale && got >= 15L * PageRank.Scale / 100,
      s"mass out of bounds: $got")
  }

  test("personalized: two iterations match the hand-computed seeded ranks") {
    val s = spark
    import s.implicits._
    // seed {1} on the 1-2-3 path: S=1, r0 = (1e12, 0, 0, 0),
    // seed base = 15e12/100 = 150000000000
    // iter1: m=(0, 1e12, 0) -> r=(150e9, 850e9, 0, 0)
    // iter2: m=(425e9, 150e9, 425e9)
    //        -> r=(150e9+361.25e9, 127.5e9, 361.25e9, 0)
    val seeds = Seq(1L).toDF("id")
    val got = PageRank.pagerankPersonalized(
        nodes, "id", edges, "src", "dst", seeds, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 511250000000L, 2L -> 127500000000L,
      3L -> 361250000000L, 9L -> 0L), s"got $got")
  }

  test("personalized: rank measures proximity to the seed set") {
    val s = spark
    import s.implicits._
    val got = PageRank.pagerankPersonalized(
        nodes, "id", edges, "src", "dst", Seq(1L).toDF("id"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) > got(3L), s"one hop must outrank two hops: $got")
    assert(got(9L) == 0L, "unreachable nodes hold zero rank")
    intercept[IllegalArgumentException] {
      PageRank.pagerankPersonalized(
        nodes, "id", edges, "src", "dst", Seq(555L).toDF("id"))
        .collect()
    }
  }

  test("weighted: one iteration matches the hand-computed 3:1 split") {
    val s = spark
    import s.implicits._
    // 1-2 at weight 3, 2-3 at weight 1 (sym): SW = (3, 4, 1)
    // rates = (250e9 div 3, 250e9 div 4, 250e9) = (83333333333, 62.5e9, 250e9)
    // m(1) = 62.5e9*3; m(2) = 83333333333*3 + 250e9; m(3) = 62.5e9*1
    // r1 = (196875000000, 462499999999, 90625000000, base 37.5e9)
    val we = Seq((1L, 2L, 3L), (2L, 1L, 3L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w")
    val got = PageRank.pagerankWeighted(
        nodes, "id", we, "src", "dst", "w", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 196875000000L, 2L -> 462499999999L,
      3L -> 90625000000L, 9L -> 37500000000L), s"got $got")
  }

  test("weighted with unit weights equals the unweighted recurrence") {
    val s = spark
    import s.implicits._
    val unit = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w")
    val a = PageRank.pagerankWeighted(
        nodes, "id", unit, "src", "dst", "w", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.pagerank(nodes, "id", edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"$a != $b")
  }

  test("dangling: two iterations match the hand-computed sink-graph ranks") {
    val s = spark
    import s.implicits._
    // chain 1→2→3, node 3 is a sink. N=3: r0 = 333333333333 each,
    // base = 15e12 div 300 = 50000000000.
    // iter1: D = r(3) = 333333333333, share = D div 3 = 111111111111
    //   r(1) = base + 85·(0+share) div 100            = 144444444444
    //   r(2) = base + 85·(333333333333+share) div 100 = 427777777777
    //   r(3) = base + 85·(333333333333+share) div 100 = 427777777777
    // iter2: D = 427777777777, share = 142592592592
    //   r(1) = base + 85·share div 100                        = 171203703703
    //   r(2) = base + 85·(144444444444+share) div 100         = 293981481480
    //   r(3) = base + 85·(427777777777+share) div 100         = 534814814813
    val chainNodes = Seq(1L, 2L, 3L).toDF("id")
    val chainEdges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = PageRank.pagerankDangling(
        chainNodes, "id", chainEdges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 171203703703L, 2L -> 293981481480L,
      3L -> 534814814813L), s"got $got")
  }

  test("dangling: rank mass is conserved up to integer truncation") {
    val s = spark
    import s.implicits._
    val chainNodes = Seq(1L, 2L, 3L).toDF("id")
    val chainEdges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = PageRank.pagerankDangling(
        chainNodes, "id", chainEdges, "src", "dst", iterations = 3)
      .agg(sum("rank_fp")).head().getLong(0)
    // the drop-dangling variant would leak ~85% of the sink's rank per
    // round; redistribution keeps the total within truncation slack
    // (< 1 unit per node per arithmetic step)
    assert(got <= PageRank.Scale && got >= PageRank.Scale - 100L,
      s"mass not conserved: $got")
  }

  test("dangling on a graph with no dangling nodes equals plain pagerank") {
    val s = spark
    import s.implicits._
    val cyc = Seq(1L, 2L, 3L).toDF("id")
    val cycEdges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val a = PageRank.pagerankDangling(cyc, "id", cycEdges, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.pagerank(cyc, "id", cycEdges, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"$a != $b")
  }

  test("weighted dangling with unit weights equals the unweighted dangling") {
    val s = spark
    import s.implicits._
    val chainNodes = Seq(1L, 2L, 3L).toDF("id")
    val unit = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val a = PageRank.pagerankWeightedDangling(
        chainNodes, "id", unit, "src", "dst", "w", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.pagerankDangling(
        chainNodes, "id", Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
        "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"$a != $b")
  }

  test("contract errors: empty graph and non-positive weights are rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      PageRank.pagerank(
        Seq.empty[Long].toDF("id"), "id", edges, "src", "dst")
    }
    intercept[IllegalArgumentException] {
      PageRank.pagerankWeighted(
        nodes, "id",
        Seq((1L, 2L, 0L), (2L, 1L, 3L)).toDF("src", "dst", "w"),
        "src", "dst", "w")
    }
  }

  test("iteration joins stay hash/sort equi-joins") {
    val plan = PageRank.pagerank(nodes, "id", edges, "src", "dst", iterations = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"degenerate join:\n$plan")
  }
}
