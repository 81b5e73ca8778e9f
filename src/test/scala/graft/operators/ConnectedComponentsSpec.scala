package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id_a", "id_b")
  }

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    ConnectedComponents.components(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to its min id (multi-round propagation)") {
    val cc = run(edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint clusters keep separate components") {
    val cc = run(edges((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("component remap is the transitive closure of pairwise remap") {
    // pairwise remap on these pairs maps 3->2 (its only pair) — the
    // component remap maps 3 all the way down to 1
    val remap = ConnectedComponents
      .componentRemap(edges((1L, 2L), (2L, 3L)), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(remap == Set((2L, 1L), (3L, 1L)))
  }

  test("unconverged graphs throw instead of returning wrong labels") {
    val chain = edges((1L to 99L).map(i => (i, i + 1)): _*)
    intercept[IllegalStateException] {
      ConnectedComponents.components(chain, "id_a", "id_b", maxIter = 2,
          preContract = false)
        .collect()
    }
  }

  test("pointer jumping collapses a long chain in logarithmic rounds") {
    // a 100-node chain has diameter 99; plain propagation would need
    // ~99 rounds — with pointer jumping 12 rounds must suffice
    // (preContract off: this test characterizes the iterative core)
    val chain = edges((1L to 99L).map(i => (i, i + 1)): _*)
    val got = ConnectedComponents.components(chain, "id_a", "id_b", maxIter = 12,
        preContract = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 100 && got.values.forall(_ == 1L))
  }

  test("per-partition pre-contraction: same labels, far fewer rounds") {
    // the 99-edge chain spans ≤32 partitions, so after local union-find
    // the stitched graph has ≤32 super-nodes: pointer jumping converges
    // well inside 8 rounds (uncontracted the same budget suffices only
    // because of jumping — maxIter=2 throws, asserted above)
    val chain = edges((1L to 99L).map(i => (i, i + 1)): _*)
    val got = ConnectedComponents.components(chain, "id_a", "id_b", maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 100 && got.values.forall(_ == 1L))
    // contraction preserves the exact labelling on a multi-cluster graph
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (5L, 5L))
    val contracted = ConnectedComponents.components(g, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = ConnectedComponents.components(g, "id_a", "id_b",
        preContract = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(contracted == plain)
  }

  test("localContract preserves the node universe via root self-loops") {
    val g = edges((5L, 5L), (1L, 2L), (2L, 3L))
    // single partition so the whole graph is one task's local subgraph
    val star = ConnectedComponents.localContract(
      g.selectExpr("cast(id_a as long) as src", "cast(id_b as long) as dst")
        .coalesce(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every node appears as a src; every non-root points at its local min
    assert(star.map(_._1) == Set(1L, 2L, 3L, 5L))
    assert(star.filter(p => p._1 != p._2).forall(_._2 == 1L))
    assert(star.contains((5L, 5L)) && star.contains((1L, 1L)))
  }

  private def runStar(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    ConnectedComponents.componentsStar(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction matches label propagation on chains and clusters") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (20L, 21L), (21L, 20L))
    assert(runStar(g) == run(g))
  }

  test("star contraction collapses a 200-node chain in few rounds") {
    // diameter 199 — star contraction must converge in O(log n) rounds,
    // far under the default maxIter, with every node labelled 1
    val chain = edges((1L to 199L).map(i => (i, i + 1)): _*)
    val got = ConnectedComponents
      .componentsStar(chain, "id_a", "id_b", maxIter = 15, preContract = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }

  test("star contraction throws past maxIter instead of wrong labels") {
    val chain = edges((1L to 99L).map(i => (i, i + 1)): _*)
    intercept[IllegalStateException] {
      ConnectedComponents.componentsStar(chain, "id_a", "id_b", maxIter = 1,
          preContract = false)
        .collect()
    }
  }

  test("star contraction handles self-loops and reversed duplicates") {
    val g = edges((5L, 5L), (1L, 2L), (2L, 1L), (2L, 3L))
    // 5's only edge is a self-loop → its own component
    assert(runStar(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L))
  }

  test("real near-dup pairs: star contraction equals label propagation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.8)
      .select("id_a", "id_b")
    val star = runStar(pairs)
    assert(star == run(pairs))
    assert(star.nonEmpty)
  }

  test("real near-dup pairs: components agree with a union-find oracle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.8)
      .select("id_a", "id_b")
    val got = run(pairs)
    // driver-side union-find over the same pairs
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
