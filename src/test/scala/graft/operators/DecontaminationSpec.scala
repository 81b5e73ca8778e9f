package graft.operators

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("flags docs by distinct shingle overlap with the benchmark set") {
    // benchmark: "a b c d e f" → 3-gram shingles {abc, bcd, cde, def}
    val bench = docs((100L, "a b c d e f"))
    val corpus = docs(
      (1L, "a b c d e f"),       // all 4 shingles shared
      (2L, "x a b c d y"),       // shares {abc, bcd} = 2
      (3L, "a b c d q r"),       // shares {abc, bcd} = 2
      (4L, "totally different words here"))
    val flagged2 = Decontamination
      .flagContaminated(corpus, bench, "text", "doc_id", 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flagged2 == Map(1L -> 4L, 2L -> 2L, 3L -> 2L))
    val flagged3 = Decontamination
      .flagContaminated(corpus, bench, "text", "doc_id", 3, minOverlap = 3)
      .collect().map(_.getLong(0)).toSet
    assert(flagged3 == Set(1L))
  }

  test("short texts fall back to the whole-text shingle") {
    val bench = docs((100L, "a b"))
    val corpus = docs((1L, "a b"), (2L, "a c"))
    val flagged = Decontamination
      .flagContaminated(corpus, bench, "text", "doc_id", 3, minOverlap = 1)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("benchmark members flag themselves maximally on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = d.filter(org.apache.spark.sql.functions.col("doc_id") % 23 === 0)
    val flagged = Decontamination
      .flagContaminated(d, bench, "text", "doc_id", 3, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0))
    assert(benchIds.forall(flagged.contains))
  }

  test("fuzzy: verbatim and near-copy leak found, unrelated not flagged") {
    val a = "the quick brown fox jumps over the lazy dog and runs away fast today"
    val near = "the quick brown fox jumps over the lazy dog and runs away fast now"
    val corpus = docs((1L, a), (2L, near),
      (3L, "completely different text about database engines and storage"))
    val bench = docs((100L, a))
    val got = Decontamination.fuzzyContaminated(
        corpus, bench, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).toSeq == Seq((1L, 100L, 1.0))) // ONE row despite 16 bands
    assert(byDoc.contains(2L) && byDoc(2L).head._3 > 0.5 && byDoc(2L).head._3 < 1.0)
    assert(!byDoc.contains(3L))
  }

  test("portable fuzzy matches the xxhash path's semantics on leaks") {
    val a = "the quick brown fox jumps over the lazy dog and runs away fast today"
    val near = "the quick brown fox jumps over the lazy dog and runs away fast now"
    val corpus = docs((1L, a), (2L, near),
      (3L, "completely different text about database engines and storage"))
    val bench = docs((100L, a))
    val got = Decontamination.fuzzyContaminatedPortable(
        corpus, bench, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).toSeq == Seq((1L, 100L, 1.0))) // ONE row despite 8 bands
    assert(byDoc.contains(2L) && byDoc(2L).head._3 > 0.5 && byDoc(2L).head._3 < 1.0)
    assert(!byDoc.contains(3L))
    // benchmark side broadcasts — the corpus must not shuffle for the probe
    val plan = Decontamination.fuzzyContaminatedPortable(
        corpus, bench, "text", "doc_id", threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$plan")
  }

  test("fuzzy: returned jaccards are exact and recall at 1.0 is total") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = d.filter(org.apache.spark.sql.functions.col("doc_id") % 23 === 0)
    val got = Decontamination.fuzzyContaminated(
        d, bench, "text", "doc_id", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._3 >= 0.8))
    // every benchmark member (present verbatim in the corpus) is
    // recalled against itself — identical sets collide in all bands
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0)).toSet
    val selfPairs = got.filter(p => p._1 == p._2).map(_._1).toSet
    assert(selfPairs == benchIds)
    got.filter(p => p._1 == p._2).foreach(p => assert(p._3 == 1.0))
    // exactness: each reported jaccard equals the direct shingle-set
    // jaccard of the pair
    val texts = d.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (did, bid, j) =>
      val sa = Dedup.shingleStrings(texts(did), 3).toSet
      val sb = Dedup.shingleStrings(texts(bid), 3).toSet
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(j - exact) < 1e-12, s"pair ($did,$bid)")
    }
  }

  test("winnow decontamination flags verbatim overlap, spares clean docs") {
    val s = spark
    import s.implicits._
    val benchText = "the quick brown fox jumps over the lazy dog every single day"
    val corpus = Seq(
      (1L, s"prefix words here $benchText and a suffix tail"), // leaked
      (2L, "completely unrelated content with no overlap at all whatsoever"),
      (3L, benchText)) // verbatim copy
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val got = Decontamination.winnowContaminated(
        corpus, bench, "text", "doc_id", minShared = 2L)
      .collect().map(r => r.getLong(0)).toSet
    assert(got.contains(1L), "embedded verbatim run not flagged")
    assert(got.contains(3L), "verbatim copy not flagged")
    assert(!got.contains(2L), "clean doc falsely flagged")
  }
}
