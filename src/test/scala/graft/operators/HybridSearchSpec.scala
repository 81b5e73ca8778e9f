package graft.operators

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "filler words only here"),
      (1L, "spark spark spark spark"),          // lexical-only hit
      (2L, "nothing relevant textually"),       // vector-only hit
      (3L, "spark vector pipeline")             // hits both lists
    ).toDF("doc_id", "text")
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq(
      (0L, v(1, 0, 0, 0)),                      // query vector
      (1L, v(0, 1, 0, 0)),                      // far from query
      (2L, v(0.9, 0.1, 0, 0)),                  // close to query
      (3L, v(0.8, 0.2, 0, 0))                   // close to query
    ).toDF("vec_id", "embedding")
    (docs, emb)
  }

  test("fusion ranks a both-list document first; ranks are self-consistent") {
    val (docs, emb) = fixture
    val out = HybridSearch.rrfFusion(docs, emb, "text", "doc_id",
        Seq("spark", "vector"), "vec_id", "embedding",
        queryVecId = 0L, k = 10)
      .collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getDouble(1), Option(r.get(2)), Option(r.get(3)))).toMap
    // doc 3 is in both pools; with ≤3 candidates per list, membership in
    // two lists strictly beats any single-list rank: 2/(60+3) > 1/(60+1)
    assert(out.head.getLong(0) == 3L)
    assert(byId(3L)._2.isDefined && byId(3L)._3.isDefined)
    // doc 2 never matches a term: vector-only
    assert(byId(2L)._2.isEmpty && byId(2L)._3.isDefined)
    // doc 1 matches terms but its embedding is orthogonal-ish — it still
    // appears via the lexical list (pool 100 >> 3 candidates)
    assert(byId(1L)._2.isDefined)
    // every reported rrf equals its recomputation from the reported ranks
    out.foreach { r =>
      val expect =
        Option(r.get(2)).map(x => 1.0 / (60 + x.asInstanceOf[Int])).getOrElse(0.0) +
          Option(r.get(3)).map(x => 1.0 / (60 + x.asInstanceOf[Int])).getOrElse(0.0)
      assert(math.abs(r.getDouble(1) - expect) < 1e-6,
        s"rrf mismatch for ${r.getLong(0)}: ${r.getDouble(1)} vs $expect")
    }
    // output ordered by rrf descending
    val rrfs = out.map(_.getDouble(1)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("k truncates and pools bound the fusion input") {
    val (docs, emb) = fixture
    val out = HybridSearch.rrfFusion(docs, emb, "text", "doc_id",
      Seq("spark", "vector"), "vec_id", "embedding",
      queryVecId = 0L, k = 2, poolSize = 2)
    assert(out.count() == 2)
  }
}
