package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Late-interaction MaxSim retrieval against hand-computed scores:
  * the Σ-of-per-token-maxes definition, zero-norm doc/query token
  * handling, self-exclusion, id tie-breaks, and the all-invalid-doc
  * drop — the contracts the oracle gate exercises at corpus scale.
  */
class MaxSimSpec extends SparkSpec {

  private def docs(rows: (Long, Seq[Seq[Double]])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "toks")
  }

  test("maxSimTopK: sum of per-query-token maxes, hand-computed") {
    val d = docs(
      1L -> Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      2L -> Seq(Seq(1.0, 0.0)),
      3L -> Seq(Seq(0.6, 0.8)))
    val r = Similarity.maxSimTopK(d, "id", "toks",
        Seq((10L, Seq(Seq(2.0, 0.0), Seq(0.0, 3.0)))), k = 10)
      .orderBy("rank").collect()
    // doc1: max(1,0)+max(0,1) = 2; doc3: max(.6,.8) = 1.4; doc2: 1+0 = 1
    assert(r.map(x => (x.getLong(2), x.getDouble(3))).toSeq ==
      Seq((1L, 2.0), (3L, 1.4), (2L, 1.0)))
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("maxSimTopK: zero-norm doc tokens are skipped; all-invalid and " +
    "empty docs emit nothing; query id excluded") {
    val d = docs(
      10L -> Seq(Seq(1.0, 0.0)), // same id as the query: excluded
      1L -> Seq(Seq(0.0, 0.0), Seq(1.0, 0.0)), // zero-norm token skipped
      2L -> Seq(Seq(0.0, 0.0)), // all zero-norm: dropped
      3L -> Seq())              // no tokens: dropped
    val r = Similarity.maxSimTopK(d, "id", "toks",
        Seq((10L, Seq(Seq(1.0, 0.0)))), k = 10).collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(1L))
    assert(r.head.getDouble(3) == 1.0)
  }

  test("maxSimTopK: zero-norm query tokens drop; all-zero query rejected") {
    val d = docs(1L -> Seq(Seq(1.0, 0.0)), 2L -> Seq(Seq(1.0, 0.0)))
    // the zero-norm query token contributes nothing; score ties at 1.0
    // and breaks by ascending doc id
    val r = Similarity.maxSimTopK(d, "id", "toks",
        Seq((9L, Seq(Seq(0.0, 0.0), Seq(3.0, 0.0)))), k = 2)
      .orderBy("rank").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 1L), (2L, 2L)))
    val e = intercept[IllegalArgumentException](
      Similarity.maxSimTopK(d, "id", "toks",
        Seq((9L, Seq(Seq(0.0, 0.0)))), k = 1))
    assert(e.getMessage.contains("non-zero"))
  }

  test("maxSimTopKPruned: probe-all equals exact; tight pruning returns " +
    "a subset with identical scores") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val d = docs((1L to 30L).map(i =>
      i -> Seq.fill(3)(Seq.fill(8)(rng.nextGaussian()))): _*)
    val qs = Seq(
      (100L, Seq.fill(2)(Seq.fill(8)(rng.nextGaussian()))),
      (200L, Seq.fill(2)(Seq.fill(8)(rng.nextGaussian()))))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = rows(Similarity.maxSimTopK(d, "id", "toks", qs, k = 30))
    val probeAll = rows(Similarity.maxSimTopKPruned(d, "id", "toks", qs,
      k = 30, numPlanes = 4, maxHamming = 4))
    assert(probeAll == exact, "probe-all pruned != exact")
    // tight prune: every surviving (query, doc) carries the exact
    // score; ranks are a re-ranking of the survivors
    val pruned = Similarity.maxSimTopKPruned(d, "id", "toks", qs,
      k = 30, numPlanes = 4, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exactScores = exact.map(t => (t._1, t._3) -> t._4).toMap
    assert(pruned.nonEmpty)
    pruned.foreach { case (key, sc) =>
      assert(exactScores(key) == sc, s"pruned score diverged at $key")
    }
    assert(pruned.size < exact.size, "hamming-0 prune admitted everything")
  }

  test("MaxSimTokenMax expression == composed HOF formulation, " +
    "randomized + edge cases") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    graft.expressions.GraftFunctions.register(s)
    val rng = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      val toks = Seq.fill(1 + (i % 4).toInt)(
        Seq.fill(8)(rng.nextGaussian()))
      (i, toks)
    } ++ Seq(
      (900L, Seq(Seq.fill(8)(0.0))),                       // zero-norm only
      (901L, Seq(Seq.fill(8)(0.0), Seq.fill(8)(1.0))),     // mixed
      (902L, Seq.empty[Seq[Double]]))                       // no tokens
    val df = rows.toDF("id", "toks")
    val q = Seq.fill(8)(rng.nextGaussian())
    val qlit = array(q.map(lit): _*)
    val viaHof = aggregate(col("toks"), lit(Double.NegativeInfinity),
      (acc, t) => {
        val c = Numerics.roundz(call_function("cosine_sim", t, qlit), 6)
        when(isnan(c), acc).otherwise(greatest(acc, c))
      })
    val viaExpr = call_function("maxsim_token_max", col("toks"), qlit)
    val diff = df.select(col("id"), viaHof.as("h"), viaExpr.as("e"))
      .filter(!(col("h") <=> col("e"))).collect()
    assert(diff.isEmpty, s"expression diverged from HOF: ${diff.mkString(",")}")
    // the mixed zero-norm doc takes its valid token's cosine (skip
    // worked), and a ones-query against the ones-token gives exactly 1
    val one = df.filter(col("id") === 901L)
      .select(call_function("maxsim_token_max", col("toks"),
        array(Seq.fill(8)(lit(1.0)): _*)).as("e"))
      .head().getDouble(0)
    assert(one == 1.0)
  }

  test("maxSimTopK: multiple queries score in one pass, k bounds each") {
    val d = docs(
      1L -> Seq(Seq(1.0, 0.0)),
      2L -> Seq(Seq(0.0, 1.0)),
      3L -> Seq(Seq(1.0, 1.0)))
    val r = Similarity.maxSimTopK(d, "id", "toks",
        Seq((100L, Seq(Seq(1.0, 0.0))), (200L, Seq(Seq(0.0, 1.0)))), k = 1)
      .orderBy("query_id").collect()
    assert(r.length == 2)
    assert(r.map(x => (x.getLong(0), x.getLong(2))).toSeq ==
      Seq((100L, 1L), (200L, 2L)))
  }
}
