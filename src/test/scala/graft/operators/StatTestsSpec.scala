package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 batch-4 fixtures: Brown–Forsythe on groups with known
  * deviation structure, chi-square independence against hand-computed
  * tables, n-gram novelty on controlled overlap, mode tie-breaks, and
  * day-of-week seasonality on a synthetic week.
  */
class StatTestsSpec extends SparkSpec {

  test("leveneBrownForsythe: equal spread gives F = 0") {
    val s = spark
    import s.implicits._
    // both groups have identical |v - median| multisets -> SSB = 0
    val df = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      ("b", 11L), ("b", 13L), ("b", 15L)).toDF("g", "v")
    val out = Evaluation.leveneBrownForsythe(df, "v", "g").collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 6L)
    assert(math.abs(out.getDouble(2)) < 1e-9)
  }

  test("leveneBrownForsythe: wide vs narrow group gives large F") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("a", 12L),
      ("b", 0L), ("b", 10L), ("b", 90L), ("b", 100L)).toDF("g", "v")
    val out = Evaluation.leveneBrownForsythe(df, "v", "g").collect()(0)
    assert(out.getDouble(2) > 10.0)
  }

  test("chi2Independence: independent 2x2 table gives chi2 = 0") {
    val s = spark
    import s.implicits._
    // perfectly proportional counts: (x,p)=2,(x,q)=4,(y,p)=3,(y,q)=6
    val rows = Seq.fill(2)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(3)(("y", "p")) ++ Seq.fill(6)(("y", "q"))
    val out = Evaluation.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(out.getLong(0) == 15L && out.getLong(1) == 1L)
    assert(math.abs(out.getDouble(2)) < 1e-9)
    assert(math.abs(out.getDouble(3)) < 1e-9)
  }

  test("chi2Independence: diagonal 2x2 includes the zero cells") {
    val s = spark
    import s.implicits._
    // 5 (x,p) and 5 (y,q): zero cells (x,q), (y,p) must enter chi2
    //   e = 2.5 everywhere -> chi2 = 4 * (2.5)^2/2.5 = 10
    val rows = Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))
    val out = Evaluation.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(math.abs(out.getDouble(2) - 10.0) < 1e-9)
    assert(math.abs(out.getDouble(3) - 1.0) < 1e-9)  // Cramér's V = 1
  }

  test("ngramNovelty: exact share of unseen trigrams") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("t", "a b c d"),    // train grams: "a b c", "b c d"
      ("h", "a b c e f g") // held: "a b c"(seen) + 3 unseen
    ).toDF("side", "text")
    val out = TextAnalysis.ngramNovelty(df, "text",
      col("side") === "h").collect()(0)
    assert(out.getLong(0) == 4L && out.getLong(1) == 3L)
    assert(math.abs(out.getDouble(2) - 0.75) < 1e-9)
  }

  test("modePerGroup: tie on count breaks to the lower value") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", "zz"), ("g", "aa"), ("g", "zz"), ("g", "aa"),
      ("g", "mm")).toDF("grp", "v")
    val out = Profiling.modePerGroup(df, "grp", "v").collect()(0)
    assert(out.getString(1) == "aa" && out.getLong(2) == 2L)
    assert(out.getLong(3) == 3L)
    assert(math.abs(out.getDouble(4) - 0.4) < 1e-9)
  }

  test("dowSeasonality: uniform week has all indexes = 1") {
    val s = spark
    import s.implicits._
    // 2 events on each of 7 consecutive days
    val df = (0 until 14).map(i =>
        Tuple1(86400L * (i % 7) + 3600L * (i / 7)))
      .toDF("sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = EventSequences.dowSeasonality(df, "ts").collect()
    assert(out.length == 7)
    assert(out.forall(r => r.getLong(1) == 2L && r.getLong(2) == 1L))
    assert(out.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9))
  }

  test("quantileNormalize: shifted groups land on the shared bucket mean") {
    val s = spark
    import s.implicits._
    // group b = group a + 100 at every rank; cross-group bucket mean
    // is the midpoint, group means keep the offset
    val rows = (1 to 40).map(i => ("a", i.toLong * 10, i.toLong)) ++
      (1 to 40).map(i => ("b", i.toLong * 10 + 100, 1000L + i))
    val out = Profiling.quantileNormalize(
      rows.toDF("g", "v", "id"), "g", "v", "id", 4)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.size == 8)
    // bucket 1 of a: values 10..100 mean 55; of b: 110..200 mean 155;
    // normalized mean = 105 for both
    assert(out(("a", 1L)) == ((10L, 55.0, 105.0)))
    assert(out(("b", 1L)) == ((10L, 155.0, 105.0)))
    assert(out(("a", 4L))._3 == out(("b", 4L))._3)
  }

  test("histogramQuantiles: uniform 1..1000 hits bin-resolution quantiles") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).toDF("v")
    val out = Profiling.histogramQuantiles(df, "v", bins = 100,
      percentiles = Seq(25, 50, 99)).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // width = (999 div 100)+1 = 10; bin b covers [1+10b, 10+10b]
    // p25 -> cum 250 at bin 24 (values 241..250): lo_edge 241
    assert(out(25L) == ((241L, 250L)))
    assert(out(50L) == ((491L, 500L)))
    assert(out(99L) == ((981L, 990L)))
  }

  test("psi: identical distributions give 0; disjoint supports give a large value") {
    val s = spark
    import s.implicits._
    val same = (Seq.fill(10)(("x", true)) ++ Seq.fill(10)(("x", false)) ++
      Seq.fill(5)(("y", true)) ++ Seq.fill(5)(("y", false)))
      .toDF("cat", "h")
    val r1 = Profiling.psi(same, "cat", col("h")).collect()(0)
    assert(r1.getLong(0) == 2L && math.abs(r1.getDouble(1)) < 1e-9)
    val disjoint = (Seq.fill(20)(("x", true)) ++ Seq.fill(20)(("y", false)))
      .toDF("cat", "h")
    val r2 = Profiling.psi(disjoint, "cat", col("h")).collect()(0)
    assert(r2.getDouble(1) > 2.0, s"psi=${r2.getDouble(1)}")
  }

  test("heapsLaw: exact power-law points recover beta") {
    val s = spark
    import s.implicits._
    // slices with V = N^0.5 exactly: N in {100, 400, 900},
    // V in {10, 20, 30} -> beta = 0.5, K = 1
    def slice(tag: String, n: Int, v: Int): Seq[(String, String)] = {
      val words = (0 until n).map(i => s"w${i % v}")
      Seq((tag, words.mkString(" ")))
    }
    val df = (slice("a", 100, 10) ++ slice("b", 400, 20) ++
      slice("c", 900, 30)).toDF("src", "text")
    val out = TextAnalysis.heapsLaw(df, "src", "text").collect()(0)
    assert(out.getLong(0) == 3L)
    assert(math.abs(out.getDouble(1) - 0.5) < 1e-6)
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-3)
  }

  test("richClub: star vs clique thresholds") {
    val s = spark
    import s.implicits._
    // K4 clique (degrees 3) plus pendant chain: nodes 1-4 all degree>2
    // only within the clique -> phi(2) over the clique = 1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = GraphMetrics.richClub(edges, "a", "b", Seq(2, 4))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // degree>2: nodes 1,2,3 (deg 3) and 4 (deg 4) -> 6 internal edges, phi=1
    assert(out(2L) == ((4L, 6L, 1.0)))
    // degree>4: nobody -> phi 0 by convention
    assert(out(4L) == ((0L, 0L, 0.0)))
  }
}
