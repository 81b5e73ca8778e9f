package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 batch-5 fixtures: skyline dominance cases (duplicates,
  * same-x columns, prefilter ≡ brute force on a random cloud),
  * jackknife replicates against a hand fold, MI on dependent vs
  * independent tables, clustering coefficient on a known graph,
  * reciprocity on a mixed directed graph, and vocabulary Jaccard on
  * controlled slices.
  */
class MiningSpec extends SparkSpec {

  test("skyline2dMin: textbook frontier with interior points dropped") {
    val s = spark
    import s.implicits._
    // frontier: (1,9), (3,5), (7,2); interior: (4,6) dominated by (3,5),
    // (8,9) dominated by everything
    val df = Seq((1L, 1L, 9L), (2L, 3L, 5L), (3L, 7L, 2L),
      (4L, 4L, 6L), (5L, 8L, 9L)).toDF("id", "x", "y")
    val out = Skyline.skyline2dMin(df, "id", "x", "y")
      .orderBy("id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("skyline2dMin: exact (x,y) duplicates both survive; same-x column keeps only min y") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L, 3L), (2L, 2L, 3L), // duplicates -> both stay
      (3L, 2L, 7L), // same x, larger y -> dominated
      (4L, 9L, 1L)).toDF("id", "x", "y")
    val out = Skyline.skyline2dMin(df, "id", "x", "y")
      .orderBy("id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L, 4L))
  }

  test("skyline2dMin: bucket prefilter equals brute force on a hash cloud") {
    val pts = spark.range(2000L).select(col("id"),
      (col("id") * 2654435761L % 100000L).as("x"),
      (col("id") * 2246822519L % 100000L).as("y"))
    val fast = Skyline.skyline2dMin(pts, "id", "x", "y", buckets = 16)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    val brute = {
      val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2)))
      rows.filter { case (_, px, py) =>
        !rows.exists { case (_, qx, qy) =>
          qx <= px && qy <= py && (qx < px || qy < py) }
      }.map(_._1).sorted.toSeq
    }
    assert(fast == brute && fast.nonEmpty)
  }

  test("jackknifeRatioSE: matches the scalar fold on a small sample") {
    val s = spark
    import s.implicits._
    val data = Seq((10L, 100L), (20L, 150L), (5L, 80L), (12L, 90L))
    val df = data.toDF("y", "x")
    val out = Evaluation.jackknifeRatioSE(df, col("y"), col("x"))
      .collect()(0)
    val sy = data.map(_._1).sum.toDouble
    val sx = data.map(_._2).sum.toDouble
    val n = data.size
    // same fixed-point contract: replicate = floor((sy-y)*1e9/(sx-x))/1e9
    val reps = data.map { case (y, x) =>
      ((sy - y).toLong * 1000000000L / (sx - x).toLong).toDouble / 1e9 }
    val mean = reps.sum / n
    val se = math.sqrt((n - 1.0) / n *
      reps.map(r => (r - mean) * (r - mean)).sum)
    assert(out.getLong(0) == n)
    assert(math.abs(out.getDouble(1) - sy / sx) < 1e-6)
    assert(math.abs(out.getDouble(2) - se) < 1e-6)
  }

  test("mutualInformation: independent table gives MI = 0, identical columns give MI = H") {
    val s = spark
    import s.implicits._
    val indep = (Seq.fill(2)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(3)(("y", "p")) ++ Seq.fill(6)(("y", "q"))).toDF("a", "b")
    val r1 = Evaluation.mutualInformation(indep, "a", "b").collect()(0)
    assert(math.abs(r1.getDouble(1)) < 1e-9)
    val same = Seq(("u", "u"), ("u", "u"), ("v", "v"), ("w", "w"))
      .toDF("a", "b")
    val r2 = Evaluation.mutualInformation(same, "a", "b").collect()(0)
    // MI(a,a) = H(a); NMI = 1
    assert(math.abs(r2.getDouble(1) - r2.getDouble(2)) < 1e-6)
    assert(math.abs(r2.getDouble(4) - 1.0) < 1e-6)
  }

  test("localClustering: triangle plus pendant") {
    val s = spark
    import s.implicits._
    // 1-2-3 triangle, 4 pendant off 1: lcc(1)=1/3 (d=3,T=1), lcc(2)=lcc(3)=1, lcc(4)=0
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
      .toDF("a", "b")
    val out = GraphMetrics.localClustering(edges, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(math.abs(out(1L) - 1.0 / 3) < 1e-5)
    assert(math.abs(out(2L) - 1.0) < 1e-9)
    assert(math.abs(out(3L) - 1.0) < 1e-9)
    assert(out(4L) == 0.0)
  }

  test("reciprocity: half the edges have a reverse; loops and duplicates ignored") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), // reciprocal pair
      ("a", "c"), ("c", "d"), // one-way
      ("a", "b"), // duplicate
      ("d", "d")) // loop
      .toDF("s", "d")
    val out = GraphMetrics.reciprocity(edges, "s", "d").collect()(0)
    assert(out.getLong(0) == 4L) // ab, ba, ac, cd
    assert(out.getLong(1) == 2L)
    assert(math.abs(out.getDouble(2) - 0.5) < 1e-9)
  }

  test("fellegiSunterWeights: symmetric fields get identical weights; degenerate field clamps") {
    val s = spark
    import s.implicits._
    // x0 and x1 have mirror-image pattern multisets -> same fitted m/u;
    // x2 agrees on EVERY pair -> u would be exactly 1 without the clamp
    val pairs = Seq((1, 1, 1), (1, 0, 1), (0, 0, 1), (0, 1, 1),
      (1, 1, 1), (0, 0, 1)).toDF("x0", "x1", "x2")
    val out = EntityResolution.fellegiSunterWeights(pairs, Seq(
      "f0" -> (col("x0") === 1), "f1" -> (col("x1") === 1),
      "f2" -> (col("x2") === 1)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(6))).toMap
    assert(out("f0") == out("f1"))
    // clamped u ~ 1 - 1e-6, still finite disagreement weight
    assert(out("f2")._2 > 0.999 && !out("f2")._3.isInfinite)
    assert(out.values.forall(v => v._1 > 0 && v._1 < 1 &&
      v._2 > 0 && v._2 < 1))
  }

  test("fellegiSunterWeights: EM pulls m up and u down for a discriminative field") {
    val s = spark
    import s.implicits._
    // 20 "match-like" pairs agreeing on both fields, 80 random pairs
    // agreeing on nothing -> both fields should fit m >> u
    val rows = Seq.fill(20)((1, 1)) ++ Seq.fill(80)((0, 0))
    val out = EntityResolution.fellegiSunterWeights(
      rows.toDF("x0", "x1"),
      Seq("f0" -> (col("x0") === 1), "f1" -> (col("x1") === 1)))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(3) > 0.9, s"m=${r.getDouble(3)}")
      assert(r.getDouble(4) < 0.1, s"u=${r.getDouble(4)}")
      assert(r.getDouble(5) > 0, "agreement weight positive")
      assert(r.getDouble(6) < 0, "disagreement weight negative")
    }
  }

  test("sourceVocabJaccard: controlled overlap") {
    val s = spark
    import s.implicits._
    val df = Seq(("s1", "apple banana cherry"), ("s1", "apple"),
      ("s2", "banana cherry date"), ("s3", "zebra")).toDF("src", "text")
    val out = TextAnalysis.sourceVocabJaccard(df, "src", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(5)))).toMap
    // s1={apple,banana,cherry}, s2={banana,cherry,date}: 2/4
    assert(out(("s1", "s2")) == ((2L, 0.5)))
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
  }
}
