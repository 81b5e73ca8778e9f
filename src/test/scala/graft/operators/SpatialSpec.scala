package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 curation operators: grid-blocked spatial join vs a
  * brute-force cross join, Bradley–Terry MM steps on a rigged
  * tournament, golden-record survivorship, Chao1 closed form, and
  * temporal-split boundary placement.
  */
class SpatialSpec extends SparkSpec {

  test("gridNeighborPairs: matches brute force, including cross-cell") {
    val s = spark
    import s.implicits._
    // points straddling cell boundaries at maxDist=10
    val pts = Seq((1L, 5L, 5L), (2L, 9L, 9L), (3L, 11L, 11L),
      (4L, 45L, 45L), (5L, 300L, 300L)).toDF("id", "x", "y")
    val got = Spatial.gridNeighborPairs(pts, "id", "x", "y", 10L)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val raw = Seq((1L, 5L, 5L), (2L, 9L, 9L), (3L, 11L, 11L),
      (4L, 45L, 45L), (5L, 300L, 300L))
    val brute = for {
      a <- raw; b <- raw if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 100L
    } yield (a._1, b._1, d2)
    assert(got.toSeq == brute.sortBy(p => (p._1, p._2)))
    // sanity: 1-2 (same cell), 2-3 (adjacent cells), 1-3 (d²=72 across
    // a cell boundary) in; 3-4, 4-5 out
    assert(got.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("gridNeighborPairs: boundary distance exactly maxDist is kept") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 21L, 0L))
      .toDF("id", "x", "y")
    val got = Spatial.gridNeighborPairs(pts, "id", "x", "y", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))   // dist 10 kept, dist 11 dropped
  }

  test("bradleyTerryTwoStep: dominant player strengthens, ties ignored") {
    val s = spark
    import s.implicits._
    // 1 beats 2 twice, 2 beats 3 twice, 3 beats 1 once; one tie row
    val battles = Seq((1L, 2L, 0L), (1L, 2L, 0L), (2L, 3L, 0L),
      (2L, 3L, 0L), (3L, 1L, 0L), (1L, 3L, 2L))
      .toDF("a", "b", "o")
    val out = Preference.bradleyTerryTwoStep(battles, "a", "b", "o")
      .orderBy("model").collect()
    assert(out.length == 3)
    val byModel = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byModel(1L)._1 == 2L && byModel(1L)._2 == 3L)  // 2 wins / 3
    assert(math.abs(byModel(1L)._3 - 4.0 / 3.0) < 1e-6)   // pi1 = 2W/G, 6 dp
    // the tie battle contributed to nobody's games
    assert(out.map(_.getLong(2)).sum == 10L)              // 5 decisive x2
  }

  test("goldenRecord: keeps best row per cluster with member count") {
    val s = spark
    import s.implicits._
    val recs = Seq((10L, 1L, 50L), (10L, 2L, 99L), (10L, 3L, 99L),
      (20L, 4L, 7L)).toDF("cluster", "id", "quality")
    val out = EntityResolution.goldenRecord(recs, "cluster",
        Seq(col("quality").desc, col("id")))
      .orderBy("cluster").collect()
    // cluster 10: quality ties at 99 -> lower id 2 wins; 3 members
    assert(out(0).getLong(1) == 2L && out(0).getLong(3) == 3L)
    assert(out(1).getLong(1) == 4L && out(1).getLong(3) == 1L)
  }

  test("chao1Richness: closed form with singletons and doubletons") {
    val s = spark
    import s.implicits._
    // tokens: a a b c -> types 3, f1 = 2 (b, c), f2 = 1 (a)
    //   chao1 = 3 + 2*1/(2*2) = 3.5
    val df = Seq(("g", "a a b c")).toDF("lang", "text")
    val out = TextAnalysis.chao1Richness(df, "text", "lang").collect()(0)
    assert(out.getLong(1) == 3L && out.getLong(2) == 2L &&
      out.getLong(3) == 1L)
    assert(math.abs(out.getDouble(4) - 3.5) < 1e-9)
  }

  test("temporalSplit: embargo bands sit strictly between splits") {
    val s = spark
    import s.implicits._
    // 100 seconds of events, 1-second embargo: cuts at 80s and 90s
    val df = (0L until 100L).map(i => Tuple1(i))
      .toDF("sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Sampling.temporalSplit(df, "ts", trainPct = 80,
        valPct = 10, gapUs = 1000000L)
      .orderBy("split")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // span 99s: c1 = 79.2s -> 79_200_000 us, c2 = 89.1s
    //   train: < 78.2s -> 0..78 (79 rows); embargo1: 78.2..79.2 -> {79}
    //   val: 79.2..88.1 -> 80..88 (9); embargo2: 88.1..89.1 -> {89}
    //   test: >= 89.1 -> 90..99 (10)
    assert(out("train") == 79L && out("embargo1") == 1L)
    assert(out("val") == 9L && out("embargo2") == 1L)
    assert(out("test") == 10L)
  }
}
