package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Feature engineering: target-encoding shrinkage algebra, hashing-trick
  * conservation, min-max stats closed form, and the TF-IDF pair
  * candidate contract.
  */
class FeaturesSpec extends SparkSpec {

  test("targetEncode with m=0 is the plain per-category mean") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 30.0))
      .toDF("cat", "y")
    val enc = Features.targetEncode(df, "cat", "y", m = 0)
      .orderBy("category").collect()
    assert(enc.map(r => (r.getString(0), r.getDouble(2))).toSeq ==
      Seq(("a", 15.0), ("b", 30.0)))
  }

  test("targetEncode shrinks toward the global mean as m grows") {
    val s = spark
    import s.implicits._
    // global mean 20; category 'a' mean 10 with n=1
    val df = Seq(("a", 10.0), ("b", 20.0), ("b", 30.0)).toDF("cat", "y")
    def encA(m: Int): Double =
      Features.targetEncode(df, "cat", "y", m)
        .filter(col("category") === "a").head().getDouble(2)
    val e0 = encA(0); val e5 = encA(5); val e500 = encA(500)
    assert(e0 == 10.0)
    assert(e0 < e5 && e5 < e500 && e500 < 20.0)
    assert(math.abs(e500 - 20.0) < 0.1) // m≫n ⇒ prior dominates
  }

  test("hashedFeatureHistogram conserves the token count") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val hist = Features.hashedFeatureHistogram(docs, "text", 64)
    val totalBuckets = hist.agg(sum("cnt")).head().getLong(0)
    val totalTokens = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").count()
    assert(totalBuckets == totalTokens)
    // buckets stay in range
    assert(hist.filter(col("bucket") < 0 || col("bucket") >= 64).isEmpty)
  }

  test("hashedFeatureHistogram is invariant to bucket-count-preserving reruns") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Features.hashedFeatureHistogram(docs, "text", 64).collect().toSet
    val b = Features.hashedFeatureHistogram(docs, "text", 64).collect().toSet
    assert(a == b) // md5 contract: no run-to-run nondeterminism
  }

  test("minMaxScaleStats: hand-computed dims, zero-variance dim is null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Tuple1(Array(0.0f, 5.0f)),
      Tuple1(Array(10.0f, 5.0f)),
      Tuple1(Array(5.0f, 5.0f))).toDF("embedding")
    val rows = Features.minMaxScaleStats(df, "embedding")
      .orderBy("pos").collect()
    assert(rows(0).getDouble(1) == 0.0 && rows(0).getDouble(2) == 10.0)
    // scaled values 0, 1, 0.5 → mean 0.5
    assert(rows(0).getDouble(3) == 0.5)
    assert(rows(1).isNullAt(3)) // constant dim: no scale exists
  }

  test("tfidfRareTermPairs: shared rare bigram scores, df band enforced") {
    val s = spark
    import s.implicits._
    // bigram "rare pair" occurs in docs 1 and 2 (df=2, in band);
    // every "common common" bigram has df=4 > dfMax=3 and must not score
    val df = Seq(
      (1L, "rare pair common common"),
      (2L, "rare pair common common"),
      (3L, "common common common common"),
      (4L, "common common common common")).toDF("id", "text")
    val pairs = Features
      .tfidfRareTermPairs(df, "id", "text", dfMin = 2, dfMax = 3, k = 10)
      .collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // docs 1,2 share TWO in-band bigrams ("rare pair", "pair common"),
    // tf=1 each, df=2 ⇒ w = 1000000 div 2 = 500000; dot = 2·500000²
    assert(r.getLong(2) == 2L * 500000L * 500000L)
  }

  test("tfidfRareTermPairs: single-word docs produce no bigrams, no error") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "solo"), (2L, "solo")).toDF("id", "text")
    assert(Features
      .tfidfRareTermPairs(df, "id", "text", 1, 10, 5).isEmpty)
  }

  test("rankCorrelation: perfect monotone dims hit ±1, n=1 is null") {
    val s = spark
    import s.implicits._
    // dim 0 increases with label (ρ=1), dim 1 decreases (ρ=-1)
    val df = Seq(
      (1L, Array(1.0f, 9.0f), 1),
      (2L, Array(2.0f, 8.0f), 2),
      (3L, Array(3.0f, 7.0f), 3)).toDF("vec_id", "embedding", "label")
    val rows = Features.rankCorrelation(df, "vec_id", "embedding", "label")
      .orderBy("pos").collect()
    assert(rows(0).getDouble(2) == 1.0)
    assert(rows(1).getDouble(2) == -1.0)
    val one = Seq((1L, Array(1.0f), 4)).toDF("vec_id", "embedding", "label")
    assert(Features.rankCorrelation(one, "vec_id", "embedding", "label")
      .head().isNullAt(2))
  }

  test("chi2BinaryFeatures matches the hand-computed 2x2 statistic") {
    val s = spark
    import s.implicits._
    // one distinct token per doc → each bucket's presence is exactly
    // the docs carrying that token; "hot" appears in both positives,
    // "cold" in both negatives → maximal association: chi2 = N = 4
    val df = Seq(
      (1L, "hot", true), (2L, "hot", true),
      (3L, "cold", false), (4L, "cold", false))
      .toDF("id", "text", "pos")
    val out = Features.chi2BinaryFeatures(df, "id", "text",
        nBuckets = 1024, positive = col("pos"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    // both buckets: a=2,b=0,c=0,d=2 (or mirrored) → chi2 = 4·16/16 = 4
    assert(out == Set((2L, 0L, 0L, 2L, 4.0), (0L, 2L, 2L, 0L, 4.0)))
  }

  test("chi2BinaryFeatures: independent feature scores 0, degenerate null") {
    val s = spark
    import s.implicits._
    // "both" appears in one positive and one negative of a balanced
    // corpus → perfectly independent → chi2 = 0; "all" appears in
    // every doc → (c+d)=0 margin → null
    val df = Seq(
      (1L, "both all", true), (2L, "x all", true),
      (3L, "both all", false), (4L, "y all", false))
      .toDF("id", "text", "pos")
    val rows = Features.chi2BinaryFeatures(df, "id", "text",
        nBuckets = 1024, positive = col("pos")).collect()
    val byCells = rows.map(r => ((r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)), r)).toMap
    val both = byCells((1L, 1L, 1L, 1L))
    assert(both.getDouble(5) == 0.0)
    val all = byCells((2L, 2L, 0L, 0L))
    assert(all.isNullAt(5))
  }

  test("quantileBins: equal-frequency bins with deterministic bounds") {
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i.toLong, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    val out = Features.quantileBins(df, "vec_id", "embedding", 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1.0, 2.0), (2L, 2L, 3.0, 4.0),
      (3L, 2L, 5.0, 6.0), (4L, 2L, 7.0, 8.0)))
  }

  test("rankNormalize: (rank-1)/(n-1) under the (score, id) total order") {
    val s = spark
    import s.implicits._
    // tied scores break on id, so the quantile transform is total:
    // ranks 1..5 -> 0, .25, .5, .75, 1
    val df = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (5L, 30L))
      .toDF("doc_id", "score")
    val out = Features.rankNormalize(df, "doc_id", "score")
      .orderBy("id").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    // single row: 0.0 by the SQL percent_rank convention, no /0
    val one = Features.rankNormalize(
      Seq((9L, 42L)).toDF("doc_id", "score"), "doc_id", "score")
    assert(one.head().getDouble(2) == 0.0)
  }

  test("rankCorrelation ties break on id identically for both rankings") {
    val s = spark
    import s.implicits._
    // all values AND labels equal: rx = ry row-by-row ⇒ ρ = 1 exactly
    val df = Seq(
      (1L, Array(5.0f), 7), (2L, Array(5.0f), 7), (3L, Array(5.0f), 7))
      .toDF("vec_id", "embedding", "label")
    assert(Features.rankCorrelation(df, "vec_id", "embedding", "label")
      .head().getDouble(2) == 1.0)
  }
}
