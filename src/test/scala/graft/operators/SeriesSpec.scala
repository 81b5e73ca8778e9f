package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable fixtures for the round-10 time-series family:
  * EWMA weight math and short-history renormalization, ACF on a
  * series with known autocorrelation, interval union coverage, degree
  * assortativity on star vs path graphs, and decile lift edges.
  */
class SeriesSpec extends SparkSpec {

  test("ewmaLast: two-value history matches the closed form") {
    val s = spark
    import s.implicits._
    // newest value 10 (w=1), older 20 (w=0.75):
    //   ewma = (10 + 15) / 1.75 = 14.285714...
    val df = Seq((1L, 1L, 20.0), (1L, 2L, 10.0))
      .toDF("user", "seq", "v")
      .withColumn("ts", col("seq").cast("timestamp"))
    val out = EventSequences.ewmaLast(df, "user", "ts", "seq", "v")
      .collect()(0)
    assert(out.getLong(1) == 2L)
    assert(math.abs(out.getDouble(2) - 25.0 / 1.75) < 1e-6)
  }

  test("ewmaLast: only the most recent k values contribute") {
    val s = spark
    import s.implicits._
    val df = (1L to 30L).map(i => (1L, i, if (i <= 10) 1000.0 else 2.0))
      .toDF("user", "seq", "v")
      .withColumn("ts", col("seq").cast("timestamp"))
    val out = EventSequences.ewmaLast(df, "user", "ts", "seq", "v")
      .collect()(0)
    // last 20 values are all 2.0 -> the 1000s are outside the window
    assert(out.getLong(1) == 20L)
    assert(math.abs(out.getDouble(2) - 2.0) < 1e-9)
  }

  test("acf: alternating series has acf(1) near -1, acf(2) near +1") {
    val s = spark
    import s.implicits._
    val df = (1 to 40).map(t => (t.toLong, if (t % 2 == 0) 10L else 0L))
      .toDF("t", "x")
    val out = EventSequences.acf(df, "t", "x", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < -0.9, s"lag1 ${out(1L)}")
    assert(out(2L) > 0.9, s"lag2 ${out(2L)}")
  }

  test("acf: constant series yields null (zero variance)") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).map(t => (t.toLong, 5L)).toDF("t", "x")
    val out = EventSequences.acf(df, "t", "x", 1).collect()(0)
    // 0/0 in double division -> NaN; rounded NaN stays NaN (not a
    // silent 0) so the degenerate series is visible downstream
    assert(out.isNullAt(2) || out.getDouble(2).isNaN)
  }

  test("intervalCoverage: overlaps counted once, gaps excluded") {
    val s = spark
    import s.implicits._
    // [0,10) ∪ [5,12) ∪ [20,25) -> covered 12 + 5 = 17, 2 islands
    val df = Seq((1L, 0L, 10L), (1L, 5L, 12L), (1L, 20L, 25L))
      .toDF("k", "s", "e")
    val out = EventSequences.intervalCoverage(df, "k", "s", "e")
      .collect()(0)
    assert(out.getLong(1) == 2L)
    assert(out.getLong(2) == 17L)
  }

  test("degreeAssortativity: star graph is maximally disassortative") {
    val s = spark
    import s.implicits._
    // star 0-{1,2,3}, symmetrized: hub degree 3, leaves 1 -> r = -1
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .toDF("src", "dst")
    val out = GraphMetrics.degreeAssortativity(edges, "src", "dst")
      .collect()(0)
    assert(out.getLong(0) == 6L)
    assert(math.abs(out.getDouble(1) - (-1.0)) < 1e-6)
  }

  test("degreeAssortativity: directed path keeps dst-only endpoints") {
    val s = spark
    import s.implicits._
    // 1→2→3 NOT symmetrized: node 3 never appears as src. Degrees are
    // total-degree (1,2,1); both edges must survive the degree joins —
    // the old src-only degree silently dropped 2→3 (m was 1, not 2).
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = GraphMetrics.degreeAssortativity(edges, "src", "dst")
      .collect()(0)
    assert(out.getLong(0) == 2L, s"edge dropped: $out")
    // pairs (du,dv) = (1,2),(2,1): r = (2·4 − 3·3)/(√1·√1) = −1
    assert(math.abs(out.getDouble(1) - (-1.0)) < 1e-6)
  }

  test("liftGains: perfect ranking concentrates positives in bucket 1") {
    val s = spark
    import s.implicits._
    // 20 rows, scores 20..1, positives = top 5 scores
    val df = (1 to 20).map(i => (i.toLong, (21 - i).toLong, i <= 5))
      .toDF("id", "score", "pos")
    val out = Evaluation.liftGains(df, "score", "id", col("pos"), 4)
      .orderBy("bucket").collect()
    assert(out.length == 4)
    assert(out(0).getLong(2) == 5L)          // all positives in tile 1
    assert(math.abs(out(0).getDouble(5) - 4.0) < 1e-9)  // lift = 4x
    assert(math.abs(out(3).getDouble(4) - 1.0) < 1e-9)  // gain -> 1
    assert(math.abs(out(3).getDouble(6) - 1.0) < 1e-9)  // cum_lift -> 1
  }
}
