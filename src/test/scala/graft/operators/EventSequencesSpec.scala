package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class EventSequencesSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  // user 1: view → click → purchase → click ; user 2: purchase (direct),
  // then view → purchase ; user 3: single event (no transition)
  private def events = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "click"),
      (3L, 1L, ts(3), "purchase"), (4L, 1L, ts(4), "click"),
      (5L, 2L, ts(1), "purchase"), (6L, 2L, ts(2), "view"),
      (7L, 2L, ts(3), "purchase"),
      (8L, 3L, ts(1), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
  }

  test("transition counts and ML probabilities match hand computation") {
    val got = EventSequences.transitions(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("view", "click", 1L, 0.5), ("view", "purchase", 1L, 0.5),
      ("click", "purchase", 1L, 1.0),
      ("purchase", "click", 1L, 0.5), ("purchase", "view", 1L, 0.5)))
  }

  test("probabilities sum to 1 per source state") {
    val sums = EventSequences.transitions(events)
      .groupBy("prev").sum("prob").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    sums.values.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("same-timestamp events order by the tie column") {
    val s = spark
    import s.implicits._
    val tied = Seq(
      (2L, 1L, ts(1), "b"), (1L, 1L, ts(1), "a"), (3L, 1L, ts(1), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventSequences.transitions(tied)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c")))
  }

  test("first/last-touch attribution with a direct conversion") {
    val got = EventSequences.touchAttribution(events, "purchase")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // user 1's purchase: first=view, last=click
    // user 2's first purchase: no prior → direct/direct
    // user 2's second purchase: first=view, last=view
    assert(got == Set(
      ("view", 2L, 1L), ("click", 0L, 1L), ("direct", 1L, 1L)))
  }

  test("conversion-free input yields an empty attribution") {
    val s = spark
    import s.implicits._
    val none = Seq((1L, 1L, ts(1), "view")).toDF("event_id", "user_id", "ts", "event_type")
    assert(EventSequences.touchAttribution(none, "purchase").count() == 0)
  }

  test("zscore flags exactly the hand-computed outlier") {
    val s = spark
    import s.implicits._
    // 15 x 10.00 + one 1000.00: m=71.875, var=61256.25 (std exactly
    // 247.5), z(1000) = 928.125/247.5 = 3.75; z(10) = -0.25
    val rows = (1L to 15L).map(i => (i, "a", 10.00)) :+ ((16L, "a", 1000.00))
    val df = rows.toDF("event_id", "event_type", "value").repartition(7)
    val got = EventSequences.zscoreAnomalies(df, threshold = 3.0)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((16L, 3.75)), s"got ${got.toSeq}")
  }

  test("zscore is partitioning-independent and groups are isolated") {
    val s = spark
    import s.implicits._
    val rows = (1L to 15L).map(i => (i, "a", 10.00)) ++
      Seq((16L, "a", 1000.00)) ++
      // group b: tight cluster, no outlier — must contribute nothing
      (21L to 30L).map(i => (i, "b", 5.00 + (i % 3) * 0.5))
    val a = EventSequences.zscoreAnomalies(rows.toDF("event_id", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    val b = EventSequences.zscoreAnomalies(
        rows.toDF("event_id", "event_type", "value").repartition(13))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    assert(a == b, "decimal sums must make the stats order-independent")
    assert(a.map(_._1) == Set(16L))
  }
}
