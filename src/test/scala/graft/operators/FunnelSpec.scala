package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.map { case (u, t, at) => (u, at, ts(s"2024-01-01 $t")) }
      .toDF("user_id", "event_type", "ts")
  }

  private val stageTypes = Seq("view", "click", "purchase")

  private def run(df: org.apache.spark.sql.DataFrame, within: Long = 3600L) =
    Funnel.stages(df, "user_id", "ts", "event_type", stageTypes, within)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))
      .toMap

  test("stages must occur in order: pre-view clicks don't count") {
    // user 1: click BEFORE first view → click stage null, purchase null
    // user 2: proper view → click → purchase chain
    val got = run(events(
      (1L, "09:00:00", "click"), (1L, "10:00:00", "view"),
      (2L, "09:00:00", "view"), (2L, "09:10:00", "click"),
      (2L, "09:20:00", "purchase")))
    assert(got(1L) == ((ts("2024-01-01 10:00:00"), null, null)))
    assert(got(2L) == ((ts("2024-01-01 09:00:00"),
      ts("2024-01-01 09:10:00"), ts("2024-01-01 09:20:00"))))
  }

  test("conversion window bounds each hop, not the whole funnel") {
    // click 50 min after view (inside 1h), purchase 50 min after the
    // click (inside 1h of the CLICK, outside 1h of the view) — counts
    val got = run(events(
      (1L, "09:00:00", "view"), (1L, "09:50:00", "click"),
      (1L, "10:40:00", "purchase")))
    assert(got(1L)._3 == ts("2024-01-01 10:40:00"))
    // but a click 61 min after the view misses its hop window
    val late = run(events(
      (2L, "09:00:00", "view"), (2L, "10:01:00", "click"),
      (2L, "10:05:00", "purchase")))
    assert(late(2L)._2 == null && late(2L)._3 == null)
  }

  test("first qualifying event wins each stage, strictly after previous") {
    // two clicks after the view: the EARLIER one is the stage time;
    // a purchase at exactly the click timestamp does NOT qualify (>)
    val got = run(events(
      (1L, "09:00:00", "view"), (1L, "09:30:00", "click"),
      (1L, "09:10:00", "click"), (1L, "09:10:00", "purchase"),
      (1L, "09:15:00", "purchase")))
    assert(got(1L)._2 == ts("2024-01-01 09:10:00"))
    assert(got(1L)._3 == ts("2024-01-01 09:15:00"))
  }

  test("users without the first stage are absent; counts shrink per stage") {
    val df = events(
      (1L, "09:00:00", "view"), (1L, "09:10:00", "click"),
      (2L, "09:00:00", "view"),
      (3L, "09:00:00", "click")) // never views → absent
    val got = run(df)
    assert(got.keySet == Set(1L, 2L))
    val counts = Funnel.counts(df, "user_id", "ts", "event_type",
        stageTypes, 3600L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(counts.toSeq == Seq((1, "view", 2L), (2, "click", 1L),
      (3, "purchase", 0L)))
  }
}
