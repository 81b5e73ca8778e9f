package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class EventWindowsSpec extends SparkSpec {

  private def events(rows: (Long, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq
      .map { case (uid, ts, v) => (uid, Timestamp.valueOf(ts), "e", v) }
      .toDF("user_id", "ts", "event_type", "value")
  }

  test("tumbling windows bucket by hour") {
    val df = events(
      (1L, "2024-01-01 00:10:00", 1.0),
      (1L, "2024-01-01 00:50:00", 2.0),
      (1L, "2024-01-01 01:10:00", 4.0))
    val out = EventWindows.tumbling(df).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      ("2024-01-01 00:00:00.0", 2L, 3.0),
      ("2024-01-01 01:00:00.0", 1L, 4.0)))
  }

  test("sliding windows: every event in width/slide windows") {
    val df = events((1L, "2024-01-01 00:40:00", 1.0))
    val starts = EventWindows.sliding(df).collect()
      .map(_.getTimestamp(0).toString).toSet
    assert(starts == Set("2024-01-01 00:00:00.0", "2024-01-01 00:30:00.0"))
  }

  test("sessions split at gap >= 5 minutes, per user") {
    val df = events(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:04:00", 1.0),  // within gap → same session
      (1L, "2024-01-01 00:09:00", 1.0),  // extends session
      (1L, "2024-01-01 00:14:00.000001", 1.0), // > 5min after last → new
      (2L, "2024-01-01 00:00:00", 9.0))  // other user isolated
    val out = EventWindows.sessions(df).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01 00:00:00.0", 3L),
      (1L, "2024-01-01 00:14:00.000001", 1L),
      (2L, "2024-01-01 00:00:00.0", 1L)))
  }

  test("session boundary semantics: exactly-gap spacing stays in session") {
    // documents the session_window contract the DuckDB oracle mirrors:
    // a new session starts only when diff > gap (observed empirically —
    // Spark merges an event landing exactly at last_ts + gap)
    val df = events(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:05:00", 1.0))
    assert(EventWindows.sessions(df).count() == 1)
    val df2 = events(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:05:00.000001", 1.0))
    assert(EventWindows.sessions(df2).count() == 2)
  }
}
