package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (u, ts, id) => (u, Timestamp.valueOf(ts), id) }
      .toDF("user_id", "ts", "event_id")
  }

  test("matches most recent right row at or before each left row, per key") {
    val purchases = df(Seq(
      (1L, "2024-01-01 10:00:00", 100L),
      (1L, "2024-01-01 12:00:00", 101L),
      (2L, "2024-01-01 10:00:00", 200L))) // user 2 has no clicks
    val clicks = df(Seq(
      (1L, "2024-01-01 09:00:00", 1L),
      (1L, "2024-01-01 11:30:00", 2L),
      (1L, "2024-01-01 13:00:00", 3L))) // after both purchases → never matched
    val out = AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "event_id")
      .collect()
      .map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(100L).contains(1L)) // 09:00 click is latest ≤ 10:00
    assert(out(101L).contains(2L)) // 11:30 click
    assert(out(200L).isEmpty)      // no clicks for user 2 → null
  }

  test("equal timestamps match (<= semantics) and dedup keeps max value") {
    val purchases = df(Seq((1L, "2024-01-01 10:00:00", 100L)))
    val clicks = df(Seq(
      (1L, "2024-01-01 10:00:00", 7L),
      (1L, "2024-01-01 10:00:00", 9L))) // tie → max event_id wins
    val out = AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "event_id")
      .collect().head
    assert(out.getLong(3) == 9L)
  }

  test("tolerance: in-window matches keep, stale matches null out") {
    val purchases = df(Seq(
      (1L, "2024-01-01 10:30:00", 100L),   // click 10:20 -> 600s gap, in
      (1L, "2024-01-01 12:00:00", 101L),   // click 10:20 -> 6000s, stale
      (2L, "2024-01-01 09:00:00", 102L)))  // no prior click at all
    val clicks = df(Seq((1L, "2024-01-01 10:20:00", 7L)))
    val out = AsOfJoin.asOfTolerance(purchases, clicks,
        "user_id", "ts", "event_id", toleranceSeconds = 1800L)
      .collect().map(r => r.getLong(2) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out(100L) == ((Some(7L), Some(600000000L))))
    assert(out(101L) == ((None, None)))
    assert(out(102L) == ((None, None)))
  }

  test("nearest: picks the closer side, ties backward, labels direction") {
    val purchases = df(Seq(
      (1L, "2024-01-01 10:00:00", 100L),  // 09:00 back, 10:30 fwd → fwd
      (1L, "2024-01-01 10:40:00", 101L),  // 10:30 back (10m) vs none closer
      (2L, "2024-01-01 10:00:00", 200L),  // only a forward click exists
      (3L, "2024-01-01 10:00:00", 300L))) // no clicks at all
    val clicks = df(Seq(
      (1L, "2024-01-01 09:00:00", 1L),
      (1L, "2024-01-01 10:30:00", 2L),
      (2L, "2024-01-01 11:00:00", 3L)))
    val out = AsOfJoin.asOfNearest(
        purchases, clicks, "user_id", "ts", "event_id")
      .collect()
      .map(r => r.getLong(2) -> ((Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.getString(5))))).toMap
    assert(out(100L) == ((Some(2L), Some(1800000000L), Some("forward"))))
    assert(out(101L) == ((Some(2L), Some(600000000L), Some("backward"))))
    assert(out(200L) == ((Some(3L), Some(3600000000L), Some("forward"))))
    assert(out(300L) == ((None, None, None)))
    // exact tie: 10:00 left with clicks at 09:59 and 10:01 → backward
    val tied = AsOfJoin.asOfNearest(
        df(Seq((9L, "2024-01-01 10:00:00", 900L))),
        df(Seq((9L, "2024-01-01 09:59:00", 1L),
          (9L, "2024-01-01 10:01:00", 2L))),
        "user_id", "ts", "event_id").head()
    assert(tied.getLong(3) == 1L && tied.getString(5) == "backward")
  }

  test("tolerance: a left row cannot shadow the true last right row") {
    // left row at 10:25 sits between the click and the later purchase —
    // the window must still see the 10:20 click for the 10:30 purchase
    val purchases = df(Seq(
      (1L, "2024-01-01 10:25:00", 200L),
      (1L, "2024-01-01 10:30:00", 201L)))
    val clicks = df(Seq((1L, "2024-01-01 10:20:00", 7L)))
    val out = AsOfJoin.asOfTolerance(purchases, clicks,
        "user_id", "ts", "event_id", toleranceSeconds = 3600L)
      .collect().map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(200L) == Some(7L) && out(201L) == Some(7L))
  }
}
