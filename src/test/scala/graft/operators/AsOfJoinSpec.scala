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
}
