package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, ts) => (id, Timestamp.valueOf(ts)) }
      .toDF("event_id", "ts")
  }

  test("counts right rows in trailing window, incl. cross-bucket matches") {
    val errors = df(Seq(
      (1L, "2024-01-01 10:01:05"),  // bucket boundary at 10:01:00
      (2L, "2024-01-01 10:30:00")))
    val clicks = df(Seq(
      (10L, "2024-01-01 10:00:10"), // 55s before error 1, PREVIOUS bucket
      (11L, "2024-01-01 10:01:00"), // 5s before error 1, same bucket
      (12L, "2024-01-01 10:01:05"), // exactly at error 1 → excluded (< ts)
      (13L, "2024-01-01 09:59:00"))) // 2m05s before → outside window
    val out = RangeJoin.trailingCount(errors, clicks, "event_id", "ts", 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2) // cross-bucket + same-bucket, boundary excluded
    assert(out(2L) == 0) // zero-match left row preserved
  }

  test("bucketed result equals the naive inequality join") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001").events
    val errors = e.filter(col("event_type") === "error")
    val clicks = e.filter(col("event_type") === "click")
    // 1h window: sf0.001 events are ~72min apart, 60s would match nothing
    val bucketed = RangeJoin.trailingCount(errors, clicks, "event_id", "ts", 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = errors.as("l").join(clicks.as("r"),
        col("r.ts") >= col("l.ts") - expr("INTERVAL 3600 seconds") &&
          col("r.ts") < col("l.ts"), "left_outer")
      .groupBy(col("l.event_id")).agg(count(col("r.ts")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
    assert(bucketed.values.sum > 0)
  }
}
