package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column profiling: metric exactness, null accounting, and drift
  * deltas/flags against hand-built snapshots.
  */
class DataProfileSpec extends SparkSpec {

  private def before = {
    val s = spark
    import s.implicits._
    Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("id", "v")
  }

  test("profile computes exact rows, nulls, distincts, string bounds") {
    val rows = DataProfile.profile(before, Seq("id", "v"))
      .orderBy("column").collect()
    val id = rows(0); val v = rows(1)
    assert(id.getString(0) == "id" && id.getLong(1) == 3 &&
      id.getLong(2) == 0 && id.getLong(3) == 3 &&
      id.getString(4) == "1" && id.getString(5) == "3")
    assert(v.getString(0) == "v" && v.getLong(1) == 3 &&
      v.getLong(2) == 1 && v.getLong(3) == 2 &&
      v.getString(4) == "a" && v.getString(5) == "b")
  }

  test("drift reports deltas and bound-change flags") {
    val s = spark
    import s.implicits._
    val after = Seq((1L, Some("a")), (2L, Some("z")))
      .toDF("id", "v")
    val d = DataProfile.drift(before, after, Seq("id", "v"))
      .orderBy("column").collect()
    val id = d(0); val v = d(1)
    assert(id.getAs[Long]("rows_delta") == -1)
    assert(!id.getAs[Boolean]("min_changed"))
    assert(id.getAs[Boolean]("max_changed")) // "3" dropped → max "2"
    assert(v.getAs[Long]("nulls_after") == 0)
    assert(v.getAs[Boolean]("max_changed")) // "b" → "z"
    assert(!v.getAs[Boolean]("min_changed"))
  }

  test("identical snapshots drift to all-zero deltas and false flags") {
    val d = DataProfile.drift(before, before, Seq("id", "v")).collect()
    assert(d.forall(r => r.getAs[Long]("rows_delta") == 0 &&
      r.getAs[Long]("distinct_delta") == 0 &&
      !r.getAs[Boolean]("min_changed") &&
      !r.getAs[Boolean]("max_changed")))
  }
}
