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

  private def corpus = {
    val s = spark
    import s.implicits._
    (0L until 200L).map(i => (i, s"doc $i body")).toDF("id", "text")
  }

  test("merkleDigest is invariant to row order and partitioning") {
    val a = DataProfile.merkleDigest(corpus, "id", "text", 16)
      .orderBy("bucket").collect()
    val b = DataProfile.merkleDigest(
        corpus.orderBy(col("id").desc).repartition(7), "id", "text", 16)
      .orderBy("bucket").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("merkleDigest: single-row content change flips exactly one bucket") {
    val mutated = corpus.withColumn("text",
      when(col("id") === 42L, lit("tampered")).otherwise(col("text")))
    val a = DataProfile.merkleDigest(corpus, "id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = DataProfile.merkleDigest(mutated, "id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.keySet == b.keySet)
    assert(a.count { case (k, v) => b(k) != v } == 1)
  }

  test("changedBuckets labels added/removed/changed/unchanged") {
    val v2 = corpus.filter(col("id") =!= 5L) // mutate one row's text
      .withColumn("text",
        when(col("id") === 7L, lit("new body")).otherwise(col("text")))
    val statuses = DataProfile.changedBuckets(corpus, v2, "id", "text", 256)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // with 256 buckets over 200 rows most buckets hold ≤2 rows: the
    // bucket holding id=5 shrinks (changed), id=7's changes, the rest
    // are unchanged; no bucket is added or removed here (v2 ⊂ corpus ids)
    val byStatus = statuses.values.groupBy(identity).view.mapValues(_.size)
    assert(byStatus.getOrElse("changed", 0) >= 1)
    assert(byStatus.getOrElse("unchanged", 0) > byStatus("changed"))
    assert(!byStatus.contains("added"))
  }

  test("keySkewProfile ranks hot keys with exact share accounting") {
    val s = spark
    import s.implicits._
    // 60 rows of "hot", 30 of "warm", 10 singletons
    val rows = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (0 until 10).map(i => s"k$i")
    val df = rows.toDF("k")
    val out = DataProfile.keySkewProfile(df, "k", 3).orderBy("rk").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("key") == "hot" &&
      out(0).getAs[Long]("cnt") == 60 &&
      out(0).getAs[Long]("share_bp") == 6000)
    assert(out(1).getAs[String]("key") == "warm" &&
      out(1).getAs[Long]("share_bp") == 3000)
    assert(out(1).getAs[Long]("cum_share_bp") == 9000)
    assert(out(2).getAs[Long]("n_keys") == 12)
  }
}
