package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE semantics: the four-way action classification, tombstone
  * precedence, absent-key tombstone no-op, and value wins.
  */
class MergeUpsertSpec extends SparkSpec {

  private def frames = {
    val s = spark
    import s.implicits._
    val target = Seq(
      (1L, "one", "en"), (2L, "two", "en"), (3L, "three", "de"))
      .toDF("id", "text", "lang")
    val source = Seq(
      (2L, "TWO", "fr", false), // matched, not tombstone → update
      (3L, "x", "x", true),     // matched tombstone → delete
      (4L, "four", "fi", false), // unmatched → insert
      (9L, "x", "x", true))     // unmatched tombstone → no-op
      .toDF("id", "text", "lang", "del")
    (target, source)
  }

  test("actions classify per the MERGE contract; deletes drop out") {
    val (t, s0) = frames
    val out = MergeUpsert.merge(t, s0, "id", Seq("text", "lang"), "del")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "one", "en", "keep"),
      (2L, "TWO", "fr", "update"), // source values win
      (4L, "four", "fi", "insert")))
  }

  test("idempotence: re-merging an already-applied changeset keeps rows") {
    val (t, s0) = frames
    val once = MergeUpsert.merge(t, s0, "id", Seq("text", "lang"), "del")
      .drop("action")
    val twice = MergeUpsert.merge(once, s0, "id", Seq("text", "lang"), "del")
      .drop("action")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("empty changeset keeps everything as keep") {
    val (t, s0) = frames
    val out = MergeUpsert.merge(t, s0.limit(0), "id",
      Seq("text", "lang"), "del")
    assert(out.count() == 3)
    assert(out.filter(col("action") =!= "keep").isEmpty)
  }
}
