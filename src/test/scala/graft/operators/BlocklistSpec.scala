package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho–Corasick blocklist: the automaton must count exactly what the
  * per-position definition counts — including overlapping matches and
  * patterns that are suffixes of other patterns (the classic AC fail
  * cases) — and agree with a naive scan on real data.
  */
class BlocklistSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Naive per-position occurrence count (the oracle definition). */
  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("overlapping occurrences all count") {
    val got = Blocklist.flagMatches(docs(1L -> "aaaa"), "text", "doc_id", Seq("aa"))
      .head()
    assert(got.getLong(1) == 1 && got.getLong(2) == 3, s"$got") // aa at 0,1,2
  }

  test("suffix patterns fire through fail links (he/she/hers/his)") {
    // "ushers": she at 1, he at 2, hers at 2 -> 3 patterns, 3 hits
    val got = Blocklist.flagMatches(docs(1L -> "ushers"), "text", "doc_id",
        Seq("he", "she", "his", "hers"))
      .head()
    assert(got.getLong(1) == 3 && got.getLong(2) == 3, s"$got")
  }

  test("matching is case-insensitive and the assignment total") {
    val got = Blocklist.flagMatches(
        docs(1L -> "The SPARK engine", 2L -> "nothing here"),
        "text", "doc_id", Seq("spark", "engine"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 2L)))
    assert(got(2L) == ((0L, 0L)), "clean docs still appear, with zeros")
  }

  test("automaton counts equal the naive per-position scan on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pats = Seq("spark", "ar", "customer", "the", "er")
    val got = Blocklist.flagMatches(d, "text", "doc_id", pats)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = d.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase)
    texts.foreach { case (id, t) =>
      val counts = pats.map(p => naive(t, p.toLowerCase))
      val expect = (counts.count(_ > 0).toLong, counts.sum)
      assert(got(id) == expect, s"doc $id: ${got(id)} != $expect")
    }
  }

  test("rejects empty patterns") {
    intercept[IllegalArgumentException] {
      Blocklist.flagMatches(docs(1L -> "x"), "text", "doc_id", Seq(""))
        .collect()
    }
  }

  test("the stateless kernel runs unchanged on a stream") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)](s)
    val q = Blocklist.flagMatches(
        in.toDS().toDF("doc_id", "text"), "text", "doc_id", Seq("bad", "worse"))
      .writeStream.format("memory").queryName("blocklist_sink")
      .outputMode("append").start()
    try {
      in.addData((1L, "a bad bad day"), (2L, "all fine here"))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM blocklist_sink")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == Map(1L -> ((1L, 2L)), 2L -> ((0L, 0L))), s"got $got")
    } finally q.stop()
  }
}
