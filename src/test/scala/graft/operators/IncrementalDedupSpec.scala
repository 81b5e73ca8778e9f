package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("novel rows are exactly incoming minus corpus on the key") {
    val corpus = docs((1L, "aa bb cc"), (2L, "dd ee"), (3L, "ff gg hh"))
    val incoming = docs(
      (10L, "aa bb cc"), // exact dup
      (11L, "cc  BB aa"), // dup under normalized word-set key
      (12L, "zz yy"), // novel
      (13L, "dd ee"), // exact dup
      (14L, "qq rr ss")) // novel
    val novel = IncrementalDedup.newAgainstCorpus(
        incoming, corpus, Dedup.normalizedSetKey("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(12L, 14L))
  }

  test("result is exact regardless of bloom false-positive rate") {
    // fpp = 0.5 forces many novel rows through the confirm path; the
    // exact semi/anti joins must still produce the set-difference
    val corpus = docs((1L to 50L).map(i => (i, s"corpus doc $i")): _*)
    val incoming = docs((40L to 90L).map(i => (i + 1000L, s"corpus doc $i")): _*)
    val novel = IncrementalDedup.newAgainstCorpus(
        incoming, corpus, col("text"), fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == (51L to 90L).map(_ + 1000L).toSet)
  }

  test("null keys never match: null-keyed incoming rows are kept") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, Option("aa")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, Option("aa")), (11L, Option.empty[String]))
      .toDF("doc_id", "text")
    val novel = IncrementalDedup.newAgainstCorpus(
        incoming, corpus, col("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(11L))
  }

  test("knownDuplicates is the exact complement of newAgainstCorpus") {
    val docs001 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs001.filter(col("doc_id") % 2 === 0)
    val incoming = docs001.filter(col("doc_id") % 2 === 1)
    val key = Dedup.normalizedSetKey("text")
    val novel = IncrementalDedup.newAgainstCorpus(incoming, corpus, key)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dups = IncrementalDedup.knownDuplicates(incoming, corpus, key)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = incoming.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel.intersect(dups).isEmpty)
    assert(novel.union(dups) == all)
    assert(dups.nonEmpty) // non-vacuous at sf0.001 (29 cross-parity dups)
  }

  test("matches the plain shuffled anti-join on real data") {
    val docs001 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs001.filter(col("doc_id") % 2 === 0)
    val incoming = docs001.filter(col("doc_id") % 2 === 1)
    val key = Dedup.normalizedSetKey("text")
    val bloomPath = IncrementalDedup.newAgainstCorpus(incoming, corpus, key)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = incoming.withColumn("_k", key)
      .join(corpus.select(key.as("_k")), Seq("_k"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomPath == plain)
  }
}
