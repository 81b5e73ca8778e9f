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

  test("splitByFilter: bloom-miss side is provably novel, union lossless") {
    val corpus = docs((1L to 50L).map(i => (i, s"corpus doc $i")): _*)
    val incoming = docs((40L to 90L).map(i => (i + 1000L, s"corpus doc $i")): _*)
    val f = IncrementalDedup.buildCorpusFilter(corpus, col("text"))
    val (novel, suspects) = IncrementalDedup.splitByFilter(incoming, f, col("text"))
    val nIds = novel.select("doc_id").collect().map(_.getLong(0)).toSet
    val sIds = suspects.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = (40L to 90L).map(_ + 1000L).toSet
    val trueDups = (40L to 50L).map(_ + 1000L).toSet
    assert(nIds.intersect(sIds).isEmpty)
    assert(nIds.union(sIds) == all)
    assert(trueDups.subsetOf(sIds)) // no false negatives, ever
    // suspect side carries the key hash for the out-of-band confirm;
    // running it recovers the exact answer
    assert(suspects.columns.contains("content_hash"))
    val confirmed = IncrementalDedup.newAgainstCorpus(
        suspects.drop("content_hash"), corpus, col("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nIds ++ confirmed == all -- trueDups)
  }

  test("splitByFilter is streaming-safe: both sides emit from a stream") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = docs((1L, "aa bb"), (2L, "cc dd"))
    val f = IncrementalDedup.buildCorpusFilter(corpus, col("text"))
    val in = MemoryStream[(Long, String)](s)
    val (novel, suspects) = IncrementalDedup.splitByFilter(
      in.toDS().toDF("doc_id", "text"), f, col("text"))
    val q1 = novel.writeStream.format("memory").queryName("inc_novel")
      .outputMode("append").start()
    val q2 = suspects.writeStream.format("memory").queryName("inc_suspect")
      .outputMode("append").start()
    try {
      in.addData((10L, "aa bb"), (11L, "zz yy"), (12L, "cc dd"))
      q1.processAllAvailable()
      q2.processAllAvailable()
      val nIds = spark.sql("SELECT doc_id FROM inc_novel")
        .collect().map(_.getLong(0)).toSet
      val sIds = spark.sql("SELECT doc_id FROM inc_suspect")
        .collect().map(_.getLong(0)).toSet
      assert(Set(10L, 12L).subsetOf(sIds)) // true dups always suspects
      assert(nIds.intersect(Set(10L, 12L)).isEmpty)
      assert(nIds.union(sIds) == Set(10L, 11L, 12L)) // lossless
    } finally { q1.stop(); q2.stop() }
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

  test("streamingNovel: corpus dups and in-stream dups dropped, nulls kept") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(msec: Long) = new java.sql.Timestamp(msec)
    val corpus = Seq((100L, "known doc alpha"), (200L, "known doc beta"))
      .toDF("doc_id", "text")
    val filter = IncrementalDedup.buildCorpusFilter(
      corpus, col("text"), fpp = 0.001)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)](s)
    val q = IncrementalDedup.streamingNovel(
        in.toDS().toDF("doc_id", "text", "ts"), filter, col("text"), "ts")
      .writeStream.format("memory").queryName("inc_novel_sink")
      .outputMode("append")
      .start()
    try {
      in.addData(
        (1L, "known doc alpha", ts(1000)),   // corpus dup: dropped
        (2L, "fresh doc gamma", ts(2000)),   // novel: kept
        (3L, "fresh doc gamma", ts(3000)),   // in-stream dup: dropped
        (4L, null, ts(4000)),                // null key: kept
        (5L, null, ts(5000)),                // null key: kept too
        (6L, "fresh doc delta", ts(6000)))   // novel: kept
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM inc_novel_sink")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 4L, 5L, 6L))
    } finally q.stop()
  }

  test("bloom probe stays inside whole-stage codegen (no Scala UDF)") {
    // the probe must be Catalyst's BloomFilterMightContain riding the
    // plan as a literal — a boxed udf() would break codegen on every
    // probe scan and show up here as ScalaUDF / BatchEvalPython nodes
    // parquet-backed input — a local Seq frame would be folded to a
    // LocalTableScan at optimization time and prove nothing
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = real.filter(col("doc_id") % 2 === 0)
    val incoming = real.filter(col("doc_id") % 2 === 1)
    val f = IncrementalDedup.buildCorpusFilter(corpus, col("text"))
    val (novel, _) = IncrementalDedup.splitByFilter(incoming, f, col("text"))
    novel.collect()
    val plan = novel.queryExecution.executedPlan
    assert(!plan.toString.contains("ScalaUDF"),
      "probe fell back to a boxed Scala UDF")
    assert(plan.toString.contains("bloom_might_contain") ||
      plan.toString.contains("might_contain"),
      s"codegen bloom probe missing from plan:\n${plan.toString.take(1500)}")
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.exists(_.toString.contains("might_contain")),
      "bloom probe filter not inside a WholeStageCodegen span")
  }

  test("snapshotDiff labels all four statuses and nothing else") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = IncrementalDedup.snapshotDiff(old, cur, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), s"got $got")
  }
}
