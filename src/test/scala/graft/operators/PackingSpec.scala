package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // four docs in one shard (ids ≡ 0 mod 8), 4 tokens each, seqLen 10:
  // offsets 0,4,8,12 — the third doc straddles the 10-token boundary
  private val oneShard = docs(
    (0L, "a b c d"), (8L, "e f g h"), (16L, "i j k l"), (24L, "m n o p"))

  test("offsets are the running token sum within a shard") {
    val rows = Packing.packAssignments(oneShard, "text", "doc_id", 10, 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 0L, 0L),   // tokens 0-3 in pack 0
      (8L, 4L, 0L, 0L),   // tokens 4-7 in pack 0
      (16L, 8L, 0L, 1L),  // tokens 8-11 STRADDLE packs 0-1
      (24L, 12L, 1L, 1L)))
  }

  test("shards pack independently and deterministically") {
    val twoShards = docs(
      (0L, "a b c"), (1L, "x y z"), (8L, "d e f"), (9L, "u v w"))
    val rows = Packing.packAssignments(twoShards, "text", "doc_id", 4, 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // shard 0 = ids 0,8 with offsets 0,3; shard 1 = ids 1,9 with 0,3
    assert(rows.toSeq == Seq((0L, 0L, 0L), (1L, 1L, 0L), (8L, 0L, 3L), (9L, 1L, 3L)))
  }

  test("shard stats reconcile: full packs x seqLen + tail = total tokens") {
    val stats = Packing.shardPackStats(oneShard, "text", "doc_id", 10, 8)
      .collect()
    assert(stats.length == 1)
    val r = stats.head
    val (total, fullPacks, tail) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(total == 16 && fullPacks == 1 && tail == 6)
    assert(fullPacks * 10 + tail == total)
  }

  test("chunk boundaries: stride, clipping, and short-doc fallback") {
    val df = docs(
      (1L, ("w " * 10).trim),   // 10 tokens <= 32 -> one clipped chunk
      (2L, ("w " * 32).trim),   // exactly one full chunk
      (3L, ("w " * 40).trim))   // chunks [0,32), [24,40)
    val out = Packing.chunkBoundaries(df, "text", "doc_id", 32, 8)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 10L),
      (2L, 0L, 0L, 32L),
      (3L, 0L, 0L, 32L), (3L, 1L, 24L, 40L)))
    // every token index is covered by at least one chunk
    val covered = out.filter(_._1 == 3L)
      .flatMap { case (_, _, s0, e0) => s0 until e0 }.toSet
    assert(covered == (0L until 40L).toSet)
  }

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("best-fit-decreasing reproduces the known-optimal packing") {
    // one shard (ids ≡ 0 mod 8); sizes 6,4,5,5 with seqLen 10 pack into
    // exactly two full bins: [6+4] and [5+5]
    val df = docs((0L, words(6)), (8L, words(4)), (16L, words(5)), (24L, words(5)))
    val out = Packing.packBestFit(df, "text", "doc_id", seqLen = 10, numShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // sorted decreasing: id0(6)→bin0, id16(5)→bin1, id24(5)→bin1, id8(4)→bin0
    assert(out == Map(0L -> 0L, 16L -> 1L, 24L -> 1L, 8L -> 0L))
  }

  test("best-fit bins never exceed capacity; oversize docs sit alone") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Packing.packBestFit(real, "text", "doc_id", seqLen = 64, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // every doc placed exactly once
    assert(out.map(_._1).distinct.length == real.count())
    out.groupBy(x => (x._2, x._4)).foreach { case ((shard, bin), rs) =>
      val total = rs.map(_._3).sum
      if (rs.exists(_._5)) // oversize: alone in its bin
        assert(rs.length == 1, s"oversize doc shares bin $bin in shard $shard")
      else
        assert(total <= 64, s"bin $bin in shard $shard holds $total tokens")
    }
    // oversize flag matches reality
    out.foreach { case (id, _, n, _, over) =>
      assert(over == (n > 64), s"doc $id n=$n flagged $over")
    }
    // determinism
    val again = Packing.packBestFit(real, "text", "doc_id", 64, 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == out.map(x => (x._1, x._4)).toSet)
  }

  test("best-fit wastes no more capacity than concat-and-chunk's tail") {
    // lower bound: bins_used >= ceil(total/seqLen) per shard
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Packing.packBestFit(real, "text", "doc_id", seqLen = 256, numShards = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (shard, rs) =>
      val total = rs.map(_._2).sum
      val bins = rs.map(_._3).distinct.length
      assert(bins >= math.ceil(total / 256.0).toInt, s"shard $shard impossible")
      // BFD on sub-capacity docs is within 2x of the fractional bound
      assert(bins <= 2 * math.ceil(total / 256.0).toInt + 1, s"shard $shard wasteful")
    }
  }
}
