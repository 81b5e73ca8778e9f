package graft.operators

import graft.SparkSpec

class CdcChunkingSpec extends SparkSpec {

  private def md = java.security.MessageDigest.getInstance("MD5")

  private def spans(t: String): Vector[String] =
    CdcChunking.chunkSpans(md, t)

  test("chunks concatenate back to the original text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog " * 5,
      "short",
      "a" * 100,
      "key agg row scan slow fast table value part hash")
    texts.foreach { t => assert(spans(t).mkString == t) }
  }

  test("short and empty texts") {
    assert(spans("") == Vector.empty)
    assert(spans("abc") == Vector("abc"))
    // exactly Window chars: no candidate position (i <= len-1 fails)
    assert(spans("12345678") == Vector("12345678"))
  }

  test("boundary decisions match the md5 contract position by position") {
    val t = "the quick brown fox jumps over the lazy dog resync test"
    val m = md
    val expected = {
      val bs = (CdcChunking.Window to t.length - 1).filter { i =>
        PortableSketches.hash28(m, t.substring(i - CdcChunking.Window, i)) %
          CdcChunking.Divisor == 0
      }
      val cuts = 0 +: bs.toVector :+ t.length
      cuts.sliding(2).map { case Seq(a, b) => t.substring(a, b) }.toVector
    }
    assert(spans(t) == expected)
  }

  test("resync: docs sharing a suffix share all chunks after first tail boundary") {
    val tailText = "the quick brown fox jumps over the lazy dog and " +
      "resyncs content defined chunks after any prefix shift no matter what"
    val a = "completely different prefix material here " + tailText
    val b = "xy " + tailText // different prefix LENGTH — offsets shift
    val ca = spans(a)
    val cb = spans(b)
    val shared = ca.toSet.intersect(cb.toSet)
    // the whole tail past the first in-tail boundary must be common
    assert(shared.nonEmpty, s"no resync: $ca vs $cb")
    // and the shared chunks must cover a suffix of both docs
    val sufA = ca.reverse.takeWhile(shared.contains).reverse
    val sufB = cb.reverse.takeWhile(shared.contains).reverse
    assert(sufA == sufB && sufA.nonEmpty)
  }

  test("crossDocStats flags only cross-doc repeats") {
    val s = spark
    import s.implicits._
    val tail = " the quick brown fox jumps over the lazy dog and " +
      "resyncs content defined chunks after any prefix shift"
    val docs = Seq(
      (1L, "first document body with its own words entirely" + tail),
      (2L, "second and rather different set of words here too" + tail),
      (3L, "third text that shares no suffix with the others at all")
    ).toDF("doc_id", "text")
    val got = CdcChunking.crossDocStats(docs).orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_shared")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 3)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 > 0, s"doc 1 shares tail chunks: $got")
    assert(byId(2L)._3 > 0, s"doc 2 shares tail chunks: $got")
    assert(byId(3L)._3 == 0, s"doc 3 shares nothing: $got")
    // chunk counts cover the text
    assert(got.forall(_._2 >= 1))
  }
}
