package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class QualityClassifierSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** Independent restatement of the contract: first 7 hex chars of
    * md5(s) parsed base-16 (what the oracle's substr(md5(w),1,7) does).
    */
  private def h28(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(7)
    java.lang.Long.parseLong(hex, 16)
  }

  test("portable logits match a hex-string restatement of the contract") {
    val df = docs((1L, "alpha beta gamma"), (2L, "alpha alpha alpha"),
      (3L, "Delta delta EPSILON zeta"))
    val out = QualityClassifier.portableLogitMilli(df, "text", "doc_id", 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def w(b: Long) = h28("w" + b) % 2001L - 1000L
    val bias = h28("bias") % 2001L - 1000L
    def expect(tokens: Set[String]) =
      bias + tokens.toSeq.map(t => w(h28(t) % 64)).sum
    val exp = Map(
      1L -> expect(Set("alpha", "beta", "gamma")),
      2L -> expect(Set("alpha")), // distinct tokens: presence, not tf
      3L -> expect(Set("delta", "epsilon", "zeta"))) // lowercased first
    assert(out.map { case (id, (_, l)) => id -> l } == exp)
  }

  test("n_feat counts DISTINCT lowercased tokens; label is sign of logit") {
    val df = docs((7L, "X x X y"))
    val r = QualityClassifier.portableLogitMilli(df, "text", "doc_id", 1024)
      .collect().head
    assert(r.getLong(1) == 2L) // {x, y}
    assert(r.getBoolean(3) == (r.getLong(2) > 0L))
  }

  test("production double-weight inference scores by hashed buckets") {
    // weights crafted so doc with token 'good' scores high: find its
    // bucket under the murmur hash and set only that weight positive
    val b = 16
    val goodBucket = {
      val h = Dedup.hash64("good")
      ((h % b + b) % b).toInt
    }
    val w = Array.fill(b)(0.0)
    w(goodBucket) = 2.0
    val out = QualityClassifier.scoreHashedLinear(
        docs((1L, "good stuff"), (2L, "bad stuff")), "text", "doc_id", w, -1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    // doc 2 has logit -1 + w(bad) + w(stuff); unless bad/stuff collide
    // into goodBucket they contribute 0
    assert(out(0)._2 >= out(1)._2)
    assert(out.forall(r => r._3 > 0.0 && r._3 < 1.0))
    assert(math.abs(out(0)._3 - 1.0 / (1.0 + math.exp(-out(0)._2))) < 1e-12)
  }

  test("portable weight table is in range and deterministic") {
    val w1 = QualityClassifier.portableWeights(1024)
    val w2 = QualityClassifier.portableWeights(1024)
    assert(w1.sameElements(w2))
    assert(w1.forall(x => x >= -1000L && x <= 1000L))
    // non-degenerate: both signs occur
    assert(w1.exists(_ > 0) && w1.exists(_ < 0))
  }
}
