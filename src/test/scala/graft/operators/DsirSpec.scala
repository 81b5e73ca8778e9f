package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang")
  }

  test("bucket counts are total (every bucket present) and sum to tokens") {
    val df = docs((1L, "a b c a", "en"), (2L, "d e", "en"))
    val out = Dsir.bucketCounts(df, "text", 32).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 32)
    assert(out.map(_._2).sum == 6L) // tf, with repeats
    assert(out.map(_._1).toSet == (0L until 32L).toSet)
  }

  test("importance weights rank target-vocabulary docs above raw-typical") {
    // target speaks {wiki, cite, ref}; raw background speaks {spam, ad}
    val target = docs(
      (100L, "wiki cite ref wiki", "en"), (101L, "cite ref wiki", "en"))
    val raw = docs(
      (1L, "wiki cite ref", "en"),
      (2L, "spam ad spam ad", "xx"),
      (3L, "wiki spam", "xx")) // mixed sits between
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id", 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L))
  }

  test("avg_llr matches a closed-form restatement on a tiny corpus") {
    val target = docs((10L, "t t u", "en"))
    val raw = docs((1L, "t u", "en"), (2L, "v v", "xx"))
    val b = 16
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(s: String) = (PortableSketches.hash28(md, s) % b).toInt
    // bucket models
    val ctT = new Array[Long](b); val ctR = new Array[Long](b)
    Seq("t", "t", "u").foreach(t => ctT(bucket(t)) += 1)
    Seq("t", "u", "v", "v").foreach(t => ctR(bucket(t)) += 1)
    val tT = 3L; val tR = 4L
    def llr(t: String) =
      math.log(ctT(bucket(t)) + 1.0) - math.log(tT + b.toDouble) -
        math.log(ctR(bucket(t)) + 1.0) + math.log(tR + b.toDouble)
    def rnd(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map(
      1L -> rnd((llr("t") + llr("u")) / 2.0),
      2L -> rnd(llr("v")))
    val got = Dsir.importanceWeights(raw, target, "text", "doc_id", b)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(math.abs(got(k) - v) < 2e-6, s"doc $k") }
  }

  test("selectTopK is a limit over (avg_llr desc, id asc)") {
    val target = docs((10L, "t", "en"))
    val raw = docs((1L, "t", "en"), (2L, "t", "en"), (3L, "z", "xx"))
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id", 16)
    val top = Dsir.selectTopK(w, "doc_id", 2).collect().map(_.getLong(0))
    assert(top.toSeq == Seq(1L, 2L)) // equal scores -> id tiebreak
  }
}
