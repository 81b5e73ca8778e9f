package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SentenceDedupSpec extends SparkSpec {

  test("segmentation: terminator runs, trailing punct, empties dropped") {
    val s = spark
    import s.implicits._
    val got = Seq("One two. Three four!! Five six?  Seventh", "", "Just one.")
      .toDF("text")
      .select(SentenceDedup.sentences(col("text")).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("One two", "Three four", "Five six", "Seventh"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("Just one"))
  }

  test("cross-doc stats flag shared sentences, case-insensitively") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Unique alpha. Subscribe now! Unique beta."),
      (2L, "subscribe NOW. Unique gamma."),
      (3L, "Nothing shared here. Truly original?")
    ).toDF("doc_id", "text")
    val got = SentenceDedup.crossDocStats(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_sent", "n_cross", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect()
    assert(got(0) == ((1L, 3L, 1L, 0.333333)))
    assert(got(1) == ((2L, 2L, 1L, 0.5)))
    assert(got(2) == ((3L, 2L, 0L, 0.0)))
  }

  test("duplicate sentence WITHIN one doc only is not cross-doc") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Same line. Same line. Other."),
      (2L, "Different entirely.")
    ).toDF("doc_id", "text")
    val got = SentenceDedup.crossDocStats(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_cross").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("zero-sentence docs drop out") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "..."), (2L, "Real text here.")).toDF("doc_id", "text")
    val got = SentenceDedup.crossDocStats(docs).select("doc_id")
      .as[Long].collect()
    assert(got.toSeq == Seq(2L))
  }
}
