package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._

class RepeatedSpansSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog today"
    Seq(
      (1L, s"alpha beta $quote gamma delta"),
      (2L, s"unrelated words here then $quote and more tail words"),
      (3L, "totally unique document with no shared phrases at all"),
      (4L, "short doc"))
      .toDF("doc_id", "text")
  }

  test("shared quotes surface as one maximal span per document") {
    val out = RepeatedSpans.spans(corpus, "text", "doc_id", n = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // quote = 10 tokens → 7 constituent 4-grams, merged into ONE span
    assert(out.length == 2)
    val Array(d1, d2) = out
    assert(d1 == ((1L, 2L, 11L, 7L)))
    assert(d2 == ((2L, 4L, 13L, 7L)))
  }

  test("removal keeps exactly the canonical occurrence") {
    val out = RepeatedSpans.removeRepeated(corpus, "text", "doc_id", n = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1 holds the (doc,idx)-minimum occurrence → untouched
    assert(out(1L)._1 ==
      "alpha beta the quick brown fox jumps over the lazy dog today gamma delta")
    assert(out(1L)._3 == 0L)
    // doc 2 loses the 10 quote tokens, keeps its own prose
    assert(out(2L)._1 ==
      "unrelated words here then and more tail words")
    assert(out(2L)._3 == 10L)
    // unique and short docs pass through whole
    assert(out(3L)._3 == 0L && out(4L)._3 == 0L)
    assert(out(4L)._1 == "short doc")
  }

  test("within-document repetition counts toward the frequency gate") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "x one two three four y one two three four z"))
      .toDF("doc_id", "text")
    val sp = RepeatedSpans.spans(df, "text", "doc_id", n = 4).collect()
    // the repeated 4-gram occurs twice in one doc → two disjoint spans
    assert(sp.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 4L), (6L, 9L)))
    val rm = RepeatedSpans.removeRepeated(df, "text", "doc_id", n = 4)
      .collect().head
    assert(rm.getString(1) == "x one two three four y z")
    assert(rm.getLong(3) == 4L)
  }

  test("adjacent distinct repeated grams merge into one span") {
    val s = spark
    import s.implicits._
    // two different repeated 3-grams sitting back to back in doc 3
    val df = Seq(
      (1L, "a b c p q r"),
      (2L, "x y z s t u"),
      (3L, "head a b c x y z tail"))
      .toDF("doc_id", "text")
    val sp = RepeatedSpans.spans(df, "text", "doc_id", n = 3)
      .filter("doc_id = 3").collect()
    assert(sp.map(r => (r.getLong(1), r.getLong(2))).toSet == Set((1L, 6L)))
  }

  test("supplementary characters in tokens hash identically to the " +
    "declarative md5(concat_ws) form — the kernel is code-point safe") {
    val s = spark
    import s.implicits._
    // tokens carrying surrogate pairs: whitespace is BMP-only, so
    // split never cuts a pair, and md5 runs over the same UTF-8 bytes
    // either way — prove it against Spark's own expression chain
    val phrase = "🚀x a🚀b c 🚀🚀 e f"
    val df = Seq(
      (1L, s"pre $phrase post"),
      (2L, s"$phrase trailing words here"))
      .toDF("doc_id", "text")
    val sp = RepeatedSpans.spans(df, "text", "doc_id", n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // the 6-token emoji phrase repeats: doc 1 spans tokens 1-6,
    // doc 2 spans 0-5
    assert(sp.toSeq == Seq((1L, 1L, 6L), (2L, 0L, 5L)))
    // kernel gram digests == the declarative expression's digests,
    // row for row (doc, idx, md5 hex)
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    val decl = df.select(col("doc_id"), posexplode(transform(
        sequence(lit(1), size(toks) - 5),
        i => md5(concat_ws(" ", slice(toks, i, lit(6))).cast("binary"))))
        .as(Seq("idx", "gram")))
      .orderBy("doc_id", "idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val kern = RepeatedSpans.grams(df, "text", "doc_id", n = 6)
      .orderBy("doc", "idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(kern == decl, s"kernel $kern\nvs declarative $decl")
  }
}
