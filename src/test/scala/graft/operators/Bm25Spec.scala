package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  private def score(rows: (Long, String)*)(terms: String*): Map[Long, Double] = {
    val s = spark
    import s.implicits._
    Bm25.score(rows.toSeq.toDF("doc_id", "text"), "text", "doc_id", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("only documents containing a query term are returned") {
    val got = score(
      (1L, "spark shuffles data"), (2L, "ducks swim fast"),
      (3L, "spark spark everywhere"))("spark")
    assert(got.keySet == Set(1L, 3L))
  }

  test("higher tf scores higher at equal length; saturates sublinearly") {
    val got = score(
      (1L, "spark a b c"), (2L, "spark spark b c"),
      (3L, "spark spark spark c"), (4L, "x y z w"))("spark")
    assert(got(2L) > got(1L) && got(3L) > got(2L))
    // k1 saturation: the second occurrence adds less than the first
    assert(got(3L) - got(2L) < got(2L) - got(1L))
  }

  test("rarer terms contribute more (idf monotone in df)") {
    // 'rare' appears in 1 of 4 docs, 'common' in 3 of 4; doc 1 holds
    // both once at the same length, so its rare-term contribution must
    // dominate: score(1) > 2 * score of a common-only doc of equal dl
    val got = score(
      (1L, "rare common a b"), (2L, "common x y z"),
      (3L, "common p q r"), (4L, "m n o p"))("rare", "common")
    assert(got(1L) > got(2L) && got(2L) == got(3L))
  }

  test("longer documents are penalized for the same tf") {
    val got = score(
      (1L, "spark a"), (2L, "spark a b c d e f g h"))("spark")
    assert(got(1L) > got(2L))
  }

  test("scores are positive even for terms in most of the corpus") {
    val got = score(
      (1L, "t a"), (2L, "t b"), (3L, "t c"), (4L, "z"))("t")
    assert(got.values.forall(_ > 0.0))
  }

  test("guards: empty and duplicate term sets throw") {
    intercept[IllegalArgumentException](score((1L, "a"))())
    intercept[IllegalArgumentException](score((1L, "a"))("a", "a"))
  }
}
