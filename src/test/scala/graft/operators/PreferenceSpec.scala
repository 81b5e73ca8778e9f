package graft.operators

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {

  // battles among models 1..3; (3,1) rows arrive FLIPPED to exercise
  // canonicalization: 3 beats 1 twice -> canonical (1,3) wins_b = 2
  private def battles = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 2L, 0L), (1L, 2L, 0L), (1L, 2L, 1L), // 1 beats 2, 2:1
      (2L, 3L, 1L), (2L, 3L, 2L),               // 3 beats 2; one tie
      (3L, 1L, 0L), (3L, 1L, 0L))               // 3 beats 1 twice
      .toDF("model_a", "model_b", "outcome")
  }

  test("winMatrix canonicalizes pairs and flips outcomes") {
    val m = Preference.winMatrix(battles, "model_a", "model_b", "outcome")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))
      .toMap
    assert(m((1L, 2L)) == ((3L, 2L, 1L, 0L, 0.666667)))
    assert(m((2L, 3L)) == ((2L, 0L, 1L, 1L, 0.0)))
    assert(m((1L, 3L)) == ((2L, 0L, 2L, 0L, 0.0)))
  }

  test("copelandRanking scores matchup majorities with shared ranks") {
    val r = Preference.copelandRanking(
        battles, "model_a", "model_b", "outcome")
      .collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5)))
      .toMap
    // 1 beats 2, loses to 3 -> 0; 2 loses both -> -2; 3 wins both -> 2
    assert(r(3L) == ((2L, 2L, 0L, 2L, 1L)))
    assert(r(1L) == ((2L, 1L, 1L, 0L, 2L)))
    assert(r(2L) == ((2L, 0L, 2L, -2L, 3L)))
  }

  test("invalid outcome codes raise instead of silently dropping") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, 2L, 7L)).toDF("model_a", "model_b", "outcome")
    val e = intercept[Exception] {
      Preference.winMatrix(bad, "model_a", "model_b", "outcome").collect()
    }
    assert(e.getMessage.contains("outcome must be 0|1|2"))
  }

  test("non-integral model ids raise instead of emptying the matrix") {
    val s = spark
    import s.implicits._
    // string model names — the normal arena case — must not silently
    // cast to null and drop every row
    val named = Seq(("alpha", "bravo", 0L)).toDF("model_a", "model_b", "outcome")
    val e = intercept[Exception] {
      Preference.winMatrix(named, "model_a", "model_b", "outcome").collect()
    }
    assert(e.getMessage.contains("must be integral"))
    // numeric strings DO cast and still work
    val numeric = Seq(("1", "2", 0L), ("2", "1", 1L))
      .toDF("model_a", "model_b", "outcome")
    val m = Preference.winMatrix(numeric, "model_a", "model_b", "outcome")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(m((1L, 2L)) == 2L)
  }
}
