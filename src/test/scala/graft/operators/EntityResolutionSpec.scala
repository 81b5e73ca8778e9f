package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Entity resolution: blocking contract, score-once semantics, and the
  * total cluster assignment (see [[EntityResolution]] scaladoc for the
  * stated trade-off the blocking contract encodes).
  */
class EntityResolutionSpec extends SparkSpec {

  private def dict(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "name")
  }

  test("pairs within a prefix or suffix block are scored; others are not") {
    val df = dict(
      1L -> "goldenrod lace",   // prefix "go", suffix "ce"
      2L -> "goldenrod lacy",   // prefix "go" — same prefix block as 1
      3L -> "xylophone lace",   // suffix "ce" — same suffix block as 1
      4L -> "zzgoldenrod lazz") // similar-ish to nothing by block: no shared key
    val got = EntityResolution.scoredPairs(df, "name", "id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "same-prefix pair must be scored")
    assert(got.contains((1L, 3L)), "same-suffix pair must be scored")
    // id 4 shares no 2-char prefix/suffix block with anyone: unscored by
    // design even though its string is JW-similar to id 1
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      s"blocked-out pair leaked into scoring: $got")
  }

  test("a pair agreeing on BOTH keys is emitted exactly once") {
    val df = dict(1L -> "alpha beta", 2L -> "alpha betb", 3L -> "unrelated")
    val rows = EntityResolution.scoredPairs(df, "name", "id", threshold = 0.5)
      .collect()
    assert(rows.count(r => r.getLong(0) == 1L && r.getLong(1) == 2L) == 1,
      s"double-keyed pair scored more than once: ${rows.mkString(",")}")
  }

  test("scores match the codegen'd jaro_winkler expression, 6-dp rounded") {
    val df = dict(1L -> "martha", 2L -> "marhta", 3L -> "dwayne", 4L -> "duane")
    graft.expressions.GraftFunctions.register(spark)
    val expected = spark.sql(
      "SELECT round(jaro_winkler('martha', 'marhta'), 6)").head().getDouble(0)
    val got = EntityResolution.scoredPairs(df, "name", "id", threshold = 0.9)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .head().getDouble(2)
    assert(got == expected, s"$got != $expected")
  }

  test("clusters are transitive and the assignment is total") {
    // chain: 1~2 (prefix), 2~3 (prefix) — 3 and 1 land in one cluster
    // even if their direct score were below threshold; 9 is a singleton
    val df = dict(
      1L -> "cornflower blue", 2L -> "cornflower blu",
      3L -> "cornflower bl", 9L -> "entirely different")
    val got = EntityResolution.clusters(df, "name", "id", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 4, "assignment must cover every input row")
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L,
      s"transitive chain not merged: $got")
    assert(got(9L) == 9L, "singleton must keep its own id")
  }

  test("capped: a hot block is sub-blocked, a still-hot extension is dropped") {
    // 12 names share the hot prefix "ho" AND the hot suffix "zz"
    // (both blocks over maxBlock=4). Prefix pass: the 6-char extension
    // "t<L>xxxx" is group-determined → sub-blocks of 3, kept. Suffix
    // pass: the extension is "zzzzzz" for every name → the extended
    // key is STILL 12 rows → dropped by contract.
    val hot = (0L until 12L).map { i =>
      i -> s"hot${('a' + (i / 3).toInt).toChar}xxxx${i}zzzzzzzz"
    } // hotaxxxx0zzz… hotaxxxx1zzz… hotbxxxx3zzz… … hotdxxxx11zzz…
    val df = dict(hot: _*)
    val capped = EntityResolution.scoredPairsCapped(
        df, "name", "id", threshold = 0.1, maxBlock = 4, subLen = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // kept pairs only within 3-row sub-blocks: max candidate id gap 2
    assert(capped.nonEmpty, "sub-blocked groups must still be scored")
    assert(capped.forall { case (a, b) => a / 3 == b / 3 },
      s"pair crossed a sub-block boundary (hot key not capped): $capped")
    // the uncapped operator scores ALL 66 pairs — the hazard the cap bounds
    val uncapped = EntityResolution.scoredPairs(
        df, "name", "id", threshold = 0.1)
      .count()
    assert(uncapped == 66L, s"uncapped hot block must go quadratic: $uncapped")
  }

  test("capped equals uncapped when every block is under the cap") {
    val df = dict(
      1L -> "goldenrod lace", 2L -> "goldenrod lacy",
      3L -> "xylophone lace", 4L -> "different thing")
    val a = EntityResolution.scoredPairs(df, "name", "id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = EntityResolution.scoredPairsCapped(
        df, "name", "id", threshold = 0.5, maxBlock = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b, s"cap must be a no-op on uniform blocks: $a != $b")
  }

  test("capped: candidate volume is bounded by maxBlock per block") {
    // Zipf-hot dictionary: 200 names in ONE 2-char prefix block
    val df = dict((1L to 200L).map(i => i -> s"ma$i common name"): _*)
    val cap = 8
    val keyed = EntityResolution.scoredPairsCapped(
      df, "name", "id", threshold = 0.0001, maxBlock = cap, subLen = 2)
    // with the cap, no block exceeds `cap`, so candidates ≤ Σ C(cap,2)
    // per surviving block — far below the uncapped C(200,2)=19900
    val n = keyed.count()
    assert(n < 19900 / 4,
      s"capped candidates must be far below the quadratic count: $n")
  }

  test("capped clusters equal uncapped clusters when no block is hot") {
    val df = dict(
      1L -> "cornflower blue", 2L -> "cornflower blu",
      3L -> "cornflower bl", 9L -> "entirely different")
    val a = EntityResolution.clusters(df, "name", "id", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = EntityResolution.clustersCapped(
        df, "name", "id", threshold = 0.9, maxBlock = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"$a != $b")
  }

  test("the candidate join is a hash join on the block key, never a nested loop") {
    val df = dict((1L to 40L).map(i => i -> s"name number $i"): _*)
    val plan = EntityResolution.scoredPairs(df, "name", "id", threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"blocking must keep the join a hash equi-join:\n$plan")
  }
}
