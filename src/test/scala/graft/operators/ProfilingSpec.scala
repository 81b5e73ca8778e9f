package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable fixtures for the round-10 profiling/statistics
  * family: Gini closed form, Benford digit assignment, Kruskal–Wallis
  * against a textbook example, FD g3 and IND coverage on frames whose
  * answers are visible by inspection.
  */
class ProfilingSpec extends SparkSpec {

  test("giniByGroup: closed form on a known distribution") {
    val s = spark
    import s.implicits._
    // group x: values 1.00, 2.00, 3.00 -> cents 100,200,300
    //   G = (2*(1*100+2*200+3*300) - 4*600) / (3*600) = (2800-2400)/1800
    // group y: perfectly equal -> G = (2*(1+2+3)*100 - 4*300)/(3*300)
    //   = (1200-1200)/900 = 0
    val df = Seq(
      ("x", 1.00, 1L), ("x", 2.00, 2L), ("x", 3.00, 3L),
      ("y", 1.00, 4L), ("y", 1.00, 5L), ("y", 1.00, 6L))
      .toDF("g", "v", "id")
    val out = Inequality.giniByGroup(df, "g", "v", "id")
      .orderBy("g").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("x", "y"))
    assert(math.abs(out(0).getDouble(3) - 400.0 / 1800.0) < 1e-6)
    assert(out(1).getDouble(3) == 0.0)
    assert(out(0).getLong(2) == 600L)
  }

  test("giniByGroup: ties in value do not depend on tiebreak order") {
    val s = spark
    import s.implicits._
    val a = Seq(("g", 2.0, 1L), ("g", 2.0, 2L), ("g", 5.0, 3L))
      .toDF("g", "v", "id")
    val b = Seq(("g", 2.0, 2L), ("g", 2.0, 1L), ("g", 5.0, 3L))
      .toDF("g", "v", "id")
    val ga = Inequality.giniByGroup(a, "g", "v", "id").collect()(0)
    val gb = Inequality.giniByGroup(b, "g", "v", "id").collect()(0)
    assert(ga.getDouble(3) == gb.getDouble(3))
  }

  test("benfordDigits: digit comes from integer cents, shares sum to 1") {
    val s = spark
    import s.implicits._
    val df = Seq(1.23, 19.99, 150.00, 0.07, 923.45, -5.0, 0.0)
      .toDF("v")
    val out = Profiling.benfordDigits(df, "v").orderBy("digit").collect()
    // -5.0 and 0.0 excluded; digits: 123->1, 1999->1, 15000->1, 7->7,
    // 92345->9
    assert(out.map(r => r.getInt(0) -> r.getLong(1)).toSeq ==
      Seq(1 -> 3L, 7 -> 1L, 9 -> 1L))
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-5)
    // expectation for digit 1 is log10(2) ~ 0.30103
    assert(math.abs(out(0).getDouble(3) - 0.30103) < 1e-5)
  }

  test("kruskalWallis: textbook three-group example") {
    val s = spark
    import s.implicits._
    // groups entirely separated: a={1,2}, b={3,4}, c={5,6} -> ranks
    // 1..6, R_a=3, R_b=7, R_c=11; H = 12/(6*7)*(9/2+49/2+121/2)-3*7
    //   = (2/7)*89.5/ ... compute: 12/42*(4.5+24.5+60.5)-21
    //   = 0.285714*89.5-21 = 25.5714...-21 = 4.571429; no ties -> C=1
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("g", "v")
    val out = Evaluation.kruskalWallis(df, "v", "g").collect()(0)
    assert(out.getLong(0) == 3L && out.getLong(1) == 6L)
    assert(out.getLong(2) == 0L)
    assert(math.abs(out.getDouble(3) - 4.571429) < 1e-5)
  }

  test("kruskalWallis: tie correction engages on tied values") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L),
      ("c", 2L), ("c", 3L)).toDF("g", "v")
    val out = Evaluation.kruskalWallis(df, "v", "g").collect()(0)
    // ties: value 1 (t=3) and 2 (t=2) -> Σ(t³−t) = 24 + 6 = 30
    assert(out.getLong(2) == 30L)
    assert(!out.isNullAt(3))
  }

  test("fdViolation: exact g3 on a frame with one violating lhs") {
    val s = spark
    import s.implicits._
    // lhs=a maps to {x:2, y:1} -> 1 violating row; lhs=b clean (2 rows)
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"),
      ("b", "z")).toDF("l", "r")
    val out = Profiling.fdViolation(df, "t.l->r", col("l"), col("r"))
      .collect()(0)
    assert(out.getString(0) == "t.l->r")
    assert(out.getLong(1) == 5L)     // n_rows
    assert(out.getLong(2) == 2L)     // n_lhs
    assert(out.getLong(3) == 1L)     // n_violating_lhs
    assert(out.getLong(4) == 1L)     // n_violating_rows
    assert(math.abs(out.getDouble(5) - 0.2) < 1e-9)
  }

  test("inclusionCoverage: counts distinct FK matches, ignores nulls") {
    val s = spark
    import s.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Profiling.inclusionCoverage(
      child, "fk", parent, "pk", "c<=p").collect()(0)
    assert(out.getLong(1) == 3L)     // distinct non-null fks: 1,2,9
    assert(out.getLong(2) == 2L)     // 1,2 matched
    assert(math.abs(out.getDouble(3) - 2.0 / 3.0) < 1e-6)
  }

  test("weightedMedianByGroup picks the 2·cumw ≥ totw value exactly") {
    val s = spark
    import s.implicits._
    // g1: values 1(w1), 2(w1), 3(w10) → tot 12, cum at 3 is 12 ≥ 6,
    //     cum at 2 is 2 < 6 → median 3. g2: 5(w2), 7(w2) → tot 4,
    //     cum at 5 is 2, 2·2 ≥ 4 → LOWER median 5.
    val df = Seq(("g1", 1.0, 1.0), ("g1", 2.0, 1.0), ("g1", 3.0, 10.0),
      ("g2", 5.0, 2.0), ("g2", 7.0, 2.0)).toDF("g", "v", "w")
    val out = Inequality.weightedMedianByGroup(df, "g", "v", "w")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("g1", 12L, 3.0), ("g2", 4L, 5.0)))
  }

  test("bucketed weighted median equals the plain pick, incl. tiny buckets") {
    val s = spark
    import s.implicits._
    // values span many buckets at bucketBits=2 (width 4 cents) so the
    // bucket walk, offset carry, and in-bucket pick all engage
    val df = (1 to 200).map { i =>
      (s"g${i % 3}", i.toDouble / 7.0, (i % 9 + 1).toDouble)
    }.toDF("g", "v", "w")
    val plain = Inequality.weightedMedianByGroup(df, "g", "v", "w")
      .orderBy("g").collect().map(_.toSeq)
    val bucketed = Inequality
      .weightedMedianByGroupBucketed(df, "g", "v", "w", bucketBits = 2)
      .orderBy("g").collect().map(_.toSeq)
    assert(plain.toSeq == bucketed.toSeq)
  }
}
