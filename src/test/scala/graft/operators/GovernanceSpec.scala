package graft.operators

import graft.SparkSpec

class GovernanceSpec extends SparkSpec {

  test("k-anonymity summary and violations on a hand case") {
    val s = spark
    import s.implicits._
    // groups: (en,a)=5 ok, (en,b)=2 violating, (fr,a)=1 violating
    val df = (Seq.fill(5)(("en", "a")) ++ Seq.fill(2)(("en", "b")) ++
      Seq(("fr", "a"))).toDF("lang", "source")
    val r = Governance.kAnonymity(df, Seq("lang", "source"), 5).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 3)
    assert(r.getLong(2) == 2 && r.getLong(3) == 3 && r.getLong(4) == 8)
    assert(r.getDouble(5) == 0.375)
    val v = Governance.kAnonymityViolations(df, Seq("lang", "source"), 5)
      .collect().map(r2 => (r2.getString(0), r2.getString(1), r2.getLong(2)))
      .toSet
    assert(v == Set(("en", "b", 2L), ("fr", "a", 1L)))
  }

  test("k-anonymity: fully anonymous corpus has zero risk") {
    val s = spark
    import s.implicits._
    val df = (1 to 20).map(i => ("en", s"s${i % 2}")).toDF("lang", "source")
    val r = Governance.kAnonymity(df, Seq("lang", "source"), 5).head()
    assert(r.getLong(2) == 0 && r.getLong(3) == 0 && r.getDouble(5) == 0.0)
  }

  test("l-diversity: a large-but-uniform group violates; a diverse one passes") {
    val s = spark
    import s.implicits._
    // group (en, a): 10 rows but all share sensitive value 1 -> violates l=2
    // group (en, b): 2 rows with 2 distinct values -> safe
    val df = ((1 to 10).map(_ => ("en", "a", 1L)) ++
      Seq(("en", "b", 1L), ("en", "b", 2L)))
      .toDF("lang", "source", "sens")
    val r = Governance.lDiversity(df, Seq("lang", "source"), "sens", 2).head()
    assert(r.getLong(0) == 2L)       // l
    assert(r.getLong(1) == 2L)       // n_groups
    assert(r.getLong(2) == 1L)       // n_violating
    assert(r.getLong(3) == 10L)      // rows_at_risk: the big uniform group
    assert(r.getLong(4) == 12L)
    assert(math.abs(r.getDouble(5) - 10.0 / 12) < 1e-6)
  }
}
