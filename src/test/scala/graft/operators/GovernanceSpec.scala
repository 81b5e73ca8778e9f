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
}
