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

  test("tCloseness: global-matching class scores 0, concentrated class scores high") {
    val s = spark
    import s.implicits._
    // class A mirrors the global mix (half 0s, half 2s); class B is
    // all value 2 -> |cum diff| = 0.5 at v=0 and v=1, 0 at v=2;
    // K=2 distinct values -> wait, domain {0,2} -> K=2, t_B = 0.5/1
    val rows = Seq(("A", 0L), ("A", 0L), ("A", 2L), ("A", 2L),
      ("B", 2L), ("B", 2L), ("B", 2L), ("B", 2L))
    val out = Governance.tCloseness(
        rows.toDF("q", "sens"), Seq("q"), "sens")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // global: 2/8 at v=0 -> cumshare 0.25; A: cum 0.5 -> |0.25|;
    // B: cum 0 -> |0.25|. t = 0.25/(2-1)
    assert(math.abs(out("A") - 0.25) < 1e-6)
    assert(math.abs(out("B") - 0.25) < 1e-6)
    // a class identical to the global distribution scores exactly 0
    val uni = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L))
    val out2 = Governance.tCloseness(
        uni.toDF("q", "sens"), Seq("q"), "sens")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out2("A") == 0.0 && out2("B") == 0.0)
  }

  test("kAnonymizeSuppress masks exactly the sub-k cells, passes the rest") {
    val s = spark
    import s.implicits._
    // cell (en, web): 3 rows (≥ 3 keeps); cell (fr, web): 1 row (masked)
    val df = Seq((1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "fr", "web")).toDF("id", "lang", "source")
    val out = Governance.kAnonymizeSuppress(df, Seq("lang", "source"), 3)
      .select("id", "lang", "source", "suppressed")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
    assert(out.take(3).forall(t => t._2 == "en" && !t._4))
    assert(out(3) == ((4L, "*", "*", true)))
  }

  test("kAnonymizeSuppress: NULL quasi values form a cell, rows never drop") {
    val s = spark
    import s.implicits._
    // 3 rows in the (NULL, web) cell (>= k passes, nulls intact), 1 in
    // (fr, NULL) (sub-k -> masked); a null-rejecting join-back would
    // silently LOSE all four rows from the release
    val df = Seq((1L, null, "web"), (2L, null, "web"), (3L, null, "web"),
      (4L, "fr", null)).toDF("id", "lang", "source")
    val out = Governance.kAnonymizeSuppress(df, Seq("lang", "source"), 3)
      .select("id", "lang", "source", "suppressed")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
    assert(out.length == 4, s"rows lost: ${out.mkString(",")}")
    assert(out.take(3).forall(t => t._2 == null && t._3 == "web" && !t._4))
    assert(out(3) == ((4L, "*", "*", true)))
  }
}
