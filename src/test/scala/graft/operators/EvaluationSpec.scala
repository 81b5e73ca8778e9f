package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Filter-model evaluation metrics against hand-computed values —
  * including the tie handling in AUC, both error directions in the
  * pairwise dedup measure, and the undefined-ratio edges (constant
  * raters, empty prediction sets) that must surface as NULL, never as
  * a division blow-up.
  */
class EvaluationSpec extends SparkSpec {

  private def scored(rows: (Long, Boolean)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("score", "label")
  }

  test("rank-statistic family: quantize-first guard trips on fractional " +
    "scores, passes integral") {
    val s = spark
    import s.implicits._
    val frac = Seq((0.13, true), (0.77, false)).toDF("score", "label")
      .withColumn("g", col("label").cast("string"))
    // every family member refuses a raw double column, loudly
    def msg(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(Evaluation.rocAuc(frac, "score", "label"))
      .contains("Quantize first"))
    assert(msg(Evaluation.ksDistance(frac, "score", "g", "true", "false"))
      .contains("Quantize first"))
    assert(msg(Evaluation.wasserstein1(frac, "score", "g", "true", "false"))
      .contains("Quantize first"))
    assert(msg(Evaluation.mannWhitneyU(frac, "score", col("label")))
      .contains("Quantize first"))
    assert(msg(Evaluation.kruskalWallis(frac, "score", "g"))
      .contains("Quantize first"))
    assert(msg(Evaluation.cliffsDelta(frac, "score", col("label")))
      .contains("Quantize first"))
    assert(msg(Evaluation.kendallTauB(
        frac.withColumn("b", col("score") * 2), "score", "b"))
      .contains("Quantize first"))
    assert(msg(Evaluation.conformalQuantile(frac, "score"))
      .contains("Quantize first"))
    // the documented recipe passes: milli-unit quantization
    val milli = frac.withColumn("score",
      org.apache.spark.sql.functions.expr(
        "CAST(round(score * 1000) AS LONG)"))
    assert(Evaluation.rocAuc(milli, "score", "label").head()
      .getDouble(2) == 0.0)
    // scale-0 decimals are integral too
    val dec = frac.withColumn("score",
      org.apache.spark.sql.functions.expr(
        "CAST(round(score * 1000) AS DECIMAL(18,0))"))
    assert(Evaluation.conformalQuantile(dec, "score", Seq(10))
      .count() == 1)
  }

  test("pairedBootstrap: constant difference collapses every replicate " +
    "to it; identical metrics give a zero band; deterministic") {
    val s = spark
    import s.implicits._
    // a - b = 7 on every unit: a weighted mean of a constant is the
    // constant, so delta_obs, ci_lo, ci_hi are all EXACTLY 7
    val const = (1L to 50L).map(i => (i, i * 10 + 7, i * 10))
      .toDF("unit", "a", "b")
    val r = Evaluation.pairedBootstrap(const, "unit", "a", "b",
      nBoot = 64).head()
    assert(r.getLong(0) == 50)
    assert(r.getDouble(1) == 7.0)
    assert(r.getDouble(3) == 7.0 && r.getDouble(4) == 7.0)
    assert(r.getDouble(5) == 0.0) // no replicate delta <= 0
    // identical metrics: everything at exactly 0, sign share 1
    val same = (1L to 50L).map(i => (i, i, i)).toDF("unit", "a", "b")
    val r0 = Evaluation.pairedBootstrap(same, "unit", "a", "b",
      nBoot = 64).head()
    assert(r0.getDouble(1) == 0.0 &&
      r0.getDouble(3) == 0.0 && r0.getDouble(4) == 0.0 &&
      r0.getDouble(5) == 1.0)
    // determinism across invocations (md5-contract weights)
    val mixed = (1L to 40L).map(i =>
      (i, i * 3 % 17, i * 5 % 13)).toDF("unit", "a", "b")
    val x = Evaluation.pairedBootstrap(mixed, "unit", "a", "b").head()
    val y = Evaluation.pairedBootstrap(mixed, "unit", "a", "b").head()
    assert(x == y)
    assert(x.getDouble(3) <= x.getDouble(1) &&
      x.getDouble(1) <= x.getDouble(4),
      "observed delta outside its own 95% band on iid-ish input")
    // fractional metrics refused (quantize-first contract)
    val frac = Seq((1L, 0.5, 1.0)).toDF("unit", "a", "b")
    assert(intercept[IllegalArgumentException](
      Evaluation.pairedBootstrap(frac, "unit", "a", "b"))
      .getMessage.contains("Quantize first"))
  }

  test("sprtBernoulli: textbook LLR walk and first crossing on a hand " +
    "stream") {
    val s = spark
    import s.implicits._
    // day 1: 10 trials 6 successes; day 2: 10 trials 7 successes —
    // testing H1 p=0.6 vs H0 p=0.3 at alpha=5% beta=20%:
    // c1 = ln(2), c2 = ln(4/7); upper = ln(80/5) = ln(16)
    // LLR day1 = 6 ln2 + 4 ln(4/7) = 1.920... < ln 16 = 2.7725 -> continue
    // LLR day2 = 13 ln2 + 7 ln(4/7) = 5.0938... >= ln 16 -> accept_h1
    val rows =
      (1 to 10).map(i => ("2024-01-01 0" + (i % 10) + ":00:00", i <= 6)) ++
      (1 to 10).map(i => ("2024-01-02 0" + (i % 10) + ":00:00", i <= 7))
    val df = rows.toDF("tss", "succ")
      .selectExpr("CAST(tss AS TIMESTAMP) AS ts", "succ")
    val r = Evaluation.sprtBernoulli(df, "ts", col("succ"),
        p0 = 0.3, p1 = 0.6, alphaPct = 5, betaPct = 20)
      .orderBy("day").collect()
    assert(r.length == 2)
    val d1 = r(0); val d2 = r(1)
    assert(d1.getLong(1) == 10 && d1.getLong(2) == 6)
    val exp1 = BigDecimal(6 * math.log(2.0) + 4 * math.log(4.0 / 7.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d1.getDouble(3) == exp1)
    assert(d1.getString(4) == "continue")
    assert(d2.getLong(1) == 20 && d2.getLong(2) == 13)
    assert(d2.getString(4) == "accept_h1")
    // a losing stream walks to accept_h0
    val bad = (1 to 40).map(i =>
      ("2024-01-0" + (1 + i % 5) + " 00:00:00", i % 10 == 0))
      .toDF("tss", "succ")
      .selectExpr("CAST(tss AS TIMESTAMP) AS ts", "succ")
    val last = Evaluation.sprtBernoulli(bad, "ts", col("succ"),
        p0 = 0.3, p1 = 0.6, alphaPct = 5, betaPct = 20)
      .orderBy(col("day").desc).limit(1).head()
    assert(last.getString(4) == "accept_h0")
  }

  test("cmhTest: hand-computed two-stratum pooled chi2 and MH odds " +
    "ratio; degenerate strata excluded") {
    val s = spark
    import s.implicits._
    // stratum A: n11=10 n10=5 n01=4 n00=11; stratum B: 3/7/2/8
    def cells(st: String, n11: Int, n10: Int, n01: Int, n00: Int) =
      Seq.fill(n11)((st, true, true)) ++ Seq.fill(n10)((st, true, false)) ++
      Seq.fill(n01)((st, false, true)) ++ Seq.fill(n00)((st, false, false))
    val df = (cells("a", 10, 5, 4, 11) ++ cells("b", 3, 7, 2, 8) ++
      Seq(("c", true, true))) // n=1 stratum: excluded
      .toDF("st", "t", "c")
    val r = Evaluation.cmhTest(df, "st", col("t"), col("c")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 50)
    // hand: d_a=3.0, v_a=50400/26100; d_b=0.5, v_b=7500/7600;
    // or = (110/30 + 24/20) / (20/30 + 14/20)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val va = 15.0 * 15.0 * 14.0 * 16.0 / (30.0 * 30.0 * 29.0)
    val vb = 10.0 * 10.0 * 5.0 * 15.0 / (20.0 * 20.0 * 19.0)
    val orMh = (10.0 * 11.0 / 30.0 + 3.0 * 8.0 / 20.0) /
      (5.0 * 4.0 / 30.0 + 7.0 * 2.0 / 20.0)
    val chi2 = 3.5 * 3.5 / (va + vb)
    assert(r.getDouble(2) == r6(orMh), s"${r.getDouble(2)} vs ${r6(orMh)}")
    assert(r.getDouble(3) == r6(chi2), s"${r.getDouble(3)} vs ${r6(chi2)}")
    // no-association strata: chi2 ~ 0, OR = 1
    val nul = cells("a", 5, 5, 5, 5).toDF("st", "t", "c")
    val rn = Evaluation.cmhTest(nul, "st", col("t"), col("c")).head()
    assert(rn.getDouble(2) == 1.0 && rn.getDouble(3) == 0.0)
  }

  test("rocAuc: perfect separation gives 1.0, reversed gives 0.0") {
    val perfect = scored(1L -> false, 2L -> false, 3L -> true, 4L -> true)
    val r = Evaluation.rocAuc(perfect, "score", "label").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0)
    val rev = scored(1L -> true, 2L -> true, 3L -> false, 4L -> false)
    assert(Evaluation.rocAuc(rev, "score", "label").head().getDouble(2) == 0.0)
  }

  test("rocAuc: average-rank tie handling") {
    // scores: pos at {2, 1}, neg at {2, 0} — the tie at 2 counts half.
    // Pairs: (2,2)=0.5, (2,0)=1, (1,2)=0, (1,0)=1 → AUC = 2.5/4 = 0.625
    val df = scored(2L -> true, 1L -> true, 2L -> false, 0L -> false)
    assert(Evaluation.rocAuc(df, "score", "label").head().getDouble(2)
      == 0.625)
  }

  test("rocAuc: random-ish interleave matches the quadratic definition") {
    val rows = Seq(5L -> true, 3L -> false, 8L -> true, 3L -> true,
      1L -> false, 9L -> false, 3L -> false, 7L -> true)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val expected = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum /
      (pos.size * neg.size)
    val got = Evaluation.rocAuc(scored(rows: _*), "score", "label")
      .head().getDouble(2)
    assert(math.abs(got - expected) < 1e-6, s"$got vs $expected")
  }

  test("prAtThresholds: counts and ratios at each cut") {
    val df = scored(10L -> true, 8L -> true, 6L -> false, 4L -> true,
      2L -> false)
    val byT = Evaluation
      .prAtThresholds(df, "score", "label", Seq(5L, 7L, 11L))
      .collect().map(r => r.getLong(0) -> r).toMap
    // t=5: pred {10,8,6} → tp=2 fp=1 fn=1 tn=1, P=2/3 R=2/3
    val t5 = byT(5L)
    assert((t5.getLong(1), t5.getLong(2), t5.getLong(3), t5.getLong(4))
      == ((2L, 1L, 1L, 1L)))
    assert(t5.getDouble(5) == 0.666667 && t5.getDouble(6) == 0.666667)
    assert(t5.getDouble(7) == 0.666667) // F1 = P = R here
    // t=7: pred {10,8} → tp=2 fp=0, P=1, R=2/3, F1=0.8
    val t7 = byT(7L)
    assert(t7.getDouble(5) == 1.0 && t7.getDouble(6) == 0.666667)
    assert(t7.getDouble(7) == 0.8)
    // t=11: nothing predicted → precision NULL, recall 0, f1 NULL
    val t11 = byT(11L)
    assert(t11.isNullAt(5) && t11.getDouble(6) == 0.0 && t11.isNullAt(7))
  }

  test("cohenKappa: hand-computed 2x2 and the constant-rater NULL") {
    val s = spark
    import s.implicits._
    // n11=4 n10=1 n01=2 n00=3, n=10: po=0.7,
    // pe = (5*6 + 5*4)/100 = 0.5 → kappa = 0.4
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("a", "b")
    val r = Evaluation.cohenKappa(df, "a", "b").head()
    assert(r.getLong(0) == 10)
    assert(r.getDouble(1) == 0.7 && r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
    // both raters constant-true: pe=1 → kappa undefined (NULL)
    val const = Seq.fill(5)((true, true)).toDF("a", "b")
    assert(Evaluation.cohenKappa(const, "a", "b").head().isNullAt(3))
  }

  test("calibrationBins: bins, edges, and rates — negatives floor down") {
    val df = scored(-1500L -> false, -500L -> false, -500L -> true,
      500L -> true, 1500L -> true, 1700L -> false)
    val bins = Evaluation.calibrationBins(df, "score", "label", 1000L)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // -1500 -> bin -2; -500 -> bin -1 (floor, not truncate)
    assert(bins(-2L) == ((-2000L, 1L, 0L, 0.0)))
    assert(bins(-1L) == ((-1000L, 2L, 1L, 0.5)))
    assert(bins(0L) == ((0L, 1L, 1L, 1.0)))
    assert(bins(1L) == ((1000L, 2L, 1L, 0.5)))
  }

  test("pairwiseClusterEval: both error directions counted") {
    val s = spark
    import s.implicits._
    // pred clusters {1,2,3}{4}{5}; truth clusters {1,2}{3,4}{5}
    // pred pairs {12,13,23}=3; truth pairs {12,34}=2; tp={12}=1
    val df = Seq((1L, "p1", "t1"), (2L, "p1", "t1"), (3L, "p1", "t2"),
      (4L, "p2", "t2"), (5L, "p3", "t3")).toDF("id", "pred", "truth")
    val r = Evaluation.pairwiseClusterEval(df, "pred", "truth").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 3L, 2L)))
    assert(r.getDouble(3) == 0.333333) // precision 1/3
    assert(r.getDouble(4) == 0.5)      // recall 1/2
    assert(r.getDouble(5) == 0.4)      // F1
  }

  test("pairwiseClusterEval: singleton-only clusterings give NULL ratios") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "pred", "truth")
    val r = Evaluation.pairwiseClusterEval(df, "pred", "truth").head()
    assert(r.getLong(0) == 0 && r.getLong(1) == 0 && r.getLong(2) == 0)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("rankingAgreement: hand-computed recall/MRR/nDCG at k=3") {
    val s = spark
    import s.implicits._
    val truth = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3))
      .toDF("q", "id", "rk")
    // candidate swaps 1 and 2, misses 3 (id 9 instead)
    val cand = Seq((7L, 2L, 1), (7L, 1L, 2), (7L, 9L, 3))
      .toDF("q", "id", "rk")
    val r = Evaluation.rankingAgreement(cand, truth, "q", "id", "rk", 3)
      .head()
    assert(r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.666667) // recall 2/3
    assert(r.getDouble(3) == 0.5) // truth #1 found at candidate rank 2
    val log23 = math.log(3.0) / math.log(2.0)
    val dcg = 2.0 / 1.0 + 3.0 / log23
    val ndcg = dcg / Evaluation.idealDcg(3)
    assert(r.getDouble(4) == BigDecimal(dcg)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(r.getDouble(5) - ndcg) < 5e-5)
  }

  test("rankingAgreement: identical rankings score perfectly; disjoint zero") {
    val s = spark
    import s.implicits._
    val t = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "id", "rk")
    val perfect = Evaluation.rankingAgreement(t, t, "q", "id", "rk", 2).head()
    assert(perfect.getDouble(2) == 1.0 && perfect.getDouble(3) == 1.0 &&
      perfect.getDouble(5) == 1.0)
    val miss = Seq((1L, 90L, 1), (1L, 91L, 2)).toDF("q", "id", "rk")
    val zero = Evaluation.rankingAgreement(miss, t, "q", "id", "rk", 2).head()
    assert(zero.getLong(1) == 0 && zero.getDouble(2) == 0.0 &&
      zero.getDouble(3) == 0.0 && zero.getDouble(5) == 0.0)
  }

  test("ksDistance: hand-computed ECDF gap, zero for identical samples") {
    val sp = spark
    import sp.implicits._
    // a = {1,2,3}, b = {1,4}: max gap is at x=3 -> |3/3 - 1/2| = 1/2
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L), ("b", 4L))
      .toDF("g", "x")
    val r = Evaluation.ksDistance(df, "x", "g", "a", "b").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getLong(2) == 3 && r.getDouble(3) == 0.5)
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "x")
    assert(Evaluation.ksDistance(same, "x", "g", "a", "b")
      .head().getDouble(3) == 0.0)
  }

  test("abProportionTest: per-unit conversion dedup and the pooled z") {
    val sp = spark
    import sp.implicits._
    // unit 1 (A) converts twice -> counts once; unit 2 (A) never;
    // units 3, 4 (B) never. p=0.25 pooled -> z = 0.5/sqrt(0.1875*1) = 1.1547
    val df = Seq(
      (1L, "A", true), (1L, "A", true), (2L, "A", false),
      (3L, "B", false), (4L, "B", false))
      .toDF("unit", "variant", "conv")
    val r = Evaluation.abProportionTest(df, "unit", "variant",
      org.apache.spark.sql.functions.col("conv")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 1 &&
      r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.getDouble(4) == 1.1547)
  }

  test("wasserstein1: hand-computed transport, zero for identical samples") {
    val sp = spark
    import sp.implicits._
    // A = {0, 2}, B = {2, 4}: W1 = |.5|*2 + |.5|*2 = 2; num = 8
    val df = Seq(("a", 0L), ("a", 2L), ("b", 2L), ("b", 4L))
      .toDF("g", "x")
    val r = Evaluation.wasserstein1(df, "x", "g", "a", "b").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getLong(2) == 8L && r.getDouble(3) == 2.0)
    // KS would see the same 0.5 sup for a FAR shift; W1 scales with it
    val far = Seq(("a", 0L), ("a", 2L), ("b", 2L), ("b", 100L))
      .toDF("g", "x")
    assert(Evaluation.wasserstein1(far, "x", "g", "a", "b")
      .head().getDouble(3) == 50.0)
    val same = Seq(("a", 1L), ("a", 5L), ("b", 1L), ("b", 5L))
      .toDF("g", "x")
    assert(Evaluation.wasserstein1(same, "x", "g", "a", "b")
      .head().getDouble(3) == 0.0)
  }

  test("krippendorffAlpha: hand-computed nominal alpha, singletons dropped") {
    val sp = spark
    import sp.implicits._
    // 4 units x 2 raters: one unit disagrees -> S_2 = 2, N = 8,
    // n = (3, 5), De_num = 30, alpha = 1 - 7*2/30 = 0.5333
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "b"), (3L, 2L, "b"),
      (4L, 1L, "b"), (4L, 2L, "b"),
      (9L, 1L, "a")) // single-rating unit: dropped per definition
      .toDF("unit", "rater", "cat")
    val r = Evaluation.krippendorffAlpha(df, "unit", "rater", "cat").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 8L)
    assert(r.getLong(2) == 30L)
    assert(r.getDouble(3) == 0.5333)
    // perfect agreement -> alpha = 1
    val perfect = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (2L, 1L, "b"), (2L, 2L, "b"))
      .toDF("unit", "rater", "cat")
    assert(Evaluation.krippendorffAlpha(perfect, "unit", "rater", "cat")
      .head().getDouble(3) == 1.0)
  }

  test("mannWhitneyU: exact 2U and tie-corrected z") {
    val s = spark
    import s.implicits._
    // A = {1,3}, B = {2,4}: ranks 1..4, R_A = 4, U_A = 1,
    // z = (1-2)/sqrt((4/12)*5) = -0.774597
    val df = Seq((1L, "a"), (3L, "a"), (2L, "b"), (4L, "b"))
      .toDF("v", "g")
    val r = Evaluation.mannWhitneyU(df, "v", col("g") === "a").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L) // 2·U_A
    assert(r.getDouble(3) == -0.774597)
    // ties: A = {1,2}, B = {2,3} → avg rank 2.5 for the tied pair,
    // U_A = 0.5, ties term 6, z = -sqrt(1.5)
    val t = Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"))
      .toDF("v", "g")
    val rt = Evaluation.mannWhitneyU(t, "v", col("g") === "a").head()
    assert(rt.getLong(2) == 1L) // 2·U_A = 1 (half-integer U from ties)
    assert(rt.getDouble(3) == -1.224745)
  }

  test("fdrBh: step-up rule rejects above-own-line metrics below k*") {
    val s = spark
    import s.implicits._
    // m=3, q=0.3 → lines 0.1/0.2/0.3. p1=0.11 exceeds ITS line but
    // rank-2's 0.12 ≤ 0.2 sets k*=2, so p1 still rejects (step-up).
    val df = Seq(("p1", 0.11), ("p2", 0.12), ("p3", 0.9))
      .toDF("metric", "p")
    val r = Evaluation.fdrBh(df, "metric", "p", 0.3)
      .orderBy("rank").collect()
      .map(x => (x.getString(0), x.getLong(2), x.getBoolean(4)))
    assert(r.toSeq == Seq(("p1", 1L, true), ("p2", 2L, true),
      ("p3", 3L, false)))
    // nothing under any line → kstar null → nothing rejected
    val none = Seq(("a", 0.5), ("b", 0.9)).toDF("metric", "p")
    assert(Evaluation.fdrBh(none, "metric", "p", 0.05)
      .collect().forall(!_.getBoolean(4)))
  }

  test("brierDecomposition: identity holds on a hand case") {
    val s = spark
    import s.implicits._
    // bins 1 and 9: rel = 0.01, res = 0.25, unc = 0.25, brier = 0.01
    val df = Seq((100L, 0L), (900L, 1L), (100L, 0L), (900L, 1L))
      .toDF("mp", "lbl")
    val r = Evaluation.brierDecomposition(df, "mp", "lbl").head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.01)   // brier
    assert(r.getDouble(2) == 0.01)   // reliability
    assert(r.getDouble(3) == 0.25)   // resolution
    assert(r.getDouble(4) == 0.25)   // uncertainty
  }

  test("cuped: pooled theta adjusts per-arm means") {
    val s = spark
    import s.implicits._
    // pooled theta = (4·47 − 10·16)/(4·30 − 100) = 1.4;
    // arm0 adj = 2.5 + 1.4 = 3.9, arm1 adj = 5.5 − 1.4 = 4.1
    val df = Seq((0L, 1L, 2L), (0L, 2L, 3L), (1L, 3L, 5L), (1L, 4L, 6L))
      .toDF("arm", "x", "y")
    val r = Evaluation.cuped(df, "arm", "x", "y")
      .orderBy("arm").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    assert(r.toSeq == Seq((0L, 2L, 2.5, 3.9), (1L, 2L, 5.5, 4.1)))
  }

  test("conformalQuantile: textbook k-th order statistic with ties") {
    val s = spark
    import s.implicits._
    // scores 1..19 -> n=19; alpha=10%: k=ceil(20*0.9)=18 -> threshold 18
    val df = (1L to 19L).toDF("score")
    val r = Evaluation.conformalQuantile(df, "score", Seq(10))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 19L, 18L, 18L)))
    // heavy tie block: 10 copies of 5, then 6..14 -> n=19, k=18 lands
    // inside the post-tie run
    val tied = (Seq.fill(10)(5L) ++ (6L to 14L)).toDF("score")
    val r2 = Evaluation.conformalQuantile(tied, "score", Seq(10))
      .collect()(0)
    assert(r2.getLong(3) == 13L)
  }

  test("conformalQuantile: undersized calibration emits a NULL-threshold row") {
    val s = spark
    import s.implicits._
    // n=19, alpha=1%: k = ceil(20·0.99) = 20 > n — the conformal
    // threshold is +∞; the row must still appear (NULL threshold, with
    // k and n) instead of silently vanishing
    val df = (1L to 19L).toDF("score")
    val rows = Evaluation.conformalQuantile(df, "score", Seq(10, 1))
      .orderBy("alpha_pct").collect()
    assert(rows.length == 2)
    val a1 = rows(0)
    assert(a1.getLong(0) == 1L && a1.getLong(1) == 19L &&
      a1.getLong(2) == 20L && a1.isNullAt(3), s"got $a1")
    val a10 = rows(1)
    assert(a10.getLong(0) == 10L && a10.getLong(3) == 18L)
  }

  test("kendallTauB: perfect monotone gives 1, reversal gives -1, ties corrected") {
    val s = spark
    import s.implicits._
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    val r1 = Evaluation.kendallTauB(mono.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(r1.getLong(1) == 6L && r1.getLong(2) == 0L)
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-9)
    val rev = mono.map { case (a, b) => (a, -b) }
    val r2 = Evaluation.kendallTauB(rev.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(math.abs(r2.getDouble(3) + 1.0) < 1e-9)
    // hand case with ties: (1,1),(1,2),(2,1),(2,2) -> C=1, D=1,
    // n0=6, n1=n2=2 -> tau = 0/4 = 0
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val r3 = Evaluation.kendallTauB(tied.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(r3.getLong(1) == 1L && r3.getLong(2) == 1L)
    assert(r3.getDouble(3) == 0.0)
  }

  test("cliffsDelta: hand pair counts with ties") {
    val s = spark
    import s.implicits._
    // A = {1, 3, 3}, B = {2, 3}: pairs (a,b): 1<2,1<3, 3>2,3=3, 3>2,3=3
    // -> gt=2, lt=2, delta=0
    val df = Seq((1L, true), (3L, true), (3L, true),
      (2L, false), (3L, false)).toDF("v", "a")
    val r = Evaluation.cliffsDelta(df, "v", col("a")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 2L, 2L)))
    assert(r.getDouble(4) == 0.0)
    // complete separation: A all above B -> delta = 1
    val sep = Seq((10L, true), (11L, true), (1L, false), (2L, false))
      .toDF("v", "a")
    val r2 = Evaluation.cliffsDelta(sep, "v", col("a")).collect()(0)
    assert(r2.getDouble(4) == 1.0)
  }

  test("cohensD matches the textbook pooled-sd computation") {
    val s = spark
    import s.implicits._
    // A = {1,2,3}: mean 2, var 1. B = {5,6,7,8}: mean 6.5, var 5/3.
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (5.0, false), (6.0, false), (7.0, false), (8.0, false))
      .toDF("v", "a")
    val r = Evaluation.cohensD(df, "v", col("a")).head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 4L)))
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 6.5)
    val sp2 = (2.0 * 1.0 + 3.0 * (5.0 / 3.0)) / 5.0 // = 1.4
    val d = (2.0 - 6.5) / math.sqrt(sp2)
    assert(math.abs(r.getDouble(4) - d) < 1e-6)
    val g = d * (1.0 - 3.0 / (4.0 * 7 - 9))
    assert(math.abs(r.getDouble(5) - g) < 1e-6)
  }

  test("mcnemar counts discordant cells and applies continuity correction") {
    val s = spark
    import s.implicits._
    // truth, predA, predB over 10 items: only_a = 3, only_b = 1
    val df = Seq(
      (true, true, true), (true, true, true),       // both right
      (true, true, false), (true, true, false),
      (true, true, false),                          // only_a ×3
      (false, true, false),                         // only_b (A wrong)
      (false, true, true), (false, true, true),     // both wrong ×2
      (true, false, false), (true, false, false))   // both wrong ×2
      .toDF("t", "a", "b")
    val r = Evaluation.mcnemar(df, col("t"), col("a"), col("b")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 3L, 1L, 4L)))
    // chi2 = (|3-1|-1)² / 4 = 0.25
    assert(r.getDouble(4) == 0.25)
    // no discordant pairs → null, not a division blow-up
    val same = Seq((true, true, true), (false, false, false))
      .toDF("t", "a", "b")
    assert(Evaluation.mcnemar(same, col("t"), col("a"), col("b"))
      .head().isNullAt(4))
  }

  test("expectedCalibrationError: perfectly calibrated bins give ~0") {
    val s = spark
    import s.implicits._
    // score 0 → sigmoid 0.5: half positives in that bin → gap 0.
    // score 4000 → sigmoid ≈ 0.982: all positives → gap ≈ 0.018.
    val df = (Seq.fill(50)((0L, true)) ++ Seq.fill(50)((0L, false)) ++
      Seq.fill(100)((4000L, true))).toDF("score", "label")
    val r = Evaluation.expectedCalibrationError(df, "score", "label",
      binWidth = 1000L).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 200L)
    val conf4k = 1.0 / (1.0 + math.exp(-4.0))
    val expect = (100.0 * 0.0 + 100.0 * (1.0 - conf4k)) / 200.0
    assert(math.abs(r.getDouble(2) - expect) < 1e-5)
  }

  test("diffInDiff removes group baseline and common trend exactly") {
    val s = spark
    import s.implicits._
    // control: 10 → 12 (+2 common trend); treated: 20 → 25
    // DiD = (25−20) − (12−10) = 3
    val df = Seq(
      (10.0, false, false), (10.0, false, false),
      (12.0, false, true), (12.0, false, true),
      (20.0, true, false), (20.0, true, false),
      (25.0, true, true), (25.0, true, true))
      .toDF("v", "t", "a")
    val r = Evaluation.diffInDiff(df, "v", col("t"), col("a")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2L, 2L)))
    assert(r.getDouble(4) == 25.0 && r.getDouble(5) == 20.0)
    assert(r.getDouble(6) == 12.0 && r.getDouble(7) == 10.0)
    assert(r.getDouble(8) == 3.0)
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG, NaN prefix excluded") {
    val s = spark
    import s.implicits._
    // 2-dim vectors, prefixDim=1 → prefix cosine is the SIGN of x
    // (and NaN for x=0, which must drop out of the prefix ranking
    // but still count as relevant corpus-wide)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),   // query A
      (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.5f, 0.5f), 0),
      (3L, Array(0.1f, 0.9f), 1),
      (4L, Array(-1.0f, 0.0f), 0),  // query B
      (5L, Array(0.95f, -0.9f), 0),
      (6L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Evaluation.retrievalMetrics(emb, "vec_id", "embedding",
        "label", queryIds = Seq(0L, 4L), k = 3, prefixDim = 1)
      .orderBy("query_id").collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // query 0 (label 1): prefix ranking = 1,2,3 (x>0 ties, id asc);
    // full top-3 = {1, 5, 2}; relevant = {1, 3, 6} → n_relevant 3;
    // rel hits in prefix top-3: 1@1, 3@3
    val a = out(0)
    assert(a.getLong(0) == 0L && a.getLong(1) == 3L)
    assert(a.getDouble(2) == r6(2.0 / 3.0), "recall A")
    assert(a.getDouble(3) == 1.0, "mrr A")
    val idcg3 = 1.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4)
    assert(a.getDouble(4) == r6((1.0 / log2(2) + 1.0 / log2(4)) / idcg3),
      "ndcg A")
    // query 4 (label 0): candidates now include id 0 — prefix sims all
    // -1 for x>0 → ranking 0,1,2 (id asc); full top-3 = {6, 3, 2};
    // relevant = {2, 5} → n_relevant 2; first rel hit: 2@3;
    // dcg = 1/log2(4); idcg over min(3,2) terms
    val b = out(1)
    assert(b.getLong(0) == 4L && b.getLong(1) == 2L)
    assert(b.getDouble(2) == r6(1.0 / 3.0), "recall B")
    assert(b.getDouble(3) == r6(1.0 / 3.0), "mrr B")
    val idcg2 = 1.0 / log2(2) + 1.0 / log2(3)
    assert(b.getDouble(4) == r6((1.0 / log2(4)) / idcg2), "ndcg B")
  }

  test("rankBiasedOverlap: identical rankings give 1 - p^d, divergence is depth-weighted") {
    val s = spark
    import s.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // query (1,0); full ranking by cosine: 3 (.995), 2 (.707), 1 (0)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f)),
      (3L, Array(1.0f, 0.1f))
    ).toDF("vec_id", "embedding")
    // prefixDim = full dim → identical rankings → X_k = k and
    // RBO@3 = Σ (1-p)·p^(k-1) = 0.1 + 0.09 + 0.081 = 0.271
    val same = Evaluation.rankBiasedOverlap(emb, "vec_id", "embedding",
      queryIds = Seq(0L), d = 3, p = BigDecimal("0.9"), prefixDim = 2)
      .head()
    assert(same.getLong(1) == 3L) // overlap_at_d
    assert(same.getDouble(2) == r6(
      1.0 * 0.1 / 1.0 + 2.0 * 0.09 / 2.0 + 3.0 * 0.081 / 3.0))
    assert(same.getDouble(2) == 0.271)
    // prefixDim = 1: id1's prefix is zero-norm (excluded), ids 2 and 3
    // tie at prefix cos 1 → pred = [2, 3] vs truth = [3, 2, 1]:
    // X = (0, 2, 2) → rbo = 2·0.09/2 + 2·0.081/3 = 0.144
    val div = Evaluation.rankBiasedOverlap(emb, "vec_id", "embedding",
      queryIds = Seq(0L), d = 3, p = BigDecimal("0.9"), prefixDim = 1)
      .head()
    assert(div.getLong(1) == 2L)
    assert(div.getDouble(2) == 0.144)
    assert(div.getDouble(2) < same.getDouble(2))
  }

  test("retrievalMetrics: no relevant candidates gives zero mrr and ndcg") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 9),
      (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.5f, 0.5f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = Evaluation.retrievalMetrics(emb, "vec_id", "embedding",
      "label", queryIds = Seq(0L), k = 2, prefixDim = 2).head()
    assert(r.getLong(1) == 0L)
    assert(r.getDouble(2) == 1.0) // prefix = full vector here
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("anovaF recovers the exact hand-computed F on integer groups") {
    val s = spark
    import s.implicits._
    // A={1,2,3} B={2,3,4} C={6,7,8}: SSB=42, SSW=6, F=(42/2)/(6/6)=21
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 6.0), ("c", 7.0), ("c", 8.0)).toDF("g", "v")
    val r = Evaluation.anovaF(df, "v", "g").head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 9L)))
    assert(r.getDouble(2) == 0.875) // η² = 42/48
    assert(r.getDouble(3) == 21.0)
  }
}
