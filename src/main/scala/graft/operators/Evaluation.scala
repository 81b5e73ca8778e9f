package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filter-model evaluation — the metrics a pipeline owner reads before
  * trusting a quality classifier ([[QualityClassifier]]) or a dedup
  * stage ([[Dedup]]) enough to delete data with it. The reference
  * engine has no model evaluation (SURVEY.md §2); this is extension
  * surface for the training-data pipeline, where "we filtered 40% of
  * the corpus" is only defensible next to the AUC / precision-recall /
  * agreement numbers that justify the threshold.
  *
  * Scale shapes:
  *  - [[rocAuc]] aggregates to DISTINCT SCORES first (one hash
  *    aggregate with map-side combine), then runs the rank prefix-sum
  *    over that score-domain-bounded frame. For integer milli-logits
  *    the domain is thousands of values regardless of corpus size;
  *    callers with continuous scores quantize first (the standard
  *    binned-AUC move — at 1e-6 bins the estimate error is far below
  *    reporting precision). The contract is ENFORCED: the whole
  *    rank-statistic family refuses fractional value columns at plan
  *    time ([[requireIntegralValues]]).
  *  - [[prAtThresholds]] is one pass: each row fans out to the ≤dozens
  *    of broadcast thresholds, then a threshold-keyed aggregate.
  *  - [[cohenKappa]] and [[pairwiseClusterEval]] are contingency
  *    aggregates (label-domain- resp. cluster-count-bounded), the
  *    [[Similarity.clusterAgreement]] shape.
  *
  * All ratio math casts to double BEFORE multiplying (the ARI lesson:
  * long pair-products wrap at ~80k-row cells); counts stay exact longs.
  */
object Evaluation {

  /** Enforces the quantize-first contract of the rank-statistic
    * family ([[rocAuc]], [[ksDistance]], [[wasserstein1]],
    * [[mannWhitneyU]], [[kruskalWallis]], [[cliffsDelta]],
    * [[kendallTauB]], [[conformalQuantile]]): these run exact prefix
    * sums over the DISTINCT-value domain, which is bounded only for
    * integral scores — a raw continuous double column would (a)
    * silently truncate under the internal long cast and (b) degrade
    * the value-domain window toward a corpus-scale single task. The
    * guard is a zero-cost driver-side schema check: integral types
    * (and scale-0 decimals) pass; fractional types fail loudly with
    * the quantization recipe instead of degrading silently.
    */
  private[graft] def requireIntegralValues(
      df: DataFrame, valueCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    df.select(col(valueCol)).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case d: DecimalType if d.scale == 0 => ()
      case other => throw new IllegalArgumentException(
        s"$op: value column '$valueCol' has type ${other.simpleString} — " +
          "the rank-statistic family is exact over a value-DOMAIN-bounded " +
          "frame only for integral scores. Quantize first, e.g. " +
          s"CAST(round($valueCol * 1000) AS LONG) for milli-units (at " +
          "1e-3 bins the estimate error is far below 6-dp reporting " +
          "precision), then pass the integral column.")
    }
  }

  /** ROC AUC of `scoreCol` against boolean `labelCol` via the
    * Mann-Whitney rank statistic with average-rank tie handling:
    *
    *   AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻)
    *
    * where R⁺ is the sum of average ranks of the positives. Computed
    * from per-score group counts: a group of n rows at score s, with
    * c rows strictly below, has average rank c + (n+1)/2 — so
    * 2·R⁺ = Σ_s p_s·(2·c_s + n_s + 1), all integer until the final
    * division. Returns one row (n_pos, n_neg, auc rounded 6 dp).
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    requireIntegralValues(df, scoreCol, "rocAuc")
    val g = df
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("p"))
    // Prefix-sum over the distinct-score frame, distributed: the frame
    // is score-domain-bounded (see object doc) but an unpartitioned
    // window would still sort it on ONE task — Ranks.withRunningSums
    // buckets by collected literal boundaries and windows per bucket,
    // exact to the long.
    val c = Ranks.withRunningSums(g, col("s"),
      Seq(Ranks.SumSpec("below", col("n"), inclusive = false)))
    c.agg(
        sum("p").as("np"),
        sum(col("n") - col("p")).as("nn"),
        // double BEFORE multiply: p·(2c+n+1) wraps long at ~1e10 rows
        sum(col("p").cast("double") *
          (lit(2) * col("below") + col("n") + lit(1))).as("r2"))
      .select(
        col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        round(
          (col("r2") / 2 - col("np").cast("double") * (col("np") + 1) / 2) /
            (col("np").cast("double") * col("nn")), 6).as("auc"))
  }

  /** Precision / recall / F1 of the rule `score >= t` against boolean
    * `labelCol`, one output row per threshold. Single corpus pass:
    * rows fan out to the broadcast threshold list (explode of a
    * literal array — no join), then one threshold-keyed aggregate.
    * Ratios are NULL when undefined (no predicted resp. no true
    * positives), matching SQL CASE semantics.
    */
  def prAtThresholds(
      df: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val t = explode(array(thresholds.map(lit): _*)).as("threshold")
    val pred = col(scoreCol) >= col("threshold")
    val lab = col(labelCol)
    val cnt = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    val pDen = col("tp") + col("fp")
    val rDen = col("tp") + col("fn")
    val prec = when(pDen > 0, col("tp").cast("double") / pDen)
    val rec = when(rDen > 0, col("tp").cast("double") / rDen)
    df.select(col(scoreCol), lab.as("_lab"), t)
      .groupBy("threshold")
      .agg(
        cnt(pred && col("_lab")).as("tp"),
        cnt(pred && !col("_lab")).as("fp"),
        cnt(!pred && col("_lab")).as("fn"),
        cnt(!pred && !col("_lab")).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        round(prec, 6).as("precision"),
        round(rec, 6).as("recall"),
        round(when(pDen > 0 && rDen > 0 && (prec + rec) > 0,
          lit(2) * prec * rec / (prec + rec)), 6).as("f1"))
  }

  /** Cohen's kappa between two boolean raters (e.g. the cheap hashed
    * classifier vs the rule cascade it distills): one 2×2 contingency
    * aggregate; κ = (p_o − p_e)/(1 − p_e), NULL when the raters are
    * constant (p_e = 1 leaves chance-agreement undefined). Returns one
    * row (n, p_o, p_e, kappa — ratios rounded 6 dp).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol)
    val b = col(bCol)
    val cnt = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    // double BEFORE multiply: marginal products wrap long at ~3e9 rows
    val nd = col("n").cast("double")
    val n11 = col("n11").cast("double")
    val n10 = col("n10").cast("double")
    val n01 = col("n01").cast("double")
    val n00 = col("n00").cast("double")
    val po = (n11 + n00) / nd
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) /
      (nd * nd)
    df.agg(
        count(lit(1)).as("n"),
        cnt(a && b).as("n11"),
        cnt(a && !b).as("n10"),
        cnt(!a && b).as("n01"),
        cnt(!a && !b).as("n00"))
      .select(col("n"),
        round(po, 6).as("p_o"),
        round(pe, 6).as("p_e"),
        Numerics.roundz(
          when(lit(1.0) - pe =!= 0.0, (po - pe) / (lit(1.0) - pe)), 6)
          .as("kappa"))
  }

  /** Calibration table: rows bucketed by `floor(score / binWidth)`,
    * each bin reporting its count, positive count, and observed
    * positive rate — the reliability-diagram data that says whether
    * "logit 3000" means the same thing across corpus slices before a
    * single global threshold is trusted. One hash aggregate,
    * bin-domain-bounded output. `bin_lo` is the bin's inclusive lower
    * score edge.
    */
  def calibrationBins(
      df: DataFrame, scoreCol: String, labelCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.groupBy(floor(col(scoreCol) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"))
      .select(col("bin"), (col("bin") * binWidth).as("bin_lo"), col("n"),
        col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"))
  }

  /** Expected Calibration Error — the one-number summary of
    * [[calibrationBins]]: ECE = Σ_b (n_b/N)·|acc_b − conf_b|, the gap
    * between what the model says and what happens, weighted by where
    * the mass is. Confidence is the sigmoid of the milli-logit
    * QUANTIZED to an exact micro-probability long per row
    * (round(σ·10⁶)) so per-bin confidence sums are integers —
    * corpus-order float accumulation never happens; the outer sum
    * folds the bin-bounded frame in sorted bin order. One corpus
    * aggregate, everything after is bin-frame work.
    */
  def expectedCalibrationError(
      df: DataFrame, scoreCol: String, labelCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = lit(1.0) /
      (lit(1.0) + exp(-col(scoreCol).cast("double") / 1000.0))
    val bins = df
      .select(floor(col(scoreCol) / binWidth).cast("long").as("_b"),
        col(labelCol).cast("long").as("_l"),
        round(p * 1000000.0, 0).cast("long").as("_pm"))
      .groupBy(col("_b"))
      .agg(count(lit(1)).as("_n"), sum(col("_l")).as("_np"),
        sum(col("_pm")).as("_spm"))
    bins.agg(
      count(lit(1)).as("n_bins"), sum(col("_n")).as("n"),
      aggregate(
        array_sort(collect_list(struct(col("_b"), col("_n"), col("_np"),
          col("_spm")))),
        lit(0.0),
        (acc, s) => {
          val n = s.getField("_n").cast("double")
          acc + n * abs(s.getField("_np").cast("double") / n -
            s.getField("_spm").cast("double") / (n * 1000000.0))
        }).as("_w"))
      .select(col("n_bins"), col("n"),
        Numerics.roundz(col("_w") / col("n").cast("double"), 6).as("ece"))
  }

  /** Pairwise precision / recall / F1 of a predicted duplicate
    * clustering against a reference clustering (Menestrina et al.'s
    * pairwise measure — the standard ER/dedup report): a pair of rows
    * is a predicted positive iff they share `predCol`, a true positive
    * iff additionally they share `truthCol`. All three pair counts come
    * from cluster-size aggregates (the [[Similarity.clusterAgreement]]
    * contingency shape — one groupBy each, C(n,2) per cell, never the
    * pairs themselves), so the operator is cluster-count-bounded and
    * never materializes a quadratic pair list. Returns one row
    * (tp_pairs, pred_pairs, truth_pairs, precision, recall, f1).
    */
  def pairwiseClusterEval(
      df: DataFrame, predCol: String, truthCol: String): DataFrame = {
    val pairs = expr("sum(n * (n - 1) div 2)")
    val tp = df.groupBy(predCol, truthCol).agg(count(lit(1)).as("n"))
      .agg(pairs.as("tp_pairs"))
    val pp = df.groupBy(predCol).agg(count(lit(1)).as("n"))
      .agg(pairs.as("pred_pairs"))
    val rp = df.groupBy(truthCol).agg(count(lit(1)).as("n"))
      .agg(pairs.as("truth_pairs"))
    val prec = when(col("pred_pairs") > 0,
      col("tp_pairs").cast("double") / col("pred_pairs"))
    val rec = when(col("truth_pairs") > 0,
      col("tp_pairs").cast("double") / col("truth_pairs"))
    tp.crossJoin(pp).crossJoin(rp) // 1-row frames: broadcast glue
      .select(col("tp_pairs"), col("pred_pairs"), col("truth_pairs"),
        round(prec, 6).as("precision"),
        round(rec, 6).as("recall"),
        round(when(prec.isNotNull && rec.isNotNull && (prec + rec) > 0,
          lit(2) * prec * rec / (prec + rec)), 6).as("f1"))
  }

  /** Ranking agreement between a CANDIDATE retrieval run and its
    * ground-truth ranking — recall@k, MRR, and graded nDCG@k per query.
    * The operator behind every "is the cheap retrieval path good
    * enough" decision: matryoshka prefix vs full-dim, pruned ANN vs
    * brute force, hybrid fusion vs either leg.
    *
    * Inputs are two (queryCol, idCol, rankCol) frames with ranks
    * 1..k per query. Relevance is graded from the TRUTH rank
    * (rel = k+1−rt, so truth #1 carries weight k); DCG discounts by
    * log2(rank+1); the ideal DCG is the closed-form constant
    * Σ (k+1−i)/log2(i+1), computed once on the driver and inlined —
    * the one float association mirrored verbatim by the oracle (the
    * NMI-gate discipline for transcendental terms). MRR is the
    * reciprocal candidate rank of the truth's #1 item, 0 when missed.
    *
    * Plan: one (query, id) hash join between two ≤|queries|·k-row
    * frames, one per-query aggregate — trivially broadcastable at any
    * corpus scale because BOTH sides are k-bounded per query.
    */
  def rankingAgreement(
      candidate: DataFrame, truth: DataFrame,
      queryCol: String, idCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val idcg = idealDcg(k)
    val c = candidate.select(col(queryCol).as("q"), col(idCol).as("id"),
      col(rankCol).as("rc"))
    val t = truth.select(col(queryCol).as("q"), col(idCol).as("id"),
      col(rankCol).as("rt"))
    val j = c.join(t, Seq("q", "id"), "left")
    j.groupBy(col("q"))
      .agg(
        sum(when(col("rt").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        max(when(col("rt") === 1, lit(1.0) / col("rc"))).as("mrr_raw"),
        sum(when(col("rt").isNotNull,
          (lit(k + 1) - col("rt")).cast("double") /
            (log(col("rc") + 1) / log(lit(2.0)))).otherwise(lit(0.0)))
          .as("dcg_raw"))
      .select(col("q").as(queryCol),
        col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall"),
        round(coalesce(col("mrr_raw"), lit(0.0)), 6).as("mrr"),
        round(col("dcg_raw"), 4).as("dcg"),
        round(col("dcg_raw") / lit(idcg), 4).as("ndcg"))
  }

  /** The inlined ideal-DCG constant for [[rankingAgreement]] — exposed
    * so gate SQL can embed the IDENTICAL double literal.
    */
  def idealDcg(k: Int): Double =
    (1 to k).map(i => (k + 1 - i) / (math.log(i + 1.0) / math.log(2.0))).sum

  /** Two-sample Kolmogorov–Smirnov distance over an INTEGER metric —
    * "did this source's length/quality distribution drift from that
    * one's": D = max |F_a − F_b| over the union of observed values.
    * The statistic stays EXACT until the last step: the ECDF compare
    * is restated over integers as max |cum_a·n_b − cum_b·n_a|, one
    * integer maximum, divided once by n_a·n_b in double (6 dp).
    *
    * Cost: one (group, value) count aggregate, then cumulative windows
    * over the DISTINCT-VALUE domain — bounded by the metric's
    * cardinality, not the corpus (lengths, scores ≪ rows). Output is
    * one row.
    */
  def ksDistance(
      df: DataFrame, valueCol: String, grpCol: String,
      grpA: String, grpB: String): DataFrame = {
    requireIntegralValues(df, valueCol, "ksDistance")
    import org.apache.spark.sql.expressions.Window
    val vals = df
      .filter(col(grpCol).isin(grpA, grpB) && col(valueCol).isNotNull)
      .select(col(grpCol).as("_g"), col(valueCol).cast("long").as("_x"))
    val cnt = vals.groupBy(col("_x"))
      .agg(sum(when(col("_g") === grpA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_g") === grpB, 1L).otherwise(0L)).as("_cb"))
    val tot = vals.agg(
      sum(when(col("_g") === grpA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_g") === grpB, 1L).otherwise(0L)).as("n_b"))
    // cum·n products run in DECIMAL(38,0): beyond ~3e9 rows per group
    // the long product passes 2⁶³ and silently wraps while the oracle
    // promotes to HUGEINT. d_num casts back to BIGINT at the surface
    // (oracle contract; the quotient feeding `ks` uses the exact
    // decimal). Both groups must be non-empty — an absent group makes
    // D undefined, so fail loudly rather than emit a null/NaN row.
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dd(c: Column) = c.cast(d38)
    // cumulative counts over the distinct-value frame, distributed
    // (bucket-partitioned windows, exact longs) instead of a
    // single-partition unpartitioned window
    Ranks.withRunningSums(cnt, col("_x"),
        Seq(Ranks.SumSpec("_cuma", col("_ca")),
          Ranks.SumSpec("_cumb", col("_cb"))))
      .select(col("_x"), col("_cuma"), col("_cumb"))
      .crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(abs(dd(col("_cuma")) * dd(col("n_b")) -
          dd(col("_cumb")) * dd(col("n_a")))).as("_d"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, col("_d"))
          .otherwise(raise_error(lit(
            s"ksDistance: group '$grpA' or '$grpB' has no rows — " +
              "two-sample D is undefined")))
          .cast("long").as("d_num"),
        Numerics.roundz(col("_d").cast("double") /
          (dd(col("n_a")) * dd(col("n_b"))).cast("double"), 6).as("ks"))
  }

  /** Exact 1-D Wasserstein-1 (earth mover) distance between two
    * groups' integer-valued samples — the drift metric that, unlike
    * [[ksDistance]]'s sup-norm, weighs HOW FAR mass moved:
    * W₁ = ∫|F_A − F_B| dx = Σᵢ |F_A(xᵢ) − F_B(xᵢ)|·(xᵢ₊₁ − xᵢ) over
    * the sorted distinct values. Same aggregate-over-the-distinct-
    * value-domain shape as KS (bounded by metric cardinality, not
    * corpus), same DECIMAL(38,0) rank algebra so nothing wraps at any
    * scale; `w1_num` = Σ|cumA·n_b − cumB·n_a|·gap is the exact
    * integer numerator, `w1` its one final double division by
    * n_a·n_b, 6 dp.
    */
  def wasserstein1(
      df: DataFrame, valueCol: String, grpCol: String,
      grpA: String, grpB: String): DataFrame = {
    requireIntegralValues(df, valueCol, "wasserstein1")
    import org.apache.spark.sql.expressions.Window
    val vals = df
      .filter(col(grpCol).isin(grpA, grpB) && col(valueCol).isNotNull)
      .select(col(grpCol).as("_g"), col(valueCol).cast("long").as("_x"))
    val cnt = vals.groupBy(col("_x"))
      .agg(sum(when(col("_g") === grpA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_g") === grpB, 1L).otherwise(0L)).as("_cb"))
    val tot = vals.agg(
      sum(when(col("_g") === grpA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_g") === grpB, 1L).otherwise(0L)).as("n_b"))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dd(c: Column) = c.cast(d38)
    // distributed cumulative counts + successor value (for the gap)
    // over the distinct-value frame — no single-partition window
    Ranks.withRunningSums(cnt, col("_x"),
        Seq(Ranks.SumSpec("_cuma", col("_ca")),
          Ranks.SumSpec("_cumb", col("_cb"))),
        nextKeyOut = Some("_nx"))
      .withColumn("_gap", coalesce(col("_nx") - col("_x"), lit(0L)))
      .select(col("_x"), col("_cuma"), col("_cumb"), col("_gap"))
      .crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(abs(dd(col("_cuma")) * dd(col("n_b")) -
          dd(col("_cumb")) * dd(col("n_a"))) * dd(col("_gap"))).as("_d"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, col("_d"))
          .otherwise(raise_error(lit(
            s"wasserstein1: group '$grpA' or '$grpB' has no rows — " +
              "the transport distance is undefined")))
          .cast("long").as("w1_num"),
        Numerics.roundz(col("_d").cast("double") /
          (dd(col("n_a")) * dd(col("n_b"))).cast("double"), 6).as("w1"))
  }

  /** Krippendorff's alpha (nominal data, ≥ 2 raters, missing ratings
    * allowed) — the inter-annotator agreement standard for label
    * quality audits. α = 1 − D_o/D_e with
    * D_o = (1/N)·Σ_u [Σ_c o_uc(m_u − o_uc)]/(m_u − 1) and
    * D_e = (1/(N(N−1)))·Σ_c n_c(N − n_c), units with one rating
    * dropped per the definition.
    *
    * Exactness discipline: every count is integer; the ONLY rational
    * step (the per-unit 1/(m_u−1)) is regrouped by m — units sharing
    * a rating count sum their integer disagreements first, then a
    * FIXED-ORDER fold over the ≤ #raters (m, S_m) pairs (sorted
    * array, left fold — both engines replay the identical float
    * op sequence) produces the observed-disagreement numerator.
    * Duplicate (unit, rater) ratings resolve to min(category),
    * deterministically.
    */
  def krippendorffAlpha(
      ratings: DataFrame, unitCol: String, raterCol: String,
      catCol: String): DataFrame = {
    val r = ratings
      .groupBy(col(unitCol).as("_u"), col(raterCol).as("_r"))
      .agg(min(col(catCol).cast("string")).as("_c"))
    val perUnitCat = r.groupBy(col("_u"), col("_c"))
      .agg(count(lit(1)).as("_o"))
    val perUnit = perUnitCat.groupBy(col("_u"))
      .agg(sum(col("_o")).as("_m"), sum(col("_o") * col("_o")).as("_o2"))
      .filter(col("_m") >= 2)
    // S_m = Σ_{units with m ratings} (m² − Σ_c o_uc²), exact integers
    val byM = perUnit.groupBy(col("_m"))
      .agg(sum(col("_m") * col("_m") - col("_o2")).as("_s"),
        count(lit(1)).as("_units"), sum(col("_m")).as("_n"))
    val mFold = byM.agg(
      sum(col("_units")).as("n_units"), sum(col("_n")).as("n_ratings"),
      aggregate(
        array_sort(collect_list(struct(col("_m"), col("_s")))),
        lit(0.0),
        (acc, s) => acc + s.getField("_s").cast("double") /
          (s.getField("_m").cast("double") - 1.0)).as("_do_num"))
    // n_c over KEPT units only: category totals join back on the units
    val keptCats = perUnitCat.join(perUnit.select(col("_u")), Seq("_u"))
      .groupBy(col("_c")).agg(sum(col("_o")).as("_nc"))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val de = keptCats.crossJoin(broadcast(
        mFold.select(col("n_ratings").as("_nn"))))
      .agg(sum(col("_nc").cast(d38) *
        (col("_nn") - col("_nc")).cast(d38)).as("_de_num"))
    mFold.crossJoin(broadcast(de))
      .select(col("n_units"), col("n_ratings"),
        col("_de_num").cast("long").as("de_num"),
        Numerics.roundz(
          lit(1.0) - (col("n_ratings").cast("double") - 1.0) *
            col("_do_num") / col("_de_num").cast("double"), 4)
          .as("alpha"))
  }

  /** Two-proportion A/B significance: per-variant exposed/converted
    * counts and the pooled z statistic — the experiment readout. The
    * counts are exact; z is a fixed chain of double ops over them,
    * rounded to 4 dp (cross-engine stable — every input is an
    * integer). The two variant labels are parameters (default "A"/"B");
    * a label with NO assigned units raises at runtime instead of the
    * silent empty frame a filter-and-cross-join would produce.
    */
  def abProportionTest(
      assignments: DataFrame, unitCol: String, variantCol: String,
      converted: Column, labelA: String = "A",
      labelB: String = "B"): DataFrame = {
    require(labelA != labelB, "variant labels must differ")
    val per = assignments
      .groupBy(col(unitCol).as("_u"), col(variantCol).as("_v"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("_conv"))
    val cells = per.groupBy(col("_v"))
      .agg(count(lit(1)).as("n"), sum(col("_conv")).as("conv"))
    // one always-present row: a missing label leaves its cell null and
    // trips raise_error rather than vanishing from a cross join
    def cell(lbl: String, c: Column) = max(when(col("_v") === lbl, c))
    cells.agg(
        cell(labelA, col("n")).as("_na"), cell(labelA, col("conv")).as("conv_a"),
        cell(labelB, col("n")).as("_nb"), cell(labelB, col("conv")).as("conv_b"))
      .select(
        when(col("_na").isNotNull, col("_na"))
          .otherwise(raise_error(lit(
            s"abProportionTest: no units carry variant label '$labelA'")))
          .as("n_a"),
        col("conv_a"),
        when(col("_nb").isNotNull, col("_nb"))
          .otherwise(raise_error(lit(
            s"abProportionTest: no units carry variant label '$labelB'")))
          .as("n_b"),
        col("conv_b"),
        Numerics.roundz({
          val p1 = col("conv_a").cast("double") / col("n_a")
          val p2 = col("conv_b").cast("double") / col("n_b")
          val p = (col("conv_a") + col("conv_b")).cast("double") /
            (col("n_a") + col("n_b"))
          (p1 - p2) / sqrt(p * (lit(1.0) - p) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
        }, 4).as("z"))
  }

  /** Mann–Whitney U (rank-sum) test — the non-parametric two-sample
    * comparison an experiment readout needs when the metric is skewed
    * (latencies, token counts) and a mean-based z test misleads.
    *
    * Shuffle shape: one hash aggregate to per-VALUE counts (vocabulary
    * -bounded — |distinct metric values| rows, not corpus rows), one
    * ordered window over that small frame for cumulative ranks, one
    * final 1-row reduce. Average ranks for ties come from the
    * closed form `cum_before + (n_v + 1)/2`, so 2·R and 2·U are exact
    * integers; the normal-approximation z (with the standard tie
    * correction) is the only float, rounded to 6 dp.
    *
    * Output (1 row): `n_a`, `n_b`, `u2_a` = 2·U_A (exact), `z`.
    */
  def mannWhitneyU(
      df: DataFrame, valueCol: String, inA: Column): DataFrame = {
    requireIntegralValues(df, valueCol, "mannWhitneyU")
    val perValue = df
      .groupBy(col(valueCol).cast("long").as("_v"))
      .agg(sum(when(inA, 1L).otherwise(0L)).as("_na"),
        count(lit(1)).as("_n"))
    // exclusive cumulative count over the distinct-value frame,
    // distributed (Ranks.withRunningSums) — no single-partition window
    val ranked = Ranks.withRunningSums(perValue, col("_v"),
        Seq(Ranks.SumSpec("_cum", col("_n"), inclusive = false)))
      // 2·avgRank = 2·cum_before + n_v + 1 keeps rank math integral
      .withColumn("_r2", lit(2) * col("_cum") + col("_n") + lit(1))
    val agg = ranked.agg(
      sum(col("_na")).as("n_a"),
      sum(col("_n") - col("_na")).as("n_b"),
      sum(col("_na") * col("_r2")).as("_r2a"),
      sum(col("_n") * col("_n") * col("_n") - col("_n")).as("_ties"))
    agg.select(
      col("n_a"), col("n_b"),
      (col("_r2a") - col("n_a") * (col("n_a") + 1)).as("u2_a"),
      Numerics.roundz({
        val na = col("n_a").cast("double")
        val nb = col("n_b").cast("double")
        val n = na + nb
        val u = (col("_r2a") - col("n_a") * (col("n_a") + 1))
          .cast("double") / 2.0
        val mu = na * nb / 2.0
        val varU = na * nb / 12.0 *
          ((n + 1.0) - col("_ties").cast("double") / (n * (n - 1.0)))
        (u - mu) / sqrt(varU)
      }, 6).as("z"))
  }

  /** Kruskal–Wallis H (the k-group extension of [[mannWhitneyU]]):
    * rank-sum one-way test over `groupCol` groups of the integral
    * `valueCol`, with the standard tie correction
    * H' = H / (1 − Σ(t³−t)/(N³−N)).
    *
    * Same scale shape as the two-group test: ranks never materialize
    * per row — the per-distinct-value aggregate (vocabulary-bounded)
    * carries counts per group, and 2·avgRank = 2·cumBefore + n_v + 1
    * keeps every rank sum an exact integer. The only doubles are the
    * final fixed chain over those integers; the cross-group Σ R²/n
    * fold runs in group order (sorted collect over k group rows — k
    * is the number of test arms, driver-safe by construction), so the
    * sum order is deterministic and the oracle replays it with
    * `list_sum(list(… ORDER BY g))`.
    */
  def kruskalWallis(
      df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    requireIntegralValues(df, valueCol, "kruskalWallis")
    val pv = df
      .groupBy(col(valueCol).cast("long").as("_v"),
        col(groupCol).cast("string").as("_g"))
      .agg(count(lit(1)).as("_n"))
    val nv = pv.groupBy(col("_v")).agg(sum(col("_n")).as("_nv"))
    // exclusive cumulative count, distributed (see [[mannWhitneyU]])
    val ranked = Ranks.withRunningSums(nv, col("_v"),
        Seq(Ranks.SumSpec("_cum", col("_nv"), inclusive = false)))
      .withColumn("_r2", lit(2) * col("_cum") + col("_nv") + lit(1))
    val perGroup = pv.join(ranked.select("_v", "_r2"), Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_n")).as("_ng"), sum(col("_n") * col("_r2")).as("_r2g"))
    val ties = nv.agg(
      sum(col("_nv") * col("_nv") * col("_nv") - col("_nv")).as("_t"))
    perGroup
      .agg(count(lit(1)).as("k"), sum(col("_ng")).as("n"),
        aggregate(
          array_sort(collect_list(struct(col("_g"), col("_r2g"),
            col("_ng")))),
          lit(0.0),
          (acc, s) => acc + s.getField("_r2g").cast("double") *
            s.getField("_r2g").cast("double") /
            (lit(4.0) * s.getField("_ng").cast("double"))).as("_rs"))
      .crossJoin(broadcast(ties))
      .select(col("k"), col("n"), col("_t").as("ties"),
        Numerics.roundz({
          val n = col("n").cast("double")
          val hRaw = lit(12.0) / (n * (n + 1.0)) * col("_rs") -
            lit(3.0) * (n + 1.0)
          val c = lit(1.0) - col("_t").cast("double") / (n * n * n - n)
          hRaw / c
        }, 6).as("h"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test + Mantel–Haenszel
    * pooled odds ratio — the stratified-experiment readout the A/B
    * family needs when assignment is confounded by a blocking factor
    * (country, device, cohort): per stratum the 2×2 (treated ×
    * converted) table; pooled evidence
    *
    *   χ²_CMH = (Σ_s (n11 − n1·n·1/n))² / Σ_s V_s,
    *   V_s = n1·n0·n·1·n·0 / (n²(n−1)),
    *   OR_MH = Σ_s (n11·n00/n) / Σ_s (n10·n01/n).
    *
    * (No continuity correction — the convention that matches large-N
    * pipeline use; strata with n < 2 carry no information, V is
    * undefined there, and are EXCLUDED — `n_strata` reports the
    * survivors. NULL treatment/conversion counts as false.)
    *
    * Exactness discipline: one corpus-scale hash aggregate to
    * strata×4 integer cells; every per-stratum term is ONE fixed
    * double chain over those exact longs; the cross-stratum sums fold
    * IN STRATUM ORDER over an `array_sort(collect_list(…))` of the
    * strata-bounded frame (the kruskalWallis idiom), so the float sum
    * order is deterministic and the oracle replays it with an ordered
    * `list_reduce`. Output (1 row): n_strata, n, or_mh (NULL when the
    * denominator is 0), cmh_chi2 (NULL when ΣV = 0), both 6 dp.
    */
  def cmhTest(
      df: DataFrame, strataCol: String, treated: Column,
      converted: Column): DataFrame = {
    val per = df
      .groupBy(col(strataCol).cast("string").as("_s"))
      .agg(
        sum(when(treated && converted, 1L).otherwise(0L)).as("_n11"),
        sum(when(treated && !converted, 1L).otherwise(0L)).as("_n10"),
        sum(when(!treated && converted, 1L).otherwise(0L)).as("_n01"),
        sum(when(!treated && !converted, 1L).otherwise(0L)).as("_n00"))
      .withColumn("_n",
        col("_n11") + col("_n10") + col("_n01") + col("_n00"))
      .filter(col("_n") >= 2)
    def d(c: String) = col(c).cast("double")
    val terms = per.select(col("_s"),
      col("_n"),
      (d("_n11") - (d("_n11") + d("_n10")) * (d("_n11") + d("_n01")) /
        d("_n")).as("_d"),
      ((d("_n11") + d("_n10")) * (d("_n01") + d("_n00")) *
        (d("_n11") + d("_n01")) * (d("_n10") + d("_n00")) /
        (d("_n") * d("_n") * (d("_n") - lit(1.0)))).as("_v"),
      (d("_n11") * d("_n00") / d("_n")).as("_a"),
      (d("_n10") * d("_n01") / d("_n")).as("_b"))
    def fold(field: String) = aggregate(
      array_sort(collect_list(struct(col("_s"), col("_d"), col("_v"),
        col("_a"), col("_b")))),
      lit(0.0), (acc, s) => acc + s.getField(field))
    terms
      .agg(count(lit(1)).as("n_strata"), sum(col("_n")).as("n"),
        fold("_d").as("_sd"), fold("_v").as("_sv"),
        fold("_a").as("_sa"), fold("_b").as("_sb"))
      .select(col("n_strata"), col("n"),
        when(col("_sb") =!= 0.0,
          Numerics.roundz(col("_sa") / col("_sb"), 6)).as("or_mh"),
        when(col("_sv") =!= 0.0,
          Numerics.roundz(col("_sd") * col("_sd") / col("_sv"), 6))
          .as("cmh_chi2"))
  }

  /** Decile lift / cumulative-gains table — the model-targeting
    * readout: rank units by score, cut into `buckets` equal tiles,
    * and report per-tile and cumulative positive capture vs the base
    * rate. Tiles follow standard SQL ntile over (score desc, id) —
    * the id tiebreak makes the assignment deterministic and both
    * engines share the contract (first n mod b tiles get the extra
    * row), so the cut points agree exactly. All counts exact;
    * lift = (pos·N)/(n·P) as one integer-ratio division per row.
    *
    * Scale: tiles come from [[Ranks.withGlobalNtile]] — range-bucketed
    * parallel ranking. (An unpartitioned `ntile().over(…)` window is
    * `SinglePartition`, NOT a range exchange: the full scored corpus
    * would sort in one task.) Everything downstream is a
    * `buckets`-row frame; its cumulative window runs on a constant
    * partition key — single-task by design, `buckets` rows.
    */
  def liftGains(
      df: DataFrame, scoreCol: String, idCol: String, positive: Column,
      buckets: Int = 10): DataFrame = {
    val scored = df.select(col(scoreCol), col(idCol),
      when(positive, 1L).otherwise(0L).as("_y"))
    val perTile = Ranks.withGlobalNtile(scored, "bucket", buckets,
        col(scoreCol), descending = true, ties = Seq(col(idCol)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"))
    val totals = perTile.agg(sum(col("n")).as("_N"),
      sum(col("n_pos")).as("_P"))
    // pmod(bucket, 1) ≡ 0 — a constant partition key the optimizer
    // cannot fold away (a foldable literal is stripped from the window
    // spec). This keeps the `buckets`-row cumulative window off the
    // empty-partitionSpec ban the PlanRegressionSpec enforces for this
    // gate, while staying single-task by design over ≤ buckets rows.
    val cw = Window.partitionBy(pmod(col("bucket"), lit(1L)))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTile
      .withColumn("cum_n", sum(col("n")).over(cw))
      .withColumn("cum_pos", sum(col("n_pos")).over(cw))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"), col("n_pos"), col("cum_pos"),
        Numerics.roundz(col("cum_pos").cast("double") /
          col("_P").cast("double"), 6).as("gain"),
        Numerics.roundz((col("n_pos") * col("_N")).cast("double") /
          (col("n") * col("_P")).cast("double"), 6).as("lift"),
        Numerics.roundz((col("cum_pos") * col("_N")).cast("double") /
          (col("cum_n") * col("_P")).cast("double"), 6).as("cum_lift"))
      .orderBy("bucket")
  }

  /** Brown–Forsythe (median-centered Levene) test of equal variances
    * across `groupCol` groups of the integral `valueCol` — the
    * homogeneity check run before trusting a pooled-variance readout.
    *
    * Exactness: group medians of integers are k or k+0.5, so the
    * centered deviations doubled (z = 2·|v − med|) are exact longs
    * and every per-group sum is integer. The one-way-ANOVA F over
    * those z values needs Σ s_i²/n_i — folded in group order like
    * [[kruskalWallis]] — and then a fixed double chain. One shuffle
    * for the median (per-group exact percentile), one for the sums.
    */
  def leveneBrownForsythe(
      df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val v = df.select(col(groupCol).cast("string").as("_g"),
      col(valueCol).cast("long").as("_v"))
    val med = v.groupBy(col("_g"))
      .agg(expr("percentile(_v, 0.5)").as("_med"))
    val z = v.join(med, Seq("_g"))
      .select(col("_g"),
        abs(lit(2) * col("_v") -
          (lit(2.0) * col("_med")).cast("long")).as("_z2"))
    val pg = z.groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_z2")).as("_s"),
        sum(col("_z2") * col("_z2")).as("_q"))
    pg.agg(count(lit(1)).as("k"), sum(col("_n")).as("n"),
        sum(col("_s")).as("_S"), sum(col("_q")).as("_Q"),
        aggregate(
          array_sort(collect_list(struct(col("_g"), col("_s"),
            col("_n")))),
          lit(0.0),
          (acc, s) => acc + s.getField("_s").cast("double") *
            s.getField("_s").cast("double") /
            s.getField("_n").cast("double")).as("_fold"))
      .select(col("k"), col("n"),
        Numerics.roundz({
          val nd = col("n").cast("double")
          val kd = col("k").cast("double")
          val ssb = col("_fold") -
            col("_S").cast("double") * col("_S").cast("double") / nd
          val ssw = col("_Q").cast("double") - col("_fold")
          (ssb / (kd - 1.0)) / (ssw / (nd - kd))
        }, 6).as("f"))
  }

  /** Pearson chi-square test of independence over the (aCol, bCol)
    * contingency table, with Cramér's V effect size. Zero cells are
    * materialized (row-margin × column-margin grid, a k_a·k_b-bounded
    * frame) so the statistic matches the textbook definition; each
    * cell's (o−e)²/e term is the identical double chain both engines
    * run, summed in (a, b) order. The corpus-scale work is ONE hash
    * aggregate; margins and the grid are category-vocabulary-sized.
    */
  def chi2Independence(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    // cell frame materialized: margins/total/grid are four consumers,
    // each would rescan the corpus otherwise (plan-locked)
    val obs = df.groupBy(col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
      .agg(count(lit(1)).as("_o"))
      .materialized
    val ra = obs.groupBy(col("_a")).agg(sum(col("_o")).as("_r"))
    val cb = obs.groupBy(col("_b")).agg(sum(col("_o")).as("_c"))
    val tot = obs.agg(sum(col("_o")).as("_N"))
    val ks = ra.agg(count(lit(1)).as("_ka"))
      .crossJoin(cb.agg(count(lit(1)).as("_kb")))
    val e = (col("_r") * col("_c")).cast("double") /
      col("_N").cast("double")
    val term = (col("_o").cast("double") - e) *
      (col("_o").cast("double") - e) / e
    val cells = ra.crossJoin(cb)
      .join(obs, Seq("_a", "_b"), "left")
      .na.fill(0L, Seq("_o"))
      .crossJoin(broadcast(tot))
      .select(col("_a"), col("_b"), term.as("_t"))
    cells
      .agg(aggregate(
        array_sort(collect_list(struct(col("_a"), col("_b"), col("_t")))),
        lit(0.0), (acc, s) => acc + s.getField("_t")).as("_chi2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ks))
      .select(col("_N").as("n"),
        ((col("_ka") - 1) * (col("_kb") - 1)).as("dof"),
        Numerics.roundz(col("_chi2"), 4).as("chi2"),
        Numerics.roundz(sqrt(col("_chi2") /
          (col("_N").cast("double") *
            least(col("_ka") - 1, col("_kb") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** CUPED variance reduction (Deng et al., WSDM'13) — the standard
    * pre-experiment-covariate adjustment: θ = cov(y, x)/var(x) over
    * ALL units (pooled, the published estimator), and each arm's
    * adjusted mean is `mean(y) − θ·(mean(x) − mean(x)_pooled)`.
    *
    * Everything reduces to the five integer sums (n, Σx, Σy, Σxx,
    * Σxy) per arm plus their pooled totals — one hash aggregate over
    * units, then 2-row arithmetic. θ and the means are fixed double
    * chains over exact integers, rounded to 6 dp.
    *
    * Output: one row per arm — `arm`, `n`, `mean_y`, `mean_y_adj`.
    */
  def cuped(
      df: DataFrame, armCol: String, xCol: String,
      yCol: String): DataFrame = {
    val per = df.groupBy(col(armCol).cast("long").as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol).cast("long")).as("_sx"),
        sum(col(yCol).cast("long")).as("_sy"),
        sum(col(xCol).cast("long") * col(xCol).cast("long")).as("_sxx"),
        sum(col(xCol).cast("long") * col(yCol).cast("long")).as("_sxy"))
    val tot = per.agg(sum(col("n")).as("_tn"), sum(col("_sx")).as("_tsx"),
      sum(col("_sy")).as("_tsy"), sum(col("_sxx")).as("_tsxx"),
      sum(col("_sxy")).as("_tsxy"))
    per.crossJoin(broadcast(tot)).select(
      col("arm"), col("n"),
      Numerics.roundz(
        col("_sy").cast("double") / col("n"), 6).as("mean_y"),
      Numerics.roundz({
        val theta = (col("_tn") * col("_tsxy") - col("_tsx") * col("_tsy"))
          .cast("double") /
          (col("_tn") * col("_tsxx") - col("_tsx") * col("_tsx"))
            .cast("double")
        val meanXArm = col("_sx").cast("double") / col("n")
        val meanXAll = col("_tsx").cast("double") / col("_tn")
        col("_sy").cast("double") / col("n") - theta * (meanXArm - meanXAll)
      }, 6).as("mean_y_adj"))
  }

  /** Benjamini–Hochberg FDR control — the multiple-comparison
    * correction an experiment platform applies when one launch ships
    * dozens of metric readouts: p-values ranked ascending, k* = the
    * largest rank with `p ≤ rank·q/m`, every metric at rank ≤ k*
    * rejected (the step-up rule — metrics ABOVE their own line still
    * reject when a later rank crosses, which is what a naive
    * per-metric threshold gets wrong).
    *
    * Deterministic: rank ties break on the metric name. The frame is
    * metric-count-sized (dozens), so the single global rank window is
    * metadata-cheap. Output per metric: `p`, `rank`, `bh_threshold`
    * (= rank·q/m, 6 dp), `rejected`.
    */
  def fdrBh(
      df: DataFrame, metricCol: String, pCol: String,
      q: Double): DataFrame = {
    val w = Window.orderBy(col("_p"), col(metricCol))
    val ranked = df
      .select(col(metricCol), col(pCol).cast("double").as("_p"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("_m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("_thr", col("rank").cast("double") * q / col("_m"))
      .withColumn("_hit", when(col("_p") <= col("_thr"), col("rank")))
    val kStar = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("_kstar", max(col("_hit")).over(kStar))
      .select(col(metricCol), col("_p").as("p"), col("rank"),
        Numerics.roundz(col("_thr"), 6).as("bh_threshold"),
        (col("_kstar").isNotNull &&
          col("rank") <= col("_kstar")).as("rejected"))
  }

  /** Murphy decomposition of the Brier score over forecast bins —
    * reliability (calibration error), resolution (discrimination), and
    * uncertainty, with `brier = reliability − resolution +
    * uncertainty`. The classifier-quality readout beyond a bare
    * calibration table: a filter model can be perfectly calibrated
    * (rel 0) and useless (res 0).
    *
    * Forecasts are integer milli-probabilities (the [[rocAuc]]
    * quantization contract) binned by centi-prob decile. All bin
    * sums are exact longs; reliability's cross-bin sum uses the
    * integer fixed-point `Σ (D_k² div n_k)` (D_k = Σp − 1000·Σy per
    * bin, in milli-units) so no float accumulates across bins, and
    * resolution comes off the decomposition identity — each surfaced
    * number is ONE short double chain off exact integers, 6 dp.
    *
    * Output (1 row): `n`, `brier`, `reliability`, `resolution`,
    * `uncertainty`.
    */
  def brierDecomposition(
      df: DataFrame, milliProbCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("long")
    val p = col(milliProbCol).cast("long")
    val perBin = df
      .select((p / 100).cast("long").as("_bin"), p.as("_p"),
        when(y =!= 0L, 1L).otherwise(0L).as("_y"))
      .withColumn("_e", col("_p") - lit(1000L) * col("_y"))
      .groupBy(col("_bin"))
      .agg(count(lit(1)).as("_n"), sum(col("_p")).as("_sp"),
        sum(col("_y")).as("_sy"), sum(col("_e") * col("_e")).as("_se2"))
    val agg = perBin.agg(
      sum(col("_n")).as("n"), sum(col("_sy")).as("_ty"),
      sum(col("_se2")).as("_brier_fp"),
      sum(expr("(_sp - 1000 * _sy) * (_sp - 1000 * _sy) div _n"))
        .as("_rel_fp"))
    agg.select(
      col("n"),
      Numerics.roundz(col("_brier_fp").cast("double") /
        (lit(1000000.0) * col("n")), 6).as("brier"),
      Numerics.roundz(col("_rel_fp").cast("double") /
        (lit(1000000.0) * col("n")), 6).as("reliability"),
      Numerics.roundz({
        val unc = (col("_ty") * (col("n") - col("_ty"))).cast("double") /
          (col("n").cast("double") * col("n"))
        val rel = col("_rel_fp").cast("double") / (lit(1000000.0) * col("n"))
        val brier = col("_brier_fp").cast("double") /
          (lit(1000000.0) * col("n"))
        rel + unc - brier
      }, 6).as("resolution"),
      Numerics.roundz(
        (col("_ty") * (col("n") - col("_ty"))).cast("double") /
          (col("n").cast("double") * col("n")), 6).as("uncertainty"))
  }

  /** Cliff's delta ordinal effect size between slice A and the rest:
    * (#(a>b) − #(a<b)) / (n_a·n_b) — the tie-robust companion to
    * [[mannWhitneyU]] (δ = 2U/(n_a·n_b) − 1 without the normal
    * approximation), the standard "how often does A exceed B"
    * readout. |δ| < .147 negligible, > .474 large (Romano 2006).
    *
    * Exact and distributed: one hash aggregate to per-value
    * (n_a, n_b) counts, a cumulative window over the value-bounded
    * frame, then #(a>b) = Σ_v n_a(v)·cumB(<v) and
    * #(a<b) = Σ_v n_a(v)·(N_b − cumB(≤v)) — pure 64-bit integers
    * until the final division.
    */
  def cliffsDelta(
      df: DataFrame, valueCol: String, inA: Column): DataFrame = {
    requireIntegralValues(df, valueCol, "cliffsDelta")
    val perValue = df
      .groupBy(col(valueCol).cast("long").as("_v"))
      .agg(sum(when(inA, 1L).otherwise(0L)).as("_na"),
        sum(when(inA, 0L).otherwise(1L)).as("_nb"))
    val cum = perValue.withColumn("_cumB",
      sum(col("_nb")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("_v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    cum
      .crossJoin(broadcast(perValue.agg(sum(col("_na")).as("_ta"),
        sum(col("_nb")).as("_tb"))))
      .agg(first(col("_ta")).as("n_a"), first(col("_tb")).as("n_b"),
        sum(col("_na") * (col("_cumB") - col("_nb"))).as("n_gt"),
        sum(col("_na") * (col("_tb") - col("_cumB"))).as("n_lt"))
      .select(col("n_a"), col("n_b"), col("n_gt"), col("n_lt"),
        Numerics.roundz((col("n_gt") - col("n_lt")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("delta"))
  }

  /** Kendall τ-b rank correlation between two BOUNDED-CARDINALITY
    * ordinal columns (buckets/deciles/grades — the judge-agreement
    * and monotone-association readout that, unlike Spearman, has an
    * exact tie correction). The naive definition is O(n²) pair
    * enumeration; over bounded ordinals it collapses to the
    * contingency cells: concordant/discordant pair counts are
    * Σ n_c1·n_c2 over CELL pairs (≤ |A|·|B| squared, a config-scale
    * frame), tie terms come from the margins, and every quantity is
    * an exact 64-bit integer until the final τ division. One
    * corpus-scale hash aggregate; everything else is cell-frame work.
    */
  def kendallTauB(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    requireIntegralValues(df, aCol, "kendallTauB")
    requireIntegralValues(df, bCol, "kendallTauB")
    import graft.operators.Materialize.MaterializeOps
    val cells = df.select(col(aCol).cast("long").as("_a"),
        col(bCol).cast("long").as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_n"))
      .materialized
    val pairs = cells.select(col("_a").as("_a1"), col("_b").as("_b1"),
        col("_n").as("_n1"))
      .crossJoin(cells.select(col("_a").as("_a2"), col("_b").as("_b2"),
        col("_n").as("_n2")))
      .filter(col("_a2") > col("_a1"))
    val cd = pairs.agg(
      sum(when(col("_b2") > col("_b1"), col("_n1") * col("_n2"))
        .otherwise(0L)).as("concordant"),
      sum(when(col("_b2") < col("_b1"), col("_n1") * col("_n2"))
        .otherwise(0L)).as("discordant"))
    val ta = cells.groupBy(col("_a")).agg(sum(col("_n")).as("_t"))
      .agg(sum(expr("(_t * (_t - 1)) div 2")).as("_n1t"),
        sum(col("_t")).as("_tot"))
    val tb = cells.groupBy(col("_b")).agg(sum(col("_n")).as("_t"))
      .agg(sum(expr("(_t * (_t - 1)) div 2")).as("_n2t"))
    cd.crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("_tot").as("n"), col("concordant"), col("discordant"),
        Numerics.roundz({
          val n0 = expr("(_tot * (_tot - 1)) div 2").cast("double")
          (col("concordant") - col("discordant")).cast("double") /
            sqrt((n0 - col("_n1t").cast("double")) *
              (n0 - col("_n2t").cast("double")))
        }, 6).as("tau_b"))
  }

  /** Split-conformal calibration threshold: for each miscoverage
    * level α, the k-th smallest nonconformity score with
    * k = ceil((n+1)(1−α)) — the distribution-free prediction-set
    * cutoff (Vovk; Angelopoulos & Bates 2023). Guarantees ≥1−α
    * coverage on exchangeable data with NO model assumptions, which
    * is why it's the standard uncertainty wrapper over any scorer.
    *
    * Exact and distributed: scores are integral (the house
    * fixed-point contract), k is exact integer arithmetic
    * (ceil(a/b) = (a+b−1) div b), and the k-th order statistic comes
    * from a per-value count aggregate + cumulative window over the
    * value-bounded frame — never a global row sort. Ties are handled
    * exactly (first value whose cumulative count reaches k).
    *
    * Undersized calibration: when k = ceil((n+1)(1−α)) exceeds n (a
    * small calibration set at a small α, e.g. α=1% with n<99), the
    * conformal threshold is +∞ — the α row is still EMITTED, with a
    * NULL threshold and its (k, n), so callers see the condition
    * instead of a silently missing row.
    */
  def conformalQuantile(
      df: DataFrame, scoreCol: String,
      alphasPct: Seq[Int] = Seq(10, 5)): DataFrame = {
    require(alphasPct.nonEmpty && alphasPct.forall(a => a >= 1 && a < 100))
    requireIntegralValues(df, scoreCol, "conformalQuantile")
    val perValue = df.select(col(scoreCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy(col("_v")).agg(count(lit(1)).as("_n"))
    val tot = perValue.agg(coalesce(sum(col("_n")), lit(0L)).as("_tot"))
    val cum = perValue.withColumn("_cum",
        sum(col("_n")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
    val rows = alphasPct.map { a =>
      // k = ceil((n+1) * (100-a) / 100), all integer
      val k = expr(s"((_tot + 1) * ${100 - a} + 99) div 100")
      val found = cum.filter(col("_cum") >= k)
        .orderBy(col("_v")).limit(1)
        .select(lit(a.toLong).as("alpha_pct"), col("_v").as("_thf"))
      tot
        .select(lit(a.toLong).as("alpha_pct"), col("_tot").as("n"),
          k.as("k"))
        .join(found, Seq("alpha_pct"), "left")
        .select(col("alpha_pct"), col("n"), col("k"),
          col("_thf").as("threshold"))
    }
    rows.reduce(_ unionByName _).orderBy("alpha_pct")
  }

  /** Poisson(1) inverse-CDF thresholds at 28-bit resolution:
    * T_k = ⌊P[X ≤ k] · 2²⁸⌋ for k = 0..8 — a 28-bit md5-derived
    * uniform compared against these INTEGER literals yields a
    * Poisson(1) draw with zero float arithmetic on either engine
    * (draws > 9 have probability < 1.1e-7 and clamp to 9).
    */
  private val PoissonThresholds28: Seq[Long] = Seq(
    98751885L, 197503771L, 246879713L, 263338361L, 267453023L,
    268275955L, 268413111L, 268432704L, 268435153L)

  /** Paired Poisson bootstrap for system comparison — "is metric A
    * really better than metric B on these eval units, or is the gap
    * within resampling noise": the standard significance readout for
    * paired per-query eval scores (retrieval nDCG, win rates), where
    * the PAIRED resample respects the per-unit correlation a two-
    * sample test would throw away.
    *
    * Each (unit u, replicate r) gets a Poisson(1) weight — the
    * distributed bootstrap standard (per-replicate multinomial
    * resampling needs global coordination; independent Poisson(1)
    * weights converge to the same bootstrap distribution) — derived
    * from a 28-bit md5 integer compared against [[PoissonThresholds28]]:
    * EXACT integer arithmetic, portable to any engine with md5 (the
    * house md5-contract), deterministic under any partitioning.
    * Replicate statistic Δ_r = Σ w·(a−b) / Σ w — integer numerator and
    * denominator, one 6-dp division. The confidence band is the exact
    * (⌈0.025·R⌉, ⌈0.975·R⌉) order statistic of the R replicate deltas.
    *
    * Output (1 row): n units, `delta_obs` = mean(a−b) 6 dp, `n_reps`
    * (replicates with positive weight sum — all of them in practice),
    * `ci_lo`, `ci_hi`, and `share_le_zero` = fraction of replicates
    * with Δ_r ≤ 0 (the one-sided sign readout).
    *
    * Scale shape: the input is the PER-UNIT eval frame (queries /
    * docs under eval — eval-scale, not corpus-scale); the explode is
    * |units|×nBoot rows map-side-combined down to nBoot replicate
    * rows, and the order statistics run on that nBoot-bounded frame
    * (the conformalQuantile class). Metrics must be integral
    * fixed-point ([[requireIntegralValues]] — the quantize-first
    * contract).
    */
  def pairedBootstrap(
      df: DataFrame, unitCol: String, aCol: String, bCol: String,
      nBoot: Int = 200, tag: String = "pb"): DataFrame = {
    require(nBoot >= 2, s"nBoot must be >= 2, got $nBoot")
    requireIntegralValues(df, aCol, "pairedBootstrap")
    requireIntegralValues(df, bCol, "pairedBootstrap")
    val base = df.select(col(unitCol).cast("string").as("_u"),
      (col(aCol).cast("long") - col(bCol).cast("long")).as("_d"))
    // spread the units BEFORE the ×nBoot explode: the md5 weight runs
    // per (unit, replicate) — |units|×nBoot hashes — and without a
    // shuffle the whole fan-out pipelines inside the input's scan
    // tasks (one task for a single-file eval frame; measured 1.0 s of
    // a 1.3 s gate in one task at sf0.1/local[32]). The shuffle moves
    // only the narrow (unit, delta) rows; width is scale-adaptive
    // (max of configured shuffle width and executor slots), and the
    // explicit count exempts it from AQE's byte-based coalescing,
    // which would re-fold this CPU-bound-but-tiny-bytes stage.
    val pWidth = math.max(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt,
      df.sparkSession.sparkContext.defaultParallelism)
    val spread = base.repartition(pWidth, col("_u"))
    val h = conv(substring(md5(concat(lit(s"$tag:"), col("_u"),
      lit(":"), col("r").cast("string"))), 1, 7), 16, 10).cast("long")
    val w = PoissonThresholds28
      .map(t => when(h >= t, 1L).otherwise(0L)).reduce(_ + _)
    // materialized: the ≤ nBoot-row replicate frame feeds BOTH the
    // rank pass and the count/sign aggregate — without it the
    // units×nBoot explode would run twice
    import graft.operators.Materialize.MaterializeOps
    val perRep = spread
      .select(col("_u"), col("_d"),
        explode(sequence(lit(0), lit(nBoot - 1))).as("r"))
      .withColumn("_w", w)
      .groupBy(col("r"))
      .agg(sum(col("_w")).as("_ws"), sum(col("_w") * col("_d")).as("_dn"))
      .filter(col("_ws") > 0)
      .select(Numerics.roundz(
        col("_dn").cast("double") / col("_ws").cast("double"), 6)
        .as("_delta"))
      .materialized
    // exact order statistics over the nBoot-bounded replicate frame —
    // ranked through the bucket-partitioned Ranks primitive (same
    // permutation contract as the row_number window it replaces; the
    // two selected order-statistic _delta values are identical), so no
    // single-partition WindowExec remains on this gate
    val ranked = Ranks.withGlobalRank(perRep, "_rk", col("_delta"),
        buckets = 16)
      .crossJoin(broadcast(perRep.agg(count(lit(1)).as("n_reps"),
        sum(when(col("_delta") <= 0.0, 1L).otherwise(0L)).as("_le0"))))
    val band = ranked
      .filter(col("_rk") === expr("CAST((n_reps * 25 + 999) div 1000 AS INT)") ||
        col("_rk") === expr("CAST((n_reps * 975 + 999) div 1000 AS INT)"))
      .groupBy(col("n_reps"), col("_le0"))
      .agg(min(col("_delta")).as("ci_lo"), max(col("_delta")).as("ci_hi"))
    val obs = base.agg(count(lit(1)).as("n"),
      Numerics.roundz(sum(col("_d")).cast("double") /
        count(lit(1)).cast("double"), 6).as("delta_obs"))
    obs.crossJoin(broadcast(band))
      .select(col("n"), col("delta_obs"), col("n_reps"),
        col("ci_lo"), col("ci_hi"),
        Numerics.roundz(col("_le0").cast("double") /
          col("n_reps").cast("double"), 6).as("share_le_zero"))
  }

  /** Wald's sequential probability ratio test over a Bernoulli event
    * stream (Wald 1945) — the SEQUENTIAL face of the A/B family
    * ([[abProportionTest]] is the fixed-horizon one): per event-time
    * day, the cumulative log-likelihood ratio of H1: p = p1 against
    * H0: p = p0,
    *
    *   LLR_t = k_t·ln(p1/p0) + (n_t − k_t)·ln((1−p1)/(1−p0)),
    *
    * with the classic decision boundaries ln((1−β)/α) (accept H1) and
    * ln(β/(1−α)) (accept H0). The readout an experiment monitor wants:
    * WHEN the evidence walk crossed, not just whether the final count
    * clears a z-test.
    *
    * Determinism/portability: the four log constants are computed ONCE
    * on the driver and ride both the plan and the oracle as the SAME
    * shortest-round-trip decimal literals (the RBO discipline — both
    * engines parse them to the identical double); k and n stay exact
    * integers from one daily aggregate, so each day's LLR is one fixed
    * double expression, 6-dp-rounded. Per-day `decision` is the
    * boundary test of THAT day's LLR; the first-crossing day is the
    * min day with a non-continue decision (SPRT stops there —
    * later rows replay the counterfactual walk).
    *
    * Scale shape: one corpus-scale hash aggregate to (day, n, k); the
    * cumulative window runs over the DAY-DOMAIN-bounded frame (the
    * documented rocAuc class — days, not rows). Output: one row per
    * day (day, n_cum, k_cum, llr, decision).
    */
  def sprtBernoulli(
      df: DataFrame, tsCol: String, success: Column,
      p0: Double, p1: Double, alphaPct: Int = 5,
      betaPct: Int = 20): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct p0, p1 in (0,1), got $p0, $p1")
    require(alphaPct >= 1 && alphaPct < 100 && betaPct >= 1 && betaPct < 100,
      s"alphaPct/betaPct in [1,100), got $alphaPct/$betaPct")
    val c1 = math.log(p1 / p0)
    val c2 = math.log((1.0 - p1) / (1.0 - p0))
    val upper = math.log((100.0 - betaPct) / alphaPct)
    val lower = math.log(betaPct / (100.0 - alphaPct))
    val daily = df
      .select(to_date(col(tsCol)).as("day"),
        when(success, 1L).otherwise(0L).as("_s"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("_n"), sum(col("_s")).as("_k"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .select(col("day"),
        sum(col("_n")).over(w).as("n_cum"),
        sum(col("_k")).over(w).as("k_cum"))
      .select(col("day"), col("n_cum"), col("k_cum"),
        Numerics.roundz(col("k_cum").cast("double") * lit(c1) +
          (col("n_cum") - col("k_cum")).cast("double") * lit(c2), 6)
          .as("llr"))
      .withColumn("decision",
        when(col("llr") >= lit(upper), lit("accept_h1"))
          .when(col("llr") <= lit(lower), lit("accept_h0"))
          .otherwise(lit("continue")))
  }

  /** The literal constants [[sprtBernoulli]] uses, exposed so gate
    * oracles interpolate the IDENTICAL decimals.
    */
  private[graft] def sprtConstants(
      p0: Double, p1: Double, alphaPct: Int, betaPct: Int)
      : (Double, Double, Double, Double) =
    (math.log(p1 / p0), math.log((1.0 - p1) / (1.0 - p0)),
      math.log((100.0 - betaPct) / alphaPct),
      math.log(betaPct / (100.0 - alphaPct)))

  /** Delete-one jackknife standard error of a ratio metric
    * R = Σnum / Σden — the correct uncertainty for ratio-of-sums
    * metrics (revenue per session, discount share) where the naive
    * per-row variance is wrong because numerator and denominator
    * covary (Efron & Tibshirani ch. 11).
    *
    * Distributed-exact shape: the leave-one-out replicates
    * R_i = (S_y − y_i)/(S_x − x_i) are each a ratio of exact longs
    * (inputs are 1e-4 fixed-point units of the money columns), so
    * every replicate is computed as FIXED-POINT integer division
    * ((S_y − y_i)·10⁹ div (S_x − x_i), decimal(38,0) intermediates so
    * nothing overflows) — order-independent exact sums Σr and Σr²
    * follow, never a float accumulation across partitions. Two
    * passes: one aggregate for (S_y, S_x, n) broadcast back, one
    * scan-local replicate + final aggregate. SE =
    * sqrt((n−1)/n · (Σr² − (Σr)²/n)) / 10⁹, one fixed double chain.
    *
    * Contract: all (S_x − x_i) must be positive (a corpus whose total
    * is dominated by one row has no meaningful jackknife anyway).
    */
  def jackknifeRatioSE(
      df: DataFrame, numFp: Column, denFp: Column): DataFrame = {
    val base = df.select(numFp.cast("long").as("_y"),
      denFp.cast("long").as("_x"))
    val tot = base.agg(sum(col("_y")).as("_sy"), sum(col("_x")).as("_sx"),
      count(lit(1)).as("n"))
    val rep = base.crossJoin(broadcast(tot))
      .select(col("n"), col("_sy"), col("_sx"),
        expr("CAST((CAST(_sy - _y AS DECIMAL(38,0)) * 1000000000) div " +
          "CAST(_sx - _x AS DECIMAL(38,0)) AS DECIMAL(38,0))").as("_r"))
    rep.groupBy(col("n"), col("_sy"), col("_sx"))
      .agg(sum(col("_r")).as("_s"),
        sum(col("_r") * col("_r")).as("_sq"))
      .select(col("n"),
        Numerics.roundz(col("_sy").cast("double") /
          col("_sx").cast("double"), 6).as("ratio"),
        Numerics.roundz({
          val nd = col("n").cast("double")
          val s = col("_s").cast("double")
          val sq = col("_sq").cast("double")
          sqrt(((nd - 1.0) / nd) * (sq - s * s / nd)) / 1e9
        }, 8).as("se_jackknife"))
  }

  /** Mutual information between two categorical columns, in nats,
    * with the sqrt-normalized variant NMI = I/√(H_a·H_b) — the
    * feature-vs-label association readout that, unlike chi-square,
    * is directly comparable across feature cardinalities.
    *
    * Only observed cells contribute (0·log 0 = 0), so no margin grid
    * is needed: one corpus-scale hash aggregate to (a, b) counts,
    * then margins and the MI sum over the vocabulary-bounded cell
    * frame. Each cell's p·ln(pN²/(r·c)) term is the identical double
    * chain on both engines, folded in (a, b) order; entropies fold
    * over their margins in key order.
    */
  def mutualInformation(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    // materialize the cell frame: four consumers (margins, total, MI
    // terms) would otherwise each rescan the corpus — the cell frame
    // is vocabulary-bounded, the corpus is not (plan-locked)
    val obs = df.groupBy(col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
      .agg(count(lit(1)).as("_o"))
      .materialized
    val ra = obs.groupBy(col("_a")).agg(sum(col("_o")).as("_r"))
    val cb = obs.groupBy(col("_b")).agg(sum(col("_o")).as("_c"))
    val tot = obs.agg(sum(col("_o")).as("_N"))
    def entropyFold(margin: DataFrame, key: String, cnt: String) =
      margin.crossJoin(broadcast(tot))
        .select(col(key), (col(cnt).cast("double") /
            col("_N").cast("double")).as("_p"))
        .agg(aggregate(
          array_sort(collect_list(struct(col(key), col("_p")))),
          lit(0.0),
          (acc, s) => acc - s.getField("_p") * log(s.getField("_p"))))
    val mi = obs.join(broadcast(ra), Seq("_a"))
      .join(broadcast(cb), Seq("_b"))
      .crossJoin(broadcast(tot))
      .select(col("_a"), col("_b"),
        ((col("_o").cast("double") / col("_N").cast("double")) *
          log((col("_o").cast("double") * col("_N").cast("double")) /
            (col("_r").cast("double") * col("_c").cast("double"))))
          .as("_t"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("_a"), col("_b"), col("_t")))),
        lit(0.0), (acc, s) => acc + s.getField("_t")).as("_mi"))
    mi.crossJoin(broadcast(tot))
      .crossJoin(broadcast(entropyFold(ra, "_a", "_r").toDF("_ha")))
      .crossJoin(broadcast(entropyFold(cb, "_b", "_c").toDF("_hb")))
      .select(col("_N").as("n"),
        Numerics.roundz(col("_mi"), 6).as("mi_nats"),
        Numerics.roundz(col("_ha"), 6).as("h_a"),
        Numerics.roundz(col("_hb"), 6).as("h_b"),
        Numerics.roundz(col("_mi") / sqrt(col("_ha") * col("_hb")), 6)
          .as("nmi_sqrt"))
  }

  /** Cohen's d (and its small-sample Hedges' g correction) between
    * slice A and the rest — the standardized mean difference an
    * experiment readout pairs with the [[abProportionTest]] z: "the
    * treatment moved the metric by 0.3 pooled standard deviations"
    * survives metric-scale changes where a raw delta does not.
    *
    * Exact and distributed: ONE hash aggregate to the six moment sums
    * (n, Σv, Σv² per slice) over integer fixed-point values — Σv as
    * long, Σv² in DECIMAL(38,0) because squared cents pass 2⁶³ at
    * corpus scale — then the closed-form chain
    * sp² = ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2), d = (m_a−m_b)/sp,
    * g = d·(1 − 3/(4n−9)) as the only doubles, rounded at 6.
    */
  def cohensD(
      df: DataFrame, valueCol: String, inA: Column): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = (col(valueCol)
      .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
      .cast("long")
    val m = df.select(v.as("_v"), inA.as("_a")).agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_a"), 0L).otherwise(1L)).as("n_b"),
      sum(when(col("_a"), col("_v")).otherwise(0L)).as("_sa"),
      sum(when(!col("_a"), col("_v")).otherwise(0L)).as("_sb"),
      sum(when(col("_a"), col("_v").cast(d38) * col("_v").cast(d38))
        .otherwise(lit(0).cast(d38))).as("_qa"),
      sum(when(!col("_a"), col("_v").cast(d38) * col("_v").cast(d38))
        .otherwise(lit(0).cast(d38))).as("_qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = col("_sa").cast("double") / na
    val mb = col("_sb").cast("double") / nb
    val va = (col("_qa").cast("double") - na * ma * ma) / (na - 1.0)
    val vb = (col("_qb").cast("double") - nb * mb * mb) / (nb - 1.0)
    val sp = sqrt(((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0))
    // d is scale-invariant: numerator and denominator share the 10⁴
    // fixed-point factor, so no rescale is needed
    val dEff = (ma - mb) / sp
    m.select(col("n_a"), col("n_b"),
      Numerics.roundz(ma / 10000.0, 6).as("mean_a"),
      Numerics.roundz(mb / 10000.0, 6).as("mean_b"),
      Numerics.roundz(dEff, 6).as("cohens_d"),
      Numerics.roundz(
        dEff * (lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb) - 9.0)),
        6).as("hedges_g"))
  }

  /** Difference-in-differences — the quasi-experimental readout when
    * you can't randomize: (treated.after − treated.before) −
    * (control.after − control.before) removes both the group baseline
    * and the common time trend. ONE hash aggregate to the four cell
    * moments (n, Σv as exact fixed-point longs), then the four means
    * and the DiD estimate as the only floats. Output also carries the
    * four cell means so the parallel-trends eyeball check is in the
    * same row.
    */
  def diffInDiff(
      df: DataFrame, valueCol: String, treated: Column,
      after: Column): DataFrame = {
    val v = (col(valueCol)
      .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
      .cast("long")
    val cells =
      cell2(col("_t"), col("_a"), true, true, "n11", "s11") ++
        cell2(col("_t"), col("_a"), true, false, "n10", "s10") ++
        cell2(col("_t"), col("_a"), false, true, "n01", "s01") ++
        cell2(col("_t"), col("_a"), false, false, "n00", "s00")
    val m = df.select(v.as("_v"), treated.as("_t"), after.as("_a"))
      .agg(cells.head, cells.tail: _*)
    def mean(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double") / 10000.0
    m.select(col("n11"), col("n10"), col("n01"), col("n00"),
      Numerics.roundz(mean("s11", "n11"), 6).as("treated_after"),
      Numerics.roundz(mean("s10", "n10"), 6).as("treated_before"),
      Numerics.roundz(mean("s01", "n01"), 6).as("control_after"),
      Numerics.roundz(mean("s00", "n00"), 6).as("control_before"),
      Numerics.roundz(
        (mean("s11", "n11") - mean("s10", "n10")) -
          (mean("s01", "n01") - mean("s00", "n00")), 6).as("did"))
  }

  private def cell2(t: Column, a: Column, tv: Boolean, av: Boolean,
      nName: String, sName: String): Seq[Column] = Seq(
    sum(when(t === tv && a === av, 1L).otherwise(0L)).as(nName),
    sum(when(t === tv && a === av, col("_v")).otherwise(0L)).as(sName))

  /** McNemar's test for PAIRED classifiers — "is model B actually
    * better than model A on the same items", the readout that a naive
    * two-proportion z gets wrong because the predictions share items.
    * Only the discordant cells matter: b = A right ∧ B wrong,
    * c = A wrong ∧ B right; χ² = (|b−c|−1)²/(b+c) with the standard
    * continuity correction. ONE hash aggregate over the corpus to the
    * four contingency cells; every count exact, χ² the only float
    * (null when b+c = 0 — no discordant evidence, not χ²=∞).
    */
  def mcnemar(
      df: DataFrame, truth: Column, predA: Column,
      predB: Column): DataFrame = {
    val aRight = predA === truth
    val bRight = predB === truth
    val m = df.agg(
      sum(when(aRight && bRight, 1L).otherwise(0L)).as("both_right"),
      sum(when(aRight && !bRight, 1L).otherwise(0L)).as("only_a"),
      sum(when(!aRight && bRight, 1L).otherwise(0L)).as("only_b"),
      sum(when(!aRight && !bRight, 1L).otherwise(0L)).as("both_wrong"))
    m.select(col("both_right"), col("only_a"), col("only_b"),
      col("both_wrong"),
      when(col("only_a") + col("only_b") > 0,
        Numerics.roundz({
          val d = abs(col("only_a") - col("only_b")).cast("double") - 1.0
          d * d / (col("only_a") + col("only_b")).cast("double")
        }, 6)).as("chi2"))
  }

  /** One-way ANOVA F over `groupCol` arms of the integer fixed-point
    * `valueCol` — the k-group mean comparison behind "did any variant
    * move the metric" before pairwise drill-down (the parametric
    * companion to [[kruskalWallis]]).
    *
    * One corpus-scale hash aggregate to per-group (n, Σv, Σv²) — Σv²
    * in DECIMAL(38,0) — then SSW = Σ_g(Σv²_g − S_g²/n_g) and
    * SSB = Σ_g S_g²/n_g − S²/N fold over the k-row group frame in
    * SORTED group order (k = arm count, driver-safe), so the float
    * association order is deterministic and a DuckDB oracle replays
    * it with `list_sum(list(… ORDER BY g))`.
    */
  def anovaF(
      df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = (col(valueCol)
      .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
      .cast("long")
    val g = df.select(col(groupCol).cast("string").as("_g"), v.as("_v"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"),
        sum(col("_v").cast(d38) * col("_v").cast(d38)).as("_q"))
    val folded = g.agg(
      count(lit(1)).as("k"), sum(col("_n")).as("n"),
      sum(col("_s")).as("_ts"),
      sum(col("_q")).as("_tq"),
      aggregate(
        array_sort(collect_list(struct(col("_g"), col("_s"), col("_n")))),
        lit(0.0),
        (acc, s) => acc + s.getField("_s").cast("double") *
          s.getField("_s").cast("double") /
          s.getField("_n").cast("double")).as("_ssqn"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("_ssqn") -
      col("_ts").cast("double") * col("_ts").cast("double") / nD
    val ssw = col("_tq").cast("double") - col("_ssqn")
    // raw SS are corpus-scale doubles whose ulp exceeds any fixed
    // decimal rounding (a 1.8e11 double has ulp ~3e-5 — round(·,4) is
    // not representable); surface the scale-free η² instead
    folded.select(col("k"), col("n"),
      Numerics.roundz(ssb / (ssb + ssw), 6).as("eta_squared"),
      Numerics.roundz((ssb / (kD - 1.0)) / (ssw / (nD - kD)), 6).as("f"))
  }

  /** Offline retrieval-quality metrics — recall@k, MRR@k, nDCG@k — for
    * a CHEAP candidate ranking judged against the exact ranking and
    * against label relevance: the eval a pipeline owner reads before
    * trusting a truncated (matryoshka-prefix) index enough to serve
    * retrieval with it. The cheap ranking is cosine over the first
    * `prefixDim` dims; the truth ranking is cosine over the full
    * vector; a candidate is RELEVANT when its label matches the
    * query's.
    *
    * Per query id (all fractions 6-dp; sims 6-dp HALF_UP with ties
    * broken by ascending id — the [[Similarity.topKCosine]] contract,
    * zero-norm/NaN sims excluded per ranking):
    *  - `recall_at_k`: |top-k(prefix) ∩ top-k(full)| / |top-k(full)|
    *  - `mrr`: 1/rank of the first relevant hit in the prefix top-k
    *    (0 when none)
    *  - `ndcg_at_k`: Σ_rel-hits 1/log₂(rank+1) over the IDEAL dcg for
    *    min(k, n_relevant) hits (0 when the corpus holds no relevant
    *    candidate); binary gains
    *  - `n_relevant`: corpus-wide relevant-candidate count
    *
    * Scale shape: the query rows broadcast onto one corpus scan; the
    * scored frame carries (ids, label, two 6-dp sims) — never vectors
    * or text; both top-k passes ride [[Ranks.topKPerGroup]] (salted
    * two-stage, no whole-query-partition sort); every aggregate after
    * that is queries×k-bounded. The IDCG ladder is a k-entry literal
    * computed once on the driver.
    */
  def retrievalMetrics(
      embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryIds: Seq[Long], k: Int,
      prefixDim: Int): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    require(k >= 1, s"k must be >= 1, got $k")
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    val e = embeddings.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("v"),
      col(labelCol).cast("long").as("lbl"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("lbl").as("qlbl"))
    // zero-norm slices have no defined cosine: surface NaN (excluded
    // from each ranking below) instead of an ANSI divide-by-zero —
    // the [[Similarity.topKCosine]] contract
    def safeCos(a: Column, b: Column): Column = {
      val den = Similarity.norm(a) * Similarity.norm(b)
      when(den === 0.0, lit(Double.NaN))
        .otherwise(Similarity.dot(a, b) / den)
    }
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlbl"), col("vec_id"), col("lbl"),
        Numerics.roundz(safeCos(col("v"), col("qv")), 6).as("sf"),
        Numerics.roundz(safeCos(
          slice(col("v"), 1, prefixDim),
          slice(col("qv"), 1, prefixDim)), 6).as("sp"))
      // three consumers (both top-k passes, the relevant count) differ
      // only by a filter over a broadcast join — no exchange below
      // them, so nothing dedupes the cosine recompute; materialize the
      // narrow (ids, label, two sims) frame once
      .materialized
    val predTop = Ranks.topKPerGroup(
      scored.filter(!isnan(col("sp"))), "rk", k, Seq("query_id"),
      col("sp"), descending = true, ties = Seq(col("vec_id")))
    val truthTop = Ranks.topKPerGroup(
        scored.filter(!isnan(col("sf"))), "trk", k, Seq("query_id"),
        col("sf"), descending = true, ties = Seq(col("vec_id")))
      .select(col("query_id"), col("vec_id"))
    // corpus-wide relevant count per query (one bounded aggregate)
    val nRel = scored.groupBy("query_id")
      .agg(sum(when(col("lbl") === col("qlbl"), 1L).otherwise(0L))
        .as("n_relevant"))
    // prefix-ranking metrics from the queries×k-bounded top frame
    val overlap = predTop.join(truthTop, Seq("query_id", "vec_id"), "semi")
      .groupBy("query_id").agg(count(lit(1)).as("_hits"))
    val truthN = truthTop.groupBy("query_id")
      .agg(count(lit(1)).as("_tn"))
    val relRank = when(col("lbl") === col("qlbl"), col("rk"))
    val fromPred = predTop.groupBy("query_id").agg(
      sum(when(col("lbl") === col("qlbl"),
        lit(1.0) / log2(col("rk").cast("double") + 1.0))
        .otherwise(0.0)).as("_dcg"),
      min(relRank).as("_firstRel"))
    // IDCG ladder: cumulative Σ 1/log₂(i+1), i = 1..k, as a literal
    val idcgLadder = (1 to k).scanLeft(0.0) { (acc, i) =>
      acc + 1.0 / (math.log(i + 1.0) / math.log(2.0))
    }.tail
    val idcg = element_at(array(idcgLadder.map(lit): _*),
      least(lit(k.toLong), col("n_relevant")).cast("int"))
    q.select(col("query_id"))
      .join(nRel, Seq("query_id"), "left")
      .join(overlap, Seq("query_id"), "left")
      .join(truthN, Seq("query_id"), "left")
      .join(fromPred, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        Numerics.roundz(
          coalesce(col("_hits"), lit(0L)).cast("double") /
            greatest(coalesce(col("_tn"), lit(0L)), lit(1L)), 6)
          .as("recall_at_k"),
        Numerics.roundz(
          coalesce(lit(1.0) / col("_firstRel"), lit(0.0)), 6).as("mrr"),
        Numerics.roundz(
          when(coalesce(col("n_relevant"), lit(0L)) === 0, 0.0)
            .otherwise(coalesce(col("_dcg"), lit(0.0)) / idcg), 6)
          .as("ndcg_at_k"))
  }

  /** Rank-biased overlap at depth d (Webber, Moffat & Zobel 2010,
    * truncated form) between the cheap (matryoshka-prefix cosine) and
    * exact (full-vector cosine) rankings per query:
    *
    *   RBO@d = Σ_{k=1..d} (1−p)·p^(k−1) · |S₁..k ∩ T₁..k| / k
    *
    * — the TOP-WEIGHTED agreement measure [[retrievalMetrics]]'s set
    * recall can't express (recall@k treats rank 1 and rank k alike;
    * RBO discounts disagreement geometrically with depth). The
    * persistence p is taken as an exact decimal so every weight
    * (1−p)·p^(k−1) is an exact decimal whose nearest-double literal
    * both engines parse identically; prefix overlaps are exact
    * integers; the weighted sum is one fixed left-associated chain in
    * k order, rounded to 6 dp.
    *
    * Scale shape: same as [[retrievalMetrics]] — queries broadcast
    * onto one materialized scored pass, both top-d rankings via
    * [[Ranks.topKPerGroup]], then everything is queries×d-bounded.
    * Output: (query_id, overlap_at_d, rbo).
    */
  def rankBiasedOverlap(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], d: Int, p: BigDecimal,
      prefixDim: Int): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    require(d >= 1, s"d must be >= 1, got $d")
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    val e = embeddings.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    def safeCos(a: Column, b: Column): Column = {
      val den = Similarity.norm(a) * Similarity.norm(b)
      when(den === 0.0, lit(Double.NaN))
        .otherwise(Similarity.dot(a, b) / den)
    }
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Numerics.roundz(safeCos(col("v"), col("qv")), 6).as("sf"),
        Numerics.roundz(safeCos(
          slice(col("v"), 1, prefixDim),
          slice(col("qv"), 1, prefixDim)), 6).as("sp"))
      .materialized // both top-d passes read it
    val predTop = Ranks.topKPerGroup(
      scored.filter(!isnan(col("sp"))), "rk", d, Seq("query_id"),
      col("sp"), descending = true, ties = Seq(col("vec_id")))
    val truthTop = Ranks.topKPerGroup(
      scored.filter(!isnan(col("sf"))), "trk", d, Seq("query_id"),
      col("sf"), descending = true, ties = Seq(col("vec_id")))
    // a common item enters every prefix depth k >= max(rank_s, rank_t)
    val common = predTop.select(col("query_id"), col("vec_id"), col("rk"))
      .join(truthTop.select(col("query_id"), col("vec_id"), col("trk")),
        Seq("query_id", "vec_id"))
      .select(col("query_id"), greatest(col("rk"), col("trk")).as("_m"))
    val xAggs = (1 to d).map(k =>
      sum(when(col("_m") <= k, 1L).otherwise(0L)).as(s"_x$k"))
    val xs = common.groupBy("query_id").agg(xAggs.head, xAggs.tail: _*)
    // (1−p)·p^(k−1) exact decimals → nearest-double literals (the
    // oracle embeds the identical decimal strings)
    val weights = (1 to d).map(k =>
      ((BigDecimal(1) - p) * p.pow(k - 1)).toDouble)
    val rbo = (1 to d).map { k =>
      coalesce(col(s"_x$k"), lit(0L)).cast("double") *
        lit(weights(k - 1)) / lit(k.toDouble)
    }.reduce(_ + _)
    q.select(col("query_id"))
      .join(xs, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col(s"_x$d"), lit(0L)).as("overlap_at_d"),
        Numerics.roundz(rbo, 6).as("rbo"))
  }
}
