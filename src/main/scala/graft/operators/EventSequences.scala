package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sequence analytics over per-user event streams: first-order Markov
  * transition estimation and conversion-touch attribution — the
  * behavioral-analytics complement to the windowed/funnel operators
  * ([[graft.streaming.EventWindows]], [[Funnel]]).
  *
  * Both are one-shuffle shapes: the only wide exchange is the
  * hash-partition by user for the per-user ordered window; everything
  * after operates on type-level frames bounded by the EVENT-TYPE
  * vocabulary (≤ tens of rows), broadcast where joined. Determinism:
  * event order is (ts, tieCol) — the tie column makes same-timestamp
  * sequences reproducible across engines, and probabilities are single
  * IEEE divisions of exact counts, 6-dp-rounded (the proven
  * cross-engine contract).
  */
object EventSequences {

  private def userWindow(userCol: String, tsCol: String, tieCol: String) =
    Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))

  /** First-order Markov transition matrix: for each observed
    * (prev → next) event-type pair, the transition count and the
    * maximum-likelihood probability P(next | prev) = cnt / Σ_next cnt.
    * The totals frame is one row per event type — broadcast back onto
    * the pair counts, so the corpus shuffles exactly once (the user
    * window).
    */
  def transitions(
      events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val pairs = events
      .withColumn("prev", lag(col(typeCol), 1).over(userWindow(userCol, tsCol, tieCol)))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col(typeCol).as("next"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("prev").agg(sum("cnt").as("n"))
    pairs.join(broadcast(totals), "prev")
      .select(col("prev"), col("next"), col("cnt"),
        round(col("cnt") * lit(1.0) / col("n"), 6).as("prob"))
  }

  /** First/last-touch conversion attribution: each `convType` event is
    * attributed to the first (resp. most recent) strictly-prior
    * non-conversion event of the same user — "direct" when the
    * conversion has no prior touch. Output: one row per channel with
    * both conversion counts (0 when a channel only wins one model).
    */
  def touchAttribution(
      events: DataFrame, convType: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val w = userWindow(userCol, tsCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch: Column = when(col(typeCol) =!= convType, col(typeCol))
    val conversions = events
      .withColumn("ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .select(coalesce(col("ft"), lit("direct")).as("ft"),
        coalesce(col("lt"), lit("direct")).as("lt"))
    val byFirst = conversions.groupBy(col("ft").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val byLast = conversions.groupBy(col("lt").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    byFirst.join(byLast, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"))
  }

  /** Merge overlapping-or-touching intervals per key into maximal
    * islands — span coalescing (redaction spans, availability windows,
    * on-call shifts, session gap-bridging). An interval starts a new
    * island iff its start exceeds the running maximum end of every
    * earlier interval of the same key; islands aggregate to
    * (key, min start, max end, member count).
    *
    * One shuffle (the per-key window); the island id is a cumulative
    * sum over the same window, so no second exchange before the final
    * per-(key, island) aggregate, which re-uses the same hash
    * partitioning. Deterministic under ties: identical (start, end)
    * rows land in the same island regardless of intra-tie order.
    */
  def mergeIntervals(
      intervals: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    intervals
      .withColumn("_island", island)
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as(startCol),
        max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }

  /** Type-2 slowly-changing-dimension history: collapse each key's
    * attribute stream into validity ranges — one row per consecutive
    * run of an unchanged value, with [valid_from, valid_to) bounds
    * (valid_to NULL on the open current version). The warehouse-side
    * "latest_by_key, but with history" — audit trails, dimension
    * builds, config drift.
    *
    * One shuffle: the per-key (ts, tie) window marks change points,
    * the cumulative change count is the version number, and both the
    * run aggregate and the valid_to lead reuse the key partitioning.
    * Determinism: tie column makes same-timestamp streams
    * reproducible; values within a run are constant so min(attr) is
    * exact.
    */
  def scd2History(
      events: DataFrame, keyCol: String = "user_id",
      attrCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = userWindow(keyCol, tsCol, tieCol)
    val chg = when(lag(col(attrCol), 1).over(w).isNull ||
      lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L)
    val versioned = events
      .withColumn("version",
        sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = versioned
      .groupBy(col(keyCol), col("version"))
      .agg(min(col(attrCol)).as("value"),
        min(unix_micros(col(tsCol))).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    runs
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1)
          .over(Window.partitionBy(col(keyCol)).orderBy(col("version"))))
      .select(col(keyCol), col("version"), col("value"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"))
  }

  /** Per-group z-score outliers: events whose value sits ≥ `threshold`
    * sample standard deviations from their group's mean — the metric
    * anomaly monitor (latency spikes, fraud amounts, corrupted
    * measurements).
    *
    * Cross-engine determinism: values are exact 2-dp decimals in the
    * source, so the per-group sum and sum-of-squares are EXACT decimal
    * aggregates (order-independent); mean/variance/z are then computed
    * in ONE fixed double association from those exact inputs, and z is
    * 4-dp-rounded before the threshold compare — the same discipline
    * as [[graft.streaming.CorpusMonitor]]'s means.
    *
    * Plan: one partial-aggregating groupBy on the type (stats frame is
    * type-vocabulary-sized, broadcast back), then a scan-local
    * projection + filter — the corpus shuffles only the map-side
    * partial sums.
    */
  def zscoreAnomalies(
      events: DataFrame, typeCol: String = "event_type",
      idCol: String = "event_id", valueCol: String = "value",
      threshold: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    // zero-variance guard on EXACT decimals (min==max ⇔ variance==0):
    // Spark's Divide yields NULL on /0 (rows silently dropped) while
    // DuckDB's IEEE 0.0/0.0 is NaN, and NaN > threshold — a constant-
    // valued group would emit EVERY row on the oracle side. Mirror the
    // same min<>max guard in the oracle SQL.
    val stats = events.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(v).as("s"),
        sum(v * v).as("ss"),
        min(v).as("vmin"),
        max(v).as("vmax"))
      .filter(col("n") >= 2 && col("vmin") =!= col("vmax"))
      .drop("vmin", "vmax")
    val m = col("s").cast("double") / col("n")
    val msq = col("ss").cast("double") / col("n")
    val variance = (msq - m * m) * col("n") / (col("n") - 1)
    val z = round((col(valueCol) - m) / sqrt(variance), 4)
    events
      .join(broadcast(stats), typeCol)
      .withColumn("z", z)
      .filter(abs(col("z")) >= threshold)
      .select(col(idCol), col(typeCol), col(valueCol), col("z"))
  }

  /** Robust per-group anomalies via the modified z-score (Iglewicz &
    * Hoaglin 1993): mz = 0.6745·(x − median)/MAD with
    * MAD = median(|x − median|). The outlier-resistant sibling of
    * [[zscoreAnomalies]] — one extreme value inflates a standard
    * deviation enough to hide itself (masking), but moves a median by
    * at most one rank, so MAD flags exactly the rows the mean-based
    * score conceals. Default threshold 3.5 per the source.
    *
    * Plan: two grouped EXACT percentile aggregates (the
    * `agg_percentiles` cross-engine contract: Spark `percentile` ≡
    * DuckDB `quantile_cont`) with the type-vocabulary-sized stats
    * broadcast back between them; the corpus shuffles map-side partial
    * aggregates only. Zero-MAD groups (≥half the group at the median —
    * e.g. constant values) are excluded by the same guard discipline
    * as z-score: Spark's NULL-on-/0 vs DuckDB's NaN would otherwise
    * diverge, so both sides filter mad > 0 explicitly.
    */
  def madAnomalies(
      events: DataFrame, typeCol: String = "event_type",
      idCol: String = "event_id", valueCol: String = "value",
      threshold: Double = 3.5): DataFrame = {
    val med = events.groupBy(col(typeCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .drop("n")
    val mad = events.join(broadcast(med), typeCol)
      .groupBy(col(typeCol), col("med"))
      .agg(expr(s"percentile(abs($valueCol - med), 0.5)").as("mad"))
      .filter(col("mad") > 0)
    events.join(broadcast(mad), typeCol)
      .withColumn("mz",
        round(lit(0.6745) * (col(valueCol) - col("med")) / col("mad"), 4))
      .filter(abs(col("mz")) >= threshold)
      .select(col(idCol), col(typeCol), col(valueCol), col("mz"))
  }

  /** Trimmed per-group statistics: mean/count over the values inside
    * the exact [p_lo, p_hi] percentile band — the robust location
    * estimate a metrics dashboard shows when the raw mean is hostage
    * to a handful of extremes (the read-side companion to
    * [[madAnomalies]]'s flag-side view). Exact percentiles under the
    * `agg_percentiles` cross-engine contract; two grouped aggregates
    * with the type-vocabulary-sized bounds broadcast between them;
    * the trimmed mean sums EXACT 2-dp decimals before the one double
    * division (the money-column discipline — order-independent).
    */
  def trimmedStats(
      events: DataFrame, typeCol: String = "event_type",
      valueCol: String = "value",
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    val bounds = events.groupBy(col(typeCol))
      .agg(expr(s"percentile($valueCol, $pLo)").as("lo"),
        expr(s"percentile($valueCol, $pHi)").as("hi"),
        count(lit(1)).as("n_all"))
    events.join(broadcast(bounds), typeCol)
      .filter(col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))
      .groupBy(col(typeCol), col("lo"), col("hi"), col("n_all"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col(valueCol).cast("decimal(18,2)")).as("s"))
      .select(col(typeCol),
        Numerics.roundz(col("lo"), 4).as("lo"),
        Numerics.roundz(col("hi"), 4).as("hi"),
        col("n_all"), col("n_kept"),
        Numerics.roundz(col("s").cast("double") / col("n_kept"), 4)
          .as("trimmed_mean"))
  }

  /** Exponentially time-decayed per-user value sum — the feature-store
    * recency aggregate ("recent activity counts more"): each event
    * weighs 2^−⌊age_days/halfLifeDays⌋, age measured in calendar days
    * back from the corpus max timestamp, exponent capped at
    * `maxHalfLives` (beyond 20 half-lives the weight is < 1e-6 —
    * contract-zeroed rather than summed as float dust).
    *
    * EXACT integer algebra (the PageRank fixed-point discipline):
    * weights are powers of two, so each term is
    * cents · 2^(cap − e) — an exact long shift — and the per-user sum
    * is order-independent integer arithmetic; ONE double division by
    * 2^cap·100 at the end. That is what makes an exponential-decay
    * aggregate cross-engine hashable at all (a float `exp` sum never
    * is). One map-side-combined aggregate; the reference timestamp is
    * a broadcast 1-row cross join.
    */
  def decayedSum(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      halfLifeDays: Int = 7, maxHalfLives: Int = 20): DataFrame = {
    require(halfLifeDays >= 1 && maxHalfLives >= 1 && maxHalfLives <= 60,
      s"bad decay config ($halfLifeDays, $maxHalfLives)")
    val ref = events.agg(max(col(tsCol)).as("_ref"))
    val denom = math.pow(2.0, maxHalfLives) * 100.0
    events.crossJoin(broadcast(ref))
      .withColumn("_age", datediff(to_date(col("_ref")), to_date(col(tsCol))))
      .withColumn("_hl",
        least(expr(s"_age div $halfLifeDays"), lit(maxHalfLives)).cast("int"))
      .withColumn("_cents",
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("_fp",
        col("_cents") *
          expr(s"shiftleft(CAST(1 AS BIGINT), $maxHalfLives - _hl)"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("_fp")).as("decayed_fp"))
      .select(col(userCol), col("n_events"), col("decayed_fp"),
        Numerics.roundz(col("decayed_fp").cast("double") / lit(denom), 6)
          .as("decayed"))
  }

  /** Time-grid gap fill with last-observation-carried-forward: resample
    * each key's event stream onto a daily grid spanning [first, last]
    * event day and forward-fill the value — the standard alignment
    * step before any cross-series computation (regular-interval
    * features, downstream joins on day). Per day the observed value is
    * the key's LAST event that day (ts desc, tie desc — deterministic
    * under same-timestamp streams); grid days with no event carry the
    * previous day's value with `filled = true`.
    *
    * Scale shape: the grid explodes to |keys|·|days| rows — the
    * OUTPUT size, so nothing is amplified beyond what the caller asked
    * for; per-key windows (day pick, then LOCF) ride one hash
    * partitioning on the key, and values stay exact decimals end to
    * end (LOCF copies, never recomputes).
    */
  def gapFillLocf(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    val day = to_date(col(tsCol))
    val pick = Window.partitionBy(col(keyCol), day)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val daily = events
      .withColumn("_rn", row_number().over(pick))
      .filter(col("_rn") === 1)
      .select(col(keyCol), day.as("day"),
        col(valueCol).cast(DecimalType(18, 4)).as("_obs"))
    val grid = events
      .groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("_d0"),
        max(to_date(col(tsCol))).as("_d1"))
      .select(col(keyCol),
        explode(sequence(col("_d0"), col("_d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
    val locf = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq(keyCol, "day"), "left_outer")
      .withColumn("value",
        last(col("_obs"), ignoreNulls = true).over(locf).cast("double"))
      .withColumn("filled", col("_obs").isNull)
      .drop("_obs")
  }

  /** One-sided CUSUM drift detection in exact integer fixed-point:
    * per key, over the (ts, tie) event order, the classic recursion
    * s_i = max(0, s_{i−1} + (y_i − target − slack)) — target = the
    * key's FIRST observed value (drift is measured against where the
    * series started), slack k and threshold h in the same
    * ten-thousandths fixed point. The recursion is NOT a window
    * primitive, but the prefix identity
    *
    *   s_i = P_i − min(0, min_{j≤i} P_j),   P = running Σ(y−target−k)
    *
    * turns it into two cumulative windows over one key partitioning —
    * no iteration, no UDAF, exact longs an oracle replays. Emits every
    * event with its CUSUM statistic and the drift flag (s > h).
    */
  def cusumDrift(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      tieCol: String = "event_id",
      slackFp: Long = 50000L, thresholdFp: Long = 500000L): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("_y",
        (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long"))
      .withColumn("_target", first(col("_y")).over(cum))
      .withColumn("_p",
        sum(col("_y") - col("_target") - lit(slackFp)).over(cum))
      .withColumn("_pmin", least(lit(0L), min(col("_p")).over(cum)))
      .select(col(keyCol), col(tieCol), col("_y").as("value_fp"),
        (col("_p") - col("_pmin")).as("cusum_fp"),
        (col("_p") - col("_pmin") > thresholdFp).as("drift"))
  }

  /** Grouped OLS trend: per-key least-squares slope and intercept of
    * value over time, in EXACT integer fixed-point end to end. Time is
    * CENTERED per group — x = whole seconds since the group's first
    * event (`(µs − t0µs) div 1e6`, floor division on non-negatives, so
    * every engine truncates identically) — because raw epoch seconds
    * squared would overflow any fixed-width accumulator; y is the
    * value in ten-thousandths (long). The per-group moment sums
    * (Σx, Σy, Σxy, Σx²) are plain longs; the closed forms
    *
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) / 10⁴
    *   intercept = (Σx²·Σy − Σx·Σxy) / (n·Σx² − (Σx)²) / 10⁴
    *
    * combine them in DECIMAL(38,0) (the only place products can pass
    * 2⁶³) and divide ONCE in double at the surface (round 6) — a
    * DuckDB oracle replays this hash-for-hash via HUGEINT. Two
    * aggregates over the same key partitioning (t0, then moments) —
    * one corpus shuffle, exchange reused; zero-time-variance groups
    * yield null, not NaN.
    */
  def olsTrend(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val t0 = events.groupBy(col(keyCol))
      .agg(min(unix_micros(col(tsCol))).as("_t0"))
    val d = DecimalType(38, 0)
    val m = events
      .join(t0, keyCol)
      .withColumn("_x", expr(s"(unix_micros($tsCol) - _t0) div 1000000"))
      .withColumn("_y",
        (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
        sum(col("_x") * col("_y")).as("sxy"),
        sum(col("_x") * col("_x")).as("sxx"))
    def dd(c: Column) = c.cast(d)
    val den = dd(col("n")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))
    m.select(col(keyCol), col("n").as("n_events"),
        when(den =!= 0,
          Numerics.roundz((dd(col("n")) * dd(col("sxy")) -
            dd(col("sx")) * dd(col("sy"))).cast("double") /
            (den.cast("double") * 10000d), 6)).as("slope"),
        when(den =!= 0,
          Numerics.roundz((dd(col("sxx")) * dd(col("sy")) -
            dd(col("sx")) * dd(col("sxy"))).cast("double") /
            (den.cast("double") * 10000d), 6)).as("intercept"))
  }

  /** Rolling distinct actives — the trailing-N-day distinct-key count
    * per calendar day (rolling DAU/WAU/MAU): each (day, key) distinct
    * pair is exploded to the N window-end days it contributes to,
    * then counted distinct per day. Exact, and the explode factor is
    * the window LENGTH (not the corpus): cost is |distinct day-key|·N.
    * Days with no events emit nothing (semi-join against observed
    * days keeps phantom trailing days out). At 100 TB with long
    * windows, swap the exact countDistinct for the gated HLL merge
    * ([[HyperLogLog]]) — the explode shape is unchanged.
    */
  def rollingDistinct(
      events: DataFrame, tsCol: String, keyCol: String,
      days: Int): DataFrame = {
    require(days > 0, s"days must be positive, got $days")
    val de = events
      .select(to_date(col(tsCol)).as("_d"), col(keyCol).as("_k"))
      .distinct()
    val observed = de.select(col("_d").as("day")).distinct()
    de.select(explode(sequence(col("_d"),
          date_add(col("_d"), days - 1))).as("day"), col("_k"))
      .join(observed, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("_k")).as("active"))
  }

  /** Sweep-line maximum concurrency per group — "how many sessions /
    * jobs / connections were open at once": each CLOSED interval
    * contributes +1 at its start and −1 at its end; the running sum's
    * maximum is the peak. Boundary ties order +1 before −1 (an
    * interval ending exactly when another starts overlaps it — the
    * closed-interval contract), and permuting identical (t, Δ) rows
    * cannot change the prefix-sum multiset, so the max is
    * deterministic.
    *
    * The cumulative window partitions by the group (day, tenant, …) —
    * fan-out is the per-group interval count, never one global sort.
    * Output: (group, n_intervals, max_concurrent).
    */
  /** Pettitt changepoint test per key — the rank-based (distribution
    * -free) "did this series shift, and when" readout for metric
    * streams where a mean-shift CUSUM ([[cusumDrift]]) is fooled by
    * heavy tails. U_t = 2·Σ_{i≤t} r_i − t(n+1) over the series' ranks
    * in TIME order; K = max|U_t| is the statistic, the first argmax is
    * the changepoint, and p ≈ 2·exp(−6K²/(n³+n²)) is the standard
    * approximation.
    *
    * Exact integer path: average ranks for ties are half-integers, so
    * we carry 2r = 2·rank() + ties − 1 (integral) and U_t directly as
    * ΣR2 − t(n+1) — no float ranks, the only double is the final p.
    * Two per-key windows (one over value for ranks, one over time for
    * the prefix sum) share the same hash partition by key — one
    * corpus shuffle; time ties break on the id column so the prefix
    * order is deterministic and the oracle replays it.
    */
  def pettittTest(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val y = (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val wv = Window.partitionBy(col("_k")).orderBy(col("_y"))
    val wt = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_id"))
    val ranked = events
      .select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
        col(idCol).as("_id"), y.as("_y"))
      .withColumn("_ties",
        count(lit(1)).over(Window.partitionBy(col("_k"), col("_y"))))
      .withColumn("_r2",
        lit(2) * rank().over(wv) + col("_ties") - lit(1))
    val u = ranked
      .withColumn("_t", row_number().over(wt))
      .withColumn("_cum", sum(col("_r2"))
        .over(wt.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy(col("_k"))))
      .filter(col("_t") < col("_n"))
      .select(col("_k"), col("_n"), col("_t"),
        (col("_cum") - col("_t") * (col("_n") + 1)).as("_u"))
    u.withColumn("_kmax",
        max(abs(col("_u"))).over(Window.partitionBy(col("_k"))))
      .groupBy(col("_k"))
      .agg(first(col("_n")).as("n"),
        first(col("_kmax")).as("k_stat"),
        min(when(abs(col("_u")) === col("_kmax"), col("_t")))
          .cast("long").as("t_star"))
      .select(col("_k").as(keyCol), col("n"), col("k_stat"),
        col("t_star"),
        Numerics.roundz(
          lit(2.0) * exp(lit(-6.0) * col("k_stat").cast("double") *
            col("k_stat").cast("double") /
            (col("n").cast("double") * col("n").cast("double") *
              col("n").cast("double") +
              col("n").cast("double") * col("n").cast("double"))),
          6).as("p_approx"))
  }

  /** Theil–Sen robust trend per key: the MEDIAN of all pairwise
    * slopes over the trailing `lastK` events — the slope estimate
    * that survives the outliers which drag [[olsTrend]] (29% breakdown
    * point vs 0%). O(K²) pairs per key, so K bounds the blow-up by
    * contract (the standard windowed Theil–Sen move); the pair join is
    * key-equi with an x< filter, so it shuffles once on the key and
    * never goes cross-key.
    *
    * Determinism: x = whole seconds since the key's window start
    * (exact), y = ten-thousandths (long); each slope is ONE double
    * division of exact integers (identical in any engine), equal-x
    * pairs are excluded (vertical), and the median picks the value(s)
    * at fixed rank positions — tie order among equal doubles cannot
    * change the selected values.
    */
  def theilSen(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", lastK: Int = 200): DataFrame = {
    val wRecent = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val recent = events
      .withColumn("_rn", row_number().over(wRecent))
      .filter(col("_rn") <= lastK)
    val t0 = recent.groupBy(col(keyCol))
      .agg(min(unix_micros(col(tsCol))).as("_t0"))
    val b = recent.join(t0, keyCol)
      .select(col(keyCol).as("_k"),
        expr(s"(unix_micros($tsCol) - _t0) div 1000000").as("_x"),
        (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
          .as("_y"))
    val pairs = b.as("a")
      .join(b.select(col("_k"), col("_x").as("_x2"), col("_y").as("_y2"))
        .as("bb"), Seq("_k"))
      .filter(col("_x") < col("_x2"))
      .select(col("_k"),
        ((col("_y2") - col("_y")).cast("double") /
          (col("_x2") - col("_x")).cast("double") / 10000.0).as("_s"))
    val wS = Window.partitionBy(col("_k")).orderBy(col("_s"))
    val ranked = pairs
      .withColumn("_r", row_number().over(wS))
      .withColumn("_c", count(lit(1)).over(Window.partitionBy(col("_k"))))
    ranked
      // integer div, not SQL true-division: the two median positions
      .filter(col("_r") === expr("(_c + 1) div 2") ||
        col("_r") === expr("_c div 2 + 1"))
      .groupBy(col("_k"))
      .agg(first(col("_c")).as("n_pairs"),
        Numerics.roundz(avg(col("_s")), 6).as("sen_slope"))
      .select(col("_k").as(keyCol), col("n_pairs"), col("sen_slope"))
  }

  /** Burstiness index (Goh & Barabási 2008): B = (σ−μ)/(σ+μ) of the
    * inter-event gaps — −1 for a metronome, 0 for Poisson, →1 for
    * extreme bursts; the one-number companion to [[botRegularity]]'s
    * thresholded flag. Same exact moment sums (Σg long, Σg² in
    * DECIMAL(38,0)); σ and the index are the only floats, computed as
    * one fixed chain: σ = √(n·Σg² − (Σg)²)/n, μ = Σg/n.
    */
  def burstiness(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      minGaps: Int = 2): DataFrame = {
    val d38 = DecimalType(38, 0)
    val w = Window.partitionBy(col("_k")).orderBy(col("_ts"), col("_id"))
    val gaps = events
      .select(col(keyCol).as("_k"), unix_micros(col(tsCol)).as("_ts"),
        col(idCol).as("_id"))
      .withColumn("_g", col("_ts") - lag(col("_ts"), 1).over(w))
      .filter(col("_g").isNotNull)
    val m = gaps.groupBy(col("_k"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("_g")).as("_sg"),
        sum(col("_g").cast(d38) * col("_g").cast(d38)).as("_sq"))
      .filter(col("n_gaps") >= minGaps)
    val nD = col("n_gaps").cast("double")
    val sigma = sqrt((col("n_gaps").cast(d38) * col("_sq") -
      col("_sg").cast(d38) * col("_sg").cast(d38)).cast("double")) / nD
    val mu = col("_sg").cast("double") / nD
    m.select(col("_k").as(keyCol), col("n_gaps"),
      when(sigma + mu > 0.0,
        Numerics.roundz((sigma - mu) / (sigma + mu), 6)).as("burstiness"))
  }

  /** Empirical Markov entropy rate — how predictable the behavioral
    * stream is: Ĥ = −Σ_{i,j} (n_ij/N)·ln(n_ij/n_i) over observed
    * transitions (nats/step; 0 = fully deterministic chains). Counts
    * are the exact transition aggregate of [[transitions]]; the only
    * floats are per-cell log terms folded in SORTED (prev, next)
    * order over the type²-bounded frame.
    */
  def markovEntropyRate(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val cells = events
      .withColumn("_nx", lead(col(typeCol), 1).over(w))
      .filter(col("_nx").isNotNull)
      .groupBy(col(typeCol).as("_p"), col("_nx").as("_n"))
      .agg(count(lit(1)).as("_c"))
    val rows = cells
      .withColumn("_rowTot",
        sum(col("_c")).over(Window.partitionBy(col("_p"))))
      .withColumn("_tot",
        sum(col("_c")).over(Window.partitionBy()))
    rows.agg(
      count(lit(1)).as("n_cells"),
      first(col("_tot")).as("n_transitions"),
      Numerics.roundz(
        aggregate(
          array_sort(collect_list(struct(col("_p"), col("_n"),
            col("_c"), col("_rowTot"), col("_tot")))),
          lit(0.0),
          (acc, s) => acc -
            s.getField("_c").cast("double") /
              s.getField("_tot").cast("double") *
              log(s.getField("_c").cast("double") /
                s.getField("_rowTot").cast("double"))),
        6).as("entropy_rate_nats"))
  }

  /** Maximum drawdown per key — the "worst peak-to-trough slide" of
    * the running value sum, the risk readout for any cumulative
    * series (revenue, token budget, quota). ENTIRELY integer: cum is
    * an exact fixed-point prefix sum in (ts, id) order, peak a running
    * max over the same frame, drawdown = peak − cum; the argmax picks
    * the FIRST worst row by the same total order. One key shuffle,
    * two window frames on one sort, no floats anywhere.
    */
  def maxDrawdown(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val y = (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val wt = Window.partitionBy(col("_k")).orderBy(col("_ts"), col("_id"))
    val cum = wt.rowsBetween(Window.unboundedPreceding, 0)
    val rows = events
      .select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
        col(idCol).as("_id"), y.as("_y"))
      .withColumn("_cum", sum(col("_y")).over(cum))
      .withColumn("_peak", max(col("_cum")).over(cum))
      .withColumn("_dd", col("_peak") - col("_cum"))
      .withColumn("_t", row_number().over(wt).cast("long"))
    rows
      .withColumn("_mdd",
        max(col("_dd")).over(Window.partitionBy(col("_k"))))
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("n_events"),
        max(col("_cum")).as("peak_fp"),
        first(col("_mdd")).as("max_drawdown_fp"),
        min(when(col("_dd") === col("_mdd"), col("_t"))).as("trough_at"))
      .select(col("_k").as(keyCol), col("n_events"), col("peak_fp"),
        col("max_drawdown_fp"), col("trough_at"))
  }

  /** Kaplan–Meier survival estimator over user lifetimes — the churn
    * curve: lifetime = days between a user's first and last event;
    * a user whose last activity stops ≥ `censorGapDays` before the
    * corpus horizon is a DEATH, anyone still active near the horizon
    * is right-CENSORED (their lifetime is a lower bound, and KM is
    * exactly the estimator that uses censored rows correctly — they
    * stay in the risk set up to their observed lifetime).
    *
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct death times, with
    * nᵢ = #(lifetime ≥ tᵢ) from the lifetime histogram's reverse
    * cumulative — the corpus collapses to one row per user in one
    * aggregate, then to one row per distinct lifetime. The running
    * product is computed per row by an ORDERED LIST FOLD over the
    * (day-bounded) death-time frame — not a window product — so the
    * float association order is fixed and a DuckDB oracle replays it
    * factor for factor.
    */
  def kaplanMeier(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", censorGapDays: Int = 3): DataFrame = {
    val per = events.groupBy(col(userCol).as("_u"))
      .agg(min(to_date(col(tsCol))).as("_f"),
        max(to_date(col(tsCol))).as("_l"))
    val horizon = per.agg(max(col("_l")).as("_m"))
    val life = per.crossJoin(broadcast(horizon))
      .select(datediff(col("_l"), col("_f")).cast("long").as("_t"),
        (datediff(col("_m"), col("_l")) >= censorGapDays).as("_dead"))
    val hist = life.groupBy(col("_t"))
      .agg(sum(when(col("_dead"), 1L).otherwise(0L)).as("_d"),
        sum(when(col("_dead"), 0L).otherwise(1L)).as("_c"),
        count(lit(1)).as("_m"))
    val w = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = hist
      .withColumn("_below", coalesce(sum(col("_m")).over(w), lit(0L)))
      .withColumn("_tot",
        sum(col("_m")).over(Window.partitionBy()))
      .withColumn("_n", col("_tot") - col("_below"))
      .filter(col("_d") > 0)
      .select(col("_t"), col("_d"), col("_c"), col("_n"))
    val folded = risk.crossJoin(broadcast(risk.agg(
      array_sort(collect_list(struct(col("_t").as("t"), col("_d").as("d"),
        col("_n").as("n")))).as("_all"))))
    folded.select(col("_t").as("lifetime_days"),
        col("_n").as("n_at_risk"), col("_d").as("deaths"),
        col("_c").as("censored"),
        Numerics.roundz(
          aggregate(
            transform(
              filter(col("_all"), x => x.getField("t") <= col("_t")),
              x => lit(1.0) - x.getField("d").cast("double") /
                x.getField("n").cast("double")),
            lit(1.0), (acc, f) => acc * f), 6).as("survival"))
  }

  /** Discrete hazard table — the per-time-step face of
    * [[kaplanMeier]]: h(t) = d_t/n_t, the conditional churn
    * probability at exactly lifetime t given survival so far. Same
    * lifetime histogram and reverse-cumulative risk sets; the hazard
    * is one division of exact integers per death time.
    */
  def hazardTable(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", censorGapDays: Int = 3): DataFrame = {
    val per = events.groupBy(col(userCol).as("_u"))
      .agg(min(to_date(col(tsCol))).as("_f"),
        max(to_date(col(tsCol))).as("_l"))
    val horizon = per.agg(max(col("_l")).as("_m"))
    val life = per.crossJoin(broadcast(horizon))
      .select(datediff(col("_l"), col("_f")).cast("long").as("_t"),
        (datediff(col("_m"), col("_l")) >= censorGapDays).as("_dead"))
    val hist = life.groupBy(col("_t"))
      .agg(sum(when(col("_dead"), 1L).otherwise(0L)).as("_d"),
        count(lit(1)).as("_mm"))
    val w = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("_below", coalesce(sum(col("_mm")).over(w), lit(0L)))
      .withColumn("_tot", sum(col("_mm")).over(Window.partitionBy()))
      .filter(col("_d") > 0)
      .select(col("_t").as("lifetime_days"),
        (col("_tot") - col("_below")).as("n_at_risk"),
        col("_d").as("deaths"),
        Numerics.roundz(col("_d").cast("double") /
          (col("_tot") - col("_below")).cast("double"), 6).as("hazard"))
  }

  /** Value-weighted cohort retention (net revenue retention): for each
    * first-day cohort and day offset, the cohort's value on that day
    * as a fraction of its day-0 value — "do the dollars stick, not
    * just the logins". Exact integer cents per (cohort, offset) cell
    * from one aggregate; the day-0 base joins back cohort-keyed.
    */
  def revenueRetention(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      maxOffset: Int = 14): DataFrame = {
    val y = (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val first = events
      .groupBy(col(userCol).as("_u"))
      .agg(min(to_date(col(tsCol))).as("_c"))
    val cells = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"),
        y.as("_y"))
      .join(first, Seq("_u"))
      .withColumn("_off", datediff(col("_d"), col("_c")))
      .filter(col("_off") <= maxOffset)
      .groupBy(col("_c").as("cohort_day"),
        col("_off").cast("long").as("day_offset"))
      .agg(sum(col("_y")).as("_cents"))
    val base = cells.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("_cents").as("_base"))
    cells.join(base, Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"),
        col("_cents").as("value_fp"),
        when(col("_base") =!= 0,
          Numerics.roundz(col("_cents").cast("double") /
            col("_base").cast("double"), 6)).as("revenue_retention"))
  }

  /** Log-rank test — "do these two cohorts churn differently",
    * the hypothesis-test companion to [[kaplanMeier]] that uses
    * right-censored rows correctly (a naive mean-lifetime comparison
    * is biased by censoring). At each pooled death time t:
    * O₁ accumulates group-1 deaths (exact int), E₁ accumulates
    * d_t·n₁t/n_t and V the hypergeometric variance — both folded in
    * SORTED time order over the day-bounded death-time frame, so the
    * float association is fixed and replayable. χ² = (O₁−E₁)²/V.
    *
    * Risk sets come from one bounded join (users × death-times, times
    * day-bounded) — no per-user windows, no corpus self-join.
    */
  def logRankTest(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", inGroup1: Column,
      censorGapDays: Int = 3): DataFrame = {
    val per = events.groupBy(col(userCol).as("_u"))
      .agg(min(to_date(col(tsCol))).as("_f"),
        max(to_date(col(tsCol))).as("_l"),
        max(when(inGroup1, 1L).otherwise(0L)).as("_g"))
    val horizon = per.agg(max(col("_l")).as("_m"))
    val life = per.crossJoin(broadcast(horizon))
      .select(datediff(col("_l"), col("_f")).cast("long").as("_t"),
        (datediff(col("_m"), col("_l")) >= censorGapDays).as("_dead"),
        col("_g"))
    val times = life.filter(col("_dead"))
      .select(col("_t").as("_dt")).distinct()
    val cells = life.join(broadcast(times), col("_t") >= col("_dt"))
      .groupBy(col("_dt"))
      .agg(count(lit(1)).as("_n"),
        sum(col("_g")).as("_n1"),
        sum(when(col("_dead") && col("_t") === col("_dt"), 1L)
          .otherwise(0L)).as("_d"),
        sum(when(col("_dead") && col("_t") === col("_dt"), col("_g"))
          .otherwise(0L)).as("_d1"))
    val folded = cells.agg(
      count(lit(1)).as("n_death_times"),
      sum(col("_d1")).as("o1"),
      aggregate(
        array_sort(collect_list(struct(col("_dt"), col("_d"), col("_n1"),
          col("_n")))),
        lit(0.0),
        (acc, s) => acc + s.getField("_d").cast("double") *
          s.getField("_n1").cast("double") /
          s.getField("_n").cast("double")).as("_e1"),
      aggregate(
        array_sort(collect_list(struct(col("_dt"), col("_d"), col("_n1"),
          col("_n")))),
        lit(0.0),
        (acc, s) => {
          val n = s.getField("_n").cast("double")
          val n1 = s.getField("_n1").cast("double")
          val d = s.getField("_d").cast("double")
          acc + when(s.getField("_n") > 1,
            d * (n1 / n) * (lit(1.0) - n1 / n) * (n - d) / (n - 1.0))
            .otherwise(lit(0.0))
        }).as("_v"))
    folded.select(col("n_death_times"), col("o1"),
      Numerics.roundz(col("_e1"), 6).as("e1"),
      when(col("_v") > 0.0,
        Numerics.roundz(
          (col("o1").cast("double") - col("_e1")) *
            (col("o1").cast("double") - col("_e1")) / col("_v"), 6))
        .as("chi2"))
  }

  /** Bot / automation regularity detector: real users arrive with
    * bursty inter-event gaps; schedulers tick. Per key this computes
    * the gap count, mean gap, and coefficient of variation — and makes
    * the FLAG DECISION in exact integer arithmetic so it cannot flip
    * across engines: cv < τ (τ = pct/100) ⇔
    * 10⁴·(n·Σg² − (Σg)²) < pct²·(Σg)², evaluated in DECIMAL(38,0).
    * One window for gaps (lag over the key sort), one aggregate; the
    * float cv is display-only.
    */
  def botRegularity(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      cvThresholdPct: Int = 10, minGaps: Int = 5): DataFrame = {
    val d38 = DecimalType(38, 0)
    val w = Window.partitionBy(col("_k")).orderBy(col("_ts"), col("_id"))
    val gaps = events
      .select(col(keyCol).as("_k"), unix_micros(col(tsCol)).as("_ts"),
        col(idCol).as("_id"))
      .withColumn("_g", col("_ts") - lag(col("_ts"), 1).over(w))
      .filter(col("_g").isNotNull)
    val m = gaps.groupBy(col("_k"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("_g")).as("_sg"),
        sum(col("_g").cast(d38) * col("_g").cast(d38)).as("_sq"))
    val n = col("n_gaps").cast(d38)
    val sg = col("_sg").cast(d38)
    val varNum = n * col("_sq") - sg * sg // n²·variance, exact
    m.select(col("_k").as(keyCol), col("n_gaps"),
      Numerics.roundz(col("_sg").cast("double") /
        col("n_gaps").cast("double") / 1000000.0, 6).as("mean_gap_s"),
      when(col("_sg") > 0,
        Numerics.roundz(
          sqrt(varNum.cast("double")) / col("_sg").cast("double"), 6))
        .as("cv"),
      (col("n_gaps") >= minGaps && col("_sg") > 0 &&
        varNum * lit(10000).cast(d38) <
          lit(cvThresholdPct.toLong * cvThresholdPct).cast(d38) * sg * sg)
        .as("is_bot"))
  }

  /** Retention cohort matrix — THE activation/retention readout: users
    * are cohorted by their FIRST active day; for each (cohort_day,
    * day_offset ≤ maxOffset) the matrix holds the distinct users still
    * active, plus the cohort size and the exact-integer-derived rate.
    * Two hash aggregates (user→first day; (cohort, offset)→distinct
    * users) and a cohort-keyed size join — offsets bound the second
    * frame at cohorts×maxOffset regardless of corpus size.
    */
  def retentionCohorts(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", maxOffset: Int = 14): DataFrame = {
    val days = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .distinct()
    val first = days.groupBy(col("_u")).agg(min(col("_d")).as("_c"))
    val sized = first.groupBy(col("_c").as("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    days.join(first, Seq("_u"))
      .withColumn("_off", datediff(col("_d"), col("_c")))
      .filter(col("_off") <= maxOffset)
      .groupBy(col("_c").as("cohort_day"), col("_off").cast("long")
        .as("day_offset"))
      .agg(countDistinct(col("_u")).as("active_users"))
      .join(sized, Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("active_users"),
        col("cohort_size"),
        Numerics.roundz(col("active_users").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** RFM segmentation — recency/frequency/monetary quintiles, the
    * classic behavioral-value grid. Per-user metrics come from ONE
    * hash aggregate (recency = days since the user's last event
    * relative to the corpus max day — a 1-row broadcast); each metric
    * is quintiled under a TOTAL order (metric, user) with the exact
    * SQL-ntile contract (first n mod k tiles get the extra row) so
    * bucket assignment is deterministic and the oracle replays it with
    * plain `ntile(5)`. Output is the 125-bounded segment grid with
    * user counts.
    *
    * Scale shape: all three quintiles batch through ONE
    * [[Ranks.withRanks]] call — range-bucketed parallel ranking, NOT
    * an unpartitioned window (an `ntile(5).over(Window.orderBy(…))`
    * would move every per-user row through ONE task, three times).
    * One shared boundary job, one shared count job, three chained
    * window exchanges; the users-scale metrics frame is materialized
    * once so the bounded jobs scan cached blocks instead of
    * re-aggregating the event corpus.
    */
  def rfmSegments(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    val y = (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val per = events.groupBy(col(userCol).as("_u"))
      .agg(max(to_date(col(tsCol))).as("_last"),
        count(lit(1)).as("_f"), sum(y).as("_m"))
    val maxDay = per.agg(max(col("_last")).as("_maxd"))
    val metrics = per.crossJoin(broadcast(maxDay))
      .select(col("_u"), datediff(col("_maxd"), col("_last")).as("_r"),
        col("_f"), col("_m"))
      .materialized
    val scored = Ranks.withRanks(metrics, Seq(
        Ranks.RankSpec("r_q", col("_r"), ntile = 5),
        Ranks.RankSpec("f_q", col("_f"), descending = true, ntile = 5),
        Ranks.RankSpec("m_q", col("_m"), descending = true, ntile = 5)),
      ties = Seq(col("_u")), buckets = 64)
    scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), min(col("_u")).as("sample_user"))
  }

  /** Wald–Wolfowitz runs test per key — "are this series' ups and
    * downs random or regime-like": signs are taken against the key's
    * exact LOWER MEDIAN (rank (n+1) div 2 — an actual data value, no
    * interpolation), equal-to-median rows drop, runs are counted as
    * 1 + sign changes in time order, and the normal-approximation z
    * over (n₊, n₋, R) is the only float. Two per-key windows (value
    * rank for the median, time order for the change count) plus one
    * median join — all on the same key hash.
    */
  def runsTest(
      events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val y = (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val base = events.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      col(idCol).as("_id"), y.as("_y"))
    val wv = Window.partitionBy(col("_k")).orderBy(col("_y"), col("_id"))
    // median attached via a second window on the SAME key partition —
    // no join back, no second corpus shuffle
    val signed = base
      .withColumn("_rn", row_number().over(wv))
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy(col("_k"))))
      .withColumn("_med",
        max(when(col("_rn") === expr("(_n + 1) div 2"), col("_y")))
          .over(Window.partitionBy(col("_k"))))
      .filter(col("_y") =!= col("_med"))
      .withColumn("_s", when(col("_y") > col("_med"), 1).otherwise(-1))
    val wt = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_id"))
    val agg = signed
      .withColumn("_chg",
        when(lag(col("_s"), 1).over(wt).isNull, 0L)
          .when(lag(col("_s"), 1).over(wt) =!= col("_s"), 1L)
          .otherwise(0L))
      .groupBy(col("_k"))
      .agg(sum(when(col("_s") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("_s") === -1, 1L).otherwise(0L)).as("n_neg"),
        (sum(col("_chg")) + 1L).as("runs"))
    val n1 = col("n_pos").cast("double")
    val n2 = col("n_neg").cast("double")
    val nn = n1 + n2
    val mu = lit(2.0) * n1 * n2 / nn + 1.0
    val vr = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2) /
      (nn * nn * (nn - 1.0))
    agg.select(col("_k").as(keyCol), col("n_pos"), col("n_neg"),
      col("runs"),
      when(col("n_pos") > 0 && col("n_neg") > 0 &&
          col("n_pos") + col("n_neg") > 1,
        Numerics.roundz((col("runs").cast("double") - mu) / sqrt(vr), 6))
        .as("z"))
  }

  /** Exact conversion-lag quantiles: the p50/p90 of the gap between a
    * conversion event and its most recent prior trigger (per-pair
    * backward as-of), reported in EXACT microseconds — the quantile
    * pick is the value at rank ⌈q·n⌉ (an actual observed gap, all
    * integer, nothing to round). The as-of is the one-union-window
    * shape of [[AsOfJoin.asOf]]; the global rank comes from
    * [[Ranks.withGlobalRank]] — the matched-conversion frame scales
    * WITH the corpus, so an unpartitioned `row_number` window (one
    * task holding every conversion) is exactly the shape this repo
    * bans; the gap frame is materialized once for the bounded
    * boundary/count passes. The value at a rank is well-defined under
    * gap ties (every tie order yields the same picked value), so no
    * tiebreak column is needed.
    */
  def conversionLagQuantiles(
      events: DataFrame, fromType: String, toType: String,
      typeCol: String = "event_type", keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    val gaps = AsOfJoin.asOfTolerance(
        left = events.filter(col(typeCol) === toType)
          .select(col(keyCol), col(tsCol), col(idCol)),
        right = events.filter(col(typeCol) === fromType)
          .select(col(keyCol), col(tsCol), col(idCol)),
        keyCol = keyCol, tsCol = tsCol, rightValueCol = idCol,
        toleranceSeconds = 320L * 1000000L) // effectively unbounded
      .filter(col("asof_gap_us").isNotNull)
      .select(col("asof_gap_us").as("_g"))
      .materialized
    val total = gaps.agg(count(lit(1)).as("_n"))
    Ranks.withGlobalRank(gaps, "_rn", col("_g"))
      .crossJoin(broadcast(total))
      .filter(col("_rn") === expr("(_n + 1) div 2") ||
        col("_rn") === expr("(9 * _n + 9) div 10"))
      .agg(first(col("_n")).as("n_conversions"),
        min(col("_g")).as("p50_us"), max(col("_g")).as("p90_us"))
  }

  /** Frequent consecutive event-type TRIPLES per corpus — the 3-gram
    * extension of the transition matrix: which three-step behavioral
    * motifs dominate. One per-user ordered window (two leads), one
    * type³-bounded hash aggregate; top rows by exact count with a
    * lexicographic tie-break so the cut is total and replayable.
    */
  def frequentTriples(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type", top: Int = 20): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val tri = events
      .withColumn("_t2", lead(col(typeCol), 1).over(w))
      .withColumn("_t3", lead(col(typeCol), 2).over(w))
      .filter(col("_t2").isNotNull && col("_t3").isNotNull)
      .groupBy(col(typeCol).as("t1"), col("_t2").as("t2"),
        col("_t3").as("t3"))
      .agg(count(lit(1)).as("n"))
    tri.withColumn("_r", row_number().over(Window.orderBy(
        col("n").desc, col("t1"), col("t2"), col("t3"))))
      .filter(col("_r") <= top)
      .select(col("t1"), col("t2"), col("t3"), col("n"),
        col("_r").cast("long").as("rank"))
  }

  /** Rolling 7-point Pearson correlation between the daily event
    * COUNT and the daily value SUM — "does volume still track value"
    * as a drifting-relationship monitor. The corpus collapses to one
    * row per observed day in a single hash aggregate; the trailing
    * window then runs over that day-bounded frame. All window moments
    * (Σx, Σy, Σxy, Σx², Σy²) are exact — products go through
    * DECIMAL(38,0) because squared daily cent-sums pass 2⁶³ — and the
    * correlation is one double chain over them, emitted only for full
    * windows.
    */
  def rollingCorrDaily(
      events: DataFrame, tsCol: String = "ts",
      valueCol: String = "value", window: Int = 7): DataFrame = {
    require(window > 1, s"window must be >1, got $window")
    val d38 = DecimalType(38, 0)
    val y = (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("_x"), sum(y).as("_y"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(-(window - 1), 0)
    val nD = lit(window).cast("double")
    val sx = sum(col("_x")).over(w).cast("double")
    val sy = sum(col("_y").cast(d38)).over(w).cast("double")
    // cast BEFORE multiplying: long·long wraps silently at 2⁶³ while
    // decimal·decimal widens (the ARI lesson from the eval family)
    val sxy = sum(col("_x").cast(d38) * col("_y").cast(d38)).over(w)
      .cast("double")
    val sxx = sum(col("_x").cast(d38) * col("_x").cast(d38)).over(w)
      .cast("double")
    val syy = sum((col("_y").cast(d38) * col("_y").cast(d38))).over(w)
      .cast("double")
    daily
      .withColumn("_cnt", count(lit(1)).over(w))
      .withColumn("_r",
        (nD * sxy - sx * sy) /
          sqrt((nD * sxx - sx * sx) * (nD * syy - sy * sy)))
      .filter(col("_cnt") === window)
      .select(col("day"), col("_x").as("n_events"),
        Numerics.roundz(col("_r"), 6).as("roll_corr"))
  }

  /** Classical seasonal decomposition of the daily value-sum series:
    * trend = centered 7-day moving average, seasonal = per-day-of-week
    * mean of the detrended series, residual = value − trend −
    * seasonal. The fixed-point contract keeps the whole thing exact
    * until the surface: daily totals are integer cents, the 7-day
    * window SUM s7 is an integer, the detrended value is carried as
    * 7·c − s7 (integer — no division inside the aggregate), and the
    * per-dow seasonal mean divides two exact integers once. Emitted
    * only for days with a full centered window.
    *
    * Scale shape: one corpus hash aggregate to days, then windows and
    * a dow-keyed (≤7-row) aggregate over the day-bounded frame.
    */
  def seasonalDecompose(
      events: DataFrame, tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val y = (col(valueCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(y).as("_c"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val centered = daily
      .withColumn("_s7", sum(col("_c")).over(w))
      .withColumn("_w7", count(lit(1)).over(w))
      .filter(col("_w7") === 7)
      .withColumn("_detr7", lit(7) * col("_c") - col("_s7"))
      .withColumn("_dow", dayofweek(col("day")))
    val seasonal = centered.groupBy(col("_dow"))
      .agg(sum(col("_detr7")).as("_sd"), count(lit(1)).as("_nd"))
      .select(col("_dow"),
        (col("_sd").cast("double") /
          (lit(7.0) * col("_nd").cast("double"))).as("_seas"))
    centered.join(broadcast(seasonal), Seq("_dow"))
      .select(col("day"),
        Numerics.roundz(col("_c").cast("double") / 10000.0, 4)
          .as("value"),
        Numerics.roundz(col("_s7").cast("double") / 7.0 / 10000.0, 6)
          .as("trend"),
        Numerics.roundz(col("_seas") / 10000.0, 6).as("seasonal"),
        Numerics.roundz(
          (col("_c").cast("double") -
            col("_s7").cast("double") / 7.0 - col("_seas")) / 10000.0,
          6).as("residual"))
  }

  def maxConcurrency(
      intervals: DataFrame, startCol: String, endCol: String,
      grpCol: String): DataFrame = {
    val deltas = intervals
      .select(col(grpCol).as("_g"), col(startCol).as("_t"), lit(1L).as("_d"))
      .unionByName(intervals
        .select(col(grpCol).as("_g"), col(endCol).as("_t"),
          lit(-1L).as("_d")))
    val w = Window.partitionBy(col("_g"))
      .orderBy(col("_t"), col("_d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counts = intervals.groupBy(col(grpCol).as("_g"))
      .agg(count(lit(1)).as("n_intervals"))
    deltas.withColumn("_c", sum(col("_d")).over(w))
      .groupBy(col("_g"))
      .agg(max(col("_c")).as("max_concurrent"))
      .join(counts, Seq("_g"))
      .select(col("_g").as(grpCol), col("n_intervals"),
        col("max_concurrent"))
  }

  /** Per-key union coverage: total length covered by the key's
    * intervals counting overlaps once — [[mergeIntervals]] then one
    * sum of exact island lengths. The utilization readout beside
    * [[maxConcurrency]] (peak) and the island list (shape): "how many
    * seconds of this user's day were inside at least one session".
    * Same single shuffle as the merge (hash by key for the island
    * window); the sums are map-side-combined longs.
    */
  def intervalCoverage(
      intervals: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame =
    mergeIntervals(intervals, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col(endCol) - col(startCol)).as("covered"))

  /** Renormalized finite-window EWMA: each key's smoothed level over
    * its most recent `k` values, weights β^0..β^(k−1) newest-first,
    * divided by the realized weight mass (so short histories are
    * unbiased). The online-feature shape ("user's recent spend
    * level") computed batch-side.
    *
    * Determinism contract: β must be a dyadic rational (default 3/4)
    * so the weight chain w·β is EXACT at every step (3^j·2^-2j has an
    * exact double for j < 20) and Σw is exact under any summation
    * order; the value-weighted sum is the only rounding chain, and it
    * folds in rank order (sorted collect over ≤ k rows per key) so
    * the oracle replays it with `list_sum(list(… ORDER BY rn))`.
    * Scale: one hash shuffle by key, per-key state ≤ k rows; the
    * rank filter prunes everything older before the fold.
    */
  def ewmaLast(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, beta: Double = 0.75, k: Int = 20): DataFrame = {
    require(k >= 1 && k <= 64, s"window k=$k out of range")
    // exact repeated multiply — NOT pow(), whose last ulp may differ
    // across engines; the oracle builds the same chain recursively
    val weights = Array.iterate(1.0, k)(_ * beta)
    val wExpr = element_at(array(weights.map(lit): _*), col("_rn"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .withColumn("_term", col(valueCol) * wExpr)
      .withColumn("_w", wExpr)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_used"),
        aggregate(
          array_sort(collect_list(struct(col("_rn"), col("_term")))),
          lit(0.0),
          (acc, s) => acc + s.getField("_term")).as("_s"),
        sum(col("_w")).as("_wsum"))
      .select(col(keyCol), col("n_used"),
        Numerics.roundz(col("_s") / col("_wsum"), 6).as("ewma"))
  }

  /** Day-of-week seasonality profile: per weekday (0 = Sunday), the
    * event count, the number of observed calendar days, and the
    * seasonal index — that weekday's mean daily volume relative to
    * the overall mean, as the exact integer ratio
    * (n_dow·D_total)/(d_dow·N_total). The load-shaping readout
    * [[acf]] detects and this one localizes. One hash aggregate over
    * the stream (map-side combined, 7-row result).
    */
  def dowSeasonality(events: DataFrame, tsCol: String): DataFrame = {
    val d = events.select(
      (dayofweek(col(tsCol)) - 1).cast("long").as("dow"),
      to_date(col(tsCol)).as("_day"))
    val per = d.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("_day")).as("n_days"))
    val tot = per.agg(sum(col("n_events")).as("_N"),
      sum(col("n_days")).as("_D"))
    per.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_events"), col("n_days"),
        Numerics.roundz((col("n_events") * col("_D")).cast("double") /
          (col("n_days") * col("_N")).cast("double"), 6)
          .as("seasonal_index"))
      .orderBy("dow")
  }

  /** Sample autocorrelation of an integer series at lags 1..maxLag —
    * the seasonality/persistence readout over a per-day aggregate
    * stream. `series` must carry a dense integer index `idxCol`
    * (1..n) and an integral `valueCol`.
    *
    * The standard estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²
    * is computed in expanded form scaled by n², which makes every
    * term an exact integer:
    *
    *   num·n² = n²·Σ x_t·x_{t+k} − n·S·(Σhead + Σtail) + (n−k)·S²
    *   den·n² = n²·Q − n·S²        (S = Σx, Q = Σx²)
    *
    * so the only double op is the final division. The series is an
    * AGGREGATE (one row per day/window) — node-scale, so the per-lag
    * self-join is a broadcast join at any corpus size; the corpus
    * exchange happened upstream in the groupBy that built the series.
    */
  def acf(
      series: DataFrame, idxCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    val x = series.select(col(idxCol).as("_t"),
      col(valueCol).cast("long").as("_x"))
    val totals = x.agg(count(lit(1)).as("_n"), sum(col("_x")).as("_S"),
      sum(col("_x") * col("_x")).as("_Q"))
    val lags = series.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    val pairs = lags.crossJoin(x.as("a"))
      .join(x.as("b"), col("b._t") === col("a._t") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a._x") * col("b._x")).as("_P"),
        sum(col("a._x")).as("_h"), sum(col("b._x")).as("_tl"))
    val num = (col("_n") * col("_n") * col("_P") -
      col("_n") * col("_S") * (col("_h") + col("_tl")) +
      (col("_n") - col("lag")) * col("_S") * col("_S"))
    val den = (col("_n") * col("_n") * col("_Q") -
      col("_n") * col("_S") * col("_S"))
    pairs.crossJoin(broadcast(totals))
      .select(col("lag"), col("n_pairs"),
        // a constant series has zero variance: acf is undefined ->
        // explicit null (ANSI division would raise on the 0 denominator)
        when(den === 0, lit(null).cast("double"))
          .otherwise(Numerics.roundz(
            num.cast("double") / den.cast("double"), 6))
          .as("acf"))
      .orderBy("lag")
  }

  /** Partial autocorrelation at lags 1..3 via the Durbin–Levinson
    * closed forms — "is the lag-2 correlation real or just lag-1
    * echoing twice", the AR-order readout next to [[acf]]. Built ON
    * TOP of the ROUNDED acf surface (both engines agree on those
    * doubles bit-for-bit, so every downstream chain is deterministic
    * by construction):
    *
    *   φ11 = r1
    *   φ22 = (r2 − r1²)/(1 − r1²),  φ21 = r1·(1 − φ22)
    *   φ33 = (r3 − φ21·r2 − φ22·r1)/(1 − φ21·r1 − φ22·r2)
    *
    * One 3-row pivot over the acf frame; nulls (constant series)
    * propagate.
    */
  def pacf(
      series: DataFrame, idxCol: String, valueCol: String): DataFrame = {
    val r = acf(series, idxCol, valueCol, maxLag = 3)
      .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
        max(when(col("lag") === 2, col("acf"))).as("r2"),
        max(when(col("lag") === 3, col("acf"))).as("r3"))
    val r1 = col("r1")
    val r2 = col("r2")
    val r3 = col("r3")
    val p22 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
    val p21 = r1 * (lit(1.0) - p22)
    r.select(r1, r2, r3,
      Numerics.roundz(r1, 6).as("pacf1"),
      Numerics.roundz(p22, 6).as("pacf2"),
      Numerics.roundz(
        (r3 - p21 * r2 - p22 * r1) /
          (lit(1.0) - p21 * r1 - p22 * r2), 6).as("pacf3"))
  }
}
