package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Time-series feature gates (round 10): renormalized EWMA levels,
  * autocorrelation of a per-day aggregate stream, and interval union
  * coverage — the per-key temporal features an online store would
  * serve, computed batch-side with the engine's exact-arithmetic
  * contracts.
  */
object SeriesQueries extends QueryGroup {

  /** Per-user EWMA of the last-20 event values
    * ([[graft.operators.EventSequences.ewmaLast]]): β=3/4 dyadic so
    * the weight chain is exact, value-weighted sum folded in rank
    * order, renormalized by the realized weight mass.
    */
  val ewma: QueryDef = QueryDef(
    "events_ewma",
    (s, dir) =>
      graft.operators.EventSequences.ewmaLast(
          Tables(s, dir).events, "user_id", "ts", "event_id", "value")
        .orderBy("user_id"),
    Some(
      """WITH RECURSIVE wts(j, w) AS (
        |  SELECT 0, CAST(1.0 AS DOUBLE)
        |  UNION ALL SELECT j + 1, w * 0.75 FROM wts WHERE j + 1 < 20),
        |r AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |f AS (SELECT user_id, value, rn FROM r WHERE rn <= 20),
        |t AS (SELECT user_id, rn, value * w AS term, w
        |  FROM f JOIN wts ON wts.j = rn - 1)
        |SELECT user_id, count(*)::BIGINT AS n_used,
        |  round(list_sum(list(term ORDER BY rn)) / sum(w), 6) + 0 AS ewma
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Autocorrelation of the daily event-count series at lags 1..5
    * ([[graft.operators.EventSequences.acf]]): dense day index over
    * observed days, all-integer expanded estimator, one double
    * division per lag.
    */
  val acfGate: QueryDef = QueryDef(
    "events_acf",
    (s, dir) => {
      val daily = Tables(s, dir).events
        .groupBy(to_date(col("ts")).as("_day"))
        .agg(count(lit(1)).as("_x"))
        .withColumn("_t", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("_day"))))
      graft.operators.EventSequences.acf(daily, "_t", "_x", maxLag = 5)
    },
    Some(
      """WITH d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x
        |    FROM events GROUP BY 1),
        |s AS (SELECT x, row_number() OVER (ORDER BY day) AS t FROM d),
        |tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(x * x)::BIGINT AS q FROM s),
        |lg AS (SELECT unnest(range(1, 6)) AS lag),
        |p AS (SELECT lag, count(*)::BIGINT AS n_pairs,
        |    sum(a.x * b.x)::BIGINT AS pp, sum(a.x)::BIGINT AS h,
        |    sum(b.x)::BIGINT AS tl
        |  FROM lg CROSS JOIN s a JOIN s b ON b.t = a.t + lg.lag
        |  GROUP BY lag)
        |SELECT lag, n_pairs,
        |  round((n * n * pp - n * sx * (h + tl) + (n - lag) * sx * sx)
        |      ::DOUBLE /
        |    (n * n * q - n * sx * sx)::DOUBLE, 6) + 0 AS acf
        |FROM p CROSS JOIN tot ORDER BY lag""".stripMargin))

  /** Per-user session-union coverage
    * ([[graft.operators.EventSequences.intervalCoverage]]): the same
    * exact epoch-micros spans as `events_interval_merge`, islands
    * merged then summed — seconds inside at least one session.
    */
  val coverage: QueryDef = QueryDef(
    "events_interval_coverage",
    (s, dir) => {
      val iv = Tables(s, dir).events.select(
        col("user_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts")) +
          (col("value").cast("decimal(18,2)") * lit(600000000L))
            .cast("long")).as("end_us"))
      graft.operators.EventSequences.intervalCoverage(
          iv, "user_id", "start_us", "end_us")
        .orderBy("user_id")
    },
    Some(
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS start_us,
        |             epoch_us(ts) + (CAST(value AS DECIMAL(18,2)) * 600000000)::BIGINT AS end_us
        |           FROM events),
        |x AS (SELECT user_id, start_us, end_us,
        |        max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM iv),
        |y AS (SELECT user_id, start_us, end_us,
        |        CASE WHEN pm IS NULL OR start_us > pm THEN 1 ELSE 0 END AS ni
        |      FROM x),
        |z AS (SELECT user_id, start_us, end_us,
        |        sum(ni) OVER (PARTITION BY user_id ORDER BY start_us, end_us
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |      FROM y),
        |isl AS (SELECT user_id, min(start_us) AS s, max(end_us) AS e
        |        FROM z GROUP BY user_id, island)
        |SELECT user_id, count(*)::BIGINT AS n_islands,
        |  sum(e - s)::BIGINT AS covered
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Day-of-week seasonality
    * ([[graft.operators.EventSequences.dowSeasonality]]): per-weekday
    * volume and the exact integer-ratio seasonal index; dow numbering
    * aligned to Sunday=0 on both engines.
    */
  val dow: QueryDef = QueryDef(
    "events_dow_seasonality",
    (s, dir) =>
      graft.operators.EventSequences.dowSeasonality(
        Tables(s, dir).events, "ts"),
    Some(
      """WITH d AS (SELECT dayofweek(ts)::BIGINT AS dow, ts::DATE AS day
        |    FROM events),
        |p AS (SELECT dow, count(*)::BIGINT AS n_events,
        |    count(DISTINCT day)::BIGINT AS n_days FROM d GROUP BY dow),
        |t AS (SELECT sum(n_events)::BIGINT AS nn,
        |    sum(n_days)::BIGINT AS dd FROM p)
        |SELECT dow, n_events, n_days,
        |  round((n_events * dd)::DOUBLE / (n_days * nn)::DOUBLE, 6) + 0
        |    AS seasonal_index
        |FROM p CROSS JOIN t ORDER BY dow""".stripMargin))

  /** Pettitt rank changepoint per user
    * ([[graft.operators.EventSequences.pettittTest]]): U_t carried as
    * exact integers via doubled ranks, K/t* integral, p the only
    * float.
    */
  val pettitt: QueryDef = QueryDef(
    "events_pettitt_change",
    (s, dir) =>
      graft.operators.EventSequences.pettittTest(Tables(s, dir).events)
        .orderBy("user_id"),
    Some(
      """WITH v AS (SELECT user_id AS k, ts, event_id AS id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
        |  FROM events),
        |r AS (SELECT k, ts, id,
        |    count(*) OVER (PARTITION BY k, y) AS ties,
        |    rank() OVER (PARTITION BY k ORDER BY y) AS rk
        |  FROM v),
        |u AS (SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, id) AS t,
        |    count(*) OVER (PARTITION BY k) AS n,
        |    sum(2 * rk + ties - 1) OVER (PARTITION BY k
        |      ORDER BY ts, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM r),
        |uu AS (SELECT k, n, t, cum - t * (n + 1) AS u
        |  FROM u WHERE t < n),
        |uw AS (SELECT *, max(abs(u)) OVER (PARTITION BY k) AS kmax
        |  FROM uu),
        |agg AS (SELECT k, any_value(n)::BIGINT AS n,
        |    any_value(kmax)::BIGINT AS k_stat,
        |    min(CASE WHEN abs(u) = kmax THEN t END)::BIGINT AS t_star
        |  FROM uw GROUP BY k)
        |SELECT k AS user_id, n, k_stat, t_star,
        |  round(2.0 * exp(-6.0 * k_stat::DOUBLE * k_stat::DOUBLE /
        |    (n::DOUBLE * n::DOUBLE * n::DOUBLE
        |      + n::DOUBLE * n::DOUBLE)), 6) + 0 AS p_approx
        |FROM agg ORDER BY user_id""".stripMargin))

  /** Rolling 7-day count↔value-sum Pearson correlation
    * ([[graft.operators.EventSequences.rollingCorrDaily]]): day-frame
    * window over exact decimal moments, full windows only.
    */
  val rollingCorr: QueryDef = QueryDef(
    "events_rolling_corr",
    (s, dir) =>
      graft.operators.EventSequences.rollingCorrDaily(
          Tables(s, dir).events)
        .orderBy("day"),
    Some(
      """WITH d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x,
        |    sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
        |      AS BIGINT))::BIGINT AS y
        |  FROM events GROUP BY 1),
        |w AS (SELECT day, x,
        |    count(*) OVER win AS cnt,
        |    (sum(x) OVER win)::DOUBLE AS sx,
        |    (sum(y::HUGEINT) OVER win)::DOUBLE AS sy,
        |    (sum(x::HUGEINT * y::HUGEINT) OVER win)::DOUBLE AS sxy,
        |    (sum(x::HUGEINT * x::HUGEINT) OVER win)::DOUBLE AS sxx,
        |    (sum(y::HUGEINT * y::HUGEINT) OVER win)::DOUBLE AS syy
        |  FROM d WINDOW win AS (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, x AS n_events,
        |  round((7.0 * sxy - sx * sy) /
        |    sqrt((7.0 * sxx - sx * sx) * (7.0 * syy - sy * sy)), 6) + 0
        |    AS roll_corr
        |FROM w WHERE cnt = 7 ORDER BY day""".stripMargin))

  /** Classical 7-day seasonal decomposition of the daily value series
    * ([[graft.operators.EventSequences.seasonalDecompose]]): integer
    * cents end to end — trend sum, 7·c − s7 detrending, one division
    * per surface column.
    */
  val seasonal: QueryDef = QueryDef(
    "events_seasonal_decompose",
    (s, dir) =>
      graft.operators.EventSequences.seasonalDecompose(
          Tables(s, dir).events)
        .orderBy("day"),
    Some(
      """WITH d AS (SELECT ts::DATE AS day,
        |    sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
        |      AS BIGINT))::BIGINT AS c
        |  FROM events GROUP BY 1),
        |w AS (SELECT day, c,
        |    sum(c) OVER win AS s7, count(*) OVER win AS w7,
        |    dayofweek(day) AS dow
        |  FROM d WINDOW win AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT day, c, s7, dow, 7 * c - s7 AS detr7 FROM w
        |  WHERE w7 = 7),
        |seas AS (SELECT dow,
        |    sum(detr7)::DOUBLE / (7.0 * count(*)::DOUBLE) AS sv
        |  FROM f GROUP BY dow)
        |SELECT day,
        |  round(c::DOUBLE / 10000.0, 4) + 0 AS value,
        |  round(s7::DOUBLE / 7.0 / 10000.0, 6) + 0 AS trend,
        |  round(sv / 10000.0, 6) + 0 AS seasonal,
        |  round((c::DOUBLE - s7::DOUBLE / 7.0 - sv) / 10000.0, 6) + 0
        |    AS residual
        |FROM f JOIN seas USING (dow) ORDER BY day""".stripMargin))

  /** Theil–Sen robust trend per user
    * ([[graft.operators.EventSequences.theilSen]]): median of pairwise
    * slopes over the trailing-K window, each slope one double division
    * of exact integers, median values picked at fixed rank positions.
    */
  val theilSenGate: QueryDef = QueryDef(
    "events_theil_sen",
    (s, dir) =>
      graft.operators.EventSequences.theilSen(Tables(s, dir).events)
        .orderBy("user_id"),
    Some(
      """WITH rec AS (SELECT user_id AS k, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
        |  FROM events),
        |rc AS (SELECT * FROM rec WHERE rn <= 200),
        |t0 AS (SELECT k, min(epoch_us(ts)) AS t0 FROM rc GROUP BY k),
        |b AS (SELECT rc.k, (epoch_us(ts) - t0.t0) // 1000000 AS x, y
        |  FROM rc JOIN t0 ON rc.k = t0.k),
        |p AS (SELECT a.k,
        |    ((bb.y - a.y)::DOUBLE / (bb.x - a.x)::DOUBLE) / 10000.0 AS s
        |  FROM b a JOIN b bb ON a.k = bb.k AND a.x < bb.x),
        |r AS (SELECT k, s,
        |    row_number() OVER (PARTITION BY k ORDER BY s) AS r,
        |    count(*) OVER (PARTITION BY k) AS c FROM p)
        |SELECT k AS user_id, any_value(c)::BIGINT AS n_pairs,
        |  round(avg(s), 6) + 0 AS sen_slope
        |FROM r WHERE r = (c + 1) // 2 OR r = c // 2 + 1
        |GROUP BY k ORDER BY user_id""".stripMargin))

  /** Frequent consecutive event-type triples
    * ([[graft.operators.EventSequences.frequentTriples]]): 3-gram
    * behavioral motifs, exact counts, total lexicographic tie-break.
    */
  val triples: QueryDef = QueryDef(
    "events_frequent_triples",
    (s, dir) =>
      graft.operators.EventSequences.frequentTriples(
          Tables(s, dir).events)
        .orderBy("rank"),
    Some(
      """WITH t AS (SELECT event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT t1, t2, t3, count(*)::BIGINT AS n FROM t
        |  WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (
        |    ORDER BY n DESC, t1, t2, t3) AS rk FROM g)
        |SELECT t1, t2, t3, n, rk::BIGINT AS rank FROM r
        |WHERE rk <= 20 ORDER BY rank""".stripMargin))

  /** Wald–Wolfowitz runs test per user
    * ([[graft.operators.EventSequences.runsTest]]): signs vs the exact
    * lower median, runs = 1 + time-ordered sign changes, z the only
    * float.
    */
  val runs: QueryDef = QueryDef(
    "events_runs_test",
    (s, dir) =>
      graft.operators.EventSequences.runsTest(Tables(s, dir).events)
        .orderBy("user_id"),
    Some(
      """WITH v AS (SELECT user_id AS k, ts, event_id AS id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
        |  FROM events),
        |r AS (SELECT k, y,
        |    row_number() OVER (PARTITION BY k ORDER BY y, id) AS rn,
        |    count(*) OVER (PARTITION BY k) AS n FROM v),
        |m AS (SELECT k, y AS med FROM r WHERE rn = (n + 1) // 2),
        |sgn AS (SELECT v.k, v.ts, v.id,
        |    CASE WHEN v.y > m.med THEN 1 ELSE -1 END AS s
        |  FROM v JOIN m ON v.k = m.k WHERE v.y <> m.med),
        |c AS (SELECT k, s,
        |    lag(s) OVER (PARTITION BY k ORDER BY ts, id) AS ps
        |  FROM sgn),
        |a AS (SELECT k,
        |    sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |    sum(CASE WHEN s = -1 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
        |    (sum(CASE WHEN ps IS NOT NULL AND ps <> s THEN 1 ELSE 0 END)
        |      + 1)::BIGINT AS runs
        |  FROM c GROUP BY k)
        |SELECT k AS user_id, n_pos, n_neg, runs,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 AND n_pos + n_neg > 1 THEN
        |    round((runs::DOUBLE
        |        - (2.0 * n_pos::DOUBLE * n_neg::DOUBLE
        |          / (n_pos::DOUBLE + n_neg::DOUBLE) + 1.0)) /
        |      sqrt(2.0 * n_pos::DOUBLE * n_neg::DOUBLE
        |        * (2.0 * n_pos::DOUBLE * n_neg::DOUBLE
        |          - n_pos::DOUBLE - n_neg::DOUBLE)
        |        / ((n_pos::DOUBLE + n_neg::DOUBLE)
        |          * (n_pos::DOUBLE + n_neg::DOUBLE)
        |          * (n_pos::DOUBLE + n_neg::DOUBLE - 1.0))), 6) + 0
        |  END AS z
        |FROM a ORDER BY user_id""".stripMargin))

  /** Exact conversion-lag quantiles
    * ([[graft.operators.EventSequences.conversionLagQuantiles]]):
    * click→purchase gap p50/p90 as actual observed microsecond gaps —
    * all integer, rank-⌈q·n⌉ picks.
    */
  val convLag: QueryDef = QueryDef(
    "events_conversion_lag",
    (s, dir) =>
      graft.operators.EventSequences.conversionLagQuantiles(
        Tables(s, dir).events, fromType = "click", toType = "purchase"),
    Some(
      """WITH p AS (SELECT user_id, ts, event_id FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS v FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts),
        |j AS (SELECT p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND c.ts <= p.ts),
        |g AS (SELECT gap FROM j
        |      WHERE gap IS NOT NULL AND gap <= 320000000000000),
        |r AS (SELECT gap, row_number() OVER (ORDER BY gap) AS rn,
        |      count(*) OVER () AS n FROM g)
        |SELECT any_value(n)::BIGINT AS n_conversions,
        |  min(gap)::BIGINT AS p50_us, max(gap)::BIGINT AS p90_us
        |FROM r WHERE rn = (n + 1) // 2 OR rn = (9 * n + 9) // 10"""
        .stripMargin))

  /** Retention cohort matrix
    * ([[graft.operators.EventSequences.retentionCohorts]]): first-day
    * cohorts × day offsets ≤ 14, distinct actives + exact retention.
    */
  val retention: QueryDef = QueryDef(
    "events_retention_cohorts",
    (s, dir) =>
      graft.operators.EventSequences.retentionCohorts(
          Tables(s, dir).events)
        .orderBy("cohort_day", "day_offset"),
    Some(
      """WITH d AS (SELECT DISTINCT user_id AS u, ts::DATE AS d
        |  FROM events),
        |f AS (SELECT u, min(d) AS c FROM d GROUP BY u),
        |sz AS (SELECT c AS cohort_day, count(*)::BIGINT AS cohort_size
        |  FROM f GROUP BY c),
        |m AS (SELECT f.c AS cohort_day, (d.d - f.c)::BIGINT AS day_offset,
        |    count(DISTINCT d.u)::BIGINT AS active_users
        |  FROM d JOIN f ON d.u = f.u
        |  WHERE d.d - f.c <= 14 GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, active_users, cohort_size,
        |  round(active_users::DOUBLE / cohort_size::DOUBLE, 6) + 0
        |    AS retention
        |FROM m JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin))

  /** RFM quintile grid ([[graft.operators.EventSequences.rfmSegments]]):
    * deterministic ntile(5) under a total order, 125-bounded output.
    */
  val rfm: QueryDef = QueryDef(
    "events_rfm_grid",
    (s, dir) =>
      graft.operators.EventSequences.rfmSegments(Tables(s, dir).events)
        .orderBy("r_q", "f_q", "m_q"),
    Some(
      """WITH per AS (SELECT user_id AS u, max(ts::DATE) AS last_d,
        |    count(*)::BIGINT AS f,
        |    sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
        |      AS BIGINT))::BIGINT AS m
        |  FROM events GROUP BY user_id),
        |mx AS (SELECT max(last_d) AS maxd FROM per),
        |met AS (SELECT u, (maxd - last_d)::BIGINT AS r, f, m
        |  FROM per CROSS JOIN mx),
        |q AS (SELECT u,
        |    ntile(5) OVER (ORDER BY r, u)::BIGINT AS r_q,
        |    ntile(5) OVER (ORDER BY f DESC, u)::BIGINT AS f_q,
        |    ntile(5) OVER (ORDER BY m DESC, u)::BIGINT AS m_q
        |  FROM met)
        |SELECT r_q, f_q, m_q, count(*)::BIGINT AS n_users,
        |  min(u)::BIGINT AS sample_user
        |FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin))

  /** Bot regularity detector
    * ([[graft.operators.EventSequences.botRegularity]]): gap CV with
    * the flag decided in DECIMAL(38,0) cross-multiplication.
    */
  val botReg: QueryDef = QueryDef(
    "events_bot_regularity",
    (s, dir) =>
      graft.operators.EventSequences.botRegularity(Tables(s, dir).events)
        .orderBy("user_id"),
    Some(
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS t, event_id AS id
        |  FROM events),
        |g AS (SELECT k, t - lag(t) OVER (PARTITION BY k
        |    ORDER BY t, id) AS g FROM e),
        |m AS (SELECT k, count(*)::BIGINT AS n_gaps,
        |    sum(g)::BIGINT AS sg,
        |    sum(g::HUGEINT * g::HUGEINT) AS sq
        |  FROM g WHERE g IS NOT NULL GROUP BY k)
        |SELECT k AS user_id, n_gaps,
        |  round(sg::DOUBLE / n_gaps::DOUBLE / 1000000.0, 6) + 0
        |    AS mean_gap_s,
        |  CASE WHEN sg > 0 THEN
        |    round(sqrt((n_gaps::HUGEINT * sq
        |      - sg::HUGEINT * sg::HUGEINT)::DOUBLE) / sg::DOUBLE, 6) + 0
        |  END AS cv,
        |  (n_gaps >= 5 AND sg > 0 AND
        |    (n_gaps::HUGEINT * sq - sg::HUGEINT * sg::HUGEINT) * 10000
        |      < 100 * (sg::HUGEINT * sg::HUGEINT)) AS is_bot
        |FROM m ORDER BY user_id""".stripMargin))

  /** Kaplan–Meier churn curve
    * ([[graft.operators.EventSequences.kaplanMeier]]): right-censored
    * user lifetimes, risk sets from the reverse cumulative, the
    * running product as an ordered list fold both sides.
    */
  val km: QueryDef = QueryDef(
    "events_kaplan_meier",
    (s, dir) =>
      graft.operators.EventSequences.kaplanMeier(Tables(s, dir).events)
        .orderBy("lifetime_days"),
    Some(
      """WITH per AS (SELECT user_id, min(ts::DATE) AS f,
        |    max(ts::DATE) AS l FROM events GROUP BY user_id),
        |hz AS (SELECT max(l) AS m FROM per),
        |life AS (SELECT (l - f)::BIGINT AS t,
        |    ((m - l) >= 3) AS dead FROM per CROSS JOIN hz),
        |hist AS (SELECT t,
        |    sum(CASE WHEN dead THEN 1 ELSE 0 END)::BIGINT AS d,
        |    sum(CASE WHEN dead THEN 0 ELSE 1 END)::BIGINT AS c,
        |    count(*)::BIGINT AS mm
        |  FROM life GROUP BY t),
        |risk AS (SELECT t, d, c,
        |    (sum(mm) OVER () - coalesce(sum(mm) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS n
        |  FROM hist),
        |dr AS (SELECT t, d, c, n FROM risk WHERE d > 0),
        |al AS (SELECT list(struct_pack(t := t, d := d, n := n)
        |    ORDER BY t) AS alls FROM dr)
        |SELECT t AS lifetime_days, n AS n_at_risk, d AS deaths,
        |  c AS censored,
        |  round(list_reduce(list_prepend(1.0::DOUBLE,
        |    list_transform(list_filter(alls, x -> x.t <= dr.t),
        |      x -> 1.0 - x.d::DOUBLE / x.n::DOUBLE)),
        |    (a, b) -> a * b), 6) + 0 AS survival
        |FROM dr CROSS JOIN al ORDER BY lifetime_days""".stripMargin))

  /** Log-rank two-cohort churn comparison
    * ([[graft.operators.EventSequences.logRankTest]]): even vs odd
    * users, O/E/V folded in sorted death-time order, χ² the surface.
    */
  val logRank: QueryDef = QueryDef(
    "events_log_rank",
    (s, dir) =>
      graft.operators.EventSequences.logRankTest(
        Tables(s, dir).events, inGroup1 = col("user_id") % 2 === 0),
    Some(
      """WITH per AS (SELECT user_id, min(ts::DATE) AS f,
        |    max(ts::DATE) AS l,
        |    max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS g
        |  FROM events GROUP BY user_id),
        |hz AS (SELECT max(l) AS m FROM per),
        |life AS (SELECT (l - f)::BIGINT AS t, ((m - l) >= 3) AS dead, g
        |  FROM per CROSS JOIN hz),
        |times AS (SELECT DISTINCT t AS dt FROM life WHERE dead),
        |cells AS (SELECT dt, count(*)::BIGINT AS n,
        |    sum(g)::BIGINT AS n1,
        |    sum(CASE WHEN dead AND t = dt THEN 1 ELSE 0 END)::BIGINT
        |      AS d,
        |    sum(CASE WHEN dead AND t = dt THEN g ELSE 0 END)::BIGINT
        |      AS d1
        |  FROM life JOIN times ON life.t >= times.dt GROUP BY dt),
        |al AS (SELECT count(*)::BIGINT AS n_death_times,
        |    sum(d1)::BIGINT AS o1,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(d::DOUBLE * n1::DOUBLE / n::DOUBLE ORDER BY dt)),
        |      (a, b) -> a + b) AS e1,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(CASE WHEN n > 1 THEN
        |          d::DOUBLE * (n1::DOUBLE / n::DOUBLE)
        |          * (1.0 - n1::DOUBLE / n::DOUBLE)
        |          * (n::DOUBLE - d::DOUBLE) / (n::DOUBLE - 1.0)
        |        ELSE 0.0 END ORDER BY dt)),
        |      (a, b) -> a + b) AS v
        |  FROM cells)
        |SELECT n_death_times, o1, round(al.e1, 6) + 0 AS e1,
        |  CASE WHEN v > 0.0 THEN
        |    round((o1::DOUBLE - al.e1) * (o1::DOUBLE - al.e1) / v, 6)
        |      + 0
        |  END AS chi2
        |FROM al""".stripMargin))

  /** Maximum drawdown per user
    * ([[graft.operators.EventSequences.maxDrawdown]]): peak-to-trough
    * slide of the running value sum — integers end to end.
    */
  val drawdown: QueryDef = QueryDef(
    "events_max_drawdown",
    (s, dir) =>
      graft.operators.EventSequences.maxDrawdown(Tables(s, dir).events)
        .orderBy("user_id"),
    Some(
      """WITH v AS (SELECT user_id AS k, ts, event_id AS id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
        |  FROM events),
        |c AS (SELECT k, sum(y) OVER (PARTITION BY k ORDER BY ts, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, id) AS t
        |  FROM v),
        |p AS (SELECT k, t, cum, max(cum) OVER (PARTITION BY k ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM c),
        |d AS (SELECT k, t, cum, peak - cum AS dd FROM p),
        |m AS (SELECT *, max(dd) OVER (PARTITION BY k) AS mdd FROM d)
        |SELECT k AS user_id, count(*)::BIGINT AS n_events,
        |  max(cum)::BIGINT AS peak_fp,
        |  any_value(mdd)::BIGINT AS max_drawdown_fp,
        |  min(CASE WHEN dd = mdd THEN t END)::BIGINT AS trough_at
        |FROM m GROUP BY k ORDER BY user_id""".stripMargin))

  /** Partial autocorrelation (Durbin–Levinson lags 1..3) of the daily
    * event-count series ([[graft.operators.EventSequences.pacf]]):
    * built on the ROUNDED acf surface so every downstream double is
    * bit-identical by construction.
    */
  val pacfGate: QueryDef = QueryDef(
    "events_pacf",
    (s, dir) => {
      val daily = Tables(s, dir).events
        .groupBy(to_date(col("ts")).as("_day"))
        .agg(count(lit(1)).as("_x"))
        .withColumn("_t", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("_day"))))
      graft.operators.EventSequences.pacf(daily, "_t", "_x")
    },
    Some(
      """WITH d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x
        |    FROM events GROUP BY 1),
        |s AS (SELECT x, row_number() OVER (ORDER BY day) AS t FROM d),
        |tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(x * x)::BIGINT AS q FROM s),
        |lg AS (SELECT unnest(range(1, 4)) AS lag),
        |p AS (SELECT lag, sum(a.x * b.x)::BIGINT AS pp,
        |    sum(a.x)::BIGINT AS h, sum(b.x)::BIGINT AS tl
        |  FROM lg CROSS JOIN s a JOIN s b ON b.t = a.t + lg.lag
        |  GROUP BY lag),
        |ac AS (SELECT lag,
        |    round((n * n * pp - n * sx * (h + tl)
        |        + (n - lag) * sx * sx)::DOUBLE /
        |      (n * n * q - n * sx * sx)::DOUBLE, 6) + 0 AS acf
        |  FROM p CROSS JOIN tot),
        |pv AS (SELECT max(CASE WHEN lag = 1 THEN acf END) AS r1,
        |    max(CASE WHEN lag = 2 THEN acf END) AS r2,
        |    max(CASE WHEN lag = 3 THEN acf END) AS r3 FROM ac)
        |SELECT r1, r2, r3,
        |  round(r1, 6) + 0 AS pacf1,
        |  round((r2 - r1 * r1) / (1.0 - r1 * r1), 6) + 0 AS pacf2,
        |  round((r3 - (r1 * (1.0 - (r2 - r1 * r1) / (1.0 - r1 * r1)))
        |      * r2 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) /
        |    (1.0 - (r1 * (1.0 - (r2 - r1 * r1) / (1.0 - r1 * r1))) * r1
        |      - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2), 6) + 0
        |    AS pacf3
        |FROM pv""".stripMargin))

  /** Goh–Barabási burstiness per user
    * ([[graft.operators.EventSequences.burstiness]]): (σ−μ)/(σ+μ) of
    * gaps from exact moments, one float chain.
    */
  val bursty: QueryDef = QueryDef(
    "events_burstiness",
    (s, dir) =>
      graft.operators.EventSequences.burstiness(Tables(s, dir).events)
        .orderBy("user_id"),
    Some(
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS t, event_id AS id
        |  FROM events),
        |g AS (SELECT k, t - lag(t) OVER (PARTITION BY k
        |    ORDER BY t, id) AS g FROM e),
        |m AS (SELECT k, count(*)::BIGINT AS n_gaps,
        |    sum(g)::BIGINT AS sg, sum(g::HUGEINT * g::HUGEINT) AS sq
        |  FROM g WHERE g IS NOT NULL GROUP BY k HAVING count(*) >= 2)
        |SELECT k AS user_id, n_gaps,
        |  CASE WHEN sqrt((n_gaps::HUGEINT * sq
        |        - sg::HUGEINT * sg::HUGEINT)::DOUBLE) / n_gaps::DOUBLE
        |      + sg::DOUBLE / n_gaps::DOUBLE > 0.0 THEN
        |    round((sqrt((n_gaps::HUGEINT * sq
        |        - sg::HUGEINT * sg::HUGEINT)::DOUBLE) / n_gaps::DOUBLE
        |      - sg::DOUBLE / n_gaps::DOUBLE) /
        |      (sqrt((n_gaps::HUGEINT * sq
        |        - sg::HUGEINT * sg::HUGEINT)::DOUBLE) / n_gaps::DOUBLE
        |      + sg::DOUBLE / n_gaps::DOUBLE), 6) + 0
        |  END AS burstiness
        |FROM m ORDER BY user_id""".stripMargin))

  /** Empirical Markov entropy rate
    * ([[graft.operators.EventSequences.markovEntropyRate]]): corpus
    * predictability in nats/step, sorted fold over the type² cells.
    */
  val markovEntropy: QueryDef = QueryDef(
    "events_markov_entropy",
    (s, dir) =>
      graft.operators.EventSequences.markovEntropyRate(
        Tables(s, dir).events),
    Some(
      """WITH t AS (SELECT event_type AS p,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nx
        |  FROM events),
        |cells AS (SELECT p, nx AS n, count(*)::BIGINT AS c FROM t
        |  WHERE nx IS NOT NULL GROUP BY p, nx),
        |rt AS (SELECT p, n, c,
        |    sum(c) OVER (PARTITION BY p) AS row_tot,
        |    sum(c) OVER () AS tot FROM cells)
        |SELECT count(*)::BIGINT AS n_cells,
        |  any_value(tot)::BIGINT AS n_transitions,
        |  round(list_reduce(list_prepend(0.0::DOUBLE,
        |    list(-(c::DOUBLE / tot::DOUBLE
        |        * ln(c::DOUBLE / row_tot::DOUBLE)) ORDER BY p, n)),
        |    (a, b) -> a + b), 6) + 0 AS entropy_rate_nats
        |FROM rt""".stripMargin))

  /** Discrete hazard table
    * ([[graft.operators.EventSequences.hazardTable]]): h(t) = d/n per
    * death time, one integer division each.
    */
  val hazard: QueryDef = QueryDef(
    "events_hazard_table",
    (s, dir) =>
      graft.operators.EventSequences.hazardTable(Tables(s, dir).events)
        .orderBy("lifetime_days"),
    Some(
      """WITH per AS (SELECT user_id, min(ts::DATE) AS f,
        |    max(ts::DATE) AS l FROM events GROUP BY user_id),
        |hz AS (SELECT max(l) AS m FROM per),
        |life AS (SELECT (l - f)::BIGINT AS t, ((m - l) >= 3) AS dead
        |  FROM per CROSS JOIN hz),
        |hist AS (SELECT t,
        |    sum(CASE WHEN dead THEN 1 ELSE 0 END)::BIGINT AS d,
        |    count(*)::BIGINT AS mm FROM life GROUP BY t),
        |risk AS (SELECT t, d,
        |    (sum(mm) OVER () - coalesce(sum(mm) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS n
        |  FROM hist)
        |SELECT t AS lifetime_days, n AS n_at_risk, d AS deaths,
        |  round(d::DOUBLE / n::DOUBLE, 6) + 0 AS hazard
        |FROM risk WHERE d > 0 ORDER BY lifetime_days""".stripMargin))

  /** Net-revenue cohort retention
    * ([[graft.operators.EventSequences.revenueRetention]]): cohort
    * value at offset t over its day-0 value, exact cents.
    */
  val revRetention: QueryDef = QueryDef(
    "events_revenue_retention",
    (s, dir) =>
      graft.operators.EventSequences.revenueRetention(
          Tables(s, dir).events)
        .orderBy("cohort_day", "day_offset"),
    Some(
      """WITH f AS (SELECT user_id AS u, min(ts::DATE) AS c FROM events
        |  GROUP BY user_id),
        |cells AS (SELECT f.c AS cohort_day,
        |    (e.ts::DATE - f.c)::BIGINT AS day_offset,
        |    sum(CAST(CAST(e.value AS DECIMAL(18,4)) * 10000
        |      AS BIGINT))::BIGINT AS cents
        |  FROM events e JOIN f ON e.user_id = f.u
        |  WHERE (e.ts::DATE - f.c) <= 14 GROUP BY 1, 2),
        |base AS (SELECT cohort_day, cents AS b FROM cells
        |  WHERE day_offset = 0)
        |SELECT cohort_day, day_offset, cents AS value_fp,
        |  CASE WHEN b <> 0 THEN
        |    round(cents::DOUBLE / b::DOUBLE, 6) + 0 END
        |    AS revenue_retention
        |FROM cells JOIN base USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(ewma, acfGate, coverage, dow, pettitt, rollingCorr, seasonal,
      theilSenGate, triples, runs, convLag, retention, rfm, botReg, km,
      logRank, drawdown, pacfGate, bursty, markovEntropy, hazard,
      revRetention)
}
