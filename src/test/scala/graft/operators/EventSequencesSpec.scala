package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions.col

class EventSequencesSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  // user 1: view → click → purchase → click ; user 2: purchase (direct),
  // then view → purchase ; user 3: single event (no transition)
  private def events = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "click"),
      (3L, 1L, ts(3), "purchase"), (4L, 1L, ts(4), "click"),
      (5L, 2L, ts(1), "purchase"), (6L, 2L, ts(2), "view"),
      (7L, 2L, ts(3), "purchase"),
      (8L, 3L, ts(1), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
  }

  test("transition counts and ML probabilities match hand computation") {
    val got = EventSequences.transitions(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("view", "click", 1L, 0.5), ("view", "purchase", 1L, 0.5),
      ("click", "purchase", 1L, 1.0),
      ("purchase", "click", 1L, 0.5), ("purchase", "view", 1L, 0.5)))
  }

  test("probabilities sum to 1 per source state") {
    val sums = EventSequences.transitions(events)
      .groupBy("prev").sum("prob").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    sums.values.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("same-timestamp events order by the tie column") {
    val s = spark
    import s.implicits._
    val tied = Seq(
      (2L, 1L, ts(1), "b"), (1L, 1L, ts(1), "a"), (3L, 1L, ts(1), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventSequences.transitions(tied)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c")))
  }

  test("first/last-touch attribution with a direct conversion") {
    val got = EventSequences.touchAttribution(events, "purchase")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // user 1's purchase: first=view, last=click
    // user 2's first purchase: no prior → direct/direct
    // user 2's second purchase: first=view, last=view
    assert(got == Set(
      ("view", 2L, 1L), ("click", 0L, 1L), ("direct", 1L, 1L)))
  }

  test("conversion-free input yields an empty attribution") {
    val s = spark
    import s.implicits._
    val none = Seq((1L, 1L, ts(1), "view")).toDF("event_id", "user_id", "ts", "event_type")
    assert(EventSequences.touchAttribution(none, "purchase").count() == 0)
  }

  test("zscore flags exactly the hand-computed outlier") {
    val s = spark
    import s.implicits._
    // 15 x 10.00 + one 1000.00: m=71.875, var=61256.25 (std exactly
    // 247.5), z(1000) = 928.125/247.5 = 3.75; z(10) = -0.25
    val rows = (1L to 15L).map(i => (i, "a", 10.00)) :+ ((16L, "a", 1000.00))
    val df = rows.toDF("event_id", "event_type", "value").repartition(7)
    val got = EventSequences.zscoreAnomalies(df, threshold = 3.0)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((16L, 3.75)), s"got ${got.toSeq}")
  }

  test("zscore is partitioning-independent and groups are isolated") {
    val s = spark
    import s.implicits._
    val rows = (1L to 15L).map(i => (i, "a", 10.00)) ++
      Seq((16L, "a", 1000.00)) ++
      // group b: tight cluster, no outlier — must contribute nothing
      (21L to 30L).map(i => (i, "b", 5.00 + (i % 3) * 0.5))
    val a = EventSequences.zscoreAnomalies(rows.toDF("event_id", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    val b = EventSequences.zscoreAnomalies(
        rows.toDF("event_id", "event_type", "value").repartition(13))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    assert(a == b, "decimal sums must make the stats order-independent")
    assert(a.map(_._1) == Set(16L))
  }

  test("MAD flags the hand-computed outlier a masked z-score would shrink") {
    val s = spark
    import s.implicits._
    // values 1..10 + 1000: median 6, abs devs sorted end in 994 with
    // median 3 → mz(1000) = 0.6745·994/3 = 223.4843; mz(1) = −1.1242
    val rows = (1L to 10L).map(i => (i, "a", i.toDouble)) :+ ((11L, "a", 1000.0))
    val got = EventSequences.madAnomalies(
        rows.toDF("event_id", "event_type", "value").repartition(5))
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((11L, 223.4843)), s"got ${got.toSeq}")
  }

  test("MAD zero-MAD groups are excluded by the guard (documented limit)") {
    val s = spark
    import s.implicits._
    // >half the group at one value → MAD 0 → whole group dropped, even
    // though 1000 is an outlier: the same /0 cross-engine guard as
    // zscore's zero-variance filter
    val rows = (1L to 10L).map(i => (i, "a", 10.0)) :+ ((11L, "a", 1000.0))
    val got = EventSequences.madAnomalies(
      rows.toDF("event_id", "event_type", "value"))
    assert(got.count() == 0)
  }

  test("trimmed stats: band bounds and mean are exact on a hand case") {
    val s = spark
    import s.implicits._
    // 1..20 + 1000: p05 at index 0.05·20 = 1 → 2.0; p95 at 19 → 20.0;
    // band keeps 2..20 (19 values), trimmed mean 209/19 = 11.0 — the
    // raw mean is 57.6, hostage to the one extreme
    val rows = ((1L to 20L).map(i => ("a", i.toDouble)) :+ (("a", 1000.0)))
    val r = EventSequences.trimmedStats(
        rows.toDF("event_type", "value").repartition(5))
      .head()
    assert(r.getString(0) == "a")
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 20.0)
    assert(r.getLong(3) == 21 && r.getLong(4) == 19)
    assert(r.getDouble(5) == 11.0)
  }

  test("decayed sum: exact power-of-two weights, capped exponent") {
    val s = spark
    import s.implicits._
    def d(day: String) = Timestamp.valueOf(s"2026-01-$day 12:00:00")
    // ref = Jan 29. ages: 0d (hl 0, w 1), 7d (hl 1, w 1/2),
    // and one ancient event capped at 20 half-lives
    val rows = Seq(
      (1L, d("29"), 10.00), (1L, d("22"), 20.00),
      (2L, d("29"), 8.00))
      .toDF("user_id", "ts", "value")
      // ancient: way past the cap — weight exactly 2^-20
      .unionByName(Seq((1L, Timestamp.valueOf("2020-01-01 00:00:00"), 40.00))
        .toDF("user_id", "ts", "value"))
    val got = EventSequences.decayedSum(rows, halfLifeDays = 7,
        maxHalfLives = 20)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // user 1: 1000·2^20 + 2000·2^19 + 4000·2^0 = 2097156000
    assert(got(0) == ((1L, 3L, 2097156000L, 20.000038)))
    // user 2: 800·2^20 / (2^20·100) = 8.0 exactly
    assert(got(1) == ((2L, 1L, 838860800L, 8.0)))
  }

  test("interval merge coalesces overlapping AND touching spans per key") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      // key 1: [0,10] ∪ [5,20] ∪ [20,25] → one island; [30,40] separate
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 25L), (1L, 30L, 40L),
      // key 2: nested interval swallowed by the running max
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 150L, 160L)
    ).toDF("user_id", "start_us", "end_us")
    val out = EventSequences.mergeIntervals(iv, "user_id", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 0L, 25L, 3L), (1L, 30L, 40L, 1L),
      (2L, 0L, 100L, 2L), (2L, 150L, 160L, 1L)))
  }

  test("interval merge is repartition-invariant") {
    val s = spark
    import s.implicits._
    val iv = (1L to 200L)
      .map(i => (i % 7, i * 10L, i * 10L + (i % 13) * 5L))
      .toDF("user_id", "start_us", "end_us")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventSequences.mergeIntervals(df, "user_id", "start_us", "end_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(run(iv) == run(iv.repartition(17)))
  }

  test("scd2 history collapses runs and chains validity bounds") {
    val s = spark
    import s.implicits._
    // user 1 types: A A B A — versions (A,2 events), (B,1), (A,1) —
    // the value RECURS in version 3, which latest_by_key cannot express
    val df = Seq(
      (1L, 1L, ts(1), "A"), (2L, 1L, ts(2), "A"),
      (3L, 1L, ts(3), "B"), (4L, 1L, ts(4), "A"),
      (5L, 2L, ts(1), "C"), (6L, 2L, ts(2), "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventSequences.scd2History(df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
      .toSet
    def us(m: Int) = ts(m).getTime * 1000L
    assert(out == Set(
      (1L, 1L, "A", us(1), us(3), 2L),
      (1L, 2L, "B", us(3), us(4), 1L),
      (1L, 3L, "A", us(4), -1L, 1L),
      (2L, 1L, "C", us(1), -1L, 2L)))
  }

  test("olsTrend recovers an exact line; zero time variance yields null") {
    val s = spark
    import s.implicits._
    // user 1: y = 2x + 3 at x = 0, 60, 120 seconds (minutes 1..3)
    // user 2: two events at the SAME instant → no slope
    val df = Seq(
      (1L, 1L, ts(1), 3.0), (2L, 1L, ts(2), 123.0),
      (3L, 1L, ts(3), 243.0),
      (4L, 2L, ts(5), 7.0), (5L, 2L, ts(5), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = EventSequences.olsTrend(df).orderBy("user_id").collect()
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getDouble(2) == 2.0) // slope per second
    assert(out(0).getDouble(3) == 3.0) // intercept at group start
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("gapFillLocf fills missing grid days with the prior value") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2026-01-$d%02d 10:00:00")
    // user 1: events on days 1 and 4 (two on day 1 — later one wins)
    val df = Seq(
      (1L, 1L, day(1), 5.0),
      (2L, 1L, Timestamp.valueOf("2026-01-01 11:00:00"), 7.0),
      (3L, 1L, day(4), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = EventSequences.gapFillLocf(df)
      .orderBy("day")
      .collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("2026-01-01", 7.0, false), // last event of the day wins
      ("2026-01-02", 7.0, true),
      ("2026-01-03", 7.0, true),
      ("2026-01-04", 9.0, false)))
  }

  test("cusumDrift matches the hand-run recursion and flags the shift") {
    val s = spark
    import s.implicits._
    // baseline 10.0, slack 5.0 ⇒ drift only when values exceed 15
    val vals = Seq(10.0, 10.0, 30.0, 40.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, ts(i + 1), v)
    }.toDF("event_id", "user_id", "ts", "value")
    val out = EventSequences.cusumDrift(df,
        slackFp = 50000L, thresholdFp = 200000L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(3), r.getBoolean(4)))
    // recursion: s=max(0, s + (y-10-5)) in units of 1e-4
    // y=10: s=0; y=10: s=0; y=30: s=15; y=40: s=40; y=10: s=35
    assert(out.toSeq == Seq((0L, false), (0L, false),
      (150000L, false), (400000L, true), (350000L, true)))
  }

  test("olsTrend slope is invariant to a constant value shift") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, 1L, ts(1), 1.25), (2L, 1L, ts(2), 4.5), (3L, 1L, ts(4), 2.0))
    val df0 = base.toDF("event_id", "user_id", "ts", "value")
    val df1 = base.map { case (e, u, t, v) => (e, u, t, v + 100.0) }
      .toDF("event_id", "user_id", "ts", "value")
    val s0 = EventSequences.olsTrend(df0).head()
    val s1 = EventSequences.olsTrend(df1).head()
    assert(s0.getDouble(2) == s1.getDouble(2))
    assert(math.abs(s1.getDouble(3) - s0.getDouble(3) - 100.0) < 1e-6)
  }

  test("rollingDistinct counts trailing-window distinct keys per observed day") {
    val s = spark
    import s.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // user A on days 1 and 2 (distinct-per-day dedup matters on day 1:
    // two events), user B on day 5 only
    val ev = Seq((t(1), "A"), (t(1), "A"), (t(2), "A"), (t(5), "B"))
      .toDF("ts", "user_id")
    val out = EventSequences.rollingDistinct(ev, "ts", "user_id", days = 3)
      .orderBy("day").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
    // observed days: 1, 2, 5. 3-day windows ending there:
    // day1 ← {A}, day2 ← {A}, day5 ← {B} (A's day-2 activity expired day 4)
    assert(out.toSeq == Seq(
      "2024-01-01" -> 1L, "2024-01-02" -> 1L, "2024-01-05" -> 1L))
    // widen to 4 days: day 5 now also sees A's day-2 activity
    val wide = EventSequences.rollingDistinct(ev, "ts", "user_id", days = 4)
      .orderBy("day").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(wide("2024-01-05") == 2L)
  }

  test("maxConcurrency: sweep line with closed-interval boundary overlap") {
    val sp = spark
    import sp.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // [0,10], [5,15] overlap -> 2; [15,20] starts exactly at 15:
    // closed intervals overlap at the boundary -> peak 2 there too;
    // [30,35] alone -> never 3 except... all in group "g"
    val iv = Seq(
      ("g", t(0), t(10)), ("g", t(5), t(15)), ("g", t(15), t(20)),
      ("g", t(30), t(35)))
      .toDF("grp", "s", "e")
    val r = EventSequences.maxConcurrency(iv, "s", "e", "grp").head()
    assert(r.getLong(1) == 4 && r.getLong(2) == 2)
    // make a triple overlap: add [4,6]
    val iv3 = iv.union(Seq(("g", t(4), t(6))).toDF("grp", "s", "e"))
    assert(EventSequences.maxConcurrency(iv3, "s", "e", "grp")
      .head().getLong(2) == 3)
  }

  test("pettittTest finds the clean level shift with exact K and t*") {
    val s = spark
    import s.implicits._
    // 1,1,1 then 10,10,10: ranks (avg ties) 2,2,2,5,5,5
    // U_t = 2Σr − t·7: -3,-6,-9,-6,-3 → K=9 at t*=3
    val df = (1 to 6).map(i =>
        (i.toLong, 1L, ts(i), if (i <= 3) 1.0 else 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = EventSequences.pettittTest(df).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((6L, 9L, 3L)))
    val p = 2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0))
    assert(math.abs(r.getDouble(4) - p) < 1e-6)
    // a constant series has U_t = 0 everywhere → K = 0, p = 2 (capped
    // conceptually; the approximation is only meaningful for large K)
    val flat = (1 to 4).map(i => (i.toLong, 1L, ts(i), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(EventSequences.pettittTest(flat).head().getLong(2) == 0L)
  }

  test("rollingCorrDaily emits full windows only and matches the moments") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-02-$d%02d 10:00:00")
    // day d has d events of value d → x=d, y=d²·10⁴ cents
    val rows = for { d <- 1 to 8; k <- 1 to d }
      yield ((d * 100 + k).toLong, 1L, day(d), d.toDouble)
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val out = EventSequences.rollingCorrDaily(df).orderBy("day").collect()
    assert(out.length == 2) // 8 observed days → windows ending day 7, 8
    def corr(ds: Seq[Int]): Double = {
      val xs = ds.map(_.toDouble)
      val ys = ds.map(d => d.toDouble * d * 10000)
      val n = ds.size.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    assert(math.abs(out(0).getDouble(2) - corr(1 to 7)) < 1e-5)
    assert(math.abs(out(1).getDouble(2) - corr(2 to 8)) < 1e-5)
  }

  test("seasonalDecompose: components re-add to the value, seasonal is dow-pure") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 12:00:00")
    // 21 days of dow pattern + slow trend
    val df = (1 to 21).map { d =>
      (d.toLong, 1L, day(d), 100.0 + (d % 7) * 10.0 + d * 0.5)
    }.toDF("event_id", "user_id", "ts", "value")
    val out = EventSequences.seasonalDecompose(df).orderBy("day").collect()
    assert(out.length == 15) // 21 − 6 edge days
    out.foreach { r =>
      val (v, tr, se, re) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(v - (tr + se + re)) < 1e-4)
    }
    // seasonal depends only on the day of week
    val byDow = out.groupBy(_.getDate(0).toLocalDate.getDayOfWeek)
      .values.map(_.map(_.getDouble(3)).distinct)
    byDow.foreach(ds => assert(ds.size == 1))
  }

  test("theilSen: median pairwise slope resists one outlier") {
    val s = spark
    import s.implicits._
    def tm(m: Int) = Timestamp.valueOf(f"2024-01-01 00:0$m%01d:00")
    // y = 2x (x in minutes→seconds: slope 2/60 per second) with one
    // wild outlier at x=3: OLS bends, Theil–Sen holds the 2/60 line
    val df = Seq((1L, 1L, tm(0), 0.0), (2L, 1L, tm(1), 2.0),
      (3L, 1L, tm(2), 4.0), (4L, 1L, tm(3), 500.0), (5L, 1L, tm(4), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = EventSequences.theilSen(df).head()
    assert(r.getLong(1) == 10L) // C(5,2) pairs
    // slopes: 6 clean pairs at 2/60≈0.0333; 4 outlier pairs huge/neg.
    // sorted middle two are clean → median = 2/60
    assert(math.abs(r.getDouble(2) - 2.0 / 60.0) < 1e-4)
    val ols = EventSequences.olsTrend(df).head().getDouble(2)
    assert(math.abs(ols - 2.0 / 60.0) > 0.1) // OLS got dragged
  }

  test("runsTest: alternating series maximizes runs, blocked series minimizes") {
    val s = spark
    import s.implicits._
    // user 1 alternates around median; user 2 is two solid blocks
    val alt = Seq(1.0, 9.0, 1.0, 9.0, 1.0, 9.0)
    val blk = Seq(1.0, 1.0, 1.0, 9.0, 9.0, 9.0)
    val df = (alt.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, ts(i + 1), v)
    } ++ blk.zipWithIndex.map { case (v, i) =>
      ((i + 10).toLong, 2L, ts(i + 1), v)
    }).toDF("event_id", "user_id", "ts", "value")
    val out = EventSequences.runsTest(df).orderBy("user_id").collect()
    // lower median = 1 → rows equal to median drop: kept are the 9s…
    // wait: median of {1,1,1,9,9,9} lower = 1; signs only for y≠1 →
    // user 2 keeps three +1s → runs=1, n_neg=0 → z null
    assert(out(1).getLong(3) == 1L && out(1).isNullAt(4))
    // user 1: same kept rows (three 9s interleaved) → also runs 1?
    // no: kept rows are only the 9s (1s equal the median, dropped),
    // so both users degenerate identically — assert that contract
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 0L)
  }

  test("runsTest z matches hand computation when both signs survive") {
    val s = spark
    import s.implicits._
    // 7 values, lower median 4 drops one row; signs in time order:
    // -,-,+,+,-,+ → n_pos=3, n_neg=3, runs=4
    val vals = Seq(1.0, 2.0, 5.0, 6.0, 4.0, 3.0, 7.0)
    //            -    -    +    +   med   -    +   → runs over -,-,+,+,-,+
    val df = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, ts(i + 1), v)
    }.toDF("event_id", "user_id", "ts", "value")
    val r = EventSequences.runsTest(df).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 3L, 4L)))
    val mu = 2.0 * 3 * 3 / 6.0 + 1.0 // 4
    val vr = 2.0 * 3 * 3 * (2.0 * 3 * 3 - 6) / (6.0 * 6.0 * 5.0)
    assert(math.abs(r.getDouble(4) - (4.0 - mu) / math.sqrt(vr)) < 1e-6)
  }

  test("conversionLagQuantiles picks observed gaps at the ceil-rank") {
    val s = spark
    import s.implicits._
    // clicks at :00, purchases at +1m, +2m, ... +10m (10 conversions,
    // one user each → gaps 60s..600s)
    val rows = (1 to 10).flatMap { u =>
      Seq((u * 10L, u.toLong, ts(0), "click"),
        (u * 10L + 1, u.toLong, ts(u), "purchase"))
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val r = EventSequences.conversionLagQuantiles(
      df, fromType = "click", toType = "purchase").head()
    assert(r.getLong(0) == 10L)
    // p50 rank = ceil(11/2)=5 → 300s; p90 rank = ceil(9)=9 → 540s
    assert(r.getLong(1) == 300L * 1000000L)
    assert(r.getLong(2) == 540L * 1000000L)
  }

  test("kaplanMeier matches the textbook estimator with censoring") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-06-$d%02d 09:00:00")
    // horizon = day 20. Users (first, last):
    //  u1 (1,3):  t=2,  dead (gap 17)
    //  u2 (1,5):  t=4,  dead
    //  u3 (2,6):  t=4,  dead
    //  u4 (1,19): t=18, censored (gap 1)
    //  u5 (1,20): t=19, censored (gap 0)
    val spans = Seq((1L, 1, 3), (2L, 1, 5), (3L, 2, 6), (4L, 1, 19),
      (5L, 1, 20))
    val ev = spans.flatMap { case (u, f, l) =>
      Seq((u, day(f)), (u, day(l)))
    }.toDF("user_id", "ts")
    val out = EventSequences.kaplanMeier(ev).orderBy("lifetime_days")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // death times: t=2 (n=5, d=1) → S=0.8; t=4 (n=4, d=2) → S=0.8·0.5=0.4
    assert(out.toSeq == Seq((2L, 5L, 1L, 0L, 0.8), (4L, 4L, 2L, 0L, 0.4)))
  }

  test("burstiness: metronome → −1, single spike gap mix > 0") {
    val s = spark
    import s.implicits._
    def at(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val regular = (0 to 5).map(i => ((i + 1).toLong, 1L, at(i * 60), "x"))
    // gaps 1,1,1,1,3600 → heavy burst
    val burstTimes = Seq(0, 1, 2, 3, 4, 3604)
    val burst = burstTimes.zipWithIndex.map { case (t, i) =>
      ((i + 10).toLong, 2L, at(t), "x")
    }
    val df = (regular ++ burst)
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventSequences.burstiness(df).orderBy("user_id").collect()
    assert(out(0).getDouble(2) == -1.0) // σ=0 metronome
    // one spike among n=5 gaps maxes out near (√4−1)/(√4+1) = 1/3
    assert(out(1).getDouble(2) > 0.3)   // bursty
  }

  test("markovEntropyRate: deterministic chain → 0, fair coin → ln 2") {
    val s = spark
    import s.implicits._
    // a→b→a→b…: every row is deterministic → H = 0
    val det = (1 to 10).map(i =>
      (i.toLong, 1L, ts(i), if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(EventSequences.markovEntropyRate(det).head().getDouble(2) == 0.0)
    // from each state, next is a or b equally often → H = ln 2
    val coin = Seq("a", "a", "b", "b", "a", "b", "a", "a", "b", "b", "a",
      "b", "a").zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, 1L, ts(i + 1), t)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val h = EventSequences.markovEntropyRate(coin).head().getDouble(2)
    assert(h > 0.6 && h <= math.log(2.0) + 1e-9)
  }

  test("maxDrawdown: hand case, all-integer, first trough wins ties") {
    val s = spark
    import s.implicits._
    // values: +10, +20, −25, +5, −15 → cum 10,30,5,10,−5
    // peaks   10,30,30,30,30 → dd 0,0,25,20,35 → mdd 35 at t=5
    val vals = Seq(10.0, 20.0, -25.0, 5.0, -15.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, ts(i + 1), v)
    }.toDF("event_id", "user_id", "ts", "value")
    val r = EventSequences.maxDrawdown(df).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 300000L, 350000L, 5L)))
    // monotone series never draws down
    val up = (1 to 4).map(i => (i.toLong, 2L, ts(i), 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(EventSequences.maxDrawdown(up).head().getLong(3) == 0L)
  }

  test("pacf: AR(1)-like acf gives pacf2 ~ 0, chain matches closed form") {
    val s = spark
    import s.implicits._
    // build a series whose rounded acf we then feed the closed forms:
    // any series works — we assert pacf2/pacf3 equal the hand chain
    val daily = (1 to 40).map(i =>
      (i.toLong, (50 + 20 * math.sin(i / 3.0)).round))
      .toDF("_t", "_x")
    val r = EventSequences.pacf(daily, "_t", "_x").head()
    val (r1, r2, r3) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 * (1.0 - p22)
    assert(r.getDouble(3) == math.rint(r1 * 1e6) / 1e6 ||
      math.abs(r.getDouble(3) - r1) < 1e-6)
    assert(math.abs(r.getDouble(4) - p22) < 1e-6)
    val p33 = (r3 - p21 * r2 - p22 * r1) /
      (1.0 - p21 * r1 - p22 * r2)
    assert(math.abs(r.getDouble(5) - p33) < 1e-6)
  }

  test("hazardTable: h(t) = d/n at each death time, risk sets shrink") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-06-$d%02d 09:00:00")
    // same spans as the KM spec: deaths at t=2 (1 of 5), t=4 (2 of 4)
    val spans = Seq((1L, 1, 3), (2L, 1, 5), (3L, 2, 6), (4L, 1, 19),
      (5L, 1, 20))
    val ev = spans.flatMap { case (u, f, l) =>
      Seq((u, day(f)), (u, day(l)))
    }.toDF("user_id", "ts")
    val out = EventSequences.hazardTable(ev).orderBy("lifetime_days")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq((2L, 5L, 1L, 0.2), (4L, 4L, 2L, 0.5)))
  }

  test("revenueRetention: cohort dollars at offset over day-0 dollars") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-07-$d%02d 09:00:00")
    // cohort day1: u1 spends 10 on d1, 5 on d2; u2 spends 10 on d1
    // → base 20, offset1 value 5 → NRR 0.25
    val ev = Seq((1L, day(1), 10.0), (2L, day(1), 10.0),
      (1L, day(2), 5.0)).toDF("user_id", "ts", "value")
    val out = EventSequences.revenueRetention(ev)
      .orderBy("day_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0L, 200000L, 1.0), (1L, 50000L, 0.25)))
  }

  test("logRankTest: identical cohorts give chi2 ~ 0, disjoint churn separates") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-06-$d%02d 09:00:00")
    // horizon day 20. Group1 (even users) dies at t=2; group0 at t=8.
    val spans = Seq(
      (2L, 1, 3), (4L, 1, 3), (6L, 1, 3),    // g1, t=2, dead
      (1L, 1, 9), (3L, 1, 9), (5L, 1, 9),    // g0, t=8, dead
      (7L, 1, 20), (8L, 1, 20))              // censored, one per group
    val ev = spans.flatMap { case (u, f, l) =>
      Seq((u, day(f)), (u, day(l)))
    }.toDF("user_id", "ts")
    val r = EventSequences.logRankTest(ev,
      inGroup1 = col("user_id") % 2 === 0).head()
    // death times: t=2 (n=8, n1=4, d=3 all g1), t=8 (n=5, n1=1, d=3 g0)
    // O1 = 3; E1 = 3·4/8 + 3·1/5 = 1.5 + 0.6 = 2.1
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 2.1) < 1e-9)
    // V = 3·(4/8)(1−4/8)(8−3)/7 + 3·(1/5)(1−1/5)(5−3)/4
    val v = 3.0 * 0.5 * 0.5 * 5 / 7 + 3.0 * 0.2 * 0.8 * 2 / 4
    assert(math.abs(r.getDouble(3) - (3.0 - 2.1) * (3.0 - 2.1) / v) < 1e-5)
  }

  test("botRegularity: metronome flags, bursty human does not") {
    val s = spark
    import s.implicits._
    def at(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // user 1: exactly every 60s (cv = 0) → bot
    // user 2: gaps 10,300,5,600,45,200 s (cv >> 0.1) → human
    val bot = (0 to 6).map(i => ((i + 1).toLong, 1L, at(i * 60), "x"))
    val human = Seq(0, 10, 310, 315, 915, 960, 1160).zipWithIndex.map {
      case (t, i) => ((i + 20).toLong, 2L, at(t), "x")
    }
    val df = (bot ++ human).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventSequences.botRegularity(df).orderBy("user_id").collect()
    assert(out(0).getLong(1) == 6L && out(0).getDouble(3) == 0.0)
    assert(out(0).getBoolean(4))
    assert(!out(1).getBoolean(4) && out(1).getDouble(3) > 0.5)
    // fewer than minGaps never flags, even if perfectly regular
    val few = (0 to 3).map(i => ((i + 50).toLong, 3L, at(i * 60), "x"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(!EventSequences.botRegularity(few).head().getBoolean(4))
  }

  test("retentionCohorts: first-day cohorts, offsets, exact rates") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-04-$d%02d 09:00:00")
    // cohort day1: users 1,2 (user 1 returns day2; both return day3)
    // cohort day2: user 3 (returns day3)
    val ev = Seq((1L, day(1)), (2L, day(1)), (1L, day(2)), (3L, day(2)),
      (1L, day(3)), (2L, day(3)), (3L, day(3)), (1L, day(3)))
      .toDF("user_id", "ts")
    val out = EventSequences.retentionCohorts(ev)
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-04-01", 0L, 2L, 2L, 1.0),
      ("2024-04-01", 1L, 1L, 2L, 0.5),
      ("2024-04-01", 2L, 2L, 2L, 1.0),
      ("2024-04-02", 0L, 1L, 1L, 1.0),
      ("2024-04-02", 1L, 1L, 1L, 1.0)))
  }

  test("rfmSegments: quintiles are deterministic and grid counts sum to users") {
    val s = spark
    import s.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-05-$d%02d 09:00:00")
    val ev = (1 to 20).flatMap { u =>
      (1 to u).map(i => ((u * 100 + i).toLong, u.toLong, day(u % 10 + 1),
        u.toDouble))
    }.toDF("event_id", "user_id", "ts", "value")
    val out = EventSequences.rfmSegments(ev).collect()
    assert(out.map(_.getLong(3)).sum == 20L) // every user lands once
    val again = EventSequences.rfmSegments(ev.repartition(7)).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("frequentTriples counts 3-step motifs with a total tie-break") {
    val s = spark
    import s.implicits._
    // user 1: a b c a b c  → (a,b,c)×2, (b,c,a), (c,a,b)
    val ev = Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map {
      case (t, i) => ((i + 1).toLong, 1L, ts(i + 1), t)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val out = EventSequences.frequentTriples(ev).orderBy("rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out.head == (("a", "b", "c", 2L)))
    assert(out.length == 3)
    assert(out.map(_._4).toSeq == Seq(2L, 1L, 1L))
  }
}
