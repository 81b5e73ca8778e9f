package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-quality profiling: the checks a data engineer runs before
  * trusting a 100 TB drop — does column A still determine column B
  * (functional dependency, with the violation rate when it doesn't),
  * is every foreign key actually present on the other side (inclusion
  * dependency coverage), and do the leading digits of a monetary
  * column follow Benford's law (the classic fabricated-data /
  * truncation-bug tripwire).
  *
  * All three reduce to grouped integer counts — two hash aggregates
  * for an FD (group by (lhs, rhs), then by lhs with max/sum), one
  * distinct + one semi-join for an IND, one aggregate for Benford —
  * so each scales as a shuffle on the profiled key, never a sort,
  * never driver-side state. Complements [[DataProfile]] (per-column
  * stats) with cross-column structure.
  */
object Profiling {

  /** g3-style violation measure for one candidate FD lhs → rhs:
    * the share of rows that would have to be dropped for the
    * dependency to hold exactly (1 − Σ_lhs max_rhs count / N),
    * plus the exact group counts behind it. Null lhs/rhs are rows
    * like any other (grouped as their own key).
    */
  def fdViolation(
      df: DataFrame, name: String, lhs: Column, rhs: Column): DataFrame = {
    val pairs = df.groupBy(lhs.as("_l"), rhs.as("_r"))
      .agg(count(lit(1)).as("_n"))
    pairs.groupBy(col("_l"))
      .agg(sum(col("_n")).as("_tot"), max(col("_n")).as("_keep"),
        count(lit(1)).as("_nrhs"))
      .agg(sum(col("_tot")).as("n_rows"),
        count(lit(1)).as("n_lhs"),
        sum(when(col("_nrhs") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
        sum(col("_tot") - col("_keep")).as("n_violating_rows"))
      .select(lit(name).as("fd"), col("n_rows"), col("n_lhs"),
        col("n_violating_lhs"), col("n_violating_rows"),
        Numerics.roundz(col("n_violating_rows").cast("double") /
          col("n_rows").cast("double"), 6).as("g3"))
  }

  /** Inclusion-dependency coverage: how many distinct non-null values
    * of `fk` in `child` appear as `pk` in `parent`. Distinct first
    * (the FK side usually repeats each key many times), then one
    * semi-join against the PK side — at scale the distinct is the
    * only wide exchange and the PK side joins broadcast-or-shuffled
    * as its size dictates.
    */
  def inclusionCoverage(
      child: DataFrame, fk: String, parent: DataFrame, pk: String,
      name: String): DataFrame = {
    val fks = child.select(col(fk).as("_k")).filter(col("_k").isNotNull)
      .distinct()
    val matched = fks.join(
      parent.select(col(pk).as("_k")).distinct(), Seq("_k"), "left_semi")
    fks.agg(count(lit(1)).as("n_distinct_fk"))
      .crossJoin(broadcast(matched.agg(count(lit(1)).as("n_matched"))))
      .select(lit(name).as("ind"), col("n_distinct_fk"), col("n_matched"),
        Numerics.roundz(col("n_matched").cast("double") /
          col("n_distinct_fk").cast("double"), 6).as("coverage"))
  }

  /** Per-group mode with deterministic tie-break (highest count, then
    * lowest value), plus the distinct-value count and the mode's
    * share — the categorical-column profile row. One hash aggregate
    * to (group, value) counts, then a per-group rank window over the
    * value-vocabulary-bounded frame.
    */
  def modePerGroup(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df
      .groupBy(col(groupCol).as("_g"),
        col(valueCol).cast("string").as("_v"))
      .agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_n").desc, col("_v"))
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g"))
    counts
      .withColumn("_rn", row_number().over(w))
      .withColumn("_tot", sum(col("_n")).over(tw))
      .withColumn("n_distinct", count(lit(1)).over(tw))
      .filter(col("_rn") === 1)
      .select(col("_g").as(groupCol), col("_v").as("mode"),
        col("_n").as("n_mode"), col("n_distinct"),
        Numerics.roundz(col("_n").cast("double") /
          col("_tot").cast("double"), 6).as("share"))
  }

  /** First-significant-digit profile of a positive 2-dp monetary
    * column vs the Benford expectation log10(1+1/d): per digit the
    * exact count, observed share, expected share, and the chi²
    * contribution n·(obs−exp)²/exp. The digit is taken from the
    * integer cents value's decimal representation — pure integer/
    * string arithmetic, no float log10 on the data path, so the digit
    * assignment is bit-identical across engines.
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100d, 0).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val perDigit = df.filter(col(valueCol) > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    // ln(1 + 1/d)/ln(10) — the SAME expression shape the oracle runs,
    // so the per-digit expectation is the identical double chain
    val expected =
      log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
        log(lit(10.0))
    perDigit
      .crossJoin(broadcast(perDigit.agg(sum(col("n")).as("_tot"))))
      .select(col("digit"), col("n"),
        Numerics.roundz(col("n").cast("double") /
          col("_tot").cast("double"), 6).as("obs_share"),
        Numerics.roundz(expected, 6).as("exp_share"),
        Numerics.roundz({
          // explicit e·e, not pow(e, 2): the two engines' pow may
          // differ in the last ulp while multiplication is exact IEEE
          val e = col("n").cast("double") / col("_tot").cast("double") -
            expected
          e * e / expected * col("_tot").cast("double")
        }, 4).as("chi2_term"))
  }

  /** Coarse quantile normalization: within each group, rows are cut
    * into `k` rank buckets (SQL ntile with an id tiebreak — the
    * deterministic-cut contract), and each bucket is mapped to the
    * CROSS-GROUP mean of that bucket's per-group integer sums — the
    * distribution-alignment step that makes a metric comparable
    * across sources whose scales drift (the k-binned form of
    * microarray quantile normalization, which at 100 TB is the right
    * form anyway: full-rank QN needs a global sort per group, the
    * k-binned one needs a per-group window + two k·groups-bounded
    * aggregates).
    *
    * Output: (group, bucket, n, group_mean, normalized_mean) — all
    * means exact-integer sums divided once at the end.
    */
  def quantileNormalize(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 2, s"k=$k")
    // per-group SQL ntile via Ranks (range sub-buckets inside each
    // group) — a bare Window.partitionBy(group) would sort each whole
    // group in one task, with parallelism capped at the group count
    val base = df
      .select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("long").as("_v"), col(idCol).as("_id"))
    val bucketed = Ranks.withGroupNtile(base, "bucket", k, Seq("_g"),
      col("_v"), ties = Seq(col("_id")))
    val per = bucketed.groupBy(col("_g"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_s"))
    val cross = per.groupBy(col("bucket"))
      .agg(sum(col("_s")).as("_cs"), sum(col("n")).as("_cn"))
    per.join(broadcast(cross), Seq("bucket"))
      .select(col("_g").as(groupCol), col("bucket"), col("n"),
        Numerics.roundz(col("_s").cast("double") /
          col("n").cast("double"), 6).as("group_mean"),
        Numerics.roundz(col("_cs").cast("double") /
          col("_cn").cast("double"), 6).as("normalized_mean"))
  }

  /** Mergeable equi-width histogram quantiles over an integral
    * column: `bins` fixed-width bins between the observed min/max
    * (width = (max−min) div bins + 1 — the all-integer contract), a
    * cumulative count across the ≤`bins`-row frame, and for each
    * requested percentile p the FIRST bin whose cumulative count
    * reaches ceil(p·N/100). Error is bounded by one bin width; state
    * is O(bins) longs and merges by addition — the deterministic
    * portable-sketch answer to "approximate quantiles at 100 TB"
    * beside the engine-defined `approx_percentile` (whose gate is
    * rows-only for exactly that reason; this one full-hashes).
    *
    * Output per p: (p, bin, lo_edge, cum_count) — pure BIGINTs.
    */
  def histogramQuantiles(
      df: DataFrame, valueCol: String, bins: Int = 64,
      percentiles: Seq[Int] = Seq(25, 50, 90, 99)): DataFrame = {
    require(bins >= 2 && percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100))
    val base = df.select(col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull)
    val bounds = base.agg(min(col("_v")).as("_min"), max(col("_v")).as("_max"),
      count(lit(1)).as("_N"))
    val binned = base.crossJoin(broadcast(bounds))
      .select(expr(s"(_v - _min) div ((_max - _min) div $bins + 1)")
        .as("bin"), col("_min"), col("_max"), col("_N"))
      .groupBy(col("bin"), col("_min"), col("_max"), col("_N"))
      .agg(count(lit(1)).as("_cnt"))
    val cum = binned.withColumn("cum_count",
      sum(col("_cnt")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("bin"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val ps = percentiles.map(p =>
      cum.filter(col("cum_count") * 100 >= col("_N") * p)
        .orderBy(col("bin")).limit(1)
        .select(lit(p.toLong).as("p"), col("bin"),
          (col("_min") +
            col("bin") * expr(s"(_max - _min) div $bins + 1"))
            .as("lo_edge"),
          col("cum_count")))
    ps.reduce(_ unionByName _).orderBy("p")
  }

  /** Population stability index between a slice and the rest of the
    * corpus over a categorical column — THE drift tripwire model
    * monitoring runs on every feature (PSI < 0.1 stable, > 0.25
    * investigate). Laplace-smoothed shares p = (n+1)/(N+K) over the
    * union category domain, so empty cells are defined without an
    * ad-hoc epsilon, and the smoothing is part of the stated
    * contract. Σ (p−q)·ln(p/q) folded in category order; the
    * corpus-scale work is one hash aggregate to ≤2·K cells.
    */
  def psi(
      df: DataFrame, catCol: String, slice: Column): DataFrame = {
    val counts = df
      .groupBy(col(catCol).cast("string").as("_c"), slice.as("_s"))
      .agg(count(lit(1)).as("_n"))
    val a = counts.filter(col("_s")).select(col("_c"), col("_n").as("_na"))
    val b = counts.filter(!col("_s")).select(col("_c"), col("_n").as("_nb"))
    val grid = a.join(b, Seq("_c"), "full_outer")
      .na.fill(0L, Seq("_na", "_nb"))
    val tot = grid.agg(sum(col("_na")).as("_ta"), sum(col("_nb")).as("_tb"),
      count(lit(1)).as("n_bins"))
    val withP = grid.crossJoin(broadcast(tot))
      .select(col("_c"), col("n_bins"),
        ((col("_na") + 1).cast("double") /
          (col("_ta") + col("n_bins")).cast("double")).as("_p"),
        ((col("_nb") + 1).cast("double") /
          (col("_tb") + col("n_bins")).cast("double")).as("_q"))
    withP.groupBy(col("n_bins"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("_c"),
          ((col("_p") - col("_q")) * log(col("_p") / col("_q")))
            .as("_t")))),
        lit(0.0), (acc, s) => acc + s.getField("_t")).as("_psi"))
      .select(col("n_bins"), Numerics.roundz(col("_psi"), 6).as("psi"))
  }
}
