package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality readouts over monetary-style columns —
  * the "how skewed is this corpus/revenue/token distribution" summary
  * a curation pipeline reads before rebalancing (cf. the distribution
  * rebalance and quality-bucket operators in [[Sampling]]).
  *
  * Everything is exact integer arithmetic until one final double
  * division: values are fixed-pointed to cents, ranks come from a
  * per-group window `row_number` (ties broken by the id column, which
  * leaves the rank-weighted sum invariant — equal values contribute
  * the same total regardless of their order), and the Gini closed
  * form over sorted values
  *
  *   G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x)
  *
  * needs only the two integer sums. Ranks come from
  * [[Ranks.withGroupRank]] (range sub-buckets INSIDE each group): a
  * bare per-group window caps parallelism at the group count, and
  * inequality groups are typically few (segments, languages) over
  * corpus-scale rows — exactly the one-task-sorts-a-group shape this
  * repo bans. The integer sums map-side combine.
  */
object Inequality {

  /** Per-group Gini coefficient of `valueCol` (a 2-dp non-negative
    * monetary double), plus the exact supporting sums. `idCol` is the
    * deterministic tiebreak for equal values.
    */
  def giniByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100d, 0).cast("long")
    val base = df.select(col(groupCol).as("_g"), cents.as("_c"),
      col(idCol).as("_id"))
    Ranks.withGroupRank(base, "_i", Seq("_g"), col("_c"),
        ties = Seq(col("_id")))
      .groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_c")).as("sum_cents"),
        sum(col("_i") * col("_c")).as("_t"))
      .select(col(groupCol), col("n"), col("sum_cents"),
        Numerics.roundz(
          (lit(2) * col("_t") - (col("n") + 1) * col("sum_cents"))
            .cast("double") /
            (col("n") * col("sum_cents")).cast("double"), 6).as("gini"))
  }

  /** Per-group EXACT weighted median (lower median): the smallest
    * value whose cumulative weight reaches half the group's total —
    * "the price point where half the quantity sits", the
    * skew-robust center an approximate percentile can't pin exactly.
    *
    * All-integer: values are cents, weights are integral longs, and
    * the pick condition 2·cumw ≥ totw multiplies through so no
    * fraction ever materializes. One hash shuffle by group for the
    * cumulative window (values pre-aggregated per (group, value), so
    * the window frame is value-domain-bounded, not row-bounded), then
    * a min over qualifying values. The output value is the exact
    * input cent amount divided once.
    */
  def weightedMedianByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100d, 0).cast("long")
    val wgt = round(col(weightCol), 0).cast("long")
    val pv = df
      .select(col(groupCol).as("_g"), cents.as("_c"), wgt.as("_w"))
      .groupBy(col("_g"), col("_c"))
      .agg(sum(col("_w")).as("_wv"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    pv.withColumn("_cum", sum(col("_wv")).over(w))
      .withColumn("_tot",
        sum(col("_wv")).over(Window.partitionBy(col("_g"))))
      .filter(lit(2) * col("_cum") >= col("_tot"))
      .groupBy(col("_g").as(groupCol))
      .agg(min(col("_c")).as("_med"), first(col("_tot")).as("total_weight"))
      .select(col(groupCol), col("total_weight"),
        Numerics.roundz(col("_med").cast("double") / 100.0, 2)
          .as("weighted_median"))
  }

  /** Two-phase exact weighted median — the 100 TB shape of
    * [[weightedMedianByGroup]], HASH-IDENTICAL output. The plain
    * variant's cumulative window runs over the per-(group, value)
    * frame, which approaches corpus size when values are near-unique
    * (prices, latencies); here phase 1 aggregates to COARSE BUCKETS
    * (value div 2^bucketBits — a few hundred rows per group regardless
    * of corpus size), walks the bucket histogram to the one bucket
    * holding the weighted median and its exact preceding cumulative
    * weight, then phase 2 runs the value-ordered pick ONLY inside that
    * bucket (a broadcast semi-join prunes the rest of the corpus
    * before any sort). Both windows are bucket- resp. bucket-slice-
    * bounded; nothing corpus-scale ever sorts.
    */
  def weightedMedianByGroupBucketed(
      df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, bucketBits: Int = 16): DataFrame = {
    require(bucketBits > 0 && bucketBits < 62, s"bad bits $bucketBits")
    val cents = round(col(valueCol) * 100d, 0).cast("long")
    val wgt = round(col(weightCol), 0).cast("long")
    val width = 1L << bucketBits
    val rows = df
      .select(col(groupCol).as("_g"), cents.as("_c"), wgt.as("_w"))
      .withColumn("_b", expr(s"_c div ${width}L"))
    val perB = rows.groupBy(col("_g"), col("_b"))
      .agg(sum(col("_w")).as("_wb"))
    val wB = Window.partitionBy(col("_g")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cumB = perB
      .withColumn("_cumb", sum(col("_wb")).over(wB))
      .withColumn("_tot",
        sum(col("_wb")).over(Window.partitionBy(col("_g"))))
    // the bucket where the cumulative weight first crosses half, plus
    // the exact cumulative weight BEFORE it (offset into phase 2)
    val target = cumB.filter(lit(2) * col("_cumb") >= col("_tot"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("_g")).orderBy(col("_b"))))
      .filter(col("_rk") === 1)
      .select(col("_g"), col("_b").as("_tb"),
        (col("_cumb") - col("_wb")).as("_off"), col("_tot"))
    // target derives from rows → alias both sides of the self-join
    val inB = rows.as("r")
      .join(broadcast(target.select(col("_g").as("_tg"), col("_tb"),
        col("_off"), col("_tot"))),
        col("r._g") === col("_tg") && col("r._b") === col("_tb"))
      .select(col("r._g").as("_g"), col("r._c").as("_c"),
        col("r._w").as("_w"), col("_off"), col("_tot"))
    val pv = inB.groupBy(col("_g"), col("_c"))
      .agg(sum(col("_w")).as("_wv"), first(col("_off")).as("_off"),
        first(col("_tot")).as("_tot"))
    val w2 = Window.partitionBy(col("_g")).orderBy(col("_c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    pv.withColumn("_cum", col("_off") + sum(col("_wv")).over(w2))
      .filter(lit(2) * col("_cum") >= col("_tot"))
      .groupBy(col("_g").as(groupCol))
      .agg(min(col("_c")).as("_med"),
        first(col("_tot")).as("total_weight"))
      .select(col(groupCol), col("total_weight"),
        Numerics.roundz(col("_med").cast("double") / 100.0, 2)
          .as("weighted_median"))
  }
}
