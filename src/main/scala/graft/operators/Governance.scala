package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-governance checks over a corpus — the release-gate questions a
  * dataset owner answers before publishing: does any quasi-identifier
  * combination isolate fewer than k records (Sweeney 2002 k-anonymity)?
  * The reference has no governance surface (SURVEY.md §2.6); extension
  * for the training-data pipeline, where corpus cards routinely report
  * re-identification risk alongside [[Redaction]]'s PII masking.
  *
  * Scale: one map-side-combined aggregate to the quasi-identifier
  * group counts (bounded by the QI-combination cardinality, not the
  * corpus), then a one-row summary — the same shape as
  * [[HyperLogLog.summaryByGroup]].
  */
object Governance {

  /** One-row k-anonymity summary over the `quasiCols` combination:
    * n_groups, n_violating (groups with < k rows), rows_at_risk (rows
    * inside violating groups — the suppression cost of enforcing k),
    * and risk_rate = rows_at_risk / n_rows (6 dp).
    */
  def kAnonymity(
      df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need quasi columns and k >= 2")
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    groups.agg(
        lit(k.toLong).as("k"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"),
        sum(col("n")).as("n_rows"))
      .select(col("k"), col("n_groups"), col("n_violating"),
        col("rows_at_risk"), col("n_rows"),
        round(col("rows_at_risk").cast("double") / col("n_rows"), 6)
          .as("risk_rate"))
  }

  /** The violating groups themselves (for suppression or
    * generalization): quasi columns + their undersized count.
    */
  def kAnonymityViolations(
      df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need quasi columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** l-diversity (Machanavajjhala 2007) — k-anonymity's complement: a
    * quasi-identifier group can be large yet still leak if every
    * member shares the SAME sensitive value; a group is safe only when
    * it contains ≥ l distinct sensitive values. One release-gate
    * summary row: group counts, violating groups, rows at risk. Same
    * single-aggregate shape as [[kAnonymity]] (one groupBy on the
    * quasi columns with an exact distinct on the sensitive column —
    * group-domain-bounded output).
    */
  def lDiversity(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, s"need quasi columns and l >= 2")
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("nd"))
    groups.agg(
        lit(l.toLong).as("l"),
        count(lit(1)).as("n_groups"),
        sum(when(col("nd") < l, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("nd") < l, col("n")).otherwise(0L)).as("rows_at_risk"),
        sum(col("n")).as("n_rows"))
      .select(col("l"), col("n_groups"), col("n_violating"),
        col("rows_at_risk"), col("n_rows"),
        round(col("rows_at_risk").cast("double") / col("n_rows"), 6)
          .as("risk_rate"))
  }

  /** t-closeness (Li, Li & Venkatasubramanian, ICDE'07) — the third
    * leg of the release triad: a group can be k-anonymous AND
    * l-diverse yet still leak if its sensitive-value DISTRIBUTION
    * differs sharply from the corpus. For an ordinal sensitive
    * column, the class-vs-global distance is the normalized ordered
    * EMD: Σ_v |cumshare_class(v) − cumshare_global(v)| / (K−1) over
    * the full global domain (flat segments for values a class never
    * takes).
    *
    * Scale shape: one corpus aggregate to (class, value) counts;
    * everything after runs on the classes×domain grid (both
    * config-bounded), with the |Δcum| terms folded per class in value
    * order — deterministic double chains, never a partition-order
    * sum. Output one row per class: quasi columns, class size n, and
    * t (6-dp).
    */
  def tCloseness(
      df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need quasi columns")
    val q = quasiCols.map(col)
    val cells = df
      .groupBy((q :+ col(sensitiveCol).cast("long").as("_v")): _*)
      .agg(count(lit(1)).as("_n"))
      .materialized
    val classes = cells.groupBy(q: _*).agg(sum(col("_n")).as("_ng"))
    val domain = cells.groupBy(col("_v")).agg(sum(col("_n")).as("_nv"))
    val domCum = domain
      .withColumn("_cumAll", sum(col("_nv")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .crossJoin(broadcast(domain.agg(sum(col("_nv")).as("_tot"),
        count(lit(1)).as("_k"))))
      .select(col("_v"), col("_cumAll"), col("_tot"), col("_k"))
    val grid = classes.crossJoin(broadcast(domCum))
      .join(cells, quasiCols :+ "_v", "left")
      .na.fill(0L, Seq("_n"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(q: _*).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val terms = grid
      .withColumn("_cumG", sum(col("_n")).over(wc))
      .select((q ++ Seq(col("_ng"), col("_k"),
        struct(col("_v"),
          abs(col("_cumG").cast("double") / col("_ng").cast("double") -
            col("_cumAll").cast("double") / col("_tot").cast("double"))
            .as("_t")).as("_kv"))): _*)
    terms
      .groupBy((q :+ col("_ng") :+ col("_k")): _*)
      .agg(aggregate(array_sort(collect_list(col("_kv"))), lit(0.0),
        (acc, s) => acc + s.getField("_t")).as("_sum"))
      .select((q :+ col("_ng").as("n") :+
        Numerics.roundz(col("_sum") / (col("_k") - 1).cast("double"), 6)
          .as("t")): _*)
  }

  /** k-anonymity ENFORCEMENT by suppression — the action behind
    * [[kAnonymity]]'s measurement: rows whose quasi-identifier cell
    * holds fewer than k records get those columns masked to `'*'`
    * (the cell no longer isolates anyone); everything else passes
    * through unchanged, with the decision flag carried for the
    * release audit. One QI-cell aggregate broadcast back onto the
    * scan — cell-cardinality-bounded state, corpus never self-joins
    * wide.
    */
  def kAnonymizeSuppress(
      df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need quasi columns and k >= 2")
    val q = quasiCols.map(col)
    val cells = df.groupBy(q: _*).agg(count(lit(1)).as("_cn"))
    // null-safe (<=>) join back: groupBy counts the NULL cell as a
    // group, so the join must match it too — a null-rejecting equality
    // would silently DROP every row with a NULL quasi column from the
    // release (row loss in a privacy operator), instead of suppressing
    // or passing it like any other cell
    val cellsR = quasiCols.zipWithIndex.foldLeft(cells) {
      case (d, (c, i)) => d.withColumnRenamed(c, s"_qc_$i")
    }
    val cond = quasiCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"_qc_$i") }
      .reduce(_ && _)
    val joined = df.join(broadcast(cellsR), cond)
      .drop(quasiCols.indices.map(i => s"_qc_$i"): _*)
    val masked = quasiCols.foldLeft(
      joined.withColumn("suppressed", col("_cn") < k)) { (d, c) =>
      d.withColumn(c,
        when(col("suppressed"), lit("*")).otherwise(col(c).cast("string")))
    }
    masked.drop("_cn")
  }
}
