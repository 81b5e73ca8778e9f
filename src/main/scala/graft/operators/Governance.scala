package graft.operators

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
}
