package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling and snapshot drift — the data-quality
  * monitor a production pipeline runs on every ingest batch (the
  * Great-Expectations/Deequ shape, engine-agnostic): per-column row
  * counts, null counts, exact distinct cardinalities, and lexical
  * min/max, plus the before/after drift join.
  *
  * Contract notes:
  *  - min/max are computed over the STRING cast (stated contract —
  *    profiles compare across type changes and engines; numeric
  *    columns wanting numeric bounds profile a cast column).
  *  - distinct counts are EXACT (one expand per column, cost bounded
  *    by the profiled column list — the caller picks columns, not the
  *    schema width). At 100 TB swap `countDistinct` for the gated HLL
  *    summary ([[HyperLogLog]]) per column; the drift join is
  *    unchanged.
  *
  * Scale shape: ONE aggregate over the corpus per profile (multi-
  * distinct expands the scan |cols| ways — linear, map-side combined),
  * then a |cols|-row unpivot; drift joins two |cols|-row frames.
  */
object DataProfile {

  /** One row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_s, max_s).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackExpr) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_s, max_s)"))
  }

  /** Drift between two snapshots of the same table: per column, both
    * profiles side by side plus the deltas and bound-change flags.
    */
  def drift(
      before: DataFrame, after: DataFrame,
      cols: Seq[String]): DataFrame = {
    val p0 = profile(before, cols)
      .select(col("column"), col("n_rows").as("rows_before"),
        col("n_nulls").as("nulls_before"),
        col("n_distinct").as("distinct_before"),
        col("min_s").as("_min0"), col("max_s").as("_max0"))
    val p1 = profile(after, cols)
      .select(col("column"), col("n_rows").as("rows_after"),
        col("n_nulls").as("nulls_after"),
        col("n_distinct").as("distinct_after"),
        col("min_s").as("_min1"), col("max_s").as("_max1"))
    p0.join(p1, "column")
      .select(col("column"),
        col("rows_before"), col("rows_after"),
        (col("rows_after") - col("rows_before")).as("rows_delta"),
        col("nulls_before"), col("nulls_after"),
        col("distinct_before"), col("distinct_after"),
        (col("distinct_after") - col("distinct_before"))
          .as("distinct_delta"),
        (!(col("_min0") <=> col("_min1"))).as("min_changed"),
        (!(col("_max0") <=> col("_max1"))).as("max_changed"))
  }
}
