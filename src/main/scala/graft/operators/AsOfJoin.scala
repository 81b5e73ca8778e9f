package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the most recent right row at or
  * before its timestamp, per key". Spark has no built-in; the prompt's
  * §7.3 preference order says compose built-ins first, and the
  * composition here is exactly that (a custom SparkPlan is unnecessary):
  *
  *   union(left, right) → window(partitionBy key, orderBy ts) →
  *   last(right_value, ignoreNulls) over rows ≤ current → filter left
  *
  * One shuffle on the key, linear in |L|+|R| — the sort-merge shape an
  * engine-native as-of join would use anyway, so this composition IS the
  * at-scale plan. Ties (right.ts == left.ts) match, with right rows
  * ordered before left rows at equal timestamps.
  */
object AsOfJoin {

  /** Returns `left` plus `matched_<rightValueCol>` — the right side's
    * value column as of each left row's timestamp (null when no right
    * row precedes it).
    *
    * Both inputs need (keyCol, tsCol); `rightValueCol` is carried from
    * the right side. Right rows are deduplicated to one per (key, ts)
    * keeping the max value, making results deterministic under ties.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      rightValueCol: String): DataFrame = {

    val rightDedup = right
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(rightValueCol)).as(rightValueCol))

    val leftTagged = left
      .withColumn("_is_left", lit(1))
      .withColumn("_rv", lit(null).cast(rightDedup.schema(rightValueCol).dataType))
    val rightTagged = rightDedup.select(
      col(keyCol), col(tsCol),
      lit(0).as("_is_left"), col(rightValueCol).as("_rv"))
    // align schemas: left columns not on the right become nulls
    val leftCols = leftTagged.columns
    val rightAligned = rightTagged.select(leftCols.map(c =>
      if (rightTagged.columns.contains(c)) col(c)
      else lit(null).cast(leftTagged.schema(c).dataType).as(c)): _*)

    // right rows sort before left rows at equal ts ⇒ `<=` semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftTagged.unionByName(rightAligned)
      .withColumn(s"matched_$rightValueCol",
        last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .drop("_is_left", "_rv")
  }

  /** Backward as-of with a TOLERANCE (pandas `merge_asof(tolerance=…)`):
    * the most recent right row at or before each left row matches only
    * if it is within `toleranceSeconds` — a click from last week does
    * not explain today's purchase. Same union + per-key window shape
    * as [[asOf]] (one shuffle, no range join), with the matched row's
    * TIMESTAMP carried through the window as a struct so the gap test
    * is exact microsecond arithmetic; stale matches null out, and the
    * surviving gap is reported in microseconds.
    */
  def asOfTolerance(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      rightValueCol: String, toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, "tolerance must be non-negative")
    val rightDedup = right
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(rightValueCol)).as(rightValueCol))
    val rvType = rightDedup.schema(rightValueCol).dataType
    val leftTagged = left
      .withColumn("_is_left", lit(1))
      .withColumn("_rv", lit(null).cast(rvType))
      .withColumn("_rts", lit(null).cast("long"))
    val rightTagged = rightDedup.select(
      col(keyCol), col(tsCol), lit(0).as("_is_left"),
      col(rightValueCol).as("_rv"), unix_micros(col(tsCol)).as("_rts"))
    val leftCols = leftTagged.columns
    val rightAligned = rightTagged.select(leftCols.map(c =>
      if (rightTagged.columns.contains(c)) col(c)
      else lit(null).cast(leftTagged.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolUs = toleranceSeconds * 1000000L
    leftTagged.unionByName(rightAligned)
      // the struct must be NULL on left rows (a struct of null fields is
      // itself non-null and would shadow the true last right row)
      .withColumn("_m",
        last(when(col("_is_left") === 0,
          struct(col("_rv"), col("_rts"))), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .withColumn("_gap", unix_micros(col(tsCol)) - col("_m").getField("_rts"))
      .withColumn(s"matched_$rightValueCol",
        when(col("_gap") <= tolUs, col("_m").getField("_rv")))
      .withColumn("asof_gap_us", when(col("_gap") <= tolUs, col("_gap")))
      .drop("_is_left", "_rv", "_rts", "_m", "_gap")
  }

  /** NEAREST as-of (pandas `merge_asof(direction='nearest')`): each
    * left row matches the closest right row in EITHER direction, ties
    * going backward (the at-or-before row). Same single union +
    * per-key-sorted frame as [[asOf]] — the backward candidate is a
    * running `last(ignoreNulls)` and the forward candidate a
    * `first(ignoreNulls)` over the mirrored frame of the SAME sort
    * (one shuffle, one sort, two window frames; no range join, no
    * second exchange). Equal-ts right rows order before left rows, so
    * a same-timestamp match is backward with gap 0. Output adds
    * `matched_<col>`, `asof_gap_us` (absolute), and `asof_dir`
    * ('backward'/'forward', null when no right row exists).
    */
  def asOfNearest(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      rightValueCol: String): DataFrame = {
    val rightDedup = right
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(rightValueCol)).as(rightValueCol))
    val rvType = rightDedup.schema(rightValueCol).dataType
    val leftTagged = left
      .withColumn("_is_left", lit(1))
      .withColumn("_rv", lit(null).cast(rvType))
      .withColumn("_rts", lit(null).cast("long"))
    val rightTagged = rightDedup.select(
      col(keyCol), col(tsCol), lit(0).as("_is_left"),
      col(rightValueCol).as("_rv"), unix_micros(col(tsCol)).as("_rts"))
    val leftCols = leftTagged.columns
    val rightAligned = rightTagged.select(leftCols.map(c =>
      if (rightTagged.columns.contains(c)) col(c)
      else lit(null).cast(leftTagged.schema(c).dataType).as(c)): _*)
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_is_left"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wf = ord.rowsBetween(0, Window.unboundedFollowing)
    val m = when(col("_is_left") === 0, struct(col("_rv"), col("_rts")))
    leftTagged.unionByName(rightAligned)
      .withColumn("_b", last(m, ignoreNulls = true).over(wb))
      .withColumn("_f", first(m, ignoreNulls = true).over(wf))
      .filter(col("_is_left") === 1)
      .withColumn("_gb",
        unix_micros(col(tsCol)) - col("_b").getField("_rts"))
      .withColumn("_gf",
        col("_f").getField("_rts") - unix_micros(col(tsCol)))
      .withColumn("_takeB",
        col("_b").isNotNull &&
          (col("_f").isNull || col("_gb") <= col("_gf")))
      .withColumn(s"matched_$rightValueCol",
        when(col("_takeB"), col("_b").getField("_rv"))
          .otherwise(col("_f").getField("_rv")))
      .withColumn("asof_gap_us",
        when(col("_takeB"), col("_gb")).otherwise(col("_gf")))
      .withColumn("asof_dir",
        when(col("_takeB"), lit("backward"))
          .when(col("_f").isNotNull, lit("forward")))
      .drop("_is_left", "_rv", "_rts", "_b", "_f", "_gb", "_gf",
        "_takeB")
  }
}
