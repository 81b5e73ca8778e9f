package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimension data skipping —
  * the lakehouse clustering trick (Delta/Iceberg `OPTIMIZE ZORDER BY`):
  * interleave the bits of two quantized dimensions so rows close in
  * EITHER dimension land in the same files, and a range predicate on
  * either column prunes most files by their min/max footer stats.
  * A single-column sort gives perfect pruning on one dimension and
  * none on the other; Z-order gives ~√ pruning on both — at 100 TB
  * that is the difference between scanning a terabyte and a full
  * corpus pass when queries filter on more than one key.
  *
  * The z-value is a pure arithmetic column expression (quantize to
  * `bits` via global min/max, then an unrolled bit interleave) —
  * codegen'd, deterministic, and reproducible in plain SQL (the gate's
  * DuckDB oracle recomputes identical values).
  */
object ZOrder {

  /** Quantize `c` into [0, 2^bits) using the given closed bounds.
    * Double arithmetic is identical cross-engine for the same
    * expression shape; `floor` of it is therefore stable.
    */
  private[ingest] def quantize(
      c: Column, minV: Column, maxV: Column, bits: Int): Column = {
    val levels = (1L << bits) - 1
    when(maxV === minV, lit(0L)).otherwise(
      floor((c.cast("double") - minV) * levels / (maxV - minV)).cast("long"))
  }

  /** Interleave the low `bits` of `a` (even positions) and `b` (odd
    * positions) into one Morton code. Unrolled shifts/masks — whole
    * stage codegen keeps this a few dozen ALU ops per row.
    */
  private[ingest] def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The z-value column for (colA, colB) quantized at `bits` each,
    * with bounds taken from a 1-row global aggregate of `df` (two
    * scans total: bounds + consumer; at ingest the bounds scan prices
    * in at metadata cost).
    */
  def zValue(
      df: DataFrame, colA: String, colB: String, bits: Int = 16): DataFrame = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val bounds = df.agg(
      min(col(colA).cast("double")).as("_min_a"),
      max(col(colA).cast("double")).as("_max_a"),
      min(col(colB).cast("double")).as("_min_b"),
      max(col(colB).cast("double")).as("_max_b"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z", interleave(
        quantize(col(colA), col("_min_a"), col("_max_a"), bits),
        quantize(col(colB), col("_min_b"), col("_max_b"), bits), bits))
      .drop("_min_a", "_max_a", "_min_b", "_max_b")
  }

  /** Write `df` as `numFiles` z-clustered parquet files: range
    * partition by z, sort within partitions by z. Each output file then
    * covers a compact Morton-curve segment — a tight bounding box in
    * BOTH dimensions.
    */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int = 16, bits: Int = 16): String = {
    val z = zValue(df, colA, colB, bits)
    z.repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)
    path
  }

  /** Per-file [min,max] of both dimensions for a written layout, plus
    * the fraction of files a (loA..hiA, loB..hiB) box predicate would
    * scan — the data-skipping payoff a lakehouse reads from parquet
    * footers. One metadata-cheap scan (two columns + input_file_name).
    */
  def pruningStats(
      spark: SparkSession, path: String, colA: String, colB: String,
      loA: Double, hiA: Double, loB: Double, hiB: Double): DataFrame = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA).cast("double")).as("min_a"),
        max(col(colA).cast("double")).as("max_a"),
        min(col(colB).cast("double")).as("min_b"),
        max(col(colB).cast("double")).as("max_b"))
    perFile.agg(
      count(lit(1)).as("n_files"),
      sum(when(col("min_a") <= hiA && col("max_a") >= loA &&
        col("min_b") <= hiB && col("max_b") >= loB, 1L).otherwise(0L))
        .as("files_scanned"))
  }
}
