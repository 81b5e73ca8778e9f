package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (extension
  * surface): reproducible subsets with per-group quotas, defined purely
  * by ordering — no RNG, so any engine (and any rerun) produces the
  * identical sample.
  */
object Sampling {

  /** Stratified deterministic take: the first ⌈fraction·|group|⌉ rows of
    * every group in `orderCol` order. One shuffle on the group key; the
    * two windows (rank + group size) share a single sort. Use for
    * balanced eval slices / curriculum subsets where reproducibility
    * beats randomness; for an unbiased random sample swap `orderCol`
    * for a hash of the id — the plan shape is identical.
    */
  def stratifiedTake(
      df: DataFrame, groupCol: String, orderCol: String,
      fraction: Double): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("_rn", row_number().over(byGroup.orderBy(col(orderCol))))
      .withColumn("_n", count(lit(1)).over(byGroup))
    ranked
      .filter(col("_rn") <= ceil(lit(fraction) * col("_n")))
      .drop("_rn", "_n")
  }

  /** Deterministic hash split: bucket = xxhash64(id) mod buckets. The
    * standard train/val/test assignment — stable across runs and
    * engines that share the hash; rows-only checkable against engines
    * that don't.
    */
  def hashSplit(df: DataFrame, idCol: String, buckets: Int): DataFrame =
    df.withColumn("split_bucket",
      pmod(xxhash64(col(idCol)), lit(buckets.toLong)))
}
