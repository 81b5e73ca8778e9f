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

  /** 2³¹−1 (Mersenne prime) — modulus of the MINSTD multiplicative
    * congruential permutation used by [[shuffleKey]]. Arithmetic-only so
    * ANY engine reproduces the identical order (unlike xxhash64).
    */
  val ShuffleMod = 2147483647L
  private val ShuffleMult = 742938285L

  /** Deterministic pseudo-random permutation key for an id:
    * `(id mod p) · 742938285 mod p` (a Fishman–Moore full-period
    * multiplier). Bijective on [1, p) — distinct ids keep distinct
    * keys. The multiplier is deliberately LARGE (≈0.35·p): consecutive
    * ids wrap the modulus almost every step, so the induced order is
    * scrambled even across a handful of adjacent ids — a small
    * multiplier like MINSTD's 48271 is order-PRESERVING on any id
    * range narrower than p/48271 ≈ 44k, which is exactly the corpus
    * prefix a naive test would sample. Intermediate product ≤ 2³¹·a <
    * 2⁶², so ANSI-mode long arithmetic never overflows at any id scale.
    */
  def shuffleKey(idCol: String): org.apache.spark.sql.Column =
    pmod(pmod(col(idCol).cast("long"), lit(ShuffleMod)) * ShuffleMult,
      lit(ShuffleMod))

  /** Deterministic global shuffle for training export: every row gets
    * its shard (key mod numShards) and its position within the shard's
    * shuffled order. Exactly the write layout a trainer wants —
    * sequential reads per shard ARE the shuffled order, no shuffle at
    * read time — and it is one window over the shard partitioning (one
    * shuffle at numShards-way parallelism; at 100 TB pick shards ≫
    * executor count so each window partition stays disk-friendly).
    */
  def shuffleShards(
      df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    val keyed = df.withColumn("_k", shuffleKey(idCol))
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("_k"), col(idCol))
    keyed
      .withColumn("shard", pmod(col("_k"), lit(numShards.toLong)))
      .withColumn("shard_pos",
        row_number().over(byShard).cast("long") - 1L)
      .drop("_k")
  }

  /** Mixture builder: per-group deterministic take at PER-GROUP rates —
    * the "20% code, 30% web, all of wiki" corpus-mixing step. Groups
    * absent from `weights` take `defaultWeight`; rates clamp to [0, 1].
    * Same single-sort two-window shape as [[stratifiedTake]], with the
    * weight lookup a broadcast-free CASE expression (the weight map is
    * query-constant, so it folds into codegen).
    */
  def weightedTake(
      df: DataFrame, groupCol: String, orderCol: String,
      weights: Map[String, Double], defaultWeight: Double = 0.0): DataFrame = {
    val rate = weights.foldLeft(lit(defaultWeight)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w.max(0.0).min(1.0))).otherwise(acc)
    }
    val byGroup = Window.partitionBy(col(groupCol))
    df.withColumn("_rn", row_number().over(byGroup.orderBy(col(orderCol))))
      .withColumn("_n", count(lit(1)).over(byGroup))
      .filter(col("_rn") <= ceil(rate * col("_n")))
      .drop("_rn", "_n")
  }
}
