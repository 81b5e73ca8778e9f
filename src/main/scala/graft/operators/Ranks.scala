package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe EXACT global rank / ntile — the shared primitive behind
  * every "bucket by global rank" operator (RFM quintiles, lift/gains
  * deciles, per-dimension equal-frequency bins, Spearman ranks).
  *
  * An unpartitioned `ntile(k).over(Window.orderBy(…))` is executed by
  * Spark as a SINGLE-PARTITION sort — every row moves to one task, the
  * textbook corpus-scale bottleneck. This helper produces the
  * IDENTICAL assignment (same standard SQL ntile contract: with
  * n = q·k + r, the first r tiles get q+1 rows) from a fully parallel
  * plan:
  *
  *  1. `buckets−1` range-boundary values of the key are estimated with
  *     one `approx_percentile` aggregate and COLLECTED (≤ groups ×
  *     buckets doubles — a bounded driver load, same class as the
  *     centroid/codebook loads elsewhere). Boundary accuracy affects
  *     only LOAD BALANCE, never results, which is what makes the
  *     approximate sketch safe here.
  *  2. Each row's bucket is a pure LITERAL comparison chain (count of
  *     boundaries passed) — deterministic across plan branches by
  *     construction, monotone with the key order (long→double key
  *     casts are monotone, so precision loss only merges neighbouring
  *     buckets).
  *  3. `row_number` over (group, bucket) gives local ranks — a hash
  *     exchange at groups×buckets-way parallelism, each task sorting
  *     ~n/buckets rows.
  *  4. Per-bucket counts (one map-side-combined aggregate, ≤ groups ×
  *     buckets rows) are collected, prefix-summed on the driver, and
  *     rebroadcast as a LITERAL offset frame; global rank = bucket
  *     offset + local rank.
  *
  * Rank is exact — not an approximation — because bucketing is
  * monotone and the within-bucket order is the caller's total order.
  * Ties in the key are fine (they share a bucket; `ties` columns
  * order them); the caller's (key, ties…) must be a TOTAL order for
  * ntile determinism, exactly as with the window form.
  *
  * NULL keys follow Spark's window defaults: NULLS FIRST ascending
  * (bucket 0), NULLS LAST descending (a dedicated past-the-end
  * bucket).
  *
  * The input must be DETERMINISTIC across jobs (the usual multi-pass
  * contract, as for k-means or IVF): the bounded boundary/count jobs
  * and the final rank pass each re-evaluate `df`, so a
  * nondeterministic frame (an unordered `limit`, a `rand()` filter)
  * must be materialized first.
  */
object Ranks {

  /** df + `out` = exact 1-based global rank under the total order
    * (key asc|desc, ties…). `buckets` bounds per-task sort size
    * (pick ≳ cluster cores at scale).
    */
  def withGlobalRank(
      df: DataFrame, out: String, key: Column, descending: Boolean = false,
      ties: Seq[Column] = Nil, buckets: Int = 64): DataFrame =
    withGroupRank(df, out, Nil, key, descending, ties, buckets)

  /** df + `out` = exact SQL `ntile(k)` (LongType) under the same total
    * order — drop-in for `ntile(k).over(Window.orderBy(…))` minus the
    * single-partition sort.
    */
  def withGlobalNtile(
      df: DataFrame, out: String, k: Int, key: Column,
      descending: Boolean = false, ties: Seq[Column] = Nil,
      buckets: Int = 64): DataFrame =
    withGroupNtile(df, out, k, Nil, key, descending, ties, buckets)

  /** Per-group exact rank: `out` restarts at 1 within each value of
    * `groupCols` (bounded-domain group keys — dimensions, shards).
    * Boundaries are estimated PER GROUP, so a group 100× the corpus
    * mean still spreads over `buckets` tasks.
    */
  def withGroupRank(
      df: DataFrame, out: String, groupCols: Seq[String], key: Column,
      descending: Boolean = false, ties: Seq[Column] = Nil,
      buckets: Int = 32): DataFrame = {
    val (ranked, _) = rankImpl(df, out, groupCols, key, descending, ties, buckets)
    ranked.drop("_gr_b", "_gr_n_total")
  }

  /** Per-group exact SQL ntile(k) (LongType). */
  def withGroupNtile(
      df: DataFrame, out: String, k: Int, groupCols: Seq[String],
      key: Column, descending: Boolean = false, ties: Seq[Column] = Nil,
      buckets: Int = 32): DataFrame = {
    require(k > 0, s"ntile needs k > 0, got $k")
    val (ranked, rankCol) =
      rankImpl(df, "_gr_rank", groupCols, key, descending, ties, buckets)
    // standard SQL ntile from the exact rank, all-integer: with
    // n = q·k + r the first r tiles hold q+1 rows. The q = 0 branch
    // (n < k) never reaches the `div q` arm: rank0 < n = r·(q+1).
    // `greatest(…, 1)` on the ELSE divisor: when q = 0 that arm is
    // unreachable, but codegen may still emit the ANSI division —
    // substituting divisor 1 in the dead branch changes nothing.
    val tile = expr(
      s"""CASE WHEN ($rankCol - 1L) < (_gr_n_total % $k) * ((_gr_n_total div $k) + 1L)
         |  THEN ($rankCol - 1L) div ((_gr_n_total div $k) + 1L)
         |  ELSE (_gr_n_total % $k) +
         |    (($rankCol - 1L) - (_gr_n_total % $k) * ((_gr_n_total div $k) + 1L))
         |      div greatest(_gr_n_total div $k, 1L)
         |END + 1L""".stripMargin)
    ranked.withColumn(out, tile)
      .drop("_gr_b", "_gr_n_total", rankCol)
  }

  /** Shared machinery — returns (df + bucket `_gr_b` + group total
    * `_gr_n_total` + rank column, rank column name).
    */
  private def rankImpl(
      df: DataFrame, out: String, groupCols: Seq[String], key: Column,
      descending: Boolean, ties: Seq[Column],
      buckets: Int): (DataFrame, String) = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val spark = df.sparkSession
    val g = groupCols.map(col)
    val keyd = key.cast("double")

    // 1. boundary estimation (one aggregate job, bounded collect)
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val boundaryRows: Array[Row] =
      if (buckets == 1) Array.empty
      else {
        val agg = approx_percentile(keyd, array(fracs.map(lit): _*), lit(10000))
          .as("_gr_bs")
        (if (groupCols.isEmpty) df.agg(agg)
         else df.groupBy(g: _*).agg(agg)).collect()
      }

    // 2. deterministic bucket expression (literal boundaries only, so
    //    every plan branch recomputes the identical assignment).
    //    Ascending: #boundaries strictly below the key; null keys sort
    //    first → the null comparisons fall out to bucket 0.
    //    Descending: #boundaries strictly above; null keys sort LAST →
    //    an explicit past-the-end bucket.
    def bucketOf(bs: Column): Column = {
      val cmp =
        if (descending) size(filter(bs, b => b > keyd))
        else size(filter(bs, b => keyd > b))
      val nonNull = coalesce(cmp.cast("long"), lit(0L))
      if (descending) when(key.isNull, lit(buckets.toLong)).otherwise(nonNull)
      else nonNull
    }
    val bucketed =
      if (groupCols.isEmpty) {
        val bs: Seq[Double] =
          if (boundaryRows.isEmpty) Nil
          else Option(boundaryRows.head
              .getAs[scala.collection.Seq[Double]]("_gr_bs"))
            .map(_.toSeq).getOrElse(Nil)
        val b =
          if (bs.isEmpty) {
            if (descending) when(key.isNull, lit(1L)).otherwise(lit(0L))
            else lit(0L)
          } else bucketOf(array(bs.map(lit): _*))
        df.withColumn("_gr_b", b)
      } else if (boundaryRows.isEmpty) {
        // empty input or buckets == 1: one bucket per group
        val b =
          if (descending) when(key.isNull, lit(1L)).otherwise(lit(0L))
          else lit(0L)
        df.withColumn("_gr_b", b)
      } else {
        // per-group literal boundary frame (rebuilt from the collected
        // rows so every plan branch sees identical constants)
        val bSchema = StructType(boundaryRows.head.schema.fields)
        val renamed = groupCols.zipWithIndex.foldLeft(
          spark.createDataFrame(boundaryRows.toSeq.asJava, bSchema)) {
          case (d, (c, i)) => d.withColumnRenamed(c, s"_gr_g_$i")
        }
        val cond = groupCols.zipWithIndex
          .map { case (c, i) => col(c) <=> col(s"_gr_g_$i") }
          .reduce(_ && _)
        df.join(broadcast(renamed), cond, "left")
          .withColumn("_gr_b", bucketOf(col("_gr_bs")))
          .drop((groupCols.indices.map(i => s"_gr_g_$i") :+ "_gr_bs"): _*)
      }

    // 3. local ranks at (group × bucket)-way parallelism
    val ord = (if (descending) key.desc else key.asc) +: ties
    val w = Window.partitionBy((g :+ col("_gr_b")): _*).orderBy(ord: _*)
    val local = bucketed.withColumn("_gr_lr", row_number().over(w).cast("long"))

    // 4. bucket counts → driver prefix sums → literal offsets. The
    //    collect is ≤ groups × (buckets+1) rows by construction.
    val cntRows = bucketed
      .groupBy((g :+ col("_gr_b")): _*)
      .agg(count(lit(1)).as("_gr_n"))
      .collect()
    val ng = groupCols.size
    val ranked =
      if (groupCols.isEmpty) {
        // global: offsets become a literal array indexed by bucket —
        // no join at all, the lookup is one codegen'd element_at
        val byBucket = cntRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
        val total = byBucket.values.sum
        val offs = (0L to buckets.toLong).scanLeft(0L) { (acc, b) =>
          acc + byBucket.getOrElse(b, 0L)
        }.init
        local
          .withColumn(out,
            element_at(array(offs.map(lit): _*), (col("_gr_b") + 1L)
              .cast("int")) + col("_gr_lr"))
          .withColumn("_gr_n_total", lit(total))
          .drop("_gr_lr")
      } else {
        val offRows: Seq[Row] = cntRows.toSeq
          .groupBy(r => (0 until ng).map(r.get))
          .flatMap { case (_, rows) =>
            val sorted = rows.sortBy(_.getLong(ng))
            val total = sorted.map(_.getLong(ng + 1)).sum
            sorted.scanLeft((0L, null: Row)) { case ((acc, _), r) =>
              (acc + r.getLong(ng + 1),
                Row.fromSeq(r.toSeq.take(ng + 1) ++ Seq(acc, total)))
            }.drop(1).map(_._2)
          }.toSeq
        val offSchema = StructType(
          bucketed.select((g :+ col("_gr_b")): _*).schema.fields ++
            Seq(StructField("_gr_off", LongType, nullable = false),
              StructField("_gr_n_total", LongType, nullable = false)))
        val offRenamed = groupCols.zipWithIndex.foldLeft(
          spark.createDataFrame(offRows.asJava, offSchema)
            .withColumnRenamed("_gr_b", "_gr_ob")) {
          case (d, (c, i)) => d.withColumnRenamed(c, s"_gr_og_$i")
        }
        // bucket equality is null-safe (<=>) deliberately: a plain
        // attribute equality lets InferFiltersFromConstraints push the
        // bucket's defining expression (which references the caller's
        // key column) across the join onto the literal relation, where
        // ConvertToLocalRelation fails to bind it — an optimizer bug
        // this shape otherwise triggers. Values are never null; the
        // hash join strategy is unaffected.
        val joinCond = (groupCols.zipWithIndex
          .map { case (c, i) => col(c) <=> col(s"_gr_og_$i") } :+
          (col("_gr_b") <=> col("_gr_ob"))).reduce(_ && _)
        local
          .join(broadcast(offRenamed), joinCond)
          .withColumn(out, col("_gr_off") + col("_gr_lr"))
          .drop((groupCols.indices.map(i => s"_gr_og_$i") ++
            Seq("_gr_ob", "_gr_off", "_gr_lr")): _*)
      }
    (ranked, out)
  }
}
