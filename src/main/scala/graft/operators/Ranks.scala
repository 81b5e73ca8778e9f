package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

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
  *     re-injected as LITERAL offset arrays; global rank = bucket
  *     offset + local rank.
  *
  * Several specs batch through ONE boundary job and ONE count job
  * ([[withRanks]] — the count pass explodes a (spec, bucket) pair per
  * spec per row, still map-side-combining to specs × buckets rows), so
  * an operator ranking three metrics (RFM) pays three window exchanges
  * but only two bounded driver actions total.
  *
  * Rank is exact — not an approximation — because bucketing is
  * monotone and the within-bucket order is the caller's total order.
  * Ties in the key are fine (they share a bucket; `ties` columns
  * order them); the caller's (key, ties…) must be a TOTAL order for
  * ntile determinism, exactly as with the window form. A MASSIVELY
  * tied key (one value on most rows) degrades toward one task holding
  * the tied run — the declared skew boundary, same class as the LSH
  * hot-band caps; results stay exact.
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

  /** One ranking to compute: `out` gets the exact SQL `ntile(k)` when
    * `ntile` > 0, else the exact 1-based dense global/group rank.
    * Order is (key asc|desc, shared ties…).
    */
  final case class RankSpec(
      out: String, key: Column, descending: Boolean = false,
      ntile: Int = 0)

  /** df + `out` = exact 1-based global rank under the total order
    * (key asc|desc, ties…). `buckets` bounds per-task sort size
    * (pick ≳ cluster cores at scale).
    */
  def withGlobalRank(
      df: DataFrame, out: String, key: Column, descending: Boolean = false,
      ties: Seq[Column] = Nil, buckets: Int = 64): DataFrame =
    withRanks(df, Seq(RankSpec(out, key, descending)), Nil, ties, buckets)

  /** df + `out` = exact SQL `ntile(k)` (LongType) under the same total
    * order — drop-in for `ntile(k).over(Window.orderBy(…))` minus the
    * single-partition sort.
    */
  def withGlobalNtile(
      df: DataFrame, out: String, k: Int, key: Column,
      descending: Boolean = false, ties: Seq[Column] = Nil,
      buckets: Int = 64): DataFrame =
    withRanks(df, Seq(RankSpec(out, key, descending, ntile = k)), Nil,
      ties, buckets)

  /** Per-group exact rank: `out` restarts at 1 within each value of
    * `groupCols` (bounded-domain group keys — dimensions, shards).
    * Boundaries are estimated PER GROUP, so a group 100× the corpus
    * mean still spreads over `buckets` tasks.
    */
  def withGroupRank(
      df: DataFrame, out: String, groupCols: Seq[String], key: Column,
      descending: Boolean = false, ties: Seq[Column] = Nil,
      buckets: Int = 32): DataFrame =
    withRanks(df, Seq(RankSpec(out, key, descending)), groupCols, ties,
      buckets)

  /** Per-group exact SQL ntile(k) (LongType). */
  def withGroupNtile(
      df: DataFrame, out: String, k: Int, groupCols: Seq[String],
      key: Column, descending: Boolean = false, ties: Seq[Column] = Nil,
      buckets: Int = 32): DataFrame =
    withRanks(df, Seq(RankSpec(out, key, descending, ntile = k)),
      groupCols, ties, buckets)

  /** The batched core: every spec's rank/ntile in one pass — one
    * boundary job, one count job, then one window exchange per spec
    * chained in the caller's plan.
    */
  def withRanks(
      df: DataFrame, specs: Seq[RankSpec], groupCols: Seq[String] = Nil,
      ties: Seq[Column] = Nil, buckets: Int = 32): DataFrame = {
    require(specs.nonEmpty, "need at least one RankSpec")
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    require(specs.map(_.out).distinct.size == specs.size,
      s"duplicate output columns in ${specs.map(_.out)}")
    specs.foreach(sp => require(sp.ntile >= 0,
      s"${sp.out}: ntile must be >= 0 (0 = plain rank), got ${sp.ntile}"))
    val spark = df.sparkSession
    val g = groupCols.map(col)
    val ng = groupCols.size

    // 1. ONE boundary job: an approx_percentile column per spec
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val boundaryRows: Array[Row] =
      if (buckets == 1) Array.empty
      else {
        val aggs = specs.zipWithIndex.map { case (sp, i) =>
          approx_percentile(sp.key.cast("double"),
            array(fracs.map(lit): _*), lit(10000)).as(s"_gr_bs_$i")
        }
        (if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
         else df.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)).collect()
      }

    // 2. deterministic bucket expression per spec (literal boundaries
    //    only, so every plan branch recomputes the identical
    //    assignment). Ascending: #boundaries strictly below the key;
    //    null keys sort first → the null comparisons fall out to
    //    bucket 0. Descending: #boundaries strictly above; null keys
    //    sort LAST → an explicit past-the-end bucket.
    def bucketOf(sp: RankSpec, bs: Column): Column = {
      val keyd = sp.key.cast("double")
      val cmp =
        if (sp.descending) size(filter(bs, b => b > keyd))
        else size(filter(bs, b => keyd > b))
      val nonNull = coalesce(cmp.cast("long"), lit(0L))
      if (sp.descending)
        when(sp.key.isNull, lit(buckets.toLong)).otherwise(nonNull)
      else nonNull
    }
    def degenerateBucket(sp: RankSpec): Column =
      if (sp.descending) when(sp.key.isNull, lit(1L)).otherwise(lit(0L))
      else lit(0L)

    val bucketed =
      if (boundaryRows.isEmpty) {
        // empty input or buckets == 1: one bucket (+null bucket desc)
        specs.zipWithIndex.foldLeft(df) { case (d, (sp, i)) =>
          d.withColumn(s"_gr_b_$i", degenerateBucket(sp))
        }
      } else if (groupCols.isEmpty) {
        specs.zipWithIndex.foldLeft(df) { case (d, (sp, i)) =>
          val bs = Option(boundaryRows.head
              .getAs[scala.collection.Seq[Double]](s"_gr_bs_$i"))
            .map(_.toSeq).getOrElse(Nil)
          d.withColumn(s"_gr_b_$i",
            if (bs.isEmpty) degenerateBucket(sp)
            else bucketOf(sp, array(bs.map(lit): _*)))
        }
      } else {
        // per-group literal boundary frame (one frame carrying every
        // spec's array, rebuilt from the collected rows so all plan
        // branches see identical constants)
        val bSchema = StructType(boundaryRows.head.schema.fields)
        val renamed = groupCols.zipWithIndex.foldLeft(
          spark.createDataFrame(boundaryRows.toSeq.asJava, bSchema)) {
          case (d, (c, i)) => d.withColumnRenamed(c, s"_gr_g_$i")
        }
        val cond = groupCols.zipWithIndex
          .map { case (c, i) => col(c) <=> col(s"_gr_g_$i") }
          .reduce(_ && _)
        val joined = df.join(broadcast(renamed), cond, "left")
        specs.zipWithIndex.foldLeft(joined) { case (d, (sp, i)) =>
          d.withColumn(s"_gr_b_$i", bucketOf(sp, col(s"_gr_bs_$i")))
        }.drop((groupCols.indices.map(i => s"_gr_g_$i") ++
          specs.indices.map(i => s"_gr_bs_$i")): _*)
      }

    // 3. ONE count job: a (spec, bucket) pair per spec per row,
    //    map-side combined to ≤ groups × specs × (buckets+1) rows
    val pairs = array(specs.indices.map(i =>
      struct(lit(i).as("_si"), col(s"_gr_b_$i").as("_sb"))): _*)
    val cntRows = bucketed
      .select((g :+ explode(pairs).as("_p")): _*)
      .groupBy((g ++ Seq(col("_p._si").as("_si"), col("_p._sb").as("_sb"))): _*)
      .agg(count(lit(1)).as("_gr_n"))
      .collect()

    // driver prefix sums → per (group, spec) offset arrays indexed by
    // bucket (buckets+1 entries, missing buckets contribute 0), plus
    // the group total (identical across specs; taken from spec 0)
    def offsetsOf(rows: Seq[Row]): (Map[Int, Seq[Long]], Long) = {
      val bySpec = rows.groupBy(_.getInt(ng))
      val total = bySpec.getOrElse(0, Nil).map(_.getLong(ng + 2)).sum
      val arrays = bySpec.map { case (si, rs) =>
        val byBucket =
          rs.map(r => r.getLong(ng + 1) -> r.getLong(ng + 2)).toMap
        si -> (0L to buckets.toLong).scanLeft(0L) { (acc, b) =>
          acc + byBucket.getOrElse(b, 0L)
        }.init
      }
      (arrays, total)
    }

    def ordOf(sp: RankSpec): Seq[Column] =
      (if (sp.descending) sp.key.desc else sp.key.asc) +: ties

    def tileOf(rankCol: String, totalSql: String, k: Int): Column =
      // standard SQL ntile from the exact rank, all-integer: with
      // n = q·k + r the first r tiles hold q+1 rows. The q = 0 branch
      // (n < k) never reaches the `div q` arm (rank0 < n = r·(q+1));
      // `greatest(…, 1)` keeps the dead branch's ANSI division alive
      // under codegen without changing any reachable value.
      expr(
        s"""CASE WHEN ($rankCol - 1L) < (($totalSql) % $k) * ((($totalSql) div $k) + 1L)
           |  THEN ($rankCol - 1L) div ((($totalSql) div $k) + 1L)
           |  ELSE (($totalSql) % $k) +
           |    (($rankCol - 1L) - (($totalSql) % $k) * ((($totalSql) div $k) + 1L))
           |      div greatest(($totalSql) div $k, 1L)
           |END + 1L""".stripMargin)

    // 4. + 5. offsets as literals; one window per spec, chained
    val ranked =
      if (groupCols.isEmpty) {
        val (offArrays, total) = offsetsOf(cntRows.toSeq)
        specs.zipWithIndex.foldLeft(bucketed) { case (d, (sp, i)) =>
          val w = Window.partitionBy(col(s"_gr_b_$i")).orderBy(ordOf(sp): _*)
          val offs = offArrays.getOrElse(i, Seq.fill(buckets + 1)(0L))
          val rank = element_at(array(offs.map(lit): _*),
            (col(s"_gr_b_$i") + 1L).cast("int")) +
            row_number().over(w).cast("long")
          if (sp.ntile > 0)
            d.withColumn(s"_gr_r_$i", rank)
              .withColumn(sp.out,
                tileOf(s"_gr_r_$i", total.toString + "L", sp.ntile))
              .drop(s"_gr_r_$i")
          else d.withColumn(sp.out, rank)
        }
      } else {
        // one literal frame per GROUP: group key, every spec's offset
        // array, and the group total — joined back once (broadcast)
        val byGroup = cntRows.toSeq.groupBy(r => (0 until ng).map(r.get))
        val offRows: Seq[Row] = byGroup.map { case (gk, rs) =>
          val (arrays, total) = offsetsOf(rs)
          Row.fromSeq(gk ++
            specs.indices.map(i =>
              arrays.getOrElse(i, Seq.fill(buckets + 1)(0L))) :+
            total)
        }.toSeq
        val offSchema = StructType(
          bucketed.select(g: _*).schema.fields ++
            specs.indices.map(i =>
              StructField(s"_gr_offs_$i", ArrayType(LongType), false)) :+
            StructField("_gr_total", LongType, nullable = false))
        val offRenamed = groupCols.zipWithIndex.foldLeft(
          spark.createDataFrame(offRows.asJava, offSchema)) {
          case (d, (c, i)) => d.withColumnRenamed(c, s"_gr_og_$i")
        }
        // null-safe group equality both for NULL group values and to
        // keep InferFiltersFromConstraints from substituting bucket
        // definitions across the join into the literal relation (an
        // optimizer bug plain `=` triggers here —
        // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in ConvertToLocalRelation)
        val cond = groupCols.zipWithIndex
          .map { case (c, i) => col(c) <=> col(s"_gr_og_$i") }
          .reduce(_ && _)
        val joined = bucketed.join(broadcast(offRenamed), cond)
        specs.zipWithIndex.foldLeft(joined) { case (d, (sp, i)) =>
          val w = Window.partitionBy((g :+ col(s"_gr_b_$i")): _*)
            .orderBy(ordOf(sp): _*)
          val rank = element_at(col(s"_gr_offs_$i"),
            (col(s"_gr_b_$i") + 1L).cast("int")) +
            row_number().over(w).cast("long")
          if (sp.ntile > 0)
            d.withColumn(s"_gr_r_$i", rank)
              .withColumn(sp.out, tileOf(s"_gr_r_$i", "_gr_total", sp.ntile))
              .drop(s"_gr_r_$i")
          else d.withColumn(sp.out, rank)
        }.drop((groupCols.indices.map(i => s"_gr_og_$i") ++
          specs.indices.map(i => s"_gr_offs_$i") :+ "_gr_total"): _*)
      }
    ranked.drop(specs.indices.map(i => s"_gr_b_$i"): _*)
  }

  /** One running sum to compute over the [[withRunningSums]] key
    * order: `out` = the exact cumulative sum of `value` up to the
    * current row (inclusive) or up to the previous row (exclusive;
    * first row gets 0). `value` must be integral — sums stay exact
    * longs end to end (the Evaluation quantize-first contract).
    */
  final case class SumSpec(
      out: String, value: Column, inclusive: Boolean = true)

  /** Distributed EXACT prefix sums over a frame totally ordered by an
    * integral `key` with UNIQUE key values (a distinct-value /
    * groupBy-key frame — every call site's shape) — the drop-in for
    * `sum(v).over(Window.orderBy(key))`, whose unpartitioned window
    * Spark executes as a SINGLE-PARTITION sort.
    *
    * Same recipe as [[withRanks]]: boundary values of the key are
    * estimated once with `approx_percentile` and COLLECTED, each row's
    * bucket is a literal comparison chain (monotone with the key, so
    * bucketing never reorders; accuracy affects only load balance),
    * per-bucket totals are collected (≤ buckets rows) and
    * prefix-summed on the driver, and the global running sum is the
    * bucket's literal offset + a bucket-partitioned window's local
    * running sum. NULL keys sort first (bucket 0), matching the
    * ascending window they replace. The input is materialized
    * internally, so the three passes read one computed frame — corpus
    * work upstream of the distinct-value aggregate still runs once.
    *
    * `nextKeyOut` additionally emits each row's successor key under
    * the global order (`lead(key, 1)` equivalent; NULL on the last
    * row) — per-bucket `lead` patched at bucket edges with the next
    * non-empty bucket's collected min key.
    */
  def withRunningSums(
      df: DataFrame, key: Column, specs: Seq[SumSpec],
      nextKeyOut: Option[String] = None, buckets: Int = 32): DataFrame = {
    require(specs.nonEmpty, "need at least one SumSpec")
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val in = Materialize.frame(df)
    val keyd = key.cast("double")
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val bs: Seq[Double] =
      if (buckets == 1) Nil
      else {
        val r = in.agg(approx_percentile(keyd,
          array(fracs.map(lit): _*), lit(10000)).as("_rs_bs")).collect().head
        Option(r.getAs[scala.collection.Seq[Double]]("_rs_bs"))
          .map(_.toSeq).getOrElse(Nil)
      }
    val bucketCol =
      if (bs.isEmpty) lit(0L)
      else coalesce(
        size(filter(array(bs.map(lit): _*), b => keyd > b)).cast("long"),
        lit(0L))
    val bkt = in.withColumn("_rs_b", bucketCol)
    val totalAggs = specs.zipWithIndex.map { case (sp, i) =>
      sum(sp.value.cast("long")).as(s"_rs_t_$i")
    } :+ min(key.cast("long")).as("_rs_mk")
    val tRows = bkt.groupBy(col("_rs_b"))
      .agg(totalAggs.head, totalAggs.tail: _*).collect()
    val byBucket = tRows.map(r => r.getLong(0) -> r).toMap
    // exclusive prefix of each spec's per-bucket totals
    val offArrs: Seq[IndexedSeq[Long]] = specs.indices.map { i =>
      var acc = 0L
      (0 until buckets).map { b =>
        val cur = acc
        byBucket.get(b.toLong).foreach { r =>
          if (!r.isNullAt(1 + i)) acc += r.getLong(1 + i)
        }
        cur
      }
    }
    // min key of the next non-empty bucket, per bucket (right scan)
    val nextMin: IndexedSeq[Option[Long]] = {
      var succ: Option[Long] = None
      (buckets - 1 to 0 by -1).map { b =>
        val cur = succ
        byBucket.get(b.toLong).foreach { r =>
          if (!r.isNullAt(1 + specs.size)) succ = Some(r.getLong(1 + specs.size))
        }
        cur
      }.reverse
    }
    val w = Window.partitionBy(col("_rs_b")).orderBy(key.asc)
    val idx = (col("_rs_b") + 1L).cast("int")
    val withSums = specs.zipWithIndex.foldLeft(bkt) { case (d, (sp, i)) =>
      val frame =
        if (sp.inclusive) w.rowsBetween(Window.unboundedPreceding, 0)
        else w.rowsBetween(Window.unboundedPreceding, -1)
      d.withColumn(sp.out,
        coalesce(sum(sp.value.cast("long")).over(frame), lit(0L)) +
          element_at(array(offArrs(i).map(lit): _*), idx))
    }
    nextKeyOut.fold(withSums) { out =>
      val nextArr = array(nextMin.map(o =>
        o.map(v => lit(v)).getOrElse(lit(null).cast("long"))): _*)
      withSums.withColumn(out,
        coalesce(lead(key.cast("long"), 1).over(w), element_at(nextArr, idx)))
    }.drop("_rs_b")
  }

  /** Exact top-k rows per group under the total order (key desc|asc,
    * ties…) WITHOUT a full per-group sort. A bare
    * `row_number().over(partitionBy(group).orderBy(…))` moves each
    * whole group to one task with parallelism capped at the group
    * count — for a per-source vocabulary frame that is one task
    * sorting a web-scale group's entire vocabulary to keep 500 rows.
    *
    * Here rows are salted into `salts` sub-buckets by a deterministic
    * hash of the (key, ties…) order columns and ranked locally within
    * (group, salt): any row of a group's global top-k is necessarily
    * in its own sub-bucket's top-k (the rows ahead of it globally are a
    * superset of those ahead of it in the sub-bucket), so keeping each
    * sub-bucket's top-k and re-ranking the ≤ salts·k survivors per
    * group is exact. The heavy pass runs at groups×salts-way
    * parallelism; the final per-group sort touches ≤ salts·k rows.
    *
    * `out` is the exact 1-based rank (LongType); only rows with
    * rank ≤ k survive. (key, ties…) must be a total order within each
    * group, exactly as with the window form; single-pass, no bounded
    * driver actions — unlike [[withRanks]] this never re-evaluates the
    * input, so nondeterministic frames are safe.
    */
  def topKPerGroup(
      df: DataFrame, out: String, k: Int, groupCols: Seq[String],
      key: Column, descending: Boolean = true, ties: Seq[Column] = Nil,
      salts: Int = 32): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(salts >= 1, s"need salts >= 1, got $salts")
    val ord = ((if (descending) key.desc else key.asc) +: ties.map(_.asc))
    val g = groupCols.map(col)
    val salted = df.withColumn("_tk_s",
      pmod(xxhash64((key +: ties): _*), lit(salts)))
    val wLocal = Window.partitionBy((g :+ col("_tk_s")): _*).orderBy(ord: _*)
    val survivors = salted
      .withColumn("_tk_r", row_number().over(wLocal))
      .filter(col("_tk_r") <= k)
      .drop("_tk_s", "_tk_r")
    val wFinal = Window.partitionBy(g: _*).orderBy(ord: _*)
    survivors
      .withColumn(out, row_number().over(wFinal).cast("long"))
      .filter(col(out) <= k)
  }
}
