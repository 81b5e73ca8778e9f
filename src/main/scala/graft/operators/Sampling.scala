package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (extension
  * surface): reproducible subsets with per-group quotas, defined purely
  * by ordering — no RNG, so any engine (and any rerun) produces the
  * identical sample.
  */
object Sampling {

  /** Stratified deterministic take: the first ⌈fraction·|group|⌉ rows of
    * every group in `orderCol` order. Ranks come from
    * [[Ranks.withGroupRank]] (range sub-buckets inside each stratum) —
    * strata are typically FEW (languages, sources) over corpus-scale
    * rows, so a bare per-group window would sort each whole stratum in
    * one task; group sizes ride a strata-bounded broadcast. Use for
    * balanced eval slices / curriculum subsets where reproducibility
    * beats randomness (`orderCol` should be unique within a group, as
    * before — ties at the cutoff are order-unstable in any rank-based
    * take); for an unbiased random sample swap `orderCol` for a hash
    * of the id — the plan shape is identical.
    *
    * NOTE: ranks run through [[Ranks.withGroupRank]], whose bounded
    * boundary/count jobs re-evaluate `df` — the input must be
    * DETERMINISTIC across jobs (the standard multi-pass contract);
    * materialize nondeterministic frames (unordered limits, rand()
    * filters) first or the collected offsets disagree with the rank
    * pass and the returned ranks are silently wrong.
    */
  def stratifiedTake(
      df: DataFrame, groupCol: String, orderCol: String,
      fraction: Double): DataFrame = {
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .withColumnRenamed(groupCol, "_sg")
    Ranks.withGroupRank(df, "_rn", Seq(groupCol), col(orderCol))
      .join(broadcast(sizes), col(groupCol) <=> col("_sg"))
      .filter(col("_rn") <= ceil(lit(fraction) * col("_n")))
      .drop("_rn", "_n", "_sg")
  }

  /** Quantile bucket labels over a score column — the CCNet-style
    * head/middle/tail corpus partitioning (bucket by quality/LM score,
    * then sample each tier at its own rate). Thresholds come from the
    * EXACT `percentile` aggregate: one reduce to a single broadcast
    * row, then a per-row comparison chain — no global sort or window,
    * so the plan is a scan plus a scalar join at any corpus size. At
    * extreme scale swap in `approx_percentile` (the gate degrades to
    * rows-only, the pipeline_profile convention). Bucket i is
    * score ≤ cuts(i) quantile; the last label catches the rest.
    *
    * `tieEpsilon` makes the comparison robust to the ENGINE's
    * interpolation arithmetic: when the quantile lands on tied
    * neighbours, `a + f·(b−a)` yields exactly `a` but `a·(1−f) + b·f`
    * is an ulp below it, so a strict ≤ would classify every tied row
    * differently across engines. Scores quantized to ≥1e-6 steps keep
    * genuine non-tie thresholds ≥ (min cut)·1e-6 away from any data
    * value, so 1e-9 never reclassifies a non-tied row.
    */
  def bucketByScore(
      df: DataFrame, scoreCol: String,
      cuts: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("tail", "middle", "head"),
      tieEpsilon: Double = 1e-9): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted &&
      cuts.forall(c => c > 0 && c < 1) && labels.size == cuts.size + 1,
      "need sorted cuts in (0,1) and exactly one more label than cuts")
    val th = df.agg(percentile(col(scoreCol), lit(cuts.toArray)).as("_th"))
    val bucket = cuts.indices.foldRight(lit(labels.last)) { (i, rest) =>
      when(col(scoreCol) <= element_at(col("_th"), i + 1) + lit(tieEpsilon),
        lit(labels(i))).otherwise(rest)
    }
    df.crossJoin(broadcast(th))
      .withColumn("bucket", bucket)
      .drop("_th")
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
    Dedup.requireLongCastableId(df, idCol)
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

  /** Temperature-scaled mixture take — the multilingual/multi-domain
    * re-balancing rule (sample group g with probability ∝ n_g^τ):
    * τ = 1 keeps the corpus's natural proportions, τ → 0 flattens
    * toward uniform-over-groups, boosting small domains. Given a
    * global `baseRate`, group g's per-row keep rate is
    * min(1, baseRate · N · q_g / n_g) with q_g = n_g^τ / Σ_h n_h^τ,
    * then the take is the deterministic first ⌈rate·n_g⌉ rows by
    * `orderCol` (same reproducibility contract as [[weightedTake]]).
    *
    * Plan: group counts are one partial-aggregated groupBy (a
    * #groups-row frame); the τ-normalization is an aggregate OVER that
    * tiny frame; rates broadcast-join back onto the corpus, so the only
    * corpus-scale shuffle is the per-group rank window. Rates are
    * rounded to 6 dp before the ⌈·⌉ so the cut row doesn't depend on
    * sub-ulp `pow` differences across engines.
    */
  def temperatureTake(
      df: DataFrame, groupCol: String, orderCol: String,
      tau: Double, baseRate: Double): DataFrame = {
    require(tau >= 0.0, s"tau must be >= 0, got $tau")
    require(baseRate > 0.0 && baseRate <= 1.0,
      s"baseRate must be in (0, 1], got $baseRate")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("_n"))
    val totals = counts.agg(
      sum(pow(col("_n"), lit(tau))).as("_z"),
      sum(col("_n")).as("_total"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(groupCol),
        round(least(lit(1.0),
          lit(baseRate) * col("_total") * pow(col("_n"), lit(tau)) /
            (col("_z") * col("_n"))), 6).as("_rate"),
        col("_n"))
    val byGroup = Window.partitionBy(col(groupCol))
    df.join(broadcast(rates), groupCol)
      .withColumn("_rn", row_number().over(byGroup.orderBy(col(orderCol))))
      .filter(col("_rn") <= ceil(col("_rate") * col("_n")))
      .drop("_rn", "_n", "_rate")
  }

  /** Per-group token-budget curation: rank each group's rows best-first
    * (`scoreCol` descending, `orderCol` ascending as the deterministic
    * tiebreak) and keep rows while the group's cumulative `tokensCol`
    * stays within `budget` — the "top-quality N tokens per domain" step
    * that turns scored documents into a sized training mix. A row that
    * would push the running total past the budget is dropped, and so is
    * everything ranked after it (contiguous prefix, not best-fit — the
    * contract is "the best documents up to the budget", reproducible
    * and oracle-stable).
    *
    * One corpus shuffle (the per-group window sort); the cumulative sum
    * is integer arithmetic, so results are bit-stable across engines.
    * Returns the kept rows plus `grp_rank` (1-based quality rank) and
    * `cum_tokens` (running total INCLUDING the row).
    */
  def tokenBudgetTake(
      df: DataFrame, groupCol: String, scoreCol: String,
      tokensCol: String, orderCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(orderCol))
    df.withColumn("grp_rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum(col(tokensCol).cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budget)
  }

  /** Weighted sampling WITHOUT replacement, k rows, inclusion
    * probability ∝ `weightCol` — Efraimidis–Spirakis (IPL 2006): each
    * row gets priority u^(1/w) for u uniform in (0,1); the k largest
    * priorities ARE a weighted sample without replacement.
    *
    * u is a deterministic Knuth multiplicative hash of the id —
    * ((id·2654435761) mod 2³²+1)/(2³²+1) — not an RNG: the sample is
    * reproducible run-to-run, independent of partitioning, and the
    * arithmetic (integer mod + one pow) is reproducible in plain SQL,
    * so the draw itself is oracle-checkable. Seeding = offsetting the
    * id stream (pass `seed` to decorrelate successive draws).
    *
    * Plan: pure per-row projection + TakeOrderedAndProject — no full
    * sort, no shuffle beyond each partition's top-k flowing to one
    * reducer; the 100 TB shape. Weights must be strictly positive.
    * `priority` is emitted 9-dp rounded; adjacent-priority gaps on
    * real data sit orders above both engines' pow ulps (checked at the
    * k-boundary by the gate's data probe).
    */
  def weightedReservoirTake(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val id = col(idCol).cast("long") + lit(seed)
    val u = (pmod(id * lit(2654435761L), lit(4294967296L)) + lit(1)) /
      lit(4294967297.0)
    df.withColumn("priority",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 9))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Per-GROUP Efraimidis–Spirakis: k rows from every group, inclusion
    * ∝ weight within the group — the stratified weighted draw a
    * balanced multi-domain sample needs (global top-k would starve
    * small groups). Same deterministic hash-derived priorities as
    * [[weightedReservoirTake]]; the top-k-per-group is one window over
    * the group partitioning (rank, not sort-limit — every group keeps
    * its own k).
    */
  def weightedReservoirTakePerGroup(
      df: DataFrame, groupCol: String, idCol: String, weightCol: String,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val id = col(idCol).cast("long") + lit(seed)
    val u = (pmod(id * lit(2654435761L), lit(4294967296L)) + lit(1)) /
      lit(4294967297.0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority").desc, col(idCol))
    df.withColumn("priority",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 9))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Deterministic train/val/test assignment by content-free id hash —
    * the split every training pipeline needs to be STABLE across reruns,
    * engines, and corpus growth (a doc's split never changes when other
    * docs arrive, unlike `randomSplit`). The first two hex chars of
    * `md5(cast(id AS string))` index one of 256 buckets; `splits` gives
    * each label an integer bucket WIDTH out of 256 (e.g. train→204,
    * val→26, test→26 ≈ 80/10/10). Integer widths make the contract
    * exactly portable: any SQL engine replays it as a CASE over
    * `substr(md5(id::VARCHAR), 1, 2)`.
    *
    * Scan-local projection — zero shuffles, trivially codegen'd.
    */
  def deterministicSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 256,
      s"bucket widths must sum to 256, got ${splits.map(_._2).sum}")
    require(splits.forall(_._2 > 0), "every split needs at least 1 bucket")
    val hex = substring(md5(col(idCol).cast("string")), 1, 2)
    val bounds = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val labelled = splits.map(_._1).zip(bounds).dropRight(1)
      .foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (acc, (label, upper)) =>
          val cond = hex < lit(f"${upper}%02x")
          Some(acc.fold(when(cond, label))(_.when(cond, label)))
      }
    val split = labelled.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("split", split)
  }

  /** Deterministic negative sampling for contrastive training: for each
    * anchor id, k pseudo-random NON-neighbor ids from the universe —
    * the (anchor, positive, negative) triple builder behind every
    * embedding/retrieval trainer, with the negatives reproducible
    * across reruns and engines (no RNG).
    *
    * Contract (md5, [[PortableSketches]] discipline): the universe is
    * densely indexed rn = row_number over ascending id; candidate j of
    * anchor a (j = 1..margin) is the universe row at
    * `h28(md5(a ':' j)) mod N + 1`; candidates equal to the anchor, in
    * `pairs` (either orientation), or duplicated (same candidate from
    * two j's — keep the smallest j) are dropped; the first k surviving
    * by j win. A dense-neighborhood anchor can yield fewer than k —
    * deterministic, never padded.
    *
    * Scale: NO candidate cross join — exactly margin rows per anchor
    * are generated (`margin·N` total), joined to the universe on the
    * computed index (hash equi-join) and anti-joined to the pair list.
    * The dense index is a distributed range-sort + per-partition
    * zipWithIndex (NOT an unpartitioned `row_number` window, which
    * would drag the whole universe into one task) — the same global
    * index any engine derives as `row_number over (order by id)`.
    */
  def negativeSamples(
      universe: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      k: Int, margin: Int): DataFrame = {
    require(k >= 1 && margin >= k, s"need margin >= k >= 1, got k=$k margin=$margin")
    val spark = universe.sparkSession
    import spark.implicits._
    val ids = universe.select(col(idCol).cast("long").as("id")).distinct()
    // materialize the index once — it feeds the count, the slot join,
    // and (via ids) the candidate generator; without this the
    // sort+zipWithIndex chain re-runs per consumer (measured 32 s →
    // ~8 s on the 10× rehearsal)
    val indexed = ids.orderBy("id").as[Long].rdd.zipWithIndex()
      .map { case (id, i) => (id, i + 1) }
      .toDF("id", "rn")
      .materialized
    val n = indexed.count()
    val cand = ids.select(col("id").as("anchor"))
      .withColumn("j", explode(sequence(lit(1), lit(margin))))
      .withColumn("slot",
        pmod(conv(substring(md5(concat(col("anchor").cast("string"),
          lit(":"), col("j").cast("string"))), 1, 7), 16, 10).cast("long"),
          lit(n)) + 1)
      .join(indexed.select(col("rn").as("slot"), col("id").as("neg_id")),
        "slot")
      .filter(col("neg_id") =!= col("anchor"))
    val nbrs = pairs
      .select(col(aCol).cast("long").as("anchor"),
        col(bCol).cast("long").as("neg_id"))
      .unionByName(pairs.select(col(bCol).cast("long").as("anchor"),
        col(aCol).cast("long").as("neg_id")))
      .distinct()
    val nonNbr = cand.join(nbrs, Seq("anchor", "neg_id"), "left_anti")
    // dedup same (anchor, neg) from two j's: keep the smallest j, then
    // rank the survivors by j — both as partial-aggregating min/rank
    val firstJ = nonNbr.groupBy(col("anchor"), col("neg_id"))
      .agg(min(col("j")).as("j"))
    val byAnchor = Window.partitionBy(col("anchor"))
      .orderBy(col("j"), col("neg_id"))
    firstJ.withColumn("rk", row_number().over(byAnchor))
      .filter(col("rk") <= k)
      .select(col("anchor").as(idCol), col("neg_id"), col("j"))
  }

  /** Curriculum ordering with proportional source interleaving — the
    * deterministic training-order builder: within each source, docs
    * rank easy→hard by the score (curriculum); across sources, each
    * doc's order key is its source-PROGRESS in exact integers
    * (`(r−1)·total div n_source`), so every source advances through
    * its own curriculum at the same relative pace regardless of size —
    * a 100× bigger source cannot starve a small one the way naive
    * score-sorted concatenation does, and unlike fixed round-robin
    * slots the interleave stays proportional under skewed source
    * sizes.
    *
    * All arithmetic is exact integer rank algebra (two windows + one
    * integer division) — no RNG, so the order is reproducible across
    * engines and reruns; ties break (source, id). At 100 TB: the
    * per-source rank window partitions by source; a single global
    * row_number is driver-truth ordering and intentionally avoided —
    * downstream shuffles/writes sort by (pos_key, source, rank)
    * instead.
    */
  /** Distribution-matched downsampling toward a UNIFORM group target —
    * the "rebalance the language / source mix" curation move: each
    * group's keep-rate is min(1, target/actual) in exact basis points,
    * and a row survives iff its md5-uniform draw (the portable
    * [[shuffleKey]] contract) falls under its group's rate. Groups at
    * or below target keep everything; over-represented groups thin
    * deterministically — no RNG, rerun-stable, engine-replayable.
    *
    * One group-count aggregate (broadcast back as rates), one
    * scan-local filter. Returns the per-group summary
    * (group, n_before, target, rate_bp, n_kept); [[distributionMatchKeep]]
    * returns the surviving rows themselves.
    */
  def distributionMatchKeep(
      df: DataFrame, idCol: String, grpCol: String): DataFrame = {
    val rates = matchRates(df, grpCol)
    df.join(broadcast(rates), Seq(grpCol))
      .filter(mdUniformBp(col(idCol)) < col("rate_bp"))
      .drop("n_before", "target", "rate_bp")
  }

  def distributionMatchSummary(
      df: DataFrame, idCol: String, grpCol: String): DataFrame = {
    val rates = matchRates(df, grpCol)
    val kept = df.join(broadcast(rates), Seq(grpCol))
      .filter(mdUniformBp(col(idCol)) < col("rate_bp"))
      .groupBy(col(grpCol)).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq(grpCol), "left_outer")
      .select(col(grpCol), col("n_before"), col("target"), col("rate_bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Stratified K-fold assignment — balanced cross-validation folds
    * WITHIN each stratum: rows rank by the portable md5 coin inside
    * their group and take fold = (rank − 1) mod k, so every
    * (group, fold) cell differs by at most one row — exactly balanced,
    * deterministic, engine-replayable. One rank window per group.
    */
  def stratifiedKFold(
      df: DataFrame, idCol: String, grpCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    val key = pmod(conv(substring(md5(concat_ws(":",
      col(idCol).cast("string"), lit("kf"))), 1, 15), 16, 10)
      .cast("long"), lit(1000000007L))
    val w = Window.partitionBy(col(grpCol)).orderBy(key, col(idCol))
    df.select(col(idCol), col(grpCol))
      .withColumn("fold",
        pmod(row_number().over(w).cast("long") - 1L, lit(k.toLong)))
  }

  /** md5-uniform draw in [0, 10000) — the engine-portable coin. */
  /** Temporal train/val/test split with embargo gaps — the
    * leakage-safe alternative to the md5 split when the label leaks
    * through TIME (forecasting, churn, any target computed from
    * later events): cut points at trainPct / trainPct+valPct of the
    * observed micros span, with a `gapUs` embargo band EXCLUDED
    * before each cut so no training window overlaps an evaluation
    * window through lagged features.
    *
    * Returns the 5-way summary (train / embargo1 / val / embargo2 /
    * test: count + micros bounds). Cut arithmetic is exact long
    * DIV — no float on the boundary, so the assignment is
    * reproducible bit-for-bit on any engine at any span. Two passes:
    * one min/max aggregate (map-side combined), one broadcast of the
    * 1-row bounds frame back onto the stream — no sort, no window.
    */
  def temporalSplit(
      df: DataFrame, tsCol: String, trainPct: Int = 80,
      valPct: Int = 10, gapUs: Long = 86400000000L): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"bad split percentages ($trainPct, $valPct)")
    val us = unix_micros(col(tsCol))
    val bounds = df.agg(min(us).as("_lo"), max(us).as("_hi"))
    val cut1 = expr(s"_lo + (_hi - _lo) * $trainPct DIV 100")
    val cut2 = expr(s"_lo + (_hi - _lo) * ${trainPct + valPct} DIV 100")
    df.select(us.as("_us"))
      .crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col("_us") < cut1 - gapUs, "train")
          .when(col("_us") < cut1, "embargo1")
          .when(col("_us") < cut2 - gapUs, "val")
          .when(col("_us") < cut2, "embargo2")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), min(col("_us")).as("min_us"),
        max(col("_us")).as("max_us"))
  }

  private def mdUniformBp(id: Column): Column =
    pmod(conv(substring(md5(concat_ws(":", id.cast("string"),
      lit("dm"))), 1, 7), 16, 10).cast("long"), lit(10000))

  private def matchRates(df: DataFrame, grpCol: String): DataFrame = {
    val cnts = df.groupBy(col(grpCol)).agg(count(lit(1)).as("n_before"))
    val tot = cnts.agg(sum(col("n_before")).as("_tot"),
      count(lit(1)).as("_ng"))
    cnts.crossJoin(broadcast(tot))
      .select(col(grpCol), col("n_before"),
        expr("_tot div _ng").as("target"),
        least(lit(10000L),
          expr("(_tot div _ng) * 10000 div n_before")).as("rate_bp"))
  }

  /** NOTE: ranks run through [[Ranks.withGroupRank]], whose bounded
    * boundary/count jobs re-evaluate `df` — the input must be
    * DETERMINISTIC across jobs (the standard multi-pass contract);
    * materialize nondeterministic frames (unordered limits, rand()
    * filters) first or the collected offsets disagree with the rank
    * pass.
    */
  def curriculumInterleave(
      df: DataFrame, idCol: String, scoreCol: String,
      srcCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("_total"))
    val sizes = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("_n_src"))
    // exact per-source rank via Ranks range sub-buckets — a bare
    // partitionBy(source) window would sort each WHOLE source in one
    // task, parallelism capped at the source count (a handful)
    Ranks.withGroupRank(
        df.select(col(idCol), col(srcCol), col(scoreCol)),
        "rank_in_source", Seq(srcCol), col(scoreCol),
        ties = Seq(col(idCol)))
      .join(broadcast(sizes), Seq(srcCol))
      .crossJoin(broadcast(total))
      .select(col(idCol), col(srcCol), col("rank_in_source"),
        // (rank−1)·total runs in DECIMAL(38,0): at multi-billion-row
        // sources inside a multi-billion-row corpus the long product
        // passes 2⁶³ and would silently wrap while the oracle promotes
        // to HUGEINT. decimal×decimal ≤ 8.5e37 < 10³⁸ stays exact, and
        // IntegralDivide returns BIGINT (the quotient ≤ total always
        // fits), so the output schema is unchanged.
        expr("cast(rank_in_source - 1 as decimal(38,0)) * _total div _n_src")
          .as("pos_key"))
  }

  /** Epoch mixing — the data-recipe repetition step ("3.5 epochs of
    * wiki, 0.5 of crawl"): each row is emitted ⌊w⌋ times plus one more
    * with probability frac(w), decided by the portable md5 coin in
    * basis points (NO RNG — replayable row for row). The fan-out is
    * the WEIGHT, not the corpus (explode of a ≤⌈w⌉-element sequence
    * per row, scan-local); epoch index is carried so downstream
    * shuffling can interleave epochs.
    */
  def epochMix(
      df: DataFrame, idCol: String, grpCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight))
      .forall(w => w >= 0 && w <= 8), "weights must be in [0, 8]")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(grpCol) === k, lit(v)).otherwise(acc)
    }
    val full = floor(w).cast("int")
    // frac(w) in basis points, exact for the 4-dp weights recipes use
    val fracBp = round((w - floor(w)) * 10000.0, 0).cast("long")
    val coin = pmod(conv(substring(md5(concat_ws(":",
      col(idCol).cast("string"), lit("epoch"))), 1, 7), 16, 10)
      .cast("long"), lit(10000))
    df.withColumn("_copies",
        full + when(coin < fracBp, 1).otherwise(0))
      .filter(col("_copies") > 0)
      // generator can't nest inside a cast — explode a long sequence
      .withColumn("epoch",
        explode(sequence(lit(1L), col("_copies").cast("long"))))
      .drop("_copies")
  }

  /** Neyman optimal stratified allocation — the sampling budget split
    * that minimizes estimator variance: n_h ∝ N_h·σ_h (big noisy
    * strata get more budget than small uniform ones). Per-stratum σ
    * comes from exact fixed-point moments (Σv long, Σv² DECIMAL(38,0))
    * cast to double once; quotas q_h = B·w_h/ΣW with the cross-stratum
    * ΣW folded in sorted stratum order. Integerization is LARGEST
    * REMAINDER (floor everything, hand the leftover to the biggest
    * fractional parts, ties to the lexicographically first stratum) —
    * a total, replayable rule, so the allocation itself is under the
    * oracle, not just the quotas. Stratum-frame work throughout after
    * one corpus aggregate.
    */
  def neymanAllocation(
      df: DataFrame, stratumCol: String, valueCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = (col(valueCol)
      .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
      .cast("long")
    val g = df.select(col(stratumCol).cast("string").as("_g"), v.as("_v"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"),
        sum(col("_v").cast(d38) * col("_v").cast(d38)).as("_q"))
    val nD = col("_n").cast("double")
    val sigma = sqrt(
      greatest(lit(0.0),
        (col("_q").cast("double") -
          col("_s").cast("double") * col("_s").cast("double") / nD) / nD))
    val w = g.select(col("_g"), col("_n"), (nD * sigma).as("_w"))
    val tot = w.agg(
      aggregate(array_sort(collect_list(struct(col("_g"), col("_w")))),
        lit(0.0), (acc, s) => acc + s.getField("_w")).as("_tw"))
    val quotas = w.crossJoin(broadcast(tot))
      .withColumn("_q", lit(budget.toDouble) * col("_w") / col("_tw"))
      .withColumn("_base", floor(col("_q")).cast("long"))
      .withColumn("_rem", col("_q") - floor(col("_q")))
    val leftover = quotas.agg(
      (lit(budget) - sum(col("_base"))).as("_left"))
    quotas.crossJoin(broadcast(leftover))
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("_rem").desc, col("_g"))).cast("long"))
      .select(col("_g").as(stratumCol), col("_n").as("n_rows"),
        Numerics.roundz(col("_w") / col("_n").cast("double") / 10000.0, 6)
          .as("sigma"),
        Numerics.roundz(col("_q"), 6).as("quota"),
        (col("_base") + when(col("_rk") <= col("_left"), 1L)
          .otherwise(0L)).as("alloc"))
  }
}
