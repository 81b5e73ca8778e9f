package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al. 2007) —
  * the third distinct-count sketch next to [[HyperLogLog]] (register
  * maxes) and Spark's engine-internal HLL: keep the k SMALLEST
  * distinct hash values; if the k-th minimum of a uniform hash on
  * [0, M) is h_k, the unbiased distinct estimate is (k−1)·M/h_k.
  * Unlike HLL the sketch doubles as a uniform SAMPLE of the distinct
  * values (the bottom-k rows are a hash-ordered simple random sample
  * without replacement) — the structure behind mergeable distinct
  * sampling and set-similarity sketches.
  *
  * md5 contract ([[PortableSketches]] discipline): h(v) = h28(md5(v))
  * uniform on [0, 2²⁸); DISTINCT hash values are ranked, so duplicate
  * rows and (vanishingly rare) hash collisions are both absorbed by
  * the same DISTINCT — everything restates in SQL and the gate runs
  * under the full cross-engine oracle with the exact count beside the
  * estimate. The estimate is (k−1)·2²⁸/h_k — exact integers into one
  * double division, no transcendental.
  *
  * Scale shape: one distinct-hash aggregate then a global TOP-K by
  * hash (TakeOrdered — k·partitions rows to the driver side of the
  * exchange, never a full sort). When the corpus has fewer than k
  * distinct values the sketch IS the distinct set and the estimate is
  * exact by definition.
  */
object KmvSketch {

  private def h28(v: org.apache.spark.sql.Column) =
    conv(substring(md5(v), 1, 7), 16, 10).cast("long")

  /** The sketch: the k smallest distinct h28 values of `valueCol`. */
  def bottomK(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(h28(col(valueCol)).as("h"))
      .distinct()
      .orderBy("h")
      .limit(k)
  }

  /** Set algebra on two bottom-k sketches (Beyer et al. 2007 §4): the
    * union sketch is the bottom-k of K(A) ∪ K(B) — a valid KMV sketch
    * of A ∪ B without touching either corpus again; with
    * ρ = |{h ∈ K∪ : h ∈ K(A) ∧ h ∈ K(B)}| / |K∪| the estimators are
    * D̂(A∪B) = (k−1)·M/h_k, Ĵ = ρ, D̂(A∩B) = ρ·D̂(A∪B). This is the
    * planning primitive: overlap of two corpus snapshots, join-key
    * intersection size, dedup potential between sources — all from two
    * k-row sketches instead of a corpus-scale join.
    *
    * Exactness rule carried through: when the union sketch is not full
    * (n_kept < k) the sketches ARE the distinct hash sets and union/
    * intersection estimates are the exact (modulo 2⁻²⁸ hash collision)
    * set sizes. Everything after the two corpus-scale distinct
    * aggregates runs on ≤ 2k-row frames.
    *
    * Output: (k, n_kept, h_k, est_union, est_intersection, jaccard_est,
    * exact_union, exact_intersection) — exacts computed beside the
    * sketch for the gate, droppable at scale.
    */
  def setSummary(
      dfA: DataFrame, dfB: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    val ka = bottomK(dfA, valueCol, k).materialized
    val kb = bottomK(dfB, valueCol, k).materialized
    val ku = ka.unionByName(kb).distinct().orderBy("h").limit(k)
    val marked = ku
      .join(broadcast(ka.withColumn("in_a", lit(1L))), Seq("h"), "left")
      .join(broadcast(kb.withColumn("in_b", lit(1L))), Seq("h"), "left")
    val agg = marked.agg(
      count(lit(1)).as("n_kept"),
      max("h").as("h_k"),
      sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
        .otherwise(0L)).as("n_both"))
    val exactU = dfA.select(col(valueCol))
      .unionByName(dfB.select(col(valueCol)))
      .agg(countDistinct(col(valueCol)).as("exact_union"))
    val exactI = dfA.select(col(valueCol)).distinct()
      .join(dfB.select(col(valueCol)).distinct(), valueCol)
      .agg(count(lit(1)).as("exact_intersection"))
    val estU = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(268435456.0) /
        col("h_k").cast("double"))
    val rho = col("n_both").cast("double") / col("n_kept").cast("double")
    agg.crossJoin(exactU).crossJoin(exactI)
      .select(lit(k.toLong).as("k"),
        col("n_kept").cast("long").as("n_kept"),
        col("h_k").cast("long").as("h_k"),
        round(estU, 4).as("est_union"),
        round(rho * estU, 4).as("est_intersection"),
        round(rho, 6).as("jaccard_est"),
        col("exact_union").cast("long").as("exact_union"),
        col("exact_intersection").cast("long").as("exact_intersection"))
  }

  /** Equi-join cardinality estimation from two augmented KMV sketches
    * (Beyer et al. 2007 §5 / the classic planner estimator):
    * |A ⋈ B| = Σ_{key ∈ A∩B} nA(key)·nB(key). The bottom-k hashes of
    * each side's DISTINCT keys carry that key's multiplicity; the
    * intersection of the two sketches is a uniform random sample of
    * the shared keys, so
    * |A ⋈ B| ≈ D̂(A∩B) · mean(nA·nB over sampled shared keys),
    * with D̂(A∩B) = ρ·D̂(A∪B) exactly as [[setSummary]].
    *
    * This is the shuffle-planning primitive: estimate a join's output
    * (and its skew — the sampled multiplicities are inspectable) from
    * two k-row sketches BEFORE paying for the join. Everything after
    * the two per-side key-count aggregates runs on ≤ 2k-row frames;
    * the exact join size is computed beside the estimate from the same
    * per-key counts (group-scale, never the materialized join).
    *
    * Output: (k, n_kept, n_sample, est_inter_keys, avg_mult,
    * est_join_rows, exact_join_rows).
    */
  def joinSizeEstimate(
      dfA: DataFrame, keyColA: String,
      dfB: DataFrame, keyColB: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // keys are hashed via their canonical string form so any SQL engine
    // replays the sketch (md5(key::VARCHAR)); the EXACT join size joins
    // on the raw keys, never the 28-bit hashes (at ~2^14 distinct keys
    // a 2^-28 hash collision is no longer negligible for an exact column)
    val ca = dfA.groupBy(col(keyColA).as("key"))
      .agg(count(lit(1)).as("na")).materialized
    val cb = dfB.groupBy(col(keyColB).as("key"))
      .agg(count(lit(1)).as("nb")).materialized
    val ka = ca.select(h28(col("key").cast("string")).as("h"), col("na"))
      .orderBy("h").limit(k).materialized
    val kb = cb.select(h28(col("key").cast("string")).as("h"), col("nb"))
      .orderBy("h").limit(k).materialized
    val ku = ka.select("h").unionByName(kb.select("h"))
      .distinct().orderBy("h").limit(k)
    val sample = ka.join(kb, "h") // shared keys inside both sketches
    val uAgg = ku
      .join(broadcast(ka.select(col("h"), lit(1L).as("in_a"))), Seq("h"), "left")
      .join(broadcast(kb.select(col("h"), lit(1L).as("in_b"))), Seq("h"), "left")
      .agg(count(lit(1)).as("n_kept"), max("h").as("h_k"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
          .otherwise(0L)).as("n_both"))
    val sAgg = sample.agg(
      count(lit(1)).as("n_sample"),
      sum(col("na") * col("nb")).as("sum_mult"))
    val exact = ca.join(cb, "key")
      .agg(sum(col("na") * col("nb")).as("exact_join_rows"))
    val estU = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(268435456.0) /
        col("h_k").cast("double"))
    val estI = (col("n_both").cast("double") /
      col("n_kept").cast("double")) * estU
    val avgMult = when(col("n_sample") > 0,
      col("sum_mult").cast("double") / col("n_sample").cast("double"))
      .otherwise(lit(0.0))
    uAgg.crossJoin(sAgg).crossJoin(exact)
      .select(lit(k.toLong).as("k"),
        col("n_kept").cast("long").as("n_kept"),
        col("n_sample").cast("long").as("n_sample"),
        round(estI, 4).as("est_inter_keys"),
        round(avgMult, 6).as("avg_mult"),
        round(estI * avgMult, 2).as("est_join_rows"),
        coalesce(col("exact_join_rows"), lit(0L)).cast("long")
          .as("exact_join_rows"))
  }

  /** One-row summary: (k, n_kept, h_k, est_distinct, exact) —
    * n_kept < k means the distinct set fit inside the sketch and the
    * estimate equals the exact count by the standard KMV rule.
    */
  def summary(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val sk = bottomK(df, valueCol, k)
    val agg = sk.agg(count(lit(1)).as("n_kept"), max("h").as("h_k"))
    val exact = df.agg(countDistinct(col(valueCol)).as("exact"))
    agg.crossJoin(exact)
      .select(lit(k.toLong).as("k"),
        col("n_kept").cast("long").as("n_kept"),
        col("h_k").cast("long").as("h_k"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(268435456.0) /
            col("h_k").cast("double")), 4).as("est_distinct"),
        col("exact").cast("long").as("exact"))
  }
}
