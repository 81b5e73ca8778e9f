package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall — the neighborhood function N(t) and effective diameter
  * of a graph by per-node HyperLogLog counters (Boldi, Rosa & Vigna,
  * "HyperBall: Counting the Distances", 2013 — HyperANF's register
  * formulation): node v's ball counter B_t(v) starts as {v} and each
  * round absorbs its neighbors' counters by REGISTER MAX, so after t
  * rounds B_t(v) estimates |{w : dist(v,w) ≤ t}| and
  * N(t) = Σ_v est(B_t(v)).
  *
  * Scale design (100 TB): state is the portable register frame
  * (node, bucket, reg) — node-scale × m rows, never node² — and a
  * round is ONE edge-join (neighbor registers relabel to the target
  * node) + ONE (node, bucket) max aggregate, the [[GraphMetrics]]
  * bounded-round shape with per-round [[Materialize]] pinning. The
  * exact-BFS twin materializes (src, node) BALL PAIRS — node²-scale —
  * which is precisely what HyperBall exists to avoid; it lives in
  * [[GraphMetrics.neighborhoodFunction]] as the oracle face.
  *
  * Determinism: registers are md5-derived integers ([[HyperLogLog]]'s
  * exact-algebra contract), the per-node estimate is computed from
  * integer (r_max, n_filled, denom) exactly as [[HyperLogLog.summary]]
  * — including the linear-counting small-range correction — then
  * fixed to integer micro-units BEFORE the final sum, so N(t) is an
  * exact long total, independent of partitioning and float order.
  */
object HyperBall {

  /** (t, nf_est) for t = 0..maxDepth over the UNDIRECTED graph of
    * `edges` (symmetrized, self-loops dropped; nodes = edge
    * endpoints). `nf_est` is the HLL estimate of Σ_v |ball_t(v)|,
    * deterministic micro-unit fixed point rounded back to 6 dp.
    */
  def neighborhoodEstimate(
      edges: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 4, m: Int = 64): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = symmetrized(edges, aCol, bCol)
    // B_0(v) = {v}: one register row per node
    var state = initState(sym, m)
    val out = Seq.newBuilder[(Int, Long)]
    out += 0 -> estimateMicros(state, m)
    var t = 1
    while (t <= maxDepth) {
      // v absorbs every neighbor u's registers, then register-max
      state = growBalls(sym, state)
      out += t -> estimateMicros(state, m)
      t += 1
    }
    out.result()
      .map { case (d, micros) => (d, micros / 1e6) }
      .toDF("t", "nf_est")
  }

  /** Effective diameter at fraction `q` (default the standard 0.9):
    * smallest t with N(t) ≥ q · N(maxDepth). Run `maxDepth` past the
    * plateau — if N is still growing at maxDepth the result is a
    * lower bound (HyperBall's own caveat).
    */
  def effectiveDiameter(
      edges: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 8, m: Int = 64, q: Double = 0.9): Int = {
    val nf = neighborhoodEstimate(edges, aCol, bCol, maxDepth, m)
      .orderBy("t").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val target = q * nf.last._2
    nf.find(_._2 >= target).map(_._1).getOrElse(maxDepth)
  }

  /** Per-node ball estimate in integer micro-units ((node, est_micro)):
    * the [[HyperLogLog.summary]] algebra — r_max/n_filled aggregate,
    * denom = Σ_b 2^(r_max − reg_b) with absent buckets at reg 0,
    * raw = α·m²·2^r_max / denom, linear counting m·ln(m/V) when
    * raw ≤ 2.5m and V > 0 — fixed to micros so every downstream
    * combination is exact integer arithmetic.
    */
  private def perNodeMicros(state: DataFrame, m: Int): DataFrame = {
    val filled = state.groupBy("node").agg(
      max("reg").as("r_max"), count(lit(1)).as("n_filled"))
    val pow2rmax = expr("shiftleft(cast(1 as bigint), cast(r_max as int))")
    val denomFilled = state.join(filled, "node")
      .groupBy(col("node"), col("r_max"), col("n_filled"))
      .agg(sum(expr(
        "shiftleft(cast(1 as bigint), cast(r_max - reg as int))"))
        .as("d_filled"))
    val alphaM2 = HyperLogLog.alpha(m) * m.toDouble * m.toDouble
    denomFilled
      .withColumn("denom",
        col("d_filled") + (lit(m.toLong) - col("n_filled")) * pow2rmax)
      .withColumn("raw",
        lit(alphaM2) * pow2rmax.cast("double") / col("denom").cast("double"))
      .withColumn("zeros", lit(m.toLong) - col("n_filled"))
      .withColumn("est",
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw")))
      .select(col("node"),
        round(col("est") * lit(1e6)).cast("long").as("est_micro"))
  }

  /** Per-node harmonic centrality estimate (Boldi & Vigna, "Axioms
    * for Centrality", 2014 — the HyperBall centrality face):
    * H(v) = Σ_{t≥1} (|B_t(v)| − |B_{t−1}(v)|)/t, truncated at
    * `maxDepth`. Returns (node, h_fp): integer fixed point at scale
    * micro × lcm(1..maxDepth), so every per-round term
    * delta_micro · (L/t) is EXACT integer arithmetic — deterministic
    * under any partitioning, like [[neighborhoodEstimate]]'s totals.
    * Register max only grows, but the linear-counting→raw switch can
    * wobble a hair; negative deltas clamp to 0 (documented HyperBall
    * behavior). Same round shape: one edge join + one register max
    * per round, node-scale frames.
    */
  def harmonicEstimate(
      edges: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 4, m: Int = 64): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val sym = symmetrized(edges, aCol, bCol)
    val scale = lcm(1 to maxDepth)
    var state = initState(sym, m)
    // one materialized per-round estimate frame each; ALL the delta
    // joins fold into a single final plan (the round loop's only
    // per-round actions are the state pins — maxDepth+1 node-scale
    // joins total, not 3 per round)
    val ests = Seq.newBuilder[DataFrame]
    ests += perNodeMicros(state, m)
      .withColumnRenamed("est_micro", "_e0").materialized
    var t = 1
    while (t <= maxDepth) {
      state = growBalls(sym, state)
      ests += perNodeMicros(state, m)
        .withColumnRenamed("est_micro", s"_e$t").materialized
      t += 1
    }
    val frames = ests.result()
    val joined = frames.reduce((a, b) => a.join(b, "node"))
    val h = (1 to maxDepth).map { d =>
      greatest(col(s"_e$d") - col(s"_e${d - 1}"), lit(0L)) *
        lit(scale / d)
    }.reduce(_ + _)
    joined.select(col("node"), h.as("h_fp"))
  }

  private def lcm(ts: Range): Long = {
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    ts.foldLeft(1L)((l, t) => l / gcd(l, t) * t)
  }

  private def symmetrized(
      edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .materialized
  }

  private def initState(sym: DataFrame, m: Int): DataFrame =
    sym.select(col("u").as("node")).distinct()
      .select(col("node"),
        HyperLogLog.bucketOf(col("node").cast("string"), m).as("bucket"),
        HyperLogLog.rhoOf(col("node").cast("string")).as("reg"))
      .materialized

  private def growBalls(sym: DataFrame, state: DataFrame): DataFrame =
    state.unionByName(
        sym.join(state.withColumnRenamed("node", "u").hint("shuffle_hash"),
            "u")
          .select(col("v").as("node"), col("bucket"), col("reg")))
      .groupBy("node", "bucket")
      .agg(max("reg").as("reg"))
      .materialized

  /** Σ_v est(B(v)) in integer micro-units — [[perNodeMicros]] summed
    * as exact longs.
    */
  private def estimateMicros(state: DataFrame, m: Int): Long =
    perNodeMicros(state, m)
      .agg(sum(col("est_micro")).as("micros"))
      .head().getLong(0)
}
