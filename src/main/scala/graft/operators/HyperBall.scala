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
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = canon.select(col("u"), col("v"))
      .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .materialized
    val nodes = sym.select(col("u").as("node")).distinct()
    // B_0(v) = {v}: one register row per node
    var state = nodes.select(col("node"),
        HyperLogLog.bucketOf(col("node").cast("string"), m).as("bucket"),
        HyperLogLog.rhoOf(col("node").cast("string")).as("reg"))
      .materialized
    val out = Seq.newBuilder[(Int, Long)]
    out += 0 -> estimateMicros(state, m)
    var t = 1
    while (t <= maxDepth) {
      // v absorbs every neighbor u's registers, then register-max
      val contrib = sym
        .join(state.withColumnRenamed("node", "u").hint("shuffle_hash"), "u")
        .select(col("v").as("node"), col("bucket"), col("reg"))
      state = state.unionByName(contrib)
        .groupBy("node", "bucket")
        .agg(max("reg").as("reg"))
        .materialized
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

  /** Σ_v est(B(v)) in integer micro-units: per node the
    * [[HyperLogLog.summary]] algebra — r_max/n_filled aggregate,
    * denom = Σ_b 2^(r_max − reg_b) with absent buckets at reg 0,
    * raw = α·m²·2^r_max / denom, linear counting m·ln(m/V) when
    * raw ≤ 2.5m and V > 0 — each node's estimate fixed to micros
    * BEFORE the total, so the sum is an exact long.
    */
  private def estimateMicros(state: DataFrame, m: Int): Long = {
    val filled = state.groupBy("node").agg(
      max("reg").as("r_max"), count(lit(1)).as("n_filled"))
    val pow2rmax = expr("shiftleft(cast(1 as bigint), cast(r_max as int))")
    val denomFilled = state.join(filled, "node")
      .groupBy(col("node"), col("r_max"), col("n_filled"))
      .agg(sum(expr(
        "shiftleft(cast(1 as bigint), cast(r_max - reg as int))"))
        .as("d_filled"))
    val alphaM2 = HyperLogLog.alpha(m) * m.toDouble * m.toDouble
    val withEst = denomFilled
      .withColumn("denom",
        col("d_filled") + (lit(m.toLong) - col("n_filled")) * pow2rmax)
      .withColumn("raw",
        lit(alphaM2) * pow2rmax.cast("double") / col("denom").cast("double"))
      .withColumn("zeros", lit(m.toLong) - col("n_filled"))
      .withColumn("est",
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw")))
    withEst
      .agg(sum(round(col("est") * lit(1e6)).cast("long")).as("micros"))
      .head().getLong(0)
  }
}
