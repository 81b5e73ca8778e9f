package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al. 2007) — the md5-CONTRACT variant of
  * the distinct-count sketch ([[PortableSketches]] discipline), the
  * full-oracle twin to Spark's engine-internal
  * `approx_count_distinct` (gated rows-only by design).
  *
  * Contract: h28(md5(v)) mod m picks the register; the NEXT 15 hex
  * chars of the same md5 form a 60-bit tail x whose leading-zero rank
  * ρ = 61 − bitlength(x) (ρ = 61 when x = 0) feeds the register max.
  * Register update is a plain MAX aggregate — duplicates cannot move
  * it, which is the whole trick: the sketch IS the distinct count.
  *
  * The gated estimate stays in EXACT integer algebra: with
  * R = max register and D = Σ_b 2^(R − reg_b) (absent buckets carry
  * reg 0), the raw HLL estimate α·m²/Σ 2^(−reg) equals
  * α·m²·2^R / D — two exact longs and one double division, no
  * transcendental, so both engines produce bit-identical doubles.
  * The small-range linear-counting branch (m·ln(m/V)) involves libm
  * `ln`, whose last ulp may differ across engines — [[estimate]]
  * exposes it for callers, the gate pins only the algebraic parts and
  * the spec bounds the corrected estimate's relative error instead.
  *
  * Scale shape: one pass, m-bounded state (m longs per partial), the
  * canonical mergeable sketch — partials combine by register-wise max,
  * which is exactly what the hash aggregate does.
  */
object HyperLogLog {

  /** α_m for the standard bias correction (m ≥ 128 uses the closed
    * form; small m uses Flajolet's constants).
    */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  private[operators] def bucketOf(v: Column, m: Int): Column =
    pmod(conv(substring(md5(v), 1, 7), 16, 10).cast("long"), lit(m.toLong))

  /** ρ of the 60-bit tail: 61 − bitlength; `bin` has no leading
    * zeros, so its length IS the bitlength (and "0" for x = 0 is
    * caught explicitly).
    */
  private[operators] def rhoOf(v: Column): Column = {
    val x = conv(substring(md5(v), 8, 15), 16, 10).cast("long")
    when(x === 0L, lit(61L)).otherwise(lit(61L) - length(bin(x)))
  }

  /** The register table (bucket, reg) for the DISTINCT-counting of
    * `valueCol` — absent buckets mean reg 0.
    */
  def registers(df: DataFrame, valueCol: String, m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    df.select(bucketOf(col(valueCol), m).as("bucket"),
        rhoOf(col(valueCol)).as("rho"))
      .groupBy("bucket")
      .agg(max("rho").as("reg"))
  }

  /** One-row summary under the exact-algebra contract:
    * (m, n_zero, r_max, denom, est_raw, exact) where
    * denom = Σ_b 2^(r_max − reg_b) over all m buckets and
    * est_raw = α_m·m²·2^r_max / denom rounded 4 dp. `exact` is the
    * true distinct count for comparison (the gate shows the sketch
    * next to its ground truth, like [[CountMinSketch.estimate]]).
    */
  def summary(df: DataFrame, valueCol: String, m: Int = 64): DataFrame = {
    val regs = registers(df, valueCol, m)
    val filled = regs.agg(
      count(lit(1)).as("n_filled"),
      max("reg").as("r_max"),
      sum(when(col("reg") === 0L, 1L).otherwise(0L)).as("zero_filled"))
    val exact = df.agg(countDistinct(col(valueCol)).as("exact"))
    // Σ over FILLED buckets of 2^(r_max − reg); absent buckets add
    // 2^r_max each. shiftleft is exact long arithmetic — safe while
    // m·2^r_max < 2⁶³, i.e. r_max ≤ 56 at m = 64 (r_max grows like
    // log₂(distincts/m); 2⁵⁶ distincts per bucket is unreachable).
    val denomFilled = regs.crossJoin(filled.select("r_max"))
      .agg(sum(expr(
        "shiftleft(cast(1 as bigint), cast(r_max - reg as int))"))
        .as("d_filled"))
    val pow2rmax = expr("shiftleft(cast(1 as bigint), cast(r_max as int))")
    val denom = col("d_filled") + (lit(m.toLong) - col("n_filled")) * pow2rmax
    filled.crossJoin(denomFilled).crossJoin(exact)
      .select(
        lit(m.toLong).as("m"),
        (col("zero_filled") + (lit(m.toLong) - col("n_filled")))
          .cast("long").as("n_zero"),
        col("r_max").cast("long").as("r_max"),
        denom.cast("long").as("denom"),
        round(lit(alpha(m)) * m * m * pow2rmax.cast("double") /
          denom.cast("double"), 4).as("est_raw"),
        col("exact").cast("long").as("exact"))
  }

  /** The full corrected estimate (linear counting below 2.5·m when
    * empty registers remain) — uses libm `ln`, so spec-bounded rather
    * than gate-hashed; see object doc.
    */
  def estimate(df: DataFrame, valueCol: String, m: Int = 64): Double = {
    val row = summary(df, valueCol, m).head()
    val nZero = row.getLong(1)
    val raw = row.getDouble(4)
    if (raw <= 2.5 * m && nZero > 0) m * math.log(m.toDouble / nZero)
    else raw
  }

  /** Per-group register tables: (group, bucket, reg). One map-side-
    * combined aggregate; output is ≤ |groups|·m rows no matter the
    * corpus size.
    */
  def registersByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    df.select(col(groupCol).as("g"),
        bucketOf(col(valueCol), m).as("bucket"),
        rhoOf(col(valueCol)).as("rho"))
      .groupBy("g", "bucket")
      .agg(max("rho").as("reg"))
  }

  /** [[summary]] per group — the distinct-count-per-key shape every
    * corpus profile needs (distinct docs per language, per domain, per
    * shard) at sketch cost: ONE corpus-scale aggregate to ≤ |groups|·m
    * register rows, then group-scale joins. Same exact-integer algebra
    * as the global summary (register maxes, Σ 2^(r_max−reg), one
    * double division), so the whole per-group table sits under a
    * cross-engine hash; `exact` is computed beside it for the gate. At
    * 100 TB the exact column is the expensive one — a production call
    * drops it and keeps only the sketch pass.
    */
  def summaryByGroup(
      df: DataFrame, groupCol: String, valueCol: String,
      m: Int = 64): DataFrame = {
    val regs = registersByGroup(df, groupCol, valueCol, m)
    val filled = regs.groupBy("g").agg(
      count(lit(1)).as("n_filled"),
      max("reg").as("r_max"),
      sum(when(col("reg") === 0L, 1L).otherwise(0L)).as("zero_filled"))
    val denomFilled = regs.join(filled.select(col("g"), col("r_max")), "g")
      .groupBy("g")
      .agg(sum(expr(
        "shiftleft(cast(1 as bigint), cast(r_max - reg as int))"))
        .as("d_filled"))
    val exact = df.groupBy(col(groupCol).as("g"))
      .agg(countDistinct(col(valueCol)).as("exact"))
    val pow2rmax = expr("shiftleft(cast(1 as bigint), cast(r_max as int))")
    val denom = col("d_filled") + (lit(m.toLong) - col("n_filled")) * pow2rmax
    filled.join(denomFilled, "g").join(exact, "g")
      .select(
        col("g").as(groupCol),
        lit(m.toLong).as("m"),
        (col("zero_filled") + (lit(m.toLong) - col("n_filled")))
          .cast("long").as("n_zero"),
        col("r_max").cast("long").as("r_max"),
        denom.cast("long").as("denom"),
        round(lit(alpha(m)) * m * m * pow2rmax.cast("double") /
          denom.cast("double"), 4).as("est_raw"),
        col("exact").cast("long").as("exact"))
  }
}
