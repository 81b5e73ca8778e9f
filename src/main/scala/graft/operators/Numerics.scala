package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Signed-zero-normalized rounding for gate surfaces.
  *
  * Every gated double ends in `round(x, n)`. Spark's `Round` on
  * doubles goes through `BigDecimal`, which has no signed zero, so
  * Spark always emits `+0.0` — but DuckDB's `round` preserves IEEE
  * sign, so an epsilon-negative slope/z-score/entropy rounds to
  * `-0.0` on the oracle side and the driver's exact value hash
  * diverges on that single cell (round 8's `events_ols_trend`: user
  * 27, spark `0.0` vs oracle `-0.0`). The contract, stated on BOTH
  * sides so neither engine's rounding quirk is load-bearing:
  *
  *   Spark:  `roundz(x, n)`  =  `round(x, n) + 0.0`
  *   oracle: `round(x, n) + 0`
  *
  * IEEE 754 addition gives `-0.0 + 0.0 = +0.0` and is exact for
  * every other value, and `null + 0.0 = null`, so the `+ 0` is a
  * pure sign-of-zero normalizer. Applied to every rounded surface
  * whose inner expression can be negative (slopes, z-scores, log
  * probs, PMI, NMI/ARI, Spearman, modularity, projections, …) —
  * non-negative surfaces are unaffected either way.
  */
object Numerics {
  /** `round(c, scale)` with IEEE `-0.0` normalized to `+0.0`. */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** Normalize `-0.0` to `+0.0` on an already-rounded double (for
    * surfaces where the round sits inside a `when`/`transform`). */
  def zeroNorm(c: Column): Column = c + lit(0.0)
}
