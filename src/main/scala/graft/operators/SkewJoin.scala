package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting (SURVEY.md §2.6 / the 100 TB
  * design point "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles most cases at runtime by splitting oversized
  * partitions; explicit salting is for the pathological hot key whose
  * single key-group exceeds an executor: the skewed (large) side gets a
  * uniform random-ish salt in [0, factor), the small side is replicated
  * once per salt value, and the join key becomes (key, salt) — the hot
  * key's rows spread over `factor` reducers. Results are exactly the
  * plain join's (spec-verified).
  */
object SkewJoin {

  /** Inner equi-join of `large` and `small` on largeKey == smallKey,
    * salted with `factor`. Salt is derived deterministically from a
    * sibling column (or the whole row hash) so re-runs are stable.
    */
  def saltedInnerJoin(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      factor: Int,
      saltSource: Column): DataFrame = {
    val salted = large.withColumn("_salt", pmod(hash(saltSource), lit(factor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          col(largeKey) === col(smallKey))
      .drop("_salt")
  }
}
