package graft.operators

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
