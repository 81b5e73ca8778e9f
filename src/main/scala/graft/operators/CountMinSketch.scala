package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the fixed-size
  * frequency summary for unbounded token streams: depth × width
  * counters, each row a different hash, point estimate = min over
  * rows. Overestimates only (collisions add, never subtract), error
  * ≤ N/width with probability 1 − (1/2)^depth.
  *
  * This is the md5-CONTRACT variant ([[PortableSketches]] discipline):
  * row hash h_r(w) = h28(md5(r ":" w)) mod width, so the whole sketch
  * — counter table AND estimates — is restatable in SQL and sits under
  * the full cross-engine oracle, unlike JVM-hash sketches that gate
  * rows-only.
  *
  * Scale shape: ONE token pass fans each occurrence out to `depth`
  * (row, bucket) cells, then a hash aggregate onto AT MOST
  * depth·width cells (1 024 at the 4×256 default) — the shuffle is
  * sketch-bounded, not vocabulary-bounded, which is the entire point
  * of sketching: the reducer state is O(1) in the corpus. Probes then
  * broadcast-join their `depth` cells each.
  */
object CountMinSketch {

  /** The sketch itself: (row, bucket, cnt) over all token occurrences
    * (lowercased whitespace tokens, empties dropped).
    */
  def sketch(
      df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    val w = width
    val tok = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("tk"))
      .filter(col("tk") =!= "")
    tok
      .select(col("tk"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"),
        pmod(conv(substring(md5(concat(col("row"), lit(":"), col("tk"))),
          1, 7), 16, 10).cast("long"), lit(w.toLong)).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`: (word, estimate, true_count) — the
    * min-over-rows CMS answer next to the exact count, so the
    * overestimate property (estimate ≥ true, gap ≤ collision mass) is
    * visible in the output. The sketch is depth·width rows; probes
    * join it broadcast.
    */
  def estimate(
      df: DataFrame, textCol: String, probes: Seq[String],
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(probes.nonEmpty, "need at least one probe word")
    val spark = df.sparkSession
    import spark.implicits._
    val sk = sketch(df, textCol, depth, width)
    val cells = probes.toDF("word")
      .select(col("word"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("word"), col("row"),
        pmod(conv(substring(md5(concat(col("row"), lit(":"), col("word"))),
          1, 7), 16, 10).cast("long"), lit(width.toLong)).as("bucket"))
    val est = cells
      .join(sk, Seq("row", "bucket"), "left")
      .groupBy("word")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
    val truth = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("tk"))
      .filter(col("tk").isin(probes: _*))
      .groupBy(col("tk").as("word"))
      .agg(count(lit(1)).as("true_count"))
    est.join(truth, Seq("word"), "left")
      .select(col("word"), col("estimate"),
        coalesce(col("true_count"), lit(0L)).as("true_count"))
  }
}
