package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (extension surface): flag training
  * documents sharing n-gram shingles with an evaluation/benchmark set,
  * so eval data can be scrubbed from the training corpus.
  *
  * Scale design: the BENCHMARK side is the small one (eval suites are
  * MBs against a 100 TB corpus), so its distinct shingle set broadcasts
  * and the corpus side never shuffles for the match — one scan,
  * explode, broadcast semi-ish join, partial-aggregated count. The
  * corpus explodes to ~tokens rows, but those pipeline into the
  * hash-aggregate without materializing.
  *
  * The join key is the shingle STRING (oracle-parity and exact); at
  * very large benchmark sets hash both sides with xxhash64 first to
  * shrink the broadcast — same plan, 2^-64 collision odds.
  */
object Decontamination {

  /** Documents sharing ≥ `minOverlap` distinct `shingleN`-gram shingles
    * with the union of the benchmark's shingles. Returns
    * (id, n_overlap) for flagged docs — the set a pipeline anti-joins
    * away (benchmark members themselves flag maximally, as they
    * should).
    */
  def flagContaminated(
      docs: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      shingleN: Int = 3, minOverlap: Int = 5): DataFrame = {
    val benchShingles = broadcast(
      benchmark
        .select(explode(Dedup.shingles(textCol, shingleN)).as("sh"))
        .distinct())
    docs
      .select(col(idCol), explode(Dedup.shingles(textCol, shingleN)).as("sh"))
      .join(benchShingles, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap")) // shingles are distinct per doc
      .filter(col("n_overlap") >= minOverlap)
  }
}
