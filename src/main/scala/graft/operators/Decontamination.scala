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
  * The join key is xxhash64 of the shingle — an 8-byte broadcast entry
  * instead of an n-word string, and a long-equality probe instead of a
  * string compare. Counts equal the string join's up to 2^-64 hash
  * collisions (flagging tolerates that; a scrubber that must be exact
  * verifies flagged docs against the raw shingles).
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
        .select(explode(Dedup.shingles(textCol, shingleN)).as("s"))
        .select(xxhash64(col("s")).as("sh"))
        .distinct())
    docs
      .select(col(idCol), explode(Dedup.shingles(textCol, shingleN)).as("s"))
      .select(col(idCol), xxhash64(col("s")).as("sh"))
      .join(benchShingles, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap")) // shingles are distinct per doc
      .filter(col("n_overlap") >= minOverlap)
  }
}
