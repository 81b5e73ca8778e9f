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
  * shingle kernel, broadcast semi-ish join, partial-aggregated count.
  * The corpus explodes to ~tokens rows, but those pipeline into the
  * hash-aggregate without materializing.
  *
  * Shingling runs in a per-partition JVM kernel rather than
  * `explode(shingles(...))` — Spark's higher-order array lambdas
  * evaluate interpreted per window, which dominated this operator's
  * cost on the corpus side (the [[Dedup.minhashSignatures]] lesson;
  * measured 3.5 → 0.7 s at sf0.1 for the identical flag set).
  *
  * The join key is a 64-bit hash of the shingle — an 8-byte broadcast
  * entry instead of an n-word string, and a long-equality probe instead
  * of a string compare. Counts equal the string join's up to 2^-64 hash
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
    Dedup.requireLongCastableId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val benchShingles = broadcast(
      benchmark.select(col(textCol)).as[String]
        .mapPartitions { it =>
          it.flatMap { t =>
            Dedup.shingleStrings(t, shingleN).iterator.map(Dedup.hash64)
          }
        }
        .toDF("sh")
        .distinct())
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, t) =>
          // per-doc distinct (shingleStrings dedups), matching the
          // "distinct overlapping shingles" count contract
          Dedup.shingleStrings(t, shingleN).iterator.map(s => (id, Dedup.hash64(s)))
        }
      }
      .toDF(idCol, "sh")
      .join(benchShingles, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }
}
