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

  /** Fuzzy decontamination: training docs NEAR-DUPLICATE to a benchmark
    * item (paraphrased/lightly-edited eval leakage that exact shingle
    * overlap with a high `minOverlap` can miss at low jaccard). MinHash
    * banding between corpus and benchmark generates candidates; an
    * exact merge-intersect over full 64-bit shingle-hash sets verifies,
    * so every returned pair's `jaccard` is exact — only RECALL is
    * approximate, bounded by the (bands, rows) S-curve, and jaccard-1.0
    * pairs (verbatim leakage) always collide in every band.
    *
    * Scale shape: both sides run the [[Dedup.signedSets]] kernel; the
    * benchmark's banded signatures and hash sets BROADCAST (eval suites
    * are MBs against a 100 TB corpus), so the corpus never shuffles —
    * band-bucket probe, distinct per pair, verify, all map-side.
    * Returns (idCol, bench_id, jaccard) with jaccard ≥ `threshold`.
    */
  def fuzzyContaminated(
      docs: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    Dedup.requireLongCastableId(docs, idCol)
    Dedup.requireLongCastableId(benchmark, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    def banded(df: DataFrame, side: String): DataFrame =
      Dedup.signedSets(df, textCol, idCol, numHashes, shingleSize)
        .select(col(idCol).as(s"_${side}_id"), col("hs").as(s"_${side}_hs"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              hash(slice(col("signature"), b * rows + 1, rows)).as("bucket"))): _*))
            .as("bb"))
        .select(col(s"_${side}_id"), col(s"_${side}_hs"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val bench = broadcast(banded(benchmark, "bench"))
    // verify PER COLLIDING BAND and dedup the verdicts, not the raw
    // candidates: carrying hash sets through a pair-distinct would
    // shuffle array payloads, while re-running the merge walk on a
    // multi-band collision is map-side CPU only — the final distinct
    // moves bare (long, long, double) rows.
    banded(docs, "doc")
      .join(bench, Seq("band", "bucket"))
      .select(col("_doc_id"), col("_bench_id"),
        col("_doc_hs"), col("_bench_hs"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions { it =>
        it.map { case (did, bid, dh, bh) =>
          var a = 0; var b = 0; var c = 0
          while (a < dh.length && b < bh.length) {
            if (dh(a) == bh(b)) { c += 1; a += 1; b += 1 }
            else if (dh(a) < bh(b)) a += 1
            else b += 1
          }
          (did, bid, c.toDouble / (dh.length + bh.length - c))
        }
      }
      .toDF(idCol, "bench_id", "jaccard")
      .filter(col("jaccard") >= threshold)
      .distinct()
  }

  /** Benchmark leakage via WINNOWING fingerprints ([[TextAnalysis
    * .winnowFingerprints]]): flag corpus docs sharing ≥ `minShared`
    * selected fingerprints with the benchmark set. The winnowing
    * guarantee makes this an exact-substring-grade detector (any
    * sufficiently long verbatim overlap MUST share a fingerprint) at
    * ~2/(window+1) of full-shingle density — the match join moves
    * fingerprints, not shingle streams.
    *
    * Scale: corpus side is the scan-local winnow kernel; the benchmark
    * fingerprint set is tiny and BROADCASTS, so the corpus never
    * shuffles for the match — same shape as [[flagContaminated]].
    */
  def winnowContaminated(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      minShared: Long = 3L, shingleN: Int = 3, window: Int = 4): DataFrame = {
    val corpusFps = TextAnalysis.winnowFingerprints(
      corpus, textCol, idCol, shingleN, window)
    val benchFps = TextAnalysis.winnowFingerprints(
        benchmark, textCol, idCol, shingleN, window)
      .select(col("fp")).distinct()
    corpusFps
      .join(broadcast(benchFps), "fp")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[fuzzyContaminated]] under the PORTABLE md5 contract
    * ([[PortableSketches]]): same candidates-then-exact-verify
    * semantics, but every signature row, band key, and verify count is
    * restatable in SQL — so the whole cross-corpus decontamination
    * pipeline (including which near-dup pairs the banding can miss)
    * sits under a hard oracle. Same broadcast shape: the benchmark's
    * banded keys and hash sets broadcast, the corpus never shuffles.
    */
  def fuzzyContaminatedPortable(
      docs: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.8, numHashes: Int = 32,
      rowsPerBand: Int = 4, shingleSize: Int = 3): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val bands = numHashes / rowsPerBand
    val spark = docs.sparkSession
    def banded(df: DataFrame, side: String): DataFrame =
      PortableSketches.minhashSignatures60(
          df, textCol, idCol, numHashes, shingleSize)
        .select(col(idCol).as(s"${side}_id"), col("hs").as(s"${side}_hs"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              concat_ws(":", transform(
                slice(col("signature"), b * rowsPerBand + 1, rowsPerBand),
                _.cast("string"))).as("key"))): _*)).as("bb"))
        .select(col(s"${side}_id"), col(s"${side}_hs"),
          col("bb.band").as("band"), col("bb.key").as("key"))
    val bench = broadcast(banded(benchmark, "bench"))
    banded(docs, "doc")
      .join(bench, Seq("band", "key"))
      .select(col("doc_id"), col("bench_id"),
        Dedup.jaccardSorted(spark, col("doc_hs"), col("bench_hs"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("bench_id"),
        round(col("jaccard"), 6).as("jaccard"))
      .distinct()
  }
}
