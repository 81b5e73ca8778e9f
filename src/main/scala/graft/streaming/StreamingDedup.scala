package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-dup detection against a STATIC reference corpus — the
  * continuous-ingest question "is this incoming document a near-copy of
  * anything we already hold?".
  *
  * Shape: the corpus is indexed ONCE ([[NearDupIndex]]: a banding table
  * and a verify table, both cached by the caller); each micro-batch
  *  1. runs the minhash kernel over ITS OWN rows only,
  *  2. stream-static equi-joins its band buckets against the index
  *     (no corpus rescan — the join prunes to matching buckets),
  *  3. stream-static joins the surviving candidate ids to the verify
  *     table and scores exact jaccard with the codegen'd
  *     `sorted_intersect_count` expression,
  *  4. suppresses band-duplicate emissions of the same (doc, corpus)
  *     pair with watermark-bounded state.
  *
  * Per-batch cost is proportional to the BATCH (plus matched buckets),
  * never the corpus — the property that makes continuous dedup viable
  * against a 100 TB reference set.
  */
object StreamingDedup {

  /** The static side, built once per reference corpus. `bands` =
    * (band, bucket, cid); `sets` = (cid, chs sorted hashes). Caller
    * caches both (they are re-read every micro-batch).
    */
  final case class NearDupIndex(bands: DataFrame, sets: DataFrame)

  def buildIndex(
      corpus: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): NearDupIndex = {
    Dedup.requireLongCastableId(corpus, idCol)
    val rows = numHashes / bands
    val ss = Dedup.signedSets(corpus, textCol, idCol, numHashes, shingleSize)
    val banded = ss.select(
      col(idCol).cast("long").as("cid"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          hash(slice(col("signature"), b * rows + 1, rows)).as("bucket"))): _*))
        .as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("cid"))
    val sets = ss.select(col(idCol).cast("long").as("cid"),
      col("hs").as("chs"))
    NearDupIndex(banded, sets)
  }

  /** Matches of the streaming documents against the index:
    * (idCol, cid, jaccard, tsCol) rows with jaccard ≥ `threshold`.
    * `stream` must carry (idCol, textCol, tsCol). The same (doc,
    * corpus) pair emits once within the watermark horizon (band
    * duplicates and replays are suppressed by watermark-bounded
    * state); signature params must match the index's.
    */
  def matches(
      stream: DataFrame, index: NearDupIndex,
      textCol: String, idCol: String, tsCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      watermark: String = "10 minutes"): DataFrame = {
    Dedup.requireLongCastableId(stream, idCol)
    val spark = stream.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    val fam = Dedup.hashFamily(numHashes).toArray
    val p = Dedup.MinhashPrime
    // per-batch kernel: this evaluates over each micro-batch's rows only
    val signed = stream
      .select(col(idCol).cast("long"), col(textCol),
        col(tsCol).cast("timestamp"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        it.map { case (id, text, ts) =>
          val hs = Dedup.shingleStrings(text, shingleSize).map(Dedup.hash64)
          java.util.Arrays.sort(hs)
          val hm = new Array[Long](hs.length)
          var i = 0
          while (i < hs.length) {
            hm(i) = java.lang.Math.floorMod(hs(i), p); i += 1
          }
          val sig = new Array[Long](fam.length)
          var f = 0
          while (f < fam.length) {
            val (a, b) = fam(f)
            var best = Long.MaxValue
            var j = 0
            while (j < hm.length) {
              val v = (hm(j) * a + b) % p
              if (v < best) best = v
              j += 1
            }
            sig(f) = best
            f += 1
          }
          (id, ts, hs, sig)
        }
      }
      .toDF(idCol, tsCol, "hs", "signature")
    val probes = signed.select(
      col(idCol), col(tsCol), col("hs"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          hash(slice(col("signature"), b * rows + 1, rows)).as("bucket"))): _*))
        .as("bb"))
      .select(col(idCol), col(tsCol), col("hs"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    probes
      .join(index.bands, Seq("band", "bucket")) // stream-static
      .join(index.sets, Seq("cid")) // stream-static
      .select(col(idCol), col("cid"),
        round(Dedup.jaccardSorted(spark, col("hs"), col("chs")), 6).as("jaccard"),
        col(tsCol))
      .filter(col("jaccard") >= threshold)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol, "cid")
  }
}
