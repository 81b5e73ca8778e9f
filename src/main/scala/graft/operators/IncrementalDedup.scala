package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Incremental (cross-corpus) dedup: keep only the rows of a NEW batch
  * whose content key does not already exist in a REFERENCE corpus — the
  * recurring-crawl shape of training-data pipelines, where each
  * snapshot is mostly a copy of the corpus already ingested
  * (extension surface; within-batch dedup is [[Dedup.exact]]).
  *
  * Scale design: the corpus is the ~100 TB side and must never shuffle
  * per batch, so the membership test is pushed to it as two
  * scan-shaped passes with no wide exchange anywhere:
  *
  *  1. a Bloom filter over the corpus's content keys (xxhash64 of the
  *     256-bit hash — long keys so probes use Catalyst's codegen'd
  *     `BloomFilterMightContain`) is built with Spark's mergeable
  *     sketch aggregate (one corpus scan, partial sketches merged on
  *     the driver) and shipped as a literal in the probe expression;
  *  2. the incoming batch probes the filter map-side — the
  *     overwhelmingly-novel majority exits here, having touched
  *     nothing but the broadcast bitset;
  *  3. bloom hits (true duplicates + fpp false positives) are
  *     confirmed exactly: the distinct suspect keys broadcast into a
  *     semi-join against the corpus keys (second corpus scan, again no
  *     shuffle — the big side only probes a hash table), and the
  *     confirmed-duplicate keys broadcast back into a map-side
  *     anti-join on the batch.
  *
  * Result semantics are therefore EXACT set-difference on the key (up
  * to the 2^-128 sha2 collision the whole dedup family accepts —
  * [[Dedup.exact]]); the Bloom filter only decides how much work the
  * exact path sees. Null keys compare as SQL equality does: never
  * equal to anything, so null-keyed incoming rows are always kept.
  *
  * The broadcast confirm path assumes the per-batch duplicate slice
  * (plus fpp·batch false positives) fits in a broadcast — the premise
  * of incremental ingestion. A batch that is itself corpus-sized
  * should instead run the plain shuffled anti-join this operator
  * exists to avoid.
  */
object IncrementalDedup {

  /** Rows of `incoming` whose `key` value does not occur in `corpus`
    * (original `incoming` schema, duplicates dropped).
    *
    * @param expectedCorpusKeys sizes the Bloom filter; defaults to a
    *   `count()` of the corpus (metadata-only on parquet). At cluster
    *   scale pass the catalog row count instead.
    * @param fpp Bloom false-positive rate — a cost knob (how many
    *   novel rows take the exact confirm path), never a correctness
    *   knob.
    */
  def newAgainstCorpus(
      incoming: DataFrame, corpus: DataFrame, key: Column,
      fpp: Double = 0.01,
      expectedCorpusKeys: Option[Long] = None): DataFrame = {
    val (withKey, confirmed) =
      confirmedDuplicateKeys(incoming, corpus, key, fpp, expectedCorpusKeys)
    withKey
      .join(broadcast(confirmed), Seq("_ch"), "left_anti")
      .drop("_ch")
  }

  /** Complement view: incoming rows REJECTED as already-known, with the
    * shared key hash — the audit trail a pipeline logs per batch.
    */
  def knownDuplicates(
      incoming: DataFrame, corpus: DataFrame, key: Column,
      fpp: Double = 0.01,
      expectedCorpusKeys: Option[Long] = None): DataFrame = {
    val (withKey, confirmed) =
      confirmedDuplicateKeys(incoming, corpus, key, fpp, expectedCorpusKeys)
    withKey
      .join(broadcast(confirmed), Seq("_ch"), "left_semi")
      .withColumnRenamed("_ch", "content_hash")
  }

  /** The corpus's key filter, built once (one corpus scan; the sketch
    * aggregate merges per-partition filters). Reusable across batches
    * and across a streaming job's lifetime — rebuild when the corpus
    * grows past the filter's design fpp.
    *
    * The filter is built over `xxhash64(content_hash)` LONGS, not the
    * hash string: probes then run through Catalyst's codegen'd
    * `BloomFilterMightContain` (the engine's own runtime-filter
    * expression) instead of a boxed Scala UDF that would break
    * whole-stage codegen on every probe scan. An xxhash64 collision is
    * one more false positive for the exact confirm path to remove —
    * never a false negative (equal keys hash equal), so the lossless
    * split and set-difference contracts are untouched.
    */
  def buildCorpusFilter(
      corpus: DataFrame, key: Column, fpp: Double = 0.01,
      expectedKeys: Option[Long] = None): BloomFilter = {
    val keys = corpusKeyFrame(corpus, key)
      .select(xxhash64(col("content_hash")).as("_kh"))
    val expected = math.max(1L, expectedKeys.getOrElse(corpus.count()))
    keys.stat.bloomFilter("_kh", expected, fpp)
  }

  /** Codegen'd probe predicate for a `content_hash` column against a
    * corpus filter: `bloom_might_contain(bytes, xxhash64(hash))`, with
    * nulls kept null (xxhash64(null) would hit the seed's bit pattern
    * and break the nulls-match-nothing contract). The filter bytes
    * ride the plan as a foldable binary literal.
    */
  private def probe(df: DataFrame, filter: BloomFilter, hashCol: Column): Column = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val out = new ByteArrayOutputStream()
    filter.writeTo(out)
    call_function("bloom_might_contain", lit(out.toByteArray),
      when(hashCol.isNull, lit(null).cast("long")).otherwise(xxhash64(hashCol)))
  }

  /** Lossless split of a batch OR STREAMING frame against a corpus
    * filter: `_1` = rows whose key is PROVABLY absent from the corpus
    * (a Bloom filter has no false negatives — safe to emit/ingest
    * immediately), `_2` = bloom hits (true duplicates plus ~fpp of the
    * novel rows) carrying a `content_hash` column for the exact
    * confirm ([[newAgainstCorpus]] on the batch side, or an
    * out-of-band job for a stream). Map-side only — no shuffle, no
    * state, streaming-safe by construction; per-batch cost never
    * touches the corpus.
    */
  def splitByFilter(
      df: DataFrame, filter: BloomFilter, key: Column): (DataFrame, DataFrame) = {
    val keyed = df.withColumn("content_hash", sha2(key.cast("string"), 256))
    val hit = coalesce(probe(df, filter, col("content_hash")), lit(false))
    (keyed.filter(!hit).drop("content_hash"), keyed.filter(hit))
  }

  /** Streaming front line of incremental ingest: the novel-against-
    * corpus rows of a STREAMING frame, also deduplicated WITHIN the
    * stream (first occurrence wins) inside the watermark horizon. The
    * corpus membership test is the broadcast Bloom probe — map-side,
    * stateless, corpus never touched per batch; the within-stream
    * dedup is watermark-bounded state keyed by the 256-bit content
    * hash. Bloom false positives (~fpp of novel rows) are DROPPED
    * here, not confirmed — this is the high-throughput approximate
    * front line; run [[newAgainstCorpus]] on the emitted rows
    * out-of-band when exact set-difference semantics are required
    * (the [[splitByFilter]] contract covers the lossless variant).
    *
    * Null-keyed rows bypass both tests and are always emitted (SQL
    * equality semantics — null equals nothing), matching the batch
    * operators.
    */
  def streamingNovel(
      stream: DataFrame, filter: BloomFilter, key: Column,
      tsCol: String, watermark: String = "10 minutes"): DataFrame = {
    val hit = coalesce(probe(stream, filter, col("_ch")), lit(false))
    val keyed = stream
      .withColumn("_ch", sha2(key.cast("string"), 256))
      .withWatermark(tsCol, watermark)
    val novel = keyed.filter(!hit)
    novel.filter(col("_ch").isNotNull)
      .dropDuplicatesWithinWatermark("_ch")
      .unionByName(novel.filter(col("_ch").isNull))
      .drop("_ch")
  }

  /** Corpus snapshot diff — the data-versioning primitive operations
    * teams run between crawl/ingest versions: every id labelled
    * `added` (only in the new snapshot), `removed` (only in the old),
    * `changed` (both, content differs), or `unchanged`. Content is
    * compared by md5 so the full-outer join moves 16-byte digests, not
    * document text, and the contract is SQL-restatable (md5 is the
    * engine-portable hash of this repo's oracle family).
    *
    * One join keyed by id (both sides pre-projected to (id, digest));
    * at 100 TB co-partition or bucket both snapshots by id and the
    * exchange disappears.
    */
  def snapshotDiff(
      old: DataFrame, current: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    def keyed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).cast("long").as(idCol),
        md5(col(textCol)).as(s"_h_$side"))
    keyed(old, "old")
      .join(keyed(current, "new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h_old").isNull, lit("added"))
          .when(col("_h_new").isNull, lit("removed"))
          .when(col("_h_old") =!= col("_h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  private def corpusKeyFrame(corpus: DataFrame, key: Column): DataFrame =
    corpus
      .select(sha2(key.cast("string"), 256).as("content_hash"))
      .filter(col("content_hash").isNotNull)

  /** Shared machinery: (incoming + `_ch` key-hash column, confirmed
    * duplicate `_ch` keys as a broadcastable single-column frame).
    */
  private def confirmedDuplicateKeys(
      incoming: DataFrame, corpus: DataFrame, key: Column,
      fpp: Double, expectedCorpusKeys: Option[Long]): (DataFrame, DataFrame) = {
    val corpusKeys = corpusKeyFrame(corpus, key)
    val bloom = buildCorpusFilter(corpus, key, fpp, expectedCorpusKeys)
    val withKey = incoming.withColumn("_ch", sha2(key.cast("string"), 256))
    val suspectKeys = withKey
      .filter(coalesce(probe(incoming, bloom, col("_ch")), lit(false)))
      .select(col("_ch").as("content_hash"))
      .distinct()
    val confirmed = corpusKeys
      .join(broadcast(suspectKeys), Seq("content_hash"), "left_semi")
      .distinct()
      .withColumnRenamed("content_hash", "_ch")
    (withKey, confirmed)
  }
}
