package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered equi-joins (SURVEY.md §2.6 / the 100 TB design
  * point "minimize shuffles").
  *
  * The scenario AQE and broadcast joins both miss: the build side is too
  * large to broadcast as a hash relation (say 10⁸ distinct keys ≈ GBs of
  * hashed rows) but its KEY SET compresses into a Bloom filter a few MB
  * wide. Building that filter with one mergeable aggregate and
  * broadcasting it lets the probe side discard non-matching rows
  * MAP-SIDE, before the shuffle — at 100 TB the exchange then carries
  * only `selectivity + fpp` of the fact table instead of all of it.
  * Spark's own `InjectRuntimeFilter` applies the same idea
  * opportunistically (size/selectivity heuristics, shuffle joins only);
  * this operator is the explicit, deterministic form for pipelines that
  * know their selectivity up front.
  *
  * Correctness contract: a Bloom filter has NO false negatives, so
  * pre-filter + exact join is result-identical to the plain join —
  * false positives (~fpp of the pruned side) survive the pre-filter and
  * are removed by the exact join that follows. The `join_bloom_prefilter`
  * gate proves identity against the PLAIN semi-join oracle, same pattern
  * as `join_salted_skew`.
  *
  * The probe predicate is Catalyst's own codegen'd
  * `BloomFilterMightContain` (registered as `bloom_might_contain` by
  * [[graft.expressions.GraftFunctions]]) — not a Scala UDF — so the
  * pre-filter stays inside whole-stage codegen; the filter bytes ride
  * the expression as a foldable binary literal, which Spark broadcasts
  * with the task binary.
  */
object BloomJoin {

  import org.apache.spark.sql.types._

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Long image of a join key for the Bloom filter: integral keys cast
    * losslessly (preserving the filter's native `putLong` path); every
    * other type goes through `xxhash64` — the SAME function on build and
    * probe sides, so join-equal keys collide by construction, and a hash
    * collision is merely an extra Bloom false positive removed by the
    * exact join that follows. Null keys must stay null (`xxhash64(null)`
    * returns the seed, which would silently give null keys a real filter
    * entry and break the nulls-match-nothing contract).
    */
  private def keyAsLong(dt: DataType, key: Column): Column =
    if (integral(dt)) key.cast("long")
    else when(key.isNull, lit(null).cast("long")).otherwise(xxhash64(key))

  /** Join-equality across DIFFERENT non-integral types would let Spark
    * coerce the join condition while the two sides' xxhash64 images
    * disagree — a false-NEGATIVE vector. Refuse loudly; the caller
    * pre-casts one side instead.
    */
  private def checkKeyTypes(probe: DataType, build: DataType): Unit =
    require((integral(probe) && integral(build)) || probe == build,
      s"BloomJoin keys must both be integral or share one exact type, " +
        s"got $probe vs $build — pre-cast one side")

  /** Serialized Bloom filter over `build`'s join keys (any type — see
    * [[keyAsLong]]). One `treeAggregate` job (per-partition filters
    * OR-merged), driver holds only the final bitset. `expectedKeys`
    * sizes the filter — pass the known dimension cardinality at scale to
    * skip the count job.
    */
  def buildKeyFilter(
      build: DataFrame, buildKey: String, fpp: Double = 0.01,
      expectedKeys: Option[Long] = None): Array[Byte] = {
    val dt = build.schema(buildKey).dataType
    val keys = build.filter(col(buildKey).isNotNull)
      .select(keyAsLong(dt, col(buildKey)).as("k"))
    val expected = math.max(1L, expectedKeys.getOrElse(keys.count()))
    val bf = keys.stat.bloomFilter("k", expected, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `bloom_might_contain` probe column for `df(key)` against filter
    * bytes, applying the same key normalization the filter was built
    * with. Null keys yield null (they match nothing — callers pick the
    * branch nulls belong to, per join type).
    */
  def mightContain(df: DataFrame, filterBytes: Array[Byte], key: String): Column = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    call_function("bloom_might_contain", lit(filterBytes),
      keyAsLong(df.schema(key).dataType, col(key)))
  }

  /** LEFT SEMI join of `probe` against `build`'s keys, Bloom-prefiltered:
    * probe rows provably absent from the build key set are dropped
    * map-side; survivors run the exact semi-join that removes the ~fpp
    * false positives. Null probe keys match nothing in a semi-join, so
    * the null-valued probe predicate correctly drops them pre-shuffle.
    */
  def semiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      fpp: Double = 0.01, expectedKeys: Option[Long] = None): DataFrame = {
    checkKeyTypes(probe.schema(probeKey).dataType, build.schema(buildKey).dataType)
    val bytes = buildKeyFilter(build, buildKey, fpp, expectedKeys)
    // alias the build key so probeKey == buildKey (same-named columns,
    // the common self-corpus case) doesn't make the condition ambiguous
    val keys = build.select(col(buildKey).as("_bloom_build_key"))
    probe.filter(mightContain(probe, bytes, probeKey))
      .join(keys, col(probeKey) === col("_bloom_build_key"), "left_semi")
  }

  /** LEFT ANTI join of `probe` against `build`'s keys, Bloom-split:
    * rows the filter proves absent (plus null-keyed rows, which an
    * anti-join always emits) are in the answer IMMEDIATELY with no join
    * at all; only the bloom hits — `selectivity + fpp` of the probe —
    * pay the exact anti-join that separates true matches from false
    * positives. Same lossless-split contract as
    * [[IncrementalDedup.splitByFilter]], lifted to general keys.
    */
  def antiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      fpp: Double = 0.01, expectedKeys: Option[Long] = None): DataFrame = {
    checkKeyTypes(probe.schema(probeKey).dataType, build.schema(buildKey).dataType)
    val bytes = buildKeyFilter(build, buildKey, fpp, expectedKeys)
    val hit = coalesce(mightContain(probe, bytes, probeKey), lit(false))
    val keys = build.select(col(buildKey).as("_bloom_build_key"))
    probe.filter(!hit).unionAll(
      probe.filter(hit)
        .join(keys, col(probeKey) === col("_bloom_build_key"), "left_anti"))
  }

  // === Portable (md5-contract) Bloom filter ===
  //
  // The engine-portable twin of the xxhash64 filter above, in the same
  // twin pattern as PortableSketches: bit position j of a key is
  // md5(key ":" j) sliced to 60 bits mod m — restatable in any engine
  // with md5, so the FILTER ITSELF (which keys pass, which false
  // positives occur) sits under the cross-engine oracle, not just the
  // downstream exact join. Use the xxhash64 path for production speed;
  // use this when the bit-set must be reproduced outside the JVM
  // (a serialized index another system probes, or a gate).

  /** The k md5-contract bit positions of a key. */
  private def portablePos(key: Column, m: Int, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      pmod(conv(substring(md5(concat_ws(":", key.cast("string"),
        j.cast("string"))), 1, 15), 16, 10).cast("long"), lit(m)))

  /** The filter's set bits as a distinct single-column frame (≤ m
    * rows — broadcastable by construction for any practical m).
    */
  def portableBloomBits(
      build: DataFrame, key: String, m: Int, k: Int): DataFrame =
    build.filter(col(key).isNotNull)
      .select(explode(portablePos(col(key), m, k)).as("pos"))
      .distinct()

  /** Per-probe-key membership verdict against [[portableBloomBits]]:
    * a key passes iff ALL its distinct positions are set (two
    * positions of one key may coincide, so the test is got == need,
    * not got == k). The bit frame broadcasts; the probe side does one
    * map-side explode and a key-scale aggregate — nothing joins at
    * fact scale.
    */
  def portableMightContain(
      probe: DataFrame, key: String, bits: DataFrame,
      m: Int, k: Int): DataFrame = {
    val pp = probe.filter(col(key).isNotNull)
      .select(col(key).as("key")).distinct()
      .select(col("key"), explode(portablePos(col("key"), m, k)).as("pos"))
      .distinct()
    val need = pp.groupBy("key").agg(count(lit(1)).as("_need"))
    val got = pp.join(broadcast(bits), Seq("pos"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("_got"))
    need.join(got, Seq("key"), "left_outer")
      .select(col("key"),
        (coalesce(col("_got"), lit(0L)) === col("_need"))
          .as("might_contain"))
  }
}
