package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-PORTABLE sketch family: SimHash and MinHash whose every bit is
  * derivable from `md5(token)` — a hash both Spark and any SQL oracle
  * (DuckDB, Trino, ...) compute identically. The xxhash64-based paths in
  * [[Dedup]] stay the production default (xxhash is faster than md5);
  * this family exists so the LSH *pipelines* — signatures, banding,
  * candidate join, verify — can sit under a hard cross-engine oracle
  * instead of the rows-only check approximate ops normally get. The
  * approximation itself (pairs missed when no band agrees) is part of
  * the pinned contract: both engines run the identical hash family, so
  * they miss the identical pairs.
  *
  * Portable token hash: the first 15 hex chars of md5(token) read as an
  * integer — 60 bits, reproducible in SQL as
  * `('0x' || substr(md5(w), 1, 15))::BIGINT` (DuckDB) or
  * `conv(substr(md5(w), 1, 15), 16, 10)` (Spark SQL).
  *
  * Reference scope: the reference engine has no near-dup machinery at
  * all (SURVEY.md §2.6) — this is extension surface for the 100 TB
  * training-data pipeline, where dedup runs on shingle/word sets and
  * every shuffle must carry hashes, never text.
  */
object PortableSketches {

  /** 2³¹−1, same modulus as [[Dedup.MinhashPrime]]: keeps a·x+b below
    * 2^62 — exact long arithmetic in both engines, no overflow.
    */
  val Prime: Long = (1L << 31) - 1

  private def md5Bytes(md: java.security.MessageDigest, s: String): Array[Byte] = {
    md.reset()
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** First 15 hex nibbles of md5(s) as a 60-bit non-negative long —
    * the top 60 bits of the first 8 digest bytes (hex chars are nibbles
    * in byte order, so `>>> 4` drops exactly the 16th nibble).
    */
  private[operators] def hash60(md: java.security.MessageDigest, s: String): Long = {
    val b = md5Bytes(md, s)
    val top = ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    top >>> 4
  }

  /** First 7 hex nibbles of md5(s) as a 28-bit long (< [[Prime]]) —
    * seeds the portable hash family below.
    */
  private[operators] def hash28(md: java.security.MessageDigest, s: String): Long = {
    val b = md5Bytes(md, s)
    val top = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    top >>> 4
  }

  /** Universal hash family h_i(x) = (a_i·x + b_i) mod p with the
    * coefficients themselves md5-derived — a_i from "a{i}", b_i from
    * "b{i}" — so an oracle reproduces the family from the contract
    * alone, no embedded constant tables:
    * `a_i = h28('a'||i) % (p-1) + 1`, `b_i = h28('b'||i) % p`.
    */
  def portableHashFamily(k: Int): Array[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k) { i =>
      (hash28(md, "a" + i) % (Prime - 1) + 1, hash28(md, "b" + i) % Prime)
    }
  }

  /** (id, sig): 60-bit portable SimHash over the DISTINCT lowercased
    * whitespace tokens — bit j of the signature is the sign of
    * Σ_tokens (2·bit_j(hash60(token)) − 1), ties → 0. JVM kernel for
    * the same reason as [[Dedup.simhashSignatures]]: 60 ±1-accumulations
    * per token are a tight loop, not an interpreted HOF chain.
    */
  def simhashSignatures60(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val tokens = text.toLowerCase.trim.split("\\s+").distinct
          val sums = new Array[Int](60)
          var t = 0
          while (t < tokens.length) {
            val h = hash60(md, tokens(t))
            var j = 0
            while (j < 60) {
              if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
              j += 1
            }
            t += 1
          }
          var sig = 0L
          var j = 0
          while (j < 60) { if (sums(j) > 0) sig |= (1L << j); j += 1 }
          (id, sig)
        }
      }
      .toDF(idCol, "sig")
  }

  /** All pairs within `maxHammingDistance` of portable-SimHash distance
    * — EXACT over the signature space: (maxH+1) bands of 60/(maxH+1)
    * bits are pigeonhole-complete (≤ maxH differing bits can touch at
    * most maxH bands, so one band always agrees), making the banded
    * join provably equal to the all-pairs join it replaces. Identical
    * signatures are clustered first so the band join runs at
    * distinct-signature scale on duplicated corpora (same shape as
    * [[Dedup.simhashNearDups]]).
    *
    * Output: (id_a, id_b, hamming), id_a < id_b.
    */
  def simhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxHammingDistance: Int = 3): DataFrame = {
    val chunks = maxHammingDistance + 1
    require(60 % chunks == 0,
      s"60 bits must split evenly into ${chunks} bands (maxH+1)")
    val bits = 60 / chunks
    val sigs = simhashSignatures60(df, textCol, idCol)
      .select(col(idCol).as("id"), col("sig"))
    val clusters = sigs.groupBy(col("sig").as("ckey"))
      .agg(collect_list(col("id")).as("ids"))
    val banded = clusters.select(col("ckey"),
      explode(array((0 until chunks).map(cI =>
        struct(lit(cI).as("chunk"),
          shiftright(col("ckey"), cI * bits)
            .bitwiseAND((1L << bits) - 1).as("key"))): _*)).as("ck"))
      .select(col("ckey"), col("ck.chunk"), col("ck.key"))
    val repPairs = banded.as("a").join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.ckey") < col("b.ckey"))
      .select(col("a.ckey").as("ckey_a"), col("b.ckey").as("ckey_b"),
        Dedup.hammingDistance(col("a.ckey"), col("b.ckey")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHammingDistance)
    Dedup.expandClusterPairs(clusters, repPairs, "hamming", lit(0))
  }

  /** (id, signature array<long>, hs sorted distinct shingle-hash
    * array): portable MinHash signatures over the distinct word
    * `shingleSize`-gram shingles. sig_i = min over shingles of
    * (a_i·(hash60(s) mod p) + b_i) mod p with the md5-derived family;
    * `hs` keeps the FULL-width 60-bit hashes (sorted) for the exact
    * verify — mod-p never touches the verify set.
    *
    * Shingles, NOT single words: word-set banding on template-heavy
    * corpora produces millions of chance band agreements (docs sharing
    * most of a vocabulary agree on 4-row bands at j≈0.5 routinely —
    * measured 8.0M candidates vs 256 on the sf0.1 corpus), while
    * shingle jaccard separates template kin from true near-dups.
    */
  def minhashSignatures60(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, shingleSize: Int = 3): DataFrame = {
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    val fam = portableHashFamily(numHashes)
    val p = Prime
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val tokens = Dedup.shingleStrings(text, shingleSize)
          val hs = tokens.map(hash60(md, _)).distinct.sorted
          val sig = new Array[Long](fam.length)
          var i = 0
          while (i < fam.length) {
            val (a, b) = fam(i)
            var best = Long.MaxValue
            var t = 0
            while (t < hs.length) {
              val v = (a * (hs(t) % p) + b) % p
              if (v < best) best = v
              t += 1
            }
            sig(i) = best
            i += 1
          }
          (id, sig, hs)
        }
      }
      .toDF(idCol, "signature", "hs")
  }

  /** MinHash+LSH near-dup pairs under the PORTABLE contract, end to
    * end: band keys are the ':'-joined decimal signature slices (string
    * equality — reproducible by `string_agg(mh::VARCHAR, ':' ORDER BY
    * i)`), candidates are distinct same-band pairs, verify is the exact
    * shingle-set jaccard via the codegen'd merge-walk
    * ([[Dedup.jaccardSorted]]). Pairs whose signatures agree on no band
    * are missed by BOTH engines — the S-curve is part of the contract
    * (numHashes=32, rowsPerBand=4 ⇒ 8 bands: miss ≈ 1.5% at j=0.8
    * exactly, ≈ 1.4e-6 at j=0.95).
    *
    * Output: (id_a, id_b, jaccard ≥ threshold), id_a < id_b. Shuffles
    * carry band-key strings and hash arrays, never text; candidate
    * volume ≈ output volume (true near-dup clusters dominate buckets),
    * so the verify join is output-bounded. For mega-duplicated corpora
    * route through the identical-set clustering of
    * [[Dedup.minhashNearDups]] first.
    */
  def minhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double, numHashes: Int = 32,
      rowsPerBand: Int = 4, shingleSize: Int = 3): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val bands = numHashes / rowsPerBand
    val spark = df.sparkSession
    val sigs = minhashSignatures60(df, textCol, idCol, numHashes, shingleSize)
      .select(col(idCol).as("id"), col("signature"), col("hs"))
      .materialized
    val banded = sigs.select(col("id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          concat_ws(":", transform(
            slice(col("signature"), b * rowsPerBand + 1, rowsPerBand),
            _.cast("string"))).as("key"))): _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.key"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val hsOnly = sigs.select(col("id"), col("hs"))
    cands
      .join(hsOnly.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(hsOnly.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Dedup.jaccardSorted(spark, col("hs_a"), col("hs_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
