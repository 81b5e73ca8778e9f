package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — trainer + Viterbi encoder (Kudo,
  * "Subword Regularization", ACL 2018; the SentencePiece `unigram`
  * model): the OTHER major tokenizer family beside [[Bpe]]. Where BPE
  * grows a vocabulary bottom-up by merge frequency, the unigram model
  * starts from a LARGE candidate-piece vocabulary, fits piece
  * probabilities by EM over all segmentations of each word, and prunes
  * low-mass pieces until the target size — then encodes with the
  * single best (Viterbi) segmentation.
  *
  * Scale design — the [[Bpe]] discipline exactly:
  *  - ONE corpus-scale pass total: the word-frequency aggregate.
  *    Everything after runs on the DISTINCT-WORD dict (vocabulary-
  *    bounded by Heaps' law, ≪ corpus), collected top-V by
  *    (freq desc, word) like [[Bpe.trainMerges]] — EM is inherently
  *    sequential across iterations, so looping Spark jobs per
  *    iteration would buy nothing but scheduler overhead; the dict
  *    fits the driver by construction and the EM rounds are
  *    vocabulary-bounded driver compute.
  *  - Deterministic end to end: the dict collect has a total order
  *    (freq desc, word); EM runs single-threaded in dict order (float
  *    sums in one fixed order — no partition-order sensitivity);
  *    candidate selection and pruning break ties (count desc, piece
  *    UTF-8 asc); the emitted log-probs are quantized to integer
  *    MILLI-NATS, so the encoder's Viterbi argmax is exact integer
  *    arithmetic with documented tie-breaks — the same fixed-point
  *    portability contract as the rank-statistic family.
  *  - The encoder broadcasts the piece table and segments each word
  *    independently — embarrassingly parallel, no shuffle at all.
  *
  * Losslessness: every single code point seen in training is kept in
  * the vocabulary unconditionally (never pruned), so any text drawn
  * from the training character set round-trips exactly; encode-time
  * UNSEEN code points become their own single-cp tokens under a fixed
  * penalty score (still lossless — the round trip holds for ANY
  * input).
  */
object UnigramLm {

  /** Train piece log-probs. Returns (piece, logProbMilli) with
    * logProbMilli = round(ln p · 1000) ≤ 0, sorted by piece — the
    * broadcastable model table.
    *
    * @param vocabSize     target piece count (floor: the single-cp
    *                      inventory is never pruned below)
    * @param maxPieceLen   max candidate length in code points
    * @param maxCandidates seed vocabulary cap (top by corpus count)
    * @param emIters       EM iterations per prune round (and final)
    * @param pruneKeep     fraction of multi-cp pieces kept per prune
    *                      round (SentencePiece's shrinking_factor)
    * @param maxDriverVocab word-dict cap, the [[Bpe.trainMerges]]
    *                      bounded-sample contract: under the cap the
    *                      fit is exact; past it training sees the
    *                      top-V words by frequency (logged loudly)
    */
  def trainPieces(
      df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, maxCandidates: Int = 1 << 14,
      emIters: Int = 2, pruneKeep: Double = 0.8,
      maxDriverVocab: Int = 1 << 18): Seq[(String, Long)] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(pruneKeep > 0.0 && pruneKeep < 1.0,
      s"pruneKeep in (0,1), got $pruneKeep")
    val spark = df.sparkSession
    import spark.implicits._
    val dict = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxDriverVocab)
      .as[(String, Long)]
      .collect()
    if (dict.length == maxDriverVocab)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"unigram-LM dict hit maxDriverVocab=$maxDriverVocab — training " +
          "on the top-V words by frequency (the Bpe bounded-sample " +
          "contract); raise the cap with driver heap to match")
    trainOnWordDict(dict, vocabSize, maxPieceLen, maxCandidates,
      emIters, pruneKeep)
  }

  /** UTF-8 byte order — the tie-break order shared with [[Bpe]] and
    * Spark SQL's string comparison.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Code-point split (the [[Bpe.toSymbols]] lesson: UTF-16 surrogate
    * halves are not symbols).
    */
  private def cps(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Expected piece counts of ONE word under the current probs —
    * log-space forward-backward (scaling-free, so long words cannot
    * underflow). The shared E-step kernel: the driver trainer sums the
    * raw doubles in dict order; the distributed trainer quantizes each
    * word's contribution to micro-units and sums exact longs. Emits
    * f · P[piece used at (i,j) | word], once per in-vocab span.
    */
  private def expectedCounts(
      w: Array[String], f: Long, probs: scala.collection.Map[String, Double],
      maxPieceLen: Int): Iterator[(String, Double)] = {
    val n = w.length
    if (n == 0) return Iterator.empty
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    // piece log-probs for every in-vocab span, by (start, end)
    val lp = Array.ofDim[Double](n, n + 1)
    var i = 0
    while (i < n) {
      var piece = ""
      var j = i
      while (j < math.min(n, i + maxPieceLen)) {
        piece = piece + w(j)
        lp(i)(j + 1) = probs.get(piece) match {
          case Some(p) => math.log(p)
          case None => Double.NegativeInfinity
        }
        j += 1
      }
      i += 1
    }
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var j = 1
    while (j <= n) {
      var i1 = math.max(0, j - maxPieceLen)
      while (i1 < j) {
        if (lp(i1)(j) != Double.NegativeInfinity)
          alpha(j) = lse(alpha(j), alpha(i1) + lp(i1)(j))
        i1 += 1
      }
      j += 1
    }
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    beta(n) = 0.0
    var i2 = n - 1
    while (i2 >= 0) {
      var j2 = i2 + 1
      val jMax = math.min(n, i2 + maxPieceLen)
      while (j2 <= jMax) {
        if (lp(i2)(j2) != Double.NegativeInfinity)
          beta(i2) = lse(beta(i2), lp(i2)(j2) + beta(j2))
        j2 += 1
      }
      i2 -= 1
    }
    val logZ = alpha(n) // singles always in vocab → finite
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    i = 0
    while (i < n) {
      var piece = ""
      var j3 = i
      while (j3 < math.min(n, i + maxPieceLen)) {
        piece = piece + w(j3)
        if (lp(i)(j3 + 1) != Double.NegativeInfinity) {
          val e = math.exp(alpha(i) + lp(i)(j3 + 1) + beta(j3 + 1) - logZ)
          if (e > 0.0) out += ((piece, f * e))
        }
        j3 += 1
      }
      i += 1
    }
    out.iterator
  }

  /** The in-memory fit over a (word, freq) dict: seed candidates →
    * (EM × emIters → prune to `pruneKeep`) until ≤ vocabSize → final
    * EM. All driver compute, all in deterministic dict/piece order.
    */
  private[operators] def trainOnWordDict(
      dict: Array[(String, Long)], vocabSize: Int, maxPieceLen: Int,
      maxCandidates: Int, emIters: Int,
      pruneKeep: Double): Seq[(String, Long)] = {
    import scala.collection.mutable
    if (dict.isEmpty) return Seq.empty
    val words: Array[Array[String]] = dict.map { case (w, _) => cps(w) }
    val freqs: Array[Long] = dict.map(_._2)

    // seed counts: every substring occurrence, weighted by word freq
    val singleCounts = mutable.HashMap.empty[String, Long]
    val multiCounts = mutable.HashMap.empty[String, Long]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val f = freqs(wi)
      var i = 0
      while (i < w.length) {
        singleCounts(w(i)) = singleCounts.getOrElse(w(i), 0L) + f
        var j = i + 2
        val jMax = math.min(w.length, i + maxPieceLen)
        var piece = w(i)
        while (j <= jMax) {
          piece = piece + w(j - 1)
          multiCounts(piece) = multiCounts.getOrElse(piece, 0L) + f
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    val singles: Array[String] = singleCounts.keys.toArray.sortWith(utf8Lt)
    // top candidates by (count desc, piece utf8 asc)
    var multis: Array[String] = multiCounts.toArray
      .sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else utf8Lt(p1, p2)
      }
      .take(maxCandidates)
      .map(_._1)

    // probs: init proportional to seed counts
    var probs = mutable.HashMap.empty[String, Double]
    locally {
      val tot = (singles.map(singleCounts) ++ multis.map(multiCounts))
        .map(_.toDouble).sum
      singles.foreach(p => probs(p) = singleCounts(p) / tot)
      multis.foreach(p => probs(p) = multiCounts(p) / tot)
    }

    /** One EM pass: expected piece counts via [[expectedCounts]] over
      * every dict word in dict order, then re-normalized probs.
      * Returns the expected counts (the prune criterion).
      */
    def emStep(): mutable.HashMap[String, Double] = {
      val counts = mutable.HashMap.empty[String, Double]
      var wi = 0
      while (wi < words.length) {
        expectedCounts(words(wi), freqs(wi), probs, maxPieceLen)
          .foreach { case (piece, e) =>
            counts(piece) = counts.getOrElse(piece, 0.0) + e
          }
        wi += 1
      }
      // M-step: renormalize over the live vocabulary (zero-expectation
      // multi-cp pieces drop; singles keep a floor so losslessness and
      // finite logZ are structural, not data-dependent)
      val floor = 1e-12
      multis = multis.filter(p => counts.getOrElse(p, 0.0) > 0.0)
      val tot = singles.map(p => math.max(counts.getOrElse(p, 0.0), floor)).sum +
        multis.map(counts).sum
      val next = mutable.HashMap.empty[String, Double]
      singles.foreach(p =>
        next(p) = math.max(counts.getOrElse(p, 0.0), floor) / tot)
      multis.foreach(p => next(p) = counts(p) / tot)
      probs = next
      counts
    }

    // prune rounds: EM to fit, then drop the low-expectation tail of
    // the multi-cp pieces, until the target size; then a final EM fit
    // on the settled vocabulary. (No pruning needed → exactly emIters
    // EM steps total, which is what the hand-corpus spec locks.)
    var rounds = 0
    while (singles.length + multis.length > vocabSize &&
        math.max(vocabSize - singles.length, 0) < multis.length &&
        rounds < 64) {
      var lastCounts = mutable.HashMap.empty[String, Double]
      var it = 0
      while (it < emIters) { lastCounts = emStep(); it += 1 }
      val targetMulti = math.max(vocabSize - singles.length, 0)
      if (multis.length > targetMulti) {
        // keep the top pruneKeep-fraction (floored at the target) of
        // multi-cp pieces by (expected count desc, piece utf8 asc)
        val keep = math.max(targetMulti,
          math.floor(multis.length * pruneKeep).toInt)
          .min(multis.length - 1).max(targetMulti)
        multis = multis
          .sortWith { (a, b) =>
            val ca = lastCounts.getOrElse(a, 0.0)
            val cb = lastCounts.getOrElse(b, 0.0)
            if (ca != cb) ca > cb else utf8Lt(a, b)
          }
          .take(keep)
        val tot = singles.map(probs).sum + multis.map(probs).sum
        val next = mutable.HashMap.empty[String, Double]
        (singles ++ multis).foreach(p => next(p) = probs(p) / tot)
        probs = next
      }
      rounds += 1
    }
    // settle probabilities on the final vocabulary
    var it = 0
    while (it < emIters) { emStep(); it += 1 }

    (singles ++ multis).sortWith(utf8Lt).map { p =>
      (p, math.round(math.log(probs(p)) * 1000.0))
    }.toSeq
  }

  /** All-distributed trainer — the [[Bpe.trainMergesDistributed]]
    * parallel, for vocabularies that must not be truncated and don't
    * fit a driver heap: the WORD DICT never collects. Per EM
    * iteration, ONE Spark pass over the materialized distinct-word
    * frame (current piece probs broadcast) runs the same
    * [[expectedCounts]] forward-backward kernel per word; each word's
    * expected-count contribution QUANTIZES to integer MICRO-units
    * (round half-up) and the per-piece totals are EXACT LONG sums —
    * partition-order-independent, so the fit is deterministic on any
    * cluster (raw double sums would flip last bits with partitioning).
    * Only VOCABULARY-bounded frames ever reach the driver: the seed
    * candidates (top `maxCandidates` by (count desc, piece UTF-8 asc),
    * a TakeOrdered), the single-cp inventory, and one (piece, micro)
    * row per live piece per iteration. Same prune schedule and output
    * contract as [[trainPieces]]; micro-quantization perturbs probs
    * below the milli-nat output precision on anything but adversarial
    * boundaries (UnigramLmSpec pins exact agreement on the hand
    * corpus).
    */
  def trainPiecesDistributed(
      df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, maxCandidates: Int = 1 << 14,
      emIters: Int = 2, pruneKeep: Double = 0.8): Seq[(String, Long)] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(pruneKeep > 0.0 && pruneKeep < 1.0,
      s"pruneKeep in (0,1), got $pruneKeep")
    import graft.operators.Materialize.MaterializeOps
    val spark = df.sparkSession
    import spark.implicits._
    val mpl = maxPieceLen
    val words = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .materialized // every EM pass re-reads this frame
      .as[(String, Long)]
    // seed counts: singles (charset-bounded inventory) + top multi-cp
    // candidates by (count desc, piece asc) — Spark's string order IS
    // UTF-8 binary, matching the driver trainer's tie-break
    val singleSeed = words.flatMap { case (w, f) =>
      cps(w).iterator.map(c => (c, f))
    }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
      .as[(String, Long)].collect().sortWith((a, b) => utf8Lt(a._1, b._1))
    if (singleSeed.isEmpty) return Seq.empty
    val multiSeed = words.flatMap { case (w, f) =>
      val c = cps(w)
      (0 until c.length).iterator.flatMap { i =>
        (i + 2 to math.min(c.length, i + mpl)).iterator
          .map(j => (c.slice(i, j).mkString, f))
      }
    }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
      .orderBy(col("c").desc, col("p"))
      .limit(maxCandidates)
      .as[(String, Long)].collect()
    val singles = singleSeed.map(_._1)
    var multis = multiSeed.map(_._1)
    var probs: Map[String, Double] = {
      val tot = (singleSeed.map(_._2) ++ multiSeed.map(_._2))
        .map(_.toDouble).sum
      (singleSeed ++ multiSeed).map { case (p, c) => p -> c / tot }.toMap
    }
    // one distributed E-step: exact long micro-unit piece totals
    def emPass(): Map[String, Long] = {
      val bc = spark.sparkContext.broadcast(probs)
      val out = words.flatMap { case (w, f) =>
        expectedCounts(cps(w), f, bc.value, mpl).flatMap { case (p, e) =>
          val micro = math.round(e * 1e6) // half-up, deterministic
          if (micro > 0L) Iterator.single((p, micro)) else Iterator.empty
        }
      }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
        .as[(String, Long)].collect().toMap
      out
    }
    def mStep(counts: Map[String, Long]): Unit = {
      multis = multis.filter(p => counts.getOrElse(p, 0L) > 0L)
      val tot = (singles.map(p => math.max(counts.getOrElse(p, 0L), 1L)) ++
        multis.map(counts)).map(_.toDouble).sum
      probs = (singles.map(p =>
        p -> math.max(counts.getOrElse(p, 0L), 1L) / tot) ++
        multis.map(p => p -> counts(p) / tot)).toMap
    }
    var rounds = 0
    while (singles.length + multis.length > vocabSize &&
        math.max(vocabSize - singles.length, 0) < multis.length &&
        rounds < 64) {
      var last = Map.empty[String, Long]
      var it = 0
      while (it < emIters) { last = emPass(); mStep(last); it += 1 }
      val targetMulti = math.max(vocabSize - singles.length, 0)
      if (multis.length > targetMulti) {
        val keep = math.max(targetMulti,
          math.floor(multis.length * pruneKeep).toInt)
          .min(multis.length - 1).max(targetMulti)
        multis = multis
          .sortWith { (a, b) =>
            val ca = last.getOrElse(a, 0L)
            val cb = last.getOrElse(b, 0L)
            if (ca != cb) ca > cb else utf8Lt(a, b)
          }
          .take(keep)
        val tot = (singles ++ multis).map(probs).sum
        probs = (singles ++ multis).map(p => p -> probs(p) / tot).toMap
      }
      rounds += 1
    }
    var it = 0
    while (it < emIters) { mStep(emPass()); it += 1 }
    (singles ++ multis).sortWith(utf8Lt).map { p =>
      (p, math.round(math.log(probs(p)) * 1000.0))
    }.toSeq
  }

  /** Penalty score for encode-time code points absent from the model:
    * worse than any trained piece, so known pieces always win, but
    * finite — the unknown cp becomes its own token and the round trip
    * still holds.
    */
  private def unkMilli(pieces: Seq[(String, Long)]): Long =
    (if (pieces.isEmpty) 0L else pieces.map(_._2).min) - 10000L

  /** Viterbi-tokenize each document with a trained piece table: per
    * word, the segmentation maximizing Σ logProbMilli — EXACT integer
    * argmax. Ties break (1) fewer tokens, (2) at equal score and
    * count, the transition from the SMALLEST start index wins (longest
    * final piece) — a local rule, so the DP is one deterministic
    * left-to-right pass. Output: original columns + `tokens` +
    * `n_tokens`. No shuffle; the piece table broadcasts.
    */
  def encode(
      df: DataFrame, textCol: String,
      pieces: Seq[(String, Long)]): DataFrame = {
    val spark = df.sparkSession
    val maxLen =
      if (pieces.isEmpty) 1
      else pieces.map(p => p._1.codePointCount(0, p._1.length)).max
    val unk = unkMilli(pieces)
    val bc = spark.sparkContext.broadcast(pieces.toMap)
    val ml = maxLen
    val segmentWord = (w: String) => {
      val table = bc.value
      val c = cps(w)
      val n = c.length
      // dp(j) = (bestScore, bestNumTokens, backpointer i)
      val score = Array.fill(n + 1)(Long.MinValue)
      val ntok = Array.fill(n + 1)(Int.MaxValue)
      val back = Array.fill(n + 1)(-1)
      score(0) = 0L; ntok(0) = 0
      var j = 1
      while (j <= n) {
        var i = math.max(0, j - ml)
        while (i < j) {
          if (score(i) != Long.MinValue) {
            val piece = c.slice(i, j).mkString
            val lp = table.get(piece) match {
              case Some(v) => Some(v)
              case None => if (j - i == 1) Some(unk) else None
            }
            lp.foreach { v =>
              val s = score(i) + v
              val t = ntok(i) + 1
              // (score desc, ntok asc, smallest i) — i ascends in this
              // loop, so strict improvement only
              if (s > score(j) || (s == score(j) && t < ntok(j))) {
                score(j) = s; ntok(j) = t; back(j) = i
              }
            }
          }
          i += 1
        }
        j += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n
      while (pos > 0) {
        val i = back(pos)
        out += c.slice(i, pos).mkString
        pos = i
      }
      out.reverseIterator.toSeq
    }
    val tokenize = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.toLowerCase.trim.split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(segmentWord)
    }
    df.withColumn("tokens", tokenize(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Detokenize an [[encode]]d frame: unigram pieces are plain
    * substrings of the normalized words, so concatenation recovers the
    * normalized text with whitespace removed — the same lossless-
    * round-trip contract as [[Bpe.detokenized]], checkable against the
    * raw text without knowing the piece table.
    */
  def detokenized(
      encoded: DataFrame, tokensCol: String = "tokens"): DataFrame =
    encoded.withColumn("detok", expr(s"concat_ws('', $tokensCol)"))
}
