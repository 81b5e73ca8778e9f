package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer — trainer + encoder (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016): the tokenization step of a training-data
  * pipeline, here as corpus-scale Spark ops.
  *
  * Scale design (100 TB):
  *  - ONE corpus-scale pass total: the word-frequency aggregate
  *    (groupBy word). Everything after runs on the DISTINCT-WORD frame
  *    — bounded by vocabulary (Heaps' law: ≪ corpus size), exactly how
  *    reference BPE trainers operate on a word-count dict.
  *  - default trainer: the top-`maxDriverVocab` dict collects to the
  *    driver and the merge loop runs in memory with incremental
  *    pair-count updates (lazy-deletion heap) — a 32k-merge vocab is
  *    ONE Spark job plus driver compute, not 32k sequential jobs. The
  *    fallback [[trainMergesDistributed]] keeps the exact per-merge
  *    distributed rounds (materialized per round via [[Materialize]], like
  *    [[ConnectedComponents]]) for untruncatable vocabularies.
  *  - ties on pair count break lexicographically in UTF-8 order in
  *    BOTH trainers — the training is deterministic,
  *    partitioning-independent (counts are exact integers).
  *
  * The encoder broadcasts the merge table (numMerges entries) and
  * re-tokenizes each word independently — embarrassingly parallel,
  * no shuffle at all.
  */
object Bpe {

  /** End-of-word marker appended to each word's last character-symbol
    * (the standard trick so "low" the word and "low" the prefix of
    * "lower" learn different units).
    */
  val Eow = "</w>"

  /** (left, right, rank) merge rules learned from the corpus, rank
    * 0-based in learning order.
    *
    * Dispatch: BPE's merge loop is inherently sequential (merge k+1's
    * counts depend on merge k), so looping Spark jobs per merge means a
    * 32k-merge vocab = 32k sequential jobs. Instead the DEFAULT path
    * runs ONE corpus-scale Spark job — the word-frequency aggregate,
    * taken top-`maxDriverVocab` by (freq desc, word) — then trains on
    * that word dict driver-side with incremental pair-count updates and
    * a lazy-deletion heap (the classic in-memory trainer every
    * reference BPE implementation uses; the dict is vocabulary-bounded
    * by Heaps' law, NOT corpus-bounded). When the corpus vocabulary
    * fits under `maxDriverVocab` the result is IDENTICAL to the
    * per-merge distributed rounds (BpeSpec locks both to an independent
    * reference trainer); past the cap it is a documented
    * bounded-sample mode — training sees the top-V words by frequency,
    * the standard frequency-truncated dict (tail words contribute
    * negligible pair mass). `maxDriverVocab <= 0` forces the
    * all-distributed per-merge rounds ([[trainMergesDistributed]])
    * for vocabularies that must not be truncated and don't fit a
    * driver heap.
    *
    * Driver-heap sizing: the in-memory trainer holds, per dict word,
    * a symbol array (one String per character) plus pair->word-index
    * sets — roughly 200–400 bytes per average word. The default cap
    * of 2^18 (262k words) keeps that under ~100 MB, safe on a
    * default-sized driver; raise it only with driver memory to match
    * (2^21 needs several GB).
    */
  def trainMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      maxDriverVocab: Int = 1 << 18): Seq[(String, String, Int)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    if (maxDriverVocab <= 0) return trainMergesDistributed(df, textCol, numMerges)
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus-scale pass: distinct words + frequencies, top-V by
    // (freq desc, word) — TakeOrderedAndProject, no full sort.
    val dict = wordFrequencies(df, textCol)
      .orderBy(col("freq").desc, col("w"))
      .limit(maxDriverVocab)
      .as[(String, Long)]
      .collect()
    // the truncated regime must be LOUD: a caller whose vocabulary
    // outgrew the cap gets a different merge table than the exact
    // trainer, and nothing downstream would flag it
    if (dict.length == maxDriverVocab)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"BPE dict hit maxDriverVocab=$maxDriverVocab — training on the " +
          "top-V words by frequency; raise the cap (with driver heap to " +
          "match) or pass <= 0 for the exact distributed trainer")
    trainOnWordDict(dict, numMerges)
  }

  /** All-distributed trainer: one Spark round (pair aggregate + 1-row
    * argmax + re-merge of the checkpointed distinct-word frame) per
    * merge. Exact for ANY vocabulary size, but O(numMerges) sequential
    * jobs — use only when the distinct-word dict cannot be bounded.
    */
  def trainMergesDistributed(
      df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String, Int)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordFrequencies(df, textCol).as[(String, Long)]
    // symbol sequences over the distinct-word frame
    var seqs = words.map { case (w, f) => (toSymbols(w), f) }
      .toDF("syms", "freq").materialized
    val merges = Seq.newBuilder[(String, String, Int)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // adjacent-pair counts, map-side combined; ties break on the
      // pair itself so the argmax is deterministic
      val top = seqs.as[(Array[String], Long)]
        .flatMap { case (syms, f) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), f))
        }
        .toDF("l", "r", "f")
        .groupBy("l", "r").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r, rank))
        seqs = seqs.as[(Array[String], Long)]
          .map { case (syms, f) => (applyMerge(syms, l, r), f) }
          .toDF("syms", "freq").materialized
        rank += 1
      }
    }
    merges.result()
  }

  private def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Initial symbols are CODE POINTS, not UTF-16 chars: splitting a
    * supplementary-plane character into lone surrogates would be mangled
    * to '?' by the UTF8String round trip inside the distributed trainer
    * (and by any UTF-8 sink), silently collapsing distinct symbols.
    */
  private[operators] def toSymbols(w: String): Array[String] = {
    val cps = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    cps(cps.length - 1) = cps(cps.length - 1) + Eow
    cps
  }

  /** Left-to-right non-overlapping application of one merge — the ONE
    * shared kernel, so the driver trainer, the distributed trainer and
    * the recount after each driver merge agree bit for bit.
    */
  private def applyMerge(
      syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** UTF-8 byte comparison — Spark SQL's string ordering, which the
    * distributed argmax (`orderBy(col("l"), col("r"))`) uses; the
    * driver trainer must break count ties identically.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Classic incremental trainer over a (word, freq) dict: pair counts
    * and a pair→words index maintained under each merge, argmax via a
    * lazy-deletion heap. O(total symbols) init; each merge touches only
    * the words that contain the merged pair. Deterministic: ties break
    * (count desc, l, r) in UTF-8 order — identical to the distributed
    * argmax.
    */
  private[operators] def trainOnWordDict(
      dict: Array[(String, Long)], numMerges: Int): Seq[(String, String, Int)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = dict.map { case (w, _) => toSymbols(w) }
    val freqs: Array[Long] = dict.map(_._2)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // max-heap of (count, l, r) snapshots; stale entries (count no
    // longer current) are dropped on pop
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else {
          val cl = utf8Compare(b._2, a._2) // smaller l wins the tie
          if (cl != 0) cl else utf8Compare(b._3, a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    // every count CHANGE pushes the new snapshot (increments AND
    // decrements — a decremented pair whose live count never reaches
    // the heap would be silently lost); stale snapshots are dropped on
    // pop by re-checking against the live map
    def bump(p: (String, String), delta: Long, wordIdx: Int,
        enqueue: Boolean): Unit = {
      val c = pairCounts.getOrElse(p, 0L) + delta
      if (c <= 0L) pairCounts.remove(p) else pairCounts(p) = c
      if (enqueue && c > 0L) heap.enqueue((c, p._1, p._2))
      if (delta > 0)
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wordIdx
    }
    def scanWord(i: Int, sign: Long, enqueue: Boolean): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        bump((s(j), s(j + 1)), sign * freqs(i), i, enqueue)
        j += 1
      }
    }
    // init: accumulate counts without per-position heap churn, then
    // seed the heap with one snapshot per distinct pair
    var i = 0
    while (i < syms.length) { scanWord(i, 1L, enqueue = false); i += 1 }
    pairCounts.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }
    val merges = Seq.newBuilder[(String, String, Int)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // pop to the first snapshot that matches the live count
      var chosen: Option[(String, String)] = None
      while (chosen.isEmpty && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        if (pairCounts.get((l, r)).contains(c)) chosen = Some((l, r))
      }
      chosen match {
        case None => exhausted = true
        case Some((l, r)) =>
          merges += ((l, r, rank))
          val affected = pairWords.remove((l, r)).getOrElse(mutable.HashSet.empty)
          affected.foreach { w =>
            // index entries can be stale (pair merged away earlier);
            // re-check adjacency before rewriting the word
            val s = syms(w)
            var has = false
            var j = 0
            while (!has && j < s.length - 1) {
              if (s(j) == l && s(j + 1) == r) has = true
              j += 1
            }
            if (has) {
              scanWord(w, -1L, enqueue = true)
              syms(w) = applyMerge(s, l, r)
              scanWord(w, 1L, enqueue = true)
            }
          }
          rank += 1
      }
    }
    merges.result()
  }

  /** Tokenize each document with a learned merge table: per word,
    * repeatedly apply the LOWEST-rank applicable merge (the standard
    * BPE encode order — training order, not greedy-longest). Output:
    * (original columns..., tokens array, n_tokens). No shuffle; the
    * merge table broadcasts.
    */
  /** Fixed merge list for [[portableMergeChain]] — common English
    * letter pairs, ordered so every merge's components are single
    * characters or products of STRICTLY earlier merges (which makes
    * the one-pass-per-rank chain coincide with iterative
    * lowest-rank-first BPE on these rules).
    */
  val PortableMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
    "o" -> "r", "s" -> "t")

  /** md5-contract-style PORTABLE twin of [[encode]] (the
    * [[PortableSketches]] discipline): BPE encoding restated as a
    * replace chain any SQL engine can replay verbatim, so the full
    * tokenize-and-merge pipeline sits under the hard oracle that the
    * corpus-trained [[trainMerges]]+[[encode]] path (rows-only by
    * design) cannot.
    *
    * Contract: lowercase, strip to `[a-z ]`, truncate to `maxChars`
    * chars; split to character tokens joined by U+001F; then for each
    * rule (x, y) in [[PortableMerges]] in order, replace every
    * non-overlapping left-to-right occurrence of `x⟂y` with `xy` —
    * which is precisely one standard BPE merge pass, and both Spark's
    * `replace` and DuckDB's `replace` implement exactly that scan.
    * Output per doc: token count and the pipe-joined token stream.
    *
    * Pure string expressions, whole-stage codegen, zero shuffles —
    * tokenization stays inside the scan at any corpus size.
    */
  def portableMergeChain(
      df: DataFrame, textCol: String, idCol: String,
      maxChars: Int = 64): DataFrame = {
    val sep = "\u001F"
    val base = substring(
      regexp_replace(lower(col(textCol)), "[^a-z ]", ""), 1, maxChars)
    val chars = rtrim(regexp_replace(col("_b"), "(.)", "$1" + sep), sep)
    val merged = PortableMerges.foldLeft(chars) { case (c, (x, y)) =>
      // non-overlapping left-to-right replace-all == one BPE merge pass
      call_function("replace", c, lit(x + sep + y), lit(x + y))
    }
    df.select(col(idCol), base.as("_b"))
      .select(col(idCol), col("_b"), merged.as("_t"))
      .select(col(idCol),
        when(length(col("_b")) === 0, 0L)
          .otherwise(size(split(col("_t"), sep)).cast("long"))
          .as("n_tokens"),
        translate(col("_t"), sep, "|").as("tokens"))
  }

  def encode(
      df: DataFrame, textCol: String,
      merges: Seq[(String, String, Int)]): DataFrame = {
    val spark = df.sparkSession
    val ranks: Map[(String, String), Int] =
      merges.map { case (l, r, k) => (l, r) -> k }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val tokenizeWord = (w: String) => {
      val rk = bc.value
      // code-point split, same as training's toSymbols
      var syms =
        if (w.isEmpty) Vector.empty[String] else toSymbols(w).toVector
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < syms.length - 1) {
          rk.get((syms(i), syms(i + 1))).foreach { r =>
            if (r < bestRank) { bestRank = r; bestAt = i }
          }
          i += 1
        }
        if (bestAt < 0) done = true
        else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
          syms.drop(bestAt + 2)
      }
      syms
    }
    val tokenize = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.toLowerCase.trim.split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(tokenizeWord)
    }
    df.withColumn("tokens", tokenize(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Detokenize an [[encode]]d frame: BPE subwords are substrings of
    * the normalized words (plus the `</w>` end-of-word marker
    * [[toSymbols]] appends), so concatenating them and stripping the
    * markers recovers the normalized text with whitespace removed —
    * the tokenizer's lossless-round-trip property, checkable against
    * the raw text without knowing the merge table.
    */
  def detokenized(
      encoded: DataFrame, tokensCol: String = "tokens"): DataFrame =
    encoded.withColumn("detok",
      expr(s"replace(concat_ws('', $tokensCol), '</w>', '')"))
}
