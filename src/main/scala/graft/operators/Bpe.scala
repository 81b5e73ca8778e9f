package graft.operators

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
  *  - each merge round is one flatMap + one partial-aggregated groupBy
  *    over that frame plus a 1-row argmax to the driver (the chosen
  *    pair — the only driver decision, inherently sequential in BPE).
  *  - the symbol-sequence frame is localCheckpoint'd per round so the
  *    iterative plan's lineage stays flat (same shape as
  *    [[ConnectedComponents]]'s rounds).
  *  - ties on pair count break lexicographically — the training is
  *    deterministic, partitioning-independent (counts are exact
  *    integers).
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
    */
  def trainMerges(
      df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String, Int)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    // corpus-scale pass: distinct words + frequencies
    val words = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
    // symbol sequences over the distinct-word frame
    var seqs = words.map { case (w, f) =>
      val chars = w.toCharArray.map(_.toString)
      chars(chars.length - 1) = chars(chars.length - 1) + Eow
      (chars, f)
    }.toDF("syms", "freq").localCheckpoint(true)
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
        val merged = l + r
        seqs = seqs.as[(Array[String], Long)]
          .map { case (syms, f) =>
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, f)
          }.toDF("syms", "freq").localCheckpoint(true)
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
  def encode(
      df: DataFrame, textCol: String,
      merges: Seq[(String, String, Int)]): DataFrame = {
    val spark = df.sparkSession
    val ranks: Map[(String, String), Int] =
      merges.map { case (l, r, k) => (l, r) -> k }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val tokenizeWord = (w: String) => {
      val rk = bc.value
      var syms = {
        val chars = w.toCharArray.map(_.toString)
        if (chars.nonEmpty)
          chars(chars.length - 1) = chars(chars.length - 1) + Eow
        chars.toVector
      }
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
}
