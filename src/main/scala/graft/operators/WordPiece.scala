package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer — the third mainstream tokenizer family
  * beside [[Bpe]] and [[UnigramLm]]: greedy longest-match-first encoding
  * with `##` continuation markers (Wu et al., "Google's Neural Machine
  * Translation System", 2016; the BERT tokenizer, Devlin et al. 2019).
  *
  * Scale design (100 TB): identical to [[Bpe]] — the vocabulary is
  * learned from the SAME one-corpus-pass word-frequency machinery
  * ([[Bpe.trainMerges]]'s dict discipline); encoding broadcasts the
  * vocabulary (a Set, tens of thousands of entries) and re-tokenizes
  * each word independently — embarrassingly parallel, zero shuffles.
  *
  * Encoding contract (the published greedy WordPiece rules):
  *  - a word is matched left-to-right; at each position the LONGEST
  *    vocabulary piece wins (no tie is possible at equal length — a
  *    match is exact string equality);
  *  - pieces at position > 0 carry the `##` continuation prefix, so
  *    "unaffable" → `un ##aff ##able` given that vocab;
  *  - if NO piece matches at some position, the WHOLE word becomes one
  *    `[UNK]` token (BERT's whole-word-unk rule — not a partial emit);
  *  - words longer than `maxWordChars` code points become `[UNK]`
  *    without matching (BERT's max_input_chars_per_word guard: greedy
  *    matching is O(len²) per word, the cap bounds adversarial input).
  */
object WordPiece {

  val Unk = "[UNK]"
  val Cont = "##"

  /** Derive a WordPiece vocabulary from the BPE trainer's machinery
    * ([[Bpe.trainMerges]]): every merge-produced symbol becomes a piece
    * in BOTH positional forms (bare word-initial and `##`-continuation
    * — a BPE symbol is position-free, a WordPiece entry is not), with
    * [[Bpe.Eow]] markers stripped; every single code point of the
    * corpus dict is seeded likewise, so corpus words always encode
    * without `[UNK]` and the round trip is lossless on the training
    * corpus. Deterministic: merge order is [[Bpe.trainMerges]]'s
    * deterministic order and the seed pass is a set union.
    */
  def vocabFromCorpus(
      df: DataFrame, textCol: String, numMerges: Int): Set[String] = {
    val merges = Bpe.trainMerges(df, textCol, numMerges)
    val merged: Set[String] =
      merges.map { case (l, r, _) => (l + r).replace(Bpe.Eow, "") }.toSet
    val spark = df.sparkSession
    import spark.implicits._
    // corpus code-point seed: one distinct-char frame, vocabulary-bounded
    val chars = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(expr("regexp_extract_all(w, '.', 0)")).as("c"))
      .distinct()
      .as[String].collect().toSet
    val base = chars ++ merged.filter(_.nonEmpty)
    base ++ base.map(Cont + _) + Unk
  }

  /** Encode each document: lowercase-trim-whitespace normalization
    * (the [[Bpe.encode]] contract), then greedy longest-match-first
    * per word against the broadcast vocabulary. Adds `tokens`
    * (array&lt;string&gt;) and `n_tokens` columns.
    */
  def encode(
      df: DataFrame, textCol: String, vocab: Set[String],
      maxWordChars: Int = 200): DataFrame = {
    require(vocab.nonEmpty, "empty WordPiece vocabulary")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    // longest piece bounds the backward scan per position
    val maxLen = vocab.iterator.map { p =>
      (if (p.startsWith(Cont)) p.length - Cont.length else p.length)
    }.max
    val tokenizeWord = (w: String) => {
      val v = bc.value
      if (w.codePointCount(0, w.length) > maxWordChars) Vector(Unk)
      else {
        val out = Vector.newBuilder[String]
        var start = 0
        var bad = false
        while (start < w.length && !bad) {
          // longest-first: end scans down; never split a surrogate pair
          var end = math.min(w.length, w.offsetByCodePoints(start,
            math.min(maxLen, w.codePointCount(start, w.length))))
          var hit: String = null
          while (hit == null && end > start) {
            val sub = w.substring(start, end)
            val cand = if (start == 0) sub else Cont + sub
            if (v.contains(cand)) hit = cand
            else end = w.offsetByCodePoints(end, -1)
          }
          if (hit == null) bad = true
          else { out += hit; start = end }
        }
        if (bad) Vector(Unk) else out.result()
      }
    }
    val tokenize = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.toLowerCase.trim.split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(tokenizeWord)
    }
    df.withColumn("tokens", tokenize(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Detokenize an [[encode]]d frame: strip the `##` continuation
    * markers and concatenate — recovers the normalized text with
    * whitespace removed whenever no `[UNK]` was emitted (guaranteed on
    * the training corpus by [[vocabFromCorpus]]'s code-point seed).
    * The [[Bpe.detokenized]] lossless-round-trip contract.
    */
  def detokenized(
      encoded: DataFrame, tokensCol: String = "tokens"): DataFrame =
    encoded.withColumn("detok",
      expr(s"replace(concat_ws('', $tokensCol), '$Cont', '')"))
}
