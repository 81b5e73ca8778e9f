package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence-level duplicate analysis — the C4/RefinedWeb curation
  * primitive: segment each document into sentences, key each sentence,
  * and measure how much of a document is made of sentences that also
  * appear in OTHER documents (navigation chrome, subscribe prompts,
  * legal footers — boilerplate that survives document-level dedup
  * because the surrounding text differs).
  *
  * Cross-engine sentence contract (proved by `text_sentence_dedup`):
  * sentences are the non-empty trimmed splits on `[.!?]+\s+|[.!?]+$` —
  * RE2-compatible (no lookbehind), terminator-consuming, so both
  * engines produce identical segment lists; the key is
  * `md5(lower(sentence))`.
  *
  * 100 TB plan: one narrow scan-local pass does segmentation + keying
  * (codegen'd split/transform), and the ONLY corpus-scale shuffle
  * carries (docId, 32-byte key) pairs — sentence TEXT never moves. The
  * frequency aggregate is map-side combined (boilerplate collapses
  * before the exchange, same argument as exact dedup), and the
  * join-back is a key-partitioned hash join that reuses the aggregate's
  * partitioning.
  */
object SentenceDedup {

  /** Sentence segmentation as a codegen'd column chain: split on
    * terminator runs, trim, drop empties. Returns array<string>.
    */
  def sentences(text: Column): Column =
    filter(
      transform(split(text, "[.!?]+\\s+|[.!?]+$"), s => trim(s)),
      s => s =!= "")

  /** Canonical sentence key: md5 of the lowercased sentence — fixed
    * 32-char width on the wire regardless of sentence length, and
    * replayable by any engine with md5 (the portable-sketch
    * discipline, unlike xxhash64).
    */
  def sentenceKey(sentence: Column): Column = md5(lower(sentence))

  /** Per-document cross-duplication stats: n_sent (sentence instances),
    * n_cross (instances whose key occurs in ≥2 distinct docs),
    * dup_ratio = n_cross / n_sent rounded to 6dp. Documents with zero
    * sentences drop out (no instances to aggregate).
    *
    * A curation pipeline filters on dup_ratio (e.g. drop > 0.5) or
    * joins the flagged keys back to excise the boilerplate sentences
    * themselves ([[Dedup.removeBoilerplateBlocks]] is the token-block
    * sibling).
    */
  def crossDocStats(
      docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // the (id, key) frame feeds BOTH the frequency aggregate and the
    // join-back — materialize it once (32-byte keys, no text) or the
    // whole segmentation pipeline runs twice (measured 1.67 s → 0.9 s
    // on the sf0.1 gate)
    val inst = docs
      .select(col(idCol), explode(sentences(col(textCol))).as("sent"))
      .select(col(idCol), sentenceKey(col("sent")).as("k"))
      .materialized
    val freq = inst.groupBy(col("k"))
      .agg(countDistinct(col(idCol)).as("nd"))
    inst.join(freq, "k")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_sent"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_cross"))
      .withColumn("dup_ratio",
        round(col("n_cross") * lit(1.0) / col("n_sent"), 6))
  }
}
