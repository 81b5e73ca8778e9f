package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training (extension surface): documents
  * concatenate into a token stream and training sequences are
  * consecutive `seqLen`-token chunks — the concat-and-chunk dataloader
  * shape. Packing runs PER SHARD (each shard packs its own stream
  * independently), which is both how real dataloaders shard their
  * output files and what makes the plan scale: the cumulative sum is a
  * window partitioned by shard — one shuffle, every shard packs in
  * parallel. A single global stream would force a 1-partition window;
  * per-shard streams are embarrassingly parallel and deterministic.
  */
object Packing {

  /** Deterministic shard assignment, oracle-expressible (modulo, not a
    * hash, so any engine reproduces it; swap for `pmod(xxhash64(id))`
    * when id distribution is skewed).
    */
  def shardOf(idCol: Column, numShards: Int): Column =
    pmod(idCol, lit(numShards.toLong))

  /** Per-document pack placement: within its shard's id-ordered token
    * stream, each doc occupies offsets [start_offset, start_offset +
    * n_tokens); `pack_first`/`pack_last` are the seqLen-chunks it
    * lands in (a doc spans packs when the chunk boundary cuts it —
    * concat-and-chunk splits documents, it never pads).
    *
    * One shuffle (the per-shard window sort). Pure integer arithmetic —
    * bit-stable across engines, so the DuckDB oracle hash-matches.
    */
  def packAssignments(
      df: DataFrame, textCol: String, idCol: String,
      seqLen: Int, numShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(
        col(idCol),
        shardOf(col(idCol), numShards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_first", floor(col("start_offset") / seqLen))
      .withColumn("pack_last",
        floor((col("start_offset") + col("n_tokens") - 1) / seqLen))
  }

  /** Overlapping fixed-size chunk boundaries per document — the
    * splitter shape (RAG windows, long-doc training chunks): chunks of
    * `chunkTokens` tokens advancing by `chunkTokens − overlap`, last
    * chunk clipped to the document end. Boundaries only (token indexes),
    * so the scan never rewrites text; a consumer slices lazily. Pure
    * per-row arithmetic + explode — no shuffle at all.
    */
  def chunkBoundaries(
      df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("n_chunks",
        when(col("n_tokens") <= chunkTokens, lit(1L))
          .otherwise(lit(1L) +
            ceil((col("n_tokens") - chunkTokens).cast("double") / stride)
              .cast("long")))
      .select(col(idCol), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("token_start"),
        least(col("chunk_idx") * stride + chunkTokens, col("n_tokens"))
          .as("token_end"))
  }

  /** Shard-level packing summary: total tokens, number of full packs,
    * and the tail remainder a dataloader would drop or pad.
    */
  def shardPackStats(
      df: DataFrame, textCol: String, idCol: String,
      seqLen: Int, numShards: Int): DataFrame =
    packAssignments(df, textCol, idCol, seqLen, numShards)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        floor(sum(col("n_tokens")) / seqLen).as("full_packs"),
        (sum(col("n_tokens")) % seqLen).as("tail_tokens"))
}
