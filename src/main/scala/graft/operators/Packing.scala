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

  /** Best-fit-decreasing bin packing per shard — the PADDING-MINIMIZING
    * alternative to concat-and-chunk: documents never split across
    * sequences; instead each doc goes into the fullest bin it still
    * fits (docs longer than `seqLen` get a bin alone, flagged
    * oversize). The classic offline packing used when samples must stay
    * contiguous (instruction tuning, contrastive pairs).
    *
    * Distribution: one shuffle partitioning by shard, a per-shard sort
    * (n_tokens descending, id ascending — the "decreasing" in BFD and
    * the determinism tiebreak), then a single per-partition pass whose
    * state is a TreeMap of (remaining capacity, bin) — best fit is a
    * ceiling lookup, O(log bins) per doc. State is per-shard bins only
    * (≤ docs-in-shard), reset at every shard boundary inside the
    * partition, so executor memory is bounded by the largest shard's
    * BIN COUNT, not its token volume. Greedy-sequential is inherent to
    * BFD itself — parallelism comes from sharding, exactly like the
    * window in [[packAssignments]].
    *
    * Not SQL-expressible (iterative greedy state) → rows-only gate;
    * PackingSpec pins exact assignments on a known-optimal fixture and
    * the capacity/coverage invariants on real data.
    */
  def packBestFit(
      df: DataFrame, textCol: String, idCol: String,
      seqLen: Int, numShards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sized = df.select(
        shardOf(col(idCol), numShards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        col(idCol).cast("long").as("doc_id"))
      .repartition(col("shard"))
      .sortWithinPartitions(
        col("shard"), col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long, Long)]
    sized.mapPartitions { rows =>
      // (remaining, binIdx) -> binIdx; rangeFrom((n, -1)) head = the
      // FULLEST bin that still fits n, lowest bin id among equals
      var curShard = Long.MinValue
      var bins: scala.collection.mutable.TreeMap[(Long, Long), Long] = null
      var nextBin = 0L
      rows.map { case (shard, n, id) =>
        if (shard != curShard || bins == null) {
          curShard = shard
          bins = scala.collection.mutable.TreeMap.empty
          nextBin = 0L
        }
        val fit = bins.rangeFrom((n, -1L)).headOption
        val (bin, remaining) = fit match {
          case Some(((rem, _), b)) =>
            bins.remove((rem, b))
            (b, rem - n)
          case None =>
            val b = nextBin
            nextBin += 1
            (b, math.max(seqLen.toLong - n, 0L))
        }
        if (remaining > 0) bins.update((remaining, bin), bin)
        (id, shard, n, bin, n > seqLen)
      }
    }.toDF("doc_id", "shard", "n_tokens", "bin", "oversize")
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
