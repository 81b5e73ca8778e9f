package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — boundaries chosen by the CONTENT of
  * a sliding window, not by fixed offsets (Muthitacharoen 2001 LBFS /
  * rsync lineage): a chunk boundary falls after any position whose
  * trailing `Window`-char slice hashes to 0 mod `Divisor`. The property
  * fixed-size chunking lacks: inserting or deleting a prefix RESYNCS —
  * all chunks after the first shared boundary are byte-identical across
  * the two versions, so chunk-level dedup catches shared suffixes/
  * middles that document-level and block-level (fixed stride,
  * [[Dedup.dedupTokenBlocks]]) dedup both miss.
  *
  * Portable contract (the [[PortableSketches]] discipline): the window
  * hash is the first 7 hex nibbles of md5 read as an integer —
  * `('0x'||substr(md5(substr(t,i-7,8)),1,7))::BIGINT % 16 = 0` in
  * DuckDB — so the `pipeline_cdc_chunks` gate replays every boundary
  * decision, chunk extent, and cross-doc frequency under the hash. A
  * production deployment would swap in a gear/rolling hash (O(1) per
  * position instead of an md5 over the window); the chunking geometry
  * and every downstream plan shape are identical, which is what the
  * gate pins.
  *
  * 100 TB plan: chunking is scan-local (mapPartitions, one MessageDigest
  * per partition, no shuffle); the cross-doc frequency aggregate
  * shuffles (doc_id, md5-key) pairs only — chunk TEXT never moves, the
  * same argument as [[SentenceDedup]] / exact dedup.
  */
object CdcChunking {

  val Window = 8
  val Divisor = 16

  /** Chunk spans of one document: 1-based boundary positions are every
    * i in [Window, len-1] whose trailing Window-char slice hashes to
    * 0 mod Divisor; a boundary after i ends the current chunk at i.
    * The final chunk always runs to end-of-text (no boundary test at
    * the last position — it could not start a new chunk). Texts shorter
    * than Window are one chunk; empty text is zero chunks.
    */
  private[operators] def chunkSpans(
      md: java.security.MessageDigest, t: String): Vector[String] = {
    if (t.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var start = 0 // 0-based inclusive start of current chunk
    var i = Window // candidate 1-based boundary position
    while (i <= t.length - 1) {
      if (PortableSketches.hash28(md, t.substring(i - Window, i)) % Divisor == 0) {
        out += t.substring(start, i)
        start = i
      }
      i += 1
    }
    out += t.substring(start)
    out.result()
  }

  /** Explode a corpus into (idCol, chunk_idx, chunk) rows — scan-local,
    * partition-preserving, no shuffle.
    */
  def chunks(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, t) =>
          chunkSpans(md, Option(t).getOrElse("")).zipWithIndex.map {
            case (c, j) => (id, j.toLong, c)
          }
        }
      }
      .toDF(idCol, "chunk_idx", "chunk")
  }

  /** Per-document cross-duplication stats over content-defined chunks:
    * n_chunks, n_shared (chunks whose md5 occurs in ≥2 distinct docs),
    * shared_ratio — the dedup-potential profile a storage or curation
    * layer reads before deciding chunk-level vs doc-level dedup.
    */
  def crossDocStats(
      docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // same double-consumer shape as SentenceDedup.crossDocStats: the
    // (id, key) frame is materialized once so the chunking kernel does
    // not run twice
    val inst = chunks(docs, textCol, idCol)
      .select(col(idCol), md5(col("chunk")).as("k"))
      .materialized
    val freq = inst.groupBy(col("k"))
      .agg(countDistinct(col(idCol)).as("nd"))
    inst.join(freq, "k")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_ratio",
        round(col("n_shared") * lit(1.0) / col("n_chunks"), 6))
  }
}
