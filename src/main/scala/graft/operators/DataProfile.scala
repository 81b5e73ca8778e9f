package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level data profiling and snapshot drift — the data-quality
  * monitor a production pipeline runs on every ingest batch (the
  * Great-Expectations/Deequ shape, engine-agnostic): per-column row
  * counts, null counts, exact distinct cardinalities, and lexical
  * min/max, plus the before/after drift join.
  *
  * Contract notes:
  *  - min/max are computed over the STRING cast (stated contract —
  *    profiles compare across type changes and engines; numeric
  *    columns wanting numeric bounds profile a cast column).
  *  - distinct counts are EXACT (one expand per column, cost bounded
  *    by the profiled column list — the caller picks columns, not the
  *    schema width). At 100 TB swap `countDistinct` for the gated HLL
  *    summary ([[HyperLogLog]]) per column; the drift join is
  *    unchanged.
  *
  * Scale shape: ONE aggregate over the corpus per profile (multi-
  * distinct expands the scan |cols| ways — linear, map-side combined),
  * then a |cols|-row unpivot; drift joins two |cols|-row frames.
  */
object DataProfile {

  /** One row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_s, max_s).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackExpr) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_s, max_s)"))
  }

  /** Drift between two snapshots of the same table: per column, both
    * profiles side by side plus the deltas and bound-change flags.
    */
  def drift(
      before: DataFrame, after: DataFrame,
      cols: Seq[String]): DataFrame = {
    val p0 = profile(before, cols)
      .select(col("column"), col("n_rows").as("rows_before"),
        col("n_nulls").as("nulls_before"),
        col("n_distinct").as("distinct_before"),
        col("min_s").as("_min0"), col("max_s").as("_max0"))
    val p1 = profile(after, cols)
      .select(col("column"), col("n_rows").as("rows_after"),
        col("n_nulls").as("nulls_after"),
        col("n_distinct").as("distinct_after"),
        col("min_s").as("_min1"), col("max_s").as("_max1"))
    p0.join(p1, "column")
      .select(col("column"),
        col("rows_before"), col("rows_after"),
        (col("rows_after") - col("rows_before")).as("rows_delta"),
        col("nulls_before"), col("nulls_after"),
        col("distinct_before"), col("distinct_after"),
        (col("distinct_after") - col("distinct_before"))
          .as("distinct_delta"),
        (!(col("_min0") <=> col("_min1"))).as("min_changed"),
        (!(col("_max0") <=> col("_max1"))).as("max_changed"))
  }

  /** Per-bucket Merkle-style dataset digest — the cheap "did anything
    * in this partition change" primitive for 100 TB snapshot
    * comparison: instead of a row-level full-outer join
    * ([[IncrementalDedup.snapshotDiff]] — fact-scale exchange), two
    * digest frames of `nBuckets` rows are compared, and only buckets
    * whose digests differ need the row-level pass.
    *
    * The digest is ORDER-INDEPENDENT and O(1)-state per bucket: each
    * row hashes to md5(id ":" content); the bucket accumulates the
    * row count and the exact DECIMAL(38,0) sums of two 60-bit slices
    * of that hash (commutative, so no per-bucket sort or hash-list
    * state — an aggregate, not a collect_list). All three accumulators
    * are md5-contract portable: DuckDB replays them bit-for-bit, which
    * is what puts a *digest* under a cross-engine oracle.
    *
    * One shuffle keyed by bucket; map-side combine does almost all the
    * work (32 partial rows per task regardless of input size).
    */
  /** The md5-contract digest primitives, shared with the streaming
    * face ([[graft.streaming.CorpusMonitor.digestByWindow]]) so batch
    * and stream accumulate the identical arithmetic.
    */
  private[graft] def digestBucket(idCol: String, nBuckets: Int): Column =
    pmod(conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("long"), lit(nBuckets))

  private[graft] def digestSlice(
      idCol: String, contentCol: String, from: Int): Column =
    conv(substring(md5(concat_ws(":", col(idCol).cast("string"),
      col(contentCol))), from, 15), 16, 10).cast(DecimalType(38, 0))

  private[graft] def digestHex: Column =
    md5(concat_ws(":", col("n_rows").cast("string"),
      col("_s1").cast("string"), col("_s2").cast("string")))

  def merkleDigest(
      df: DataFrame, idCol: String, contentCol: String,
      nBuckets: Int): DataFrame = {
    df.select(digestBucket(idCol, nBuckets).as("bucket"),
        digestSlice(idCol, contentCol, 1).as("_h1"),
        digestSlice(idCol, contentCol, 16).as("_h2"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_h1")).as("_s1"), sum(col("_h2")).as("_s2"))
      .select(col("bucket"), col("n_rows"), digestHex.as("digest"))
  }

  /** Bucket-level diff of two [[merkleDigest]] frames: each bucket
    * labelled added / removed / changed / unchanged. The join is
    * nBuckets-scale — the whole point: at 100 TB this compares two
    * snapshots by moving a few thousand digest rows, and the row-level
    * diff then runs only over `changed` buckets.
    */
  def changedBuckets(
      old: DataFrame, current: DataFrame,
      idCol: String, contentCol: String, nBuckets: Int): DataFrame = {
    val a = merkleDigest(old, idCol, contentCol, nBuckets)
      .select(col("bucket"), col("n_rows").as("n_old"),
        col("digest").as("_d_old"))
    val b = merkleDigest(current, idCol, contentCol, nBuckets)
      .select(col("bucket"), col("n_rows").as("n_new"),
        col("digest").as("_d_new"))
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        when(col("_d_old").isNull, lit("added"))
          .when(col("_d_new").isNull, lit("removed"))
          .when(col("_d_old") =!= col("_d_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Key-skew profile — the pre-join / pre-groupBy diagnostic that
    * decides whether a key needs salting ([[SkewJoin]]) before a
    * shuffle at scale: the top-k hottest keys with their exact counts,
    * basis-point share of all rows (integer division — exact on both
    * engines), and the cumulative share down the ranking.
    *
    * One count aggregate keyed by the profiled key (map-side
    * combined), a TakeOrdered top-k, and ≤k-row windows — nothing
    * downstream of the aggregate scales with the corpus.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("cnt").desc, col("key"))
    counts.orderBy(col("cnt").desc, col("key")).limit(k)
      .crossJoin(broadcast(tot))
      .withColumn("rk", row_number().over(w))
      .select(col("rk"), col("key"), col("cnt"),
        expr("cnt * 10000 div total").as("share_bp"),
        sum(expr("cnt * 10000 div total"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_share_bp"),
        col("n_keys"))
  }
}
