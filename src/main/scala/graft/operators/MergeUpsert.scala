package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse MERGE semantics as one declarative plan: apply a changeset
  * (upserts + tombstones) to a target table and classify every output
  * row — the batch-ingest primitive behind every "apply CDC feed to
  * the corpus" step (Delta/Iceberg MERGE INTO, SQL:2003 MERGE), here
  * engine-agnostic so the result is oracle-checkable.
  *
  * Semantics (per key):
  *   - source tombstone                → row dropped, action `delete`
  *   - source match, not tombstone     → source row wins, `update`
  *   - source only, not tombstone      → row added, `insert`
  *   - target only                     → row kept, `keep`
  * A tombstone for an absent key is a no-op (dropped silently), per
  * MERGE's WHEN MATCHED THEN DELETE.
  *
  * Scale shape: ONE full-outer hash join on the key — the minimum
  * possible data movement for merge (both sides must meet); no window,
  * no second pass, action classification is a scan-local CASE over
  * the join's null pattern. CDC feeds are typically ≪ target, so at
  * scale the join broadcasts the changeset; the plan degrades
  * gracefully to a shuffle join when the feed is corpus-sized.
  */
object MergeUpsert {

  /** `target` and `source` must share `keyCol` and `valueCols`;
    * `source` additionally carries boolean `tombstoneCol`. Returns the
    * merged table (key, valueCols, action) with `delete` rows absent
    * and actions in {insert, update, keep}.
    */
  def merge(
      target: DataFrame, source: DataFrame, keyCol: String,
      valueCols: Seq[String], tombstoneCol: String): DataFrame = {
    val t = target.select(col(keyCol),
      struct(valueCols.map(col): _*).as("_tv"))
    val s = source.select(col(keyCol),
      struct(valueCols.map(col): _*).as("_sv"),
      col(tombstoneCol).as("_del"))
    val joined = t.join(s, Seq(keyCol), "full_outer")
    val action = when(col("_del") === true, lit("delete"))
      .when(col("_sv").isNotNull && col("_tv").isNotNull, lit("update"))
      .when(col("_sv").isNotNull, lit("insert"))
      .otherwise(lit("keep"))
    val winner = when(col("_sv").isNotNull, col("_sv")).otherwise(col("_tv"))
    joined
      .withColumn("action", action)
      .filter(col("action") =!= "delete")
      .select(col(keyCol) +: valueCols.zipWithIndex.map { case (c, _) =>
        winner.getField(c).as(c)
      } :+ col("action"): _*)
  }
}
