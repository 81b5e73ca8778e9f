package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage layout for the studies corpus (SURVEY.md §4):
  *
  *  - `_direct_base_url` is MATERIALIZED at ingest as a generated column
  *    (first direct provenance hop), exactly the denormalization the
  *    reference's 0.7.0 schema evolution performed so /metrics never
  *    $elemMatch-es into `_provenance` (metrics.py:179-182,
  *    CHANGELOG.md:111-113).
  *  - files are hash-distributed on `_aggregator_identifier` (point
  *    lookups and keyset pages touch few files) and sorted within
  *    partitions by `_metadata.updated`, so parquet row-group min/max
  *    stats prune harvest-window scans — the Catalyst analogue of the
  *    reference's indexed datestamp filter.
  */
object StudyLayout {

  /** First direct provenance base_url, null when none. */
  def directBaseUrl: Column =
    get(filter(col("_provenance"), p => p.getField("direct")), lit(0))
      .getField("base_url")

  /** Apply ingest-time derivations. */
  def withDerived(studies: DataFrame): DataFrame =
    studies.withColumn("_direct_base_url", directBaseUrl)

  /** Write the corpus in query-optimal layout. */
  def write(studies: DataFrame, path: String, numFiles: Int = 32): Unit =
    withDerived(studies)
      .repartition(numFiles, col("_aggregator_identifier"))
      .sortWithinPartitions(col("_metadata.updated"))
      .write.mode("overwrite").parquet(path)
}
