package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Metrics workload — SURVEY.md §2.4 (A1..A5), from
  * cdcagg_oai/metrics.py:148-201. The reference issues 2 + 2·N count
  * queries (one pair per publisher, tests/test_metrics.py:28-74); the
  * Spark design collapses all of it into single-pass hash aggregates with
  * map-side partial aggregation — one shuffle regardless of N, which is
  * what survives 100 TB / thousands of publishers.
  *
  * Testdata mapping: documents.source ~ `_direct_base_url` (publisher),
  * documents.lang='zh' ~ the soft-deleted status (metrics.py:42).
  */
object MetricsQueries extends QueryGroup {

  /** A1 total count incl. deleted (metrics.py:170). */
  val a1Total: QueryDef = QueryDef(
    "a1_total_count",
    (s, dir) => Tables(s, dir).documents.agg(count(lit(1)).as("records_total")),
    Some("SELECT count(*) AS records_total FROM documents"))

  /** A2 filtered count — `$ne deleted` (metrics.py:171-176). */
  val a2WithoutDeleted: QueryDef = QueryDef(
    "a2_count_without_deleted",
    (s, dir) =>
      Tables(s, dir).documents
        .filter(col("lang") =!= "zh")
        .agg(count(lit(1)).as("records_total_without_deleted")),
    Some(
      "SELECT count(*) AS records_total_without_deleted FROM documents " +
        "WHERE lang <> 'zh'"))

  /** A3 distinct publisher cardinality (metrics.py:179). countDistinct is
    * exact (two-phase aggregate); at 100 TB prefer approx_count_distinct —
    * see ext_approx_distinct below for the HLL path.
    */
  val a3DistinctPublishers: QueryDef = QueryDef(
    "a3_distinct_publishers",
    (s, dir) =>
      Tables(s, dir).documents
        .agg(countDistinct(col("source")).as("publishers_total")),
    Some("SELECT count(DISTINCT source) AS publishers_total FROM documents"))

  /** A4 per-publisher counts — the N+1 loop (metrics.py:180-198) as ONE
    * hash aggregate: count(*) and a conditional count in the same pass.
    */
  val a4PerPublisher: QueryDef = QueryDef(
    "a4_per_publisher_counts",
    (s, dir) =>
      Tables(s, dir).documents
        .groupBy("source")
        .agg(
          count(lit(1)).as("cnt"),
          count(when(col("lang") =!= "zh", 1)).as("cnt_without_deleted"))
        .orderBy("source"),
    Some(
      "SELECT source, count(*) AS cnt, " +
        "count(CASE WHEN lang <> 'zh' THEN 1 END) AS cnt_without_deleted " +
        "FROM documents GROUP BY source ORDER BY source"))

  /** A5 request metrics — per-label counters (metrics.py:52-70) as a
    * group-by over an event log.
    */
  val a5RequestMetrics: QueryDef = QueryDef(
    "a5_request_metrics",
    (s, dir) =>
      Tables(s, dir).events
        .groupBy("event_type")
        .agg(count(lit(1)).as("requests_total"))
        .orderBy("event_type"),
    Some(
      "SELECT event_type, count(*) AS requests_total FROM events " +
        "GROUP BY event_type ORDER BY event_type"))

  override def defs: Seq[QueryDef] =
    Seq(a1Total, a2WithoutDeleted, a3DistinctPublishers, a4PerPublisher,
      a5RequestMetrics)
}
