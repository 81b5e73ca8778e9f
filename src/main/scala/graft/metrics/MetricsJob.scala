package graft.metrics

import graft.schema.RecordStatus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

final case class PublisherCounts(
    baseUrl: String,
    records: Long,
    recordsWithoutDeleted: Long)

final case class AggMetrics(
    recordsTotal: Long,
    recordsTotalWithoutDeleted: Long,
    publishersTotal: Long,
    perPublisher: Seq[PublisherCounts])

/** The /metrics aggregation workload (SURVEY.md §2.4; metrics.py:148-201).
  *
  * The reference issues 2 + 2·N DocStore count queries — one pair per
  * publisher (tests/test_metrics.py:28-74). Here the entire endpoint is
  * ONE Spark job: a hash aggregate on the denormalized `_direct_base_url`
  * with a conditional count, plus a driver-side fold for the globals.
  * Map-side partial aggregation means the shuffle carries at most
  * (#publishers × #partitions) rows regardless of corpus size — the
  * design that survives 100 TB and thousands of publishers.
  */
object MetricsJob {

  /** `approxPublishers = true` replaces the exact publisher cardinality
    * with one-pass HyperLogLog (`approx_count_distinct`, 1% rsd) — the
    * 100 TB path when the exact per-publisher breakdown is not needed
    * (the breakdown stays exact here because /metrics exposes per-
    * publisher gauges; at a scale where even #publishers explodes, serve
    * the HLL total alone).
    */
  def run(studies: DataFrame, approxPublishers: Boolean = false): AggMetrics = {
    val approxTotal =
      if (approxPublishers)
        Some(studies
          .filter(col("_direct_base_url").isNotNull)
          .agg(approx_count_distinct(col("_direct_base_url"), 0.01))
          .collect().head.getLong(0))
      else None
    val perPublisher = studies
      .groupBy(col("_direct_base_url"))
      .agg(
        count(lit(1)).as("records"),
        count(when(col("_metadata.status") =!= RecordStatus.Deleted, 1))
          .as("records_without_deleted"))
      .collect()
      .map(r => PublisherCounts(
        r.getAs[String]("_direct_base_url"),
        r.getAs[Long]("records"),
        r.getAs[Long]("records_without_deleted")))
      .toSeq

    val total = perPublisher.map(_.records).sum
    val totalLive = perPublisher.map(_.recordsWithoutDeleted).sum
    val named = perPublisher.filter(p => p.baseUrl != null && p.records > 0)
    AggMetrics(total, totalLive,
      approxTotal.getOrElse(named.size.toLong),
      named.sortBy(_.baseUrl))
  }

  /** Prometheus exposition text (metrics.py:103-145,199-201; IO4). */
  def prometheus(m: AggMetrics): String = {
    val sb = new StringBuilder
    def gauge(name: String, help: String, value: Long,
        labels: Map[String, String] = Map.empty): Unit = {
      if (!sb.toString.contains(s"# HELP $name")) {
        sb ++= s"# HELP $name $help\n# TYPE $name gauge\n"
      }
      val l =
        if (labels.isEmpty) ""
        else labels.map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")
      sb ++= s"$name$l $value\n"
    }
    gauge("records_total", "Total number of records", m.recordsTotal)
    gauge("records_total_without_deleted",
      "Total number of records without logically deleted",
      m.recordsTotalWithoutDeleted)
    gauge("publishers_total", "Total number of publishers", m.publishersTotal)
    m.perPublisher.foreach { p =>
      gauge("publisher_records", "Records per publisher", p.records,
        Map("publisher" -> p.baseUrl))
    }
    m.perPublisher.foreach { p =>
      gauge("publisher_records_without_deleted",
        "Live records per publisher", p.recordsWithoutDeleted,
        Map("publisher" -> p.baseUrl))
    }
    sb.toString
  }

  /** Full /metrics page: corpus gauges + OAI request counters/summaries
    * (the reference exposes both through one registry, metrics.py:52-70).
    */
  def prometheus(m: AggMetrics, requests: RequestMetrics): String =
    prometheus(m) + requests.prometheus
}
