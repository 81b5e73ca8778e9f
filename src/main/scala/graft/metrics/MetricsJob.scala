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

  /** `approxPublishers = true` is the 100 TB path: ONE scan computing
    * the two record totals plus HyperLogLog publisher cardinality
    * (`approx_count_distinct`, 1% rsd), skipping the per-publisher
    * breakdown entirely — at a scale where #publishers explodes, the
    * per-publisher gauge series is the thing that must go (and an HLL
    * total shown next to an exact breakdown would contradict it).
    * Default (exact) keeps the reference's full per-publisher gauges.
    */
  def run(studies: DataFrame, approxPublishers: Boolean = false): AggMetrics = {
    if (approxPublishers) {
      val r = studies.agg(
        count(lit(1)).as("total"),
        count(when(col("_metadata.status") =!= RecordStatus.Deleted, 1))
          .as("live"),
        approx_count_distinct(col("_direct_base_url"), 0.01).as("pubs"))
        .collect().head
      return AggMetrics(r.getLong(0), r.getLong(1), r.getLong(2), Nil)
    }
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
    AggMetrics(total, totalLive, named.size.toLong,
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
