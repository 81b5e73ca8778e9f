package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in graft.queries.* as QueryDef groups (one def per
  * SURVEY.md §2 operator); this object only aggregates them into the
  * driver's `queries` / `oracleSql` maps.
  */
object SparkEntry {

  private def groups: Seq[QueryGroup] =
    Seq(CoreQueries, MetricsQueries, JoinQueries, ParityQueries,
      AnalyticsQueries, SqlSurfaceQueries, DedupQueries, SimilarityQueries,
      TextQueries, SamplingQueries, EventQueries, MultimodalQueries,
      PipelineQueries, IoQueries, EvalQueries, ProfilingQueries,
      SeriesQueries, MiningQueries)

  private lazy val all: Seq[QueryDef] = {
    val defs = groups.flatMap(_.defs)
    // duplicate names silently shadow each other in the toMap below —
    // fail fast instead (it has happened across parallel work streams)
    val dup = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate gate names: ${dup.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.aggPricingSummary.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
