package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst handles predicate
  * pushdown / column pruning against the scan; nothing is cached here —
  * at 100 TB the tables won't fit memory and every query must be able to
  * stream from the columnar scan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
    * build's handling of nanos timestamps it arrives as one of three
    * types, all normalized here to session-TZ TimestampType (sessions
    * run UTC, and the data is UTC wall time):
    *  - long epoch-nanos (spark.sql.legacy.parquet.nanosAsLong honored):
    *    integer division to micros (`div`, not `/` — double division
    *    would lose precision past 2^53);
    *  - TIMESTAMP_NTZ (builds that read nanos natively, truncated to
    *    micros): cast reinterprets the UTC wall time as an instant;
    *  - TIMESTAMP: already what every consumer expects.
    */
  def events: DataFrame = {
    val base = t("events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    base.schema("ts").dataType match {
      case LongType =>
        base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        base.withColumn("ts", col("ts").cast(TimestampType))
      case _ => base
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
