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

  /** events.ts is parquet TIMESTAMP(NANOS), unreadable by Spark's vectorized
    * reader; with spark.sql.legacy.parquet.nanosAsLong it arrives as a long
    * of epoch-nanos, converted here to TimestampType via integer division
    * (`div`, not `/` — double division would lose precision past 2^53).
    */
  def events: DataFrame = {
    val base = t("events")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    if (base.schema("ts").dataType == LongType)
      base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else base
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
