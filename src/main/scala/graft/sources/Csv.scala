package graft.sources

import graft.operators.LruCache
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink — the tabular-sidecar interchange (metadata tables,
  * label files, per-document score exports that spreadsheet/BI tooling
  * must open). Same scale rules as [[Jsonl]], enforced not documented:
  *
  *  - READS TAKE AN EXPLICIT SCHEMA: `inferSchema` is a full extra scan
  *    of the data before the query starts, and per-shard inference
  *    drifts. No schema-less overload exists here.
  *  - Malformed lines are never silently dropped — [[read]] is
  *    FAILFAST, [[readAudited]] quarantines the raw line in `_corrupt`.
  *  - `multiLine` stays FALSE: a quoted field containing a newline
  *    makes records span lines, which forces whole-file parsing and
  *    kills split parallelism — the property that makes CSV usable at
  *    scale at all. Fields with embedded newlines belong in JSONL
  *    ([[Jsonl]] escapes them); this API rejects that data loudly at
  *    read time rather than serializing an unsplittable file.
  *  - Headers are written (the sidecar consumer is often a human) and
  *    skipped per file on read — header handling is per-file, so splits
  *    stay intact.
  */
object Csv {

  /** Write `df` as headered CSV under `path`, one part file per
    * partition; `numPartitions` > 0 repartitions round-robin first.
    */
  def write(
      df: DataFrame, path: String,
      numPartitions: Int = 0, gzip: Boolean = false): Unit = {
    val part = if (numPartitions > 0) df.repartition(numPartitions) else df
    val w = part.write.mode("overwrite").option("header", "true")
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  /** Strict read: explicit schema, malformed line = job failure. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Auditing read: malformed lines land whole in `_corrupt` (data
    * columns null) instead of failing or vanishing.
    */
  def readAudited(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  private val written = new LruCache[String, String](64)

  /** Round-trip helper (the [[Jsonl.roundTrip]] pattern): written once
    * per tag under the JVM temp dir, read back with `df`'s own schema —
    * proves sink and source agree on real data.
    */
  def roundTrip(df: DataFrame, tag: String): DataFrame = {
    val schema = df.schema
    val path = written.getOrElseUpdate(tag) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-csv/$tag"
      write(df, p)
      p
    }
    read(df.sparkSession, path, schema)
  }
}
