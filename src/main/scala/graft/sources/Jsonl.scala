package graft.sources

import graft.operators.LruCache
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * training-data pipelines exchange corpora in (one document object per
  * line; text fields carry their newlines JSON-escaped, so a record
  * never spans lines and the file splits cleanly at any byte offset —
  * which is exactly why JSONL scales: Spark assigns file SPLITS to
  * tasks, not whole files).
  *
  * Scale rules this wrapper enforces rather than documents:
  *
  *  - READS TAKE AN EXPLICIT SCHEMA. `spark.read.json` without one runs
  *    a full inference pass over the data — at 100 TB that is a second
  *    100 TB scan before the query starts, and inferred types drift
  *    with content (an all-digit id column infers LONG in one shard,
  *    STRING in another). There is no schema-less overload here.
  *  - Malformed lines are never silently dropped: [[read]] is
  *    FAILFAST (corrupt input stops the job), [[readAudited]] is
  *    PERMISSIVE with the broken line captured in `_corrupt` so a
  *    cleanup pipeline can quarantine instead of crash.
  *  - Writes go through the columnar text writer (whole-stage codegen
  *    `to_json`), optionally gzip per part file; partition count is the
  *    caller's explicit choice — repartitioning 100 TB to "one file"
  *    is a driver-side mistake this API refuses to make implicitly.
  */
object Jsonl {

  /** Write `df` as JSONL under `path`, one part file per partition.
    * `numPartitions` > 0 repartitions first (round-robin — even part
    * sizes for downstream split planning); 0 keeps the input layout.
    */
  def write(
      df: DataFrame, path: String,
      numPartitions: Int = 0, gzip: Boolean = false): Unit = {
    val part = if (numPartitions > 0) df.repartition(numPartitions) else df
    val w = part.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** Strict read: explicit schema, malformed line = job failure. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Auditing read: well-formed rows parse as usual; a malformed line
    * lands whole in `_corrupt` (its data columns null) so the pipeline
    * can count / quarantine bad input without losing the good 99.99%.
    */
  def readAudited(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Streaming read of a JSONL drop directory — the continuous-ingest
    * shape: new files land, Structured Streaming picks them up
    * incrementally (`maxFilesPerTrigger` bounds per-batch admission so
    * a backlog of 10⁶ files can't produce one giant batch). Explicit
    * schema for the same reason as [[read]] — streaming inference is
    * not even possible.
    */
  def readStream(
      spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Session-lifetime registry of written JSONL copies so gate queries
    * write once per (source, tag) and re-read thereafter — the same
    * build-once pattern as [[graft.ingest.AnnIndex.ivfIndexFor]].
    */
  private val written = new LruCache[String, String](64)

  /** Round-trip helper: `df` written as JSONL under the JVM temp dir
    * (once per tag), read back with `df`'s own schema. Proves the sink
    * and source agree byte-for-byte on real data — newlines, quotes,
    * and non-ASCII in text columns survive the JSON escaping.
    */
  def roundTrip(df: DataFrame, tag: String, gzip: Boolean = false): DataFrame = {
    val schema = df.schema
    val path = written.getOrElseUpdate(s"$tag/$gzip") {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-jsonl/$tag"
      write(df, p, gzip = gzip)
      p
    }
    read(df.sparkSession, path, schema)
  }
}
