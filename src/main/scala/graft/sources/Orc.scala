package graft.sources

import graft.operators.LruCache
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the OTHER columnar interchange format (Hive/Trino
  * warehouses hand off ORC exactly where Spark shops hand off parquet).
  * ORC is self-describing and splittable with predicate-pushdown
  * indexes, so unlike [[Csv]]/[[Jsonl]] there is no corrupt-line
  * quarantine surface — the contract here is schema discipline:
  *
  *  - READS TAKE AN EXPLICIT SCHEMA, same as every source in this
  *    package: the passed schema prunes columns at the stripe reader
  *    (a scan that deserializes all columns for a 2-column projection
  *    is wrong at 100 TB) and turns producer drift into a loud read
  *    error instead of silent nulls.
  *  - Writes are one stripe-set per partition — split parallelism on
  *    re-read matches write parallelism, no small-file explosion
  *    beyond the caller's own partitioning.
  */
object Orc {

  /** Write `df` as ORC under `path`, one file per partition;
    * `numPartitions` > 0 repartitions round-robin first.
    */
  def write(df: DataFrame, path: String, numPartitions: Int = 0): Unit = {
    val part = if (numPartitions > 0) df.repartition(numPartitions) else df
    part.write.mode("overwrite").orc(path)
  }

  /** Schema-checked read: the explicit schema projects (column-prunes)
    * and type-checks against the file footer.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  private val written = new LruCache[String, String](64)

  /** Round-trip helper (the [[Jsonl.roundTrip]] pattern): written once
    * per tag under the JVM temp dir, read back with `df`'s own schema —
    * proves sink and source agree on real data.
    */
  def roundTrip(df: DataFrame, tag: String): DataFrame = {
    val schema = df.schema
    val path = written.getOrElseUpdate(tag) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-orc/$tag"
      write(df, p)
      p
    }
    read(df.sparkSession, path, schema)
  }
}
