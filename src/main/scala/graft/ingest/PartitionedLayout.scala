package graft.ingest

import graft.operators.LruCache
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned table layout — the other data-skipping axis
  * next to [[ZOrder]]'s intra-file clustering: coarse categorical keys
  * (language, source, date) become DIRECTORIES, and an equality/IN
  * predicate on them prunes whole subtrees at PLANNING time, before a
  * single file is opened. At 100 TB this is the difference between
  * "scan the English fifth of the corpus" and "list-and-skip a
  * million files": the [[AnnIndex]] cell layout is exactly this
  * pattern with a learned key.
  *
  * Use LOW-cardinality keys only (each value is a directory; a
  * high-cardinality partition key is the small-file explosion) and
  * keep high-cardinality pruning to Z-order + min/max skipping.
  */
object PartitionedLayout {

  /** Write `df` partitioned by `partitionCols` (values become
    * directory levels in column order).
    */
  def write(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read the layout back; partition columns are reconstructed from
    * directory names. Predicates on them in the caller's query prune
    * directories at planning time (spec-asserted via
    * `FileSourceScanExec.partitionFilters`).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private val written = new LruCache[String, String](64)

  /** Round-trip helper (the sources pattern): written once per tag
    * under the JVM temp dir, read back as the partitioned layout.
    */
  def roundTrip(df: DataFrame, tag: String, partitionCols: String*): DataFrame = {
    val path = written.getOrElseUpdate(tag + partitionCols.mkString(":")) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-hivepart/$tag"
      write(df, p, partitionCols: _*)
      p
    }
    read(df.sparkSession, path)
  }
}
