package graft.sources

import graft.operators.LruCache
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet schema evolution — the 100 TB reality that a long-lived
  * dataset is written by MANY producer versions: early batches carry a
  * subset of today's columns, and a reader must union the schemas
  * (absent columns surfacing as nulls) instead of failing or silently
  * dropping the old files.
  *
  * Spark's `mergeSchema` does exactly that at the footer level; this
  * helper pins the CONTRACT under a gate: a directory holding a
  * two-column v1 batch and a four-column v2 batch reads back as the
  * union schema with v1's missing columns null — bit-for-bit
  * restatable by any engine that can union the two file sets by name.
  *
  * Operationally (stated limits): mergeSchema reads every file footer
  * at planning time — at very large file counts pin the merged schema
  * explicitly (`spark.read.schema(union)`) and keep this read for the
  * discovery step that derives it.
  */
object ParquetEvolution {

  private val written = new LruCache[String, String](64)

  /** Build (once per tag) a dataset dir with two producer generations:
    * even-id rows as v1 (doc_id, text), odd-id rows as v2
    * (doc_id, text, lang, n_chars).
    */
  def evolvedDir(docs: DataFrame, tag: String): String =
    written.getOrElseUpdate(tag) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-evo/$tag"
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$p/batch=v1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$p/batch=v2")
      p
    }

  /** Union-schema read: every file participates; columns absent from a
    * file's footer are null for its rows.
    */
  def readMerged(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .option("basePath", path)
      .parquet(s"$path/batch=v1", s"$path/batch=v2")
      .drop("batch")
}
