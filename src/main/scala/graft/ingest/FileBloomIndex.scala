package graft.ingest

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter index — point-lookup file skipping for a
  * column the layout is NOT clustered by (the Delta "bloom filter
  * index" idea): range/z-order stats ([[graft.sources.TxTable]]
  * manifests, [[ZOrder]]) prune on the cluster columns only; any other
  * high-cardinality column forces a full scan for an equality lookup.
  * Here each data file gets a Bloom filter over the key column, stored
  * in an underscore sidecar dir (corpus readers ignore it); a probe
  * reads the KB-scale sidecar driver-side and opens ONLY the files
  * whose filter might contain the key — false positives cost extra
  * file reads, never wrong answers (the row filter still applies).
  *
  * Scale shape: the build is ONE corpus scan shuffled by FILE NAME
  * (`groupByKey(file).mapGroups` — each group streams its rows through
  * one filter in constant memory; group size = file row count, the
  * write layout's own bound). Sidecar size = numFiles ×
  * bloomBytes(expectedPerFile, fpp) — size `expectedPerFile` to the
  * layout's rows-per-file, NOT the corpus (1e5 @ 1% ≈ 120 KB/file).
  * Keys hash as their canonical string form on both build and probe,
  * so any atomic key type indexes uniformly.
  */
object FileBloomIndex {

  private def sidecar(path: String, keyCol: String) =
    s"$path/_bloom_$keyCol"

  /** Build the sidecar for `keyCol` over every parquet file under
    * `path`; returns the sidecar dir. Null keys are not indexed (SQL
    * equality can never select them).
    */
  def write(
      spark: SparkSession, path: String, keyCol: String,
      expectedPerFile: Long = 100000L, fpp: Double = 0.01): String = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(input_file_name().as("f"),
        col(keyCol).cast("string").as("k"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroups { (f, it) =>
        val bloom = BloomFilter.create(expectedPerFile, fpp)
        var n = 0L
        it.foreach { case (_, k) =>
          if (k != null) { bloom.putString(k); n += 1 }
        }
        val bos = new ByteArrayOutputStream()
        bloom.writeTo(bos)
        (f, n, bos.toByteArray)
      }
      .toDF("file", "n_keys", "bloom")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(sidecar(path, keyCol))
    sidecar(path, keyCol)
  }

  /** The files a lookup for `value` must open (sidecar probe,
    * driver-side — the sidecar is KB-scale per thousand files).
    */
  def probeFiles(
      spark: SparkSession, path: String, keyCol: String,
      value: Any): Seq[String] = {
    val key = String.valueOf(value)
    spark.read.parquet(sidecar(path, keyCol))
      .select("file", "bloom")
      .collect()
      .filter { r =>
        val bloom = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        bloom.mightContainString(key)
      }
      .map(_.getString(0)).toSeq.sorted
  }

  /** Equality lookup through the index: scan ONLY the files whose
    * Bloom filter might contain `value`, then apply the exact row
    * predicate — identical rows to the full scan, a fraction of the
    * bytes. `keyExpr` defaults to the indexed column itself; pass an
    * explicit column for casts.
    */
  def lookup(
      spark: SparkSession, path: String, keyCol: String,
      value: Any, keyExpr: Option[Column] = None): DataFrame = {
    val files = probeFiles(spark, path, keyCol, value)
    val pred = keyExpr.getOrElse(col(keyCol)) === lit(value)
    if (files.isEmpty)
      spark.read.parquet(path).filter(lit(false)) // schema, zero rows
    else
      spark.read.parquet(files: _*).filter(pred)
  }
}
