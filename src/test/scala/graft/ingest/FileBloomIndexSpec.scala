package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._

class FileBloomIndexSpec extends SparkSpec {

  import spark.implicits._

  // 8 files, ids hash-scattered so each file holds a distinct id set
  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-bloom-spec-").toString
    (1L to 4000L).map(i => (i, s"name$i", i % 7))
      .toDF("id", "name", "grp")
      .repartition(8, col("id"))
      .write.mode("overwrite").parquet(p)
    FileBloomIndex.write(spark, p, "id",
      expectedPerFile = 1000, fpp = 0.01)
    p
  }

  test("lookup ≡ full-scan filter, reading a fraction of the files") {
    val viaIndex = FileBloomIndex.lookup(spark, path, "id", 1234L)
      .select("id", "name", "grp").collect()
    assert(viaIndex.toSeq.map(_.getString(1)) === Seq("name1234"))
    val probed = FileBloomIndex.probeFiles(spark, path, "id", 1234L)
    val total = spark.read.parquet(path).inputFiles.length
    assert(total === 8)
    // hash-partitioned by id: exactly one file truly holds it; Bloom
    // fps at 1% may add a file or two but never approach the full set
    assert(probed.nonEmpty && probed.size <= 3,
      s"probed ${probed.size} of $total files")
  }

  test("missing key: few or no files probed, zero rows, schema kept") {
    val miss = FileBloomIndex.lookup(spark, path, "id", 999999L)
    assert(miss.count() === 0L)
    assert(miss.columns.toSeq === Seq("id", "name", "grp"))
    assert(FileBloomIndex.probeFiles(spark, path, "id", 999999L).size <= 2)
  }

  test("string keys index through the same canonical form") {
    val p = Files.createTempDirectory("graft-bloom-str-").toString
    (1L to 500L).map(i => (i, s"u$i@example.org"))
      .toDF("id", "email")
      .repartition(4, col("email"))
      .write.mode("overwrite").parquet(p)
    FileBloomIndex.write(spark, p, "email", expectedPerFile = 500)
    val hit = FileBloomIndex.lookup(spark, p, "email", "u77@example.org")
      .select("id").as[Long].collect()
    assert(hit.toSeq === Seq(77L))
    assert(FileBloomIndex.probeFiles(
      spark, p, "email", "u77@example.org").size <= 2)
  }

  test("null keys are not indexed and never match") {
    val p = Files.createTempDirectory("graft-bloom-null-").toString
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(1L, "a"), Row(2L, null)), 2),
        schema)
      .write.mode("overwrite").parquet(p)
    FileBloomIndex.write(spark, p, "s", expectedPerFile = 10)
    assert(FileBloomIndex.lookup(spark, p, "s", "a").count() === 1L)
    // the sidecar records 1 indexed key in the file holding "a", 0 in
    // the all-null file
    val nKeys = spark.read.parquet(s"$p/_bloom_s")
      .select("n_keys").as[Long].collect().sorted
    assert(nKeys.toSeq === Seq(0L, 1L))
  }

  test("sidecar is invisible to plain corpus readers") {
    assert(spark.read.parquet(path).columns.toSeq ===
      Seq("id", "name", "grp"))
    // and a rebuild does not index its own sidecar
    FileBloomIndex.write(spark, path, "id", expectedPerFile = 1000)
    assert(spark.read.parquet(s"${path}/_bloom_id")
      .count() === 8L)
  }
}
