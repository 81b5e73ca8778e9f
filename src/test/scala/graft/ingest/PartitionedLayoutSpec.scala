package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Hive-style layout: values round-trip through the directory
  * encoding, and an equality predicate on the partition key must reach
  * the scan as a PARTITION filter that lists fewer directories than
  * exist — planning-time skip, not post-scan filtering.
  */
class PartitionedLayoutSpec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-hivepart-spec/$name"

  private def sample = {
    val s = spark
    import s.implicits._
    Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L),
      (4L, "fr", 40L), (5L, "de", 50L)).toDF("id", "lang", "v")
  }

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1)
    scans.head
  }

  test("values round-trip through the directory encoding") {
    val path = tmp("rt")
    PartitionedLayout.write(sample, path, "lang")
    val back = PartitionedLayout.read(spark, path)
      .select("id", "lang", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(back.toSeq ==
      Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L),
        (4L, "fr", 40L), (5L, "de", 50L)))
  }

  test("equality predicate prunes partitions at planning time") {
    val path = tmp("prune")
    PartitionedLayout.write(sample, path, "lang")
    val q = PartitionedLayout.read(spark, path)
      .filter(col("lang") === "en").select("id", "v")
    val scan = scanOf(q)
    assert(scan.partitionFilters.nonEmpty,
      s"predicate must be a partition filter:\n${scan.metadata.mkString("\n")}")
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values).size
    val total = scan.relation.location.listFiles(Nil, Nil).map(_.values).size
    assert(selected < total, s"selected $selected of $total partitions")
    assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }
}
