package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** CHECK-constraint enforcement: header `check=<expr>`, validated on
  * every writer batch BEFORE any file lands; SQL semantics (NULL
  * passes); set-time validation of the existing table.
  */
class TxCheckConstraintSpec extends SparkSpec {

  import spark.implicits._

  test("create with check; violating append aborts whole, valid lands") {
    val root = Files.createTempDirectory("graft-check-").toString
    TxTable.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), root,
      check = Some("v >= 0"))
    val e = intercept[IllegalArgumentException] {
      TxTable.append(Seq((3L, 30L), (4L, -1L)).toDF("id", "v"), root)
    }
    assert(e.getMessage.contains("violate CHECK"))
    assert(e.getMessage.contains("1 row(s)"))
    // all-or-nothing: the valid row of the bad batch did NOT land
    assert(TxTable.read(spark, root).count() === 2L)
    assert(TxTable.versions(spark, root) === Seq(0L))
    TxTable.append(Seq((3L, 30L)).toDF("id", "v"), root)
    assert(TxTable.read(spark, root).count() === 3L)
  }

  test("NULL passes (SQL CHECK semantics); create itself is checked") {
    val root = Files.createTempDirectory("graft-check-null-").toString
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null), Row(2L, 5L)), 1),
      schema)
    TxTable.create(withNull, root, check = Some("v >= 0"))
    assert(TxTable.read(spark, root).count() === 2L)
    intercept[IllegalArgumentException] {
      TxTable.create(Seq((1L, -5L)).toDF("id", "v"),
        Files.createTempDirectory("graft-check-bad-").toString,
        check = Some("v >= 0"))
    }
  }

  test("setCheckConstraint validates the EXISTING table; merge upserts " +
    "are checked, tombstones pass; drop lifts the gate") {
    val root = Files.createTempDirectory("graft-check-set-").toString
    TxTable.create(Seq((1L, 10L), (2L, -7L)).toDF("id", "v"), root)
    // existing violation: the constraint cannot be installed
    intercept[IllegalArgumentException] {
      TxTable.setCheckConstraint(spark, root, "v >= 0")
    }
    assert(!TxTable.latestSnapshot(spark, root).headers.contains("check"))
    // repair, then install
    TxTable.mergeInto(root, Seq((2L, 7L, false)).toDF("id", "v", "_del"),
      "id", Seq("v"), "_del")
    TxTable.setCheckConstraint(spark, root, "v >= 0")
    assert(TxTable.latestSnapshot(spark, root).headers("check") === "v >= 0")
    // violating upsert rejected; tombstone of any row passes
    intercept[IllegalArgumentException] {
      TxTable.mergeInto(root, Seq((3L, -1L, false)).toDF("id", "v", "_del"),
        "id", Seq("v"), "_del")
    }
    TxTable.mergeInto(root, Seq((1L, 0L, true)).toDF("id", "v", "_del"),
      "id", Seq("v"), "_del")
    assert(TxTable.read(spark, root).count() === 1L)
    // drop: the same violating row now lands
    TxTable.dropCheckConstraint(spark, root)
    TxTable.append(Seq((9L, -9L)).toDF("id", "v"), root)
    assert(TxTable.read(spark, root).count() === 2L)
  }

  test("streaming batches are checked before committing") {
    val root = Files.createTempDirectory("graft-check-stream-").toString
    TxTable.create(Seq((1L, 1L)).toDF("id", "v"), root,
      check = Some("v BETWEEN 0 AND 100"))
    intercept[IllegalArgumentException] {
      TxTable.addStreamingBatch(
        Seq((2L, 999L)).toDF("id", "v"), root, "s1", batchId = 0L)
    }
    assert(TxTable.addStreamingBatch(
      Seq((2L, 99L)).toDF("id", "v"), root, "s1", batchId = 0L).nonEmpty)
    assert(TxTable.read(spark, root).count() === 2L)
  }
}
