package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TxTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .appName("txtable-spec").master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot() =
    Files.createTempDirectory("graft-txtable-").toString

  private def rows(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"text-$i")).toDF("id", "text")
  }

  test("create/read roundtrip and version 0") {
    val root = tmpRoot()
    assert(TxTable.create(rows(1L, 2L, 3L), root) == 0L)
    val got = TxTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "text-1"), (2L, "text-2"), (3L, "text-3")))
    assert(TxTable.versions(spark, root) == Seq(0L))
    intercept[IllegalArgumentException] {
      TxTable.create(rows(9L), root) // already exists
    }
  }

  test("append commits a new version; old snapshots stay stable") {
    val root = tmpRoot()
    TxTable.create(rows(1L, 2L), root)
    // resolve v0 BEFORE the append: snapshot isolation means this
    // frame must not see appended rows
    val v0 = TxTable.read(spark, root)
    assert(TxTable.append(rows(3L), root) == 1L)
    assert(v0.count() == 2L)
    assert(TxTable.read(spark, root).count() == 3L)
    assert(TxTable.readVersion(spark, root, 0L).count() == 2L)
    assert(TxTable.versions(spark, root) == Seq(0L, 1L))
  }

  test("append retries past a lost commit race") {
    val root = tmpRoot()
    TxTable.create(rows(1L), root)
    // steal version 1 out from under the next append by publishing a
    // valid manifest for it directly (what a concurrent winner does):
    // v1 = v0's file set, i.e. a no-op commit
    val v0 = TxTable.snapshot(spark, root, 0L)
    val log = new java.io.File(root, "_txlog")
    val stolen = new java.io.File(log, f"${1L}%020d.txn")
    val w = new java.io.PrintWriter(stolen, "UTF-8")
    try { w.println("version=1"); v0.files.foreach(w.println) }
    finally w.close()
    // the append resolves the foreign v1 and lands at v2 — commits
    // from other writers never block or corrupt an append
    assert(TxTable.append(rows(60L), root) == 2L)
    assert(TxTable.read(spark, root).count() == 2L)
    assert(TxTable.versions(spark, root) == Seq(0L, 1L, 2L))
  }

  test("overwrite fails with CommitConflict when the snapshot is stale") {
    val root = tmpRoot()
    TxTable.create(rows(1L, 2L), root)
    val stale = TxTable.latestSnapshot(spark, root).version // 0
    TxTable.append(rows(3L), root) // someone commits v1
    intercept[TxTable.CommitConflict] {
      TxTable.overwrite(rows(9L), root, stale)
    }
    // nothing half-visible: table unchanged
    assert(TxTable.read(spark, root).count() == 3L)
    assert(TxTable.versions(spark, root) == Seq(0L, 1L))
  }

  test("mergeInto applies CDC semantics as one atomic version") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    TxTable.create(rows(1L, 2L, 3L), root)
    val changes = Seq(
      (2L, "text-2 v2", false), // update
      (3L, "text-3", true),     // tombstone
      (4L, "text-4", false))    // insert
      .toDF("id", "text", "del")
    assert(TxTable.mergeInto(root, changes, "id", Seq("text"), "del") == 1L)
    val got = TxTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "text-1"), (2L, "text-2 v2"), (4L, "text-4")))
    // the action column is merge metadata, not table state
    assert(!TxTable.read(spark, root).columns.contains("action"))
    // time travel still serves the pre-merge table
    assert(TxTable.readVersion(spark, root, 0L).count() == 3L)
  }

  test("range-clustered table records per-file stats and prunes reads") {
    val root = tmpRoot()
    TxTable.create(rows(1L to 400L: _*), root,
      clusterCol = Some("id"), buckets = 8)
    val snap = TxTable.latestSnapshot(spark, root)
    assert(snap.clusterCol.contains("id"))
    assert(snap.files.size >= 4, s"expected several files, got ${snap.files}")
    assert(snap.stats.size == snap.files.size)
    // range clustering: file spans are disjoint, so a narrow range
    // must touch a strict subset of files
    val pruned = TxTable.prunedFiles(snap, 10L, 20L)
    assert(pruned.size < snap.files.size,
      s"no pruning: ${pruned.size} of ${snap.files.size}")
    val got = TxTable.readRange(spark, root, 10L, 20L)
      .collect().map(_.getLong(0)).toSet
    assert(got == (10L to 20L).toSet)
    // stats survive an append and the appended rows are found
    TxTable.append(rows(1000L), root)
    val got2 = TxTable.readRange(spark, root, 900L, 1100L)
      .collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1000L))
  }

  test("compact folds small files down without changing contents") {
    val root = tmpRoot()
    TxTable.create(rows(1L to 50L: _*), root,
      clusterCol = Some("id"), buckets = 4)
    (0 until 5).foreach(i => TxTable.append(rows(100L + i), root))
    val before = TxTable.latestSnapshot(spark, root)
    val pre = TxTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val v = TxTable.compact(spark, root, buckets = 4)
    val after = TxTable.snapshot(spark, root, v)
    assert(after.files.size < before.files.size,
      s"${after.files.size} !< ${before.files.size}")
    val post = TxTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(post == pre)
    // compaction preserves clustering + stats (skipping still works)
    assert(after.stats.size == after.files.size)
  }

  test("streaming batches commit exactly once across redelivery") {
    val root = tmpRoot()
    TxTable.create(rows(1L), root)
    assert(TxTable.addStreamingBatch(rows(10L), root, "s1", 0L).contains(1L))
    assert(TxTable.addStreamingBatch(rows(11L), root, "s1", 1L).contains(2L))
    // restart redelivers batch 1: must be a no-op skip
    assert(TxTable.addStreamingBatch(rows(11L), root, "s1", 1L).isEmpty)
    assert(TxTable.addStreamingBatch(rows(12L), root, "s1", 2L).contains(3L))
    // an independent stream has its own high-water mark
    assert(TxTable.addStreamingBatch(rows(20L), root, "s2", 0L).contains(4L))
    val got = TxTable.read(spark, root).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 10L, 11L, 12L, 20L))
    val s = TxTable.latestSnapshot(spark, root)
    assert(s.headers.get("stream:s1").contains("2"))
    assert(s.headers.get("stream:s2").contains("0"))
  }

  test("vacuum drops unreferenced files but keeps readable versions") {
    val root = tmpRoot()
    TxTable.create(rows(1L, 2L), root)
    TxTable.mergeInto(root,
      rows(1L).withColumn("del", lit(true)), "id", Seq("text"), "del")
    TxTable.append(rows(7L), root)
    TxTable.vacuum(spark, root, keepVersions = 2)
    // v0's files are referenced by no kept manifest → gone
    assert(TxTable.versions(spark, root) == Seq(1L, 2L))
    intercept[Exception] { TxTable.readVersion(spark, root, 0L) }
    assert(TxTable.read(spark, root).collect().map(_.getLong(0)).toSet ==
      Set(2L, 7L))
  }
}
