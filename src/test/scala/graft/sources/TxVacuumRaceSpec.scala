package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Vacuum-vs-reader race, two JVMs (the TxRaceSpec harness): a
  * time-travel reader in a SEPARATE driver process pins version 0's
  * file list, then this process vacuums with version 0 dropped —
  * once with the files INSIDE the retention window (reader must
  * finish cleanly: manifests gate discovery, retention gates bytes)
  * and once with retention zero (reader must fail with missing
  * files: the contract's documented outer edge). Pins the paragraph
  * on [[TxTable.vacuum]].
  */
class TxVacuumRaceSpec extends SparkSpec {

  import TxRaceSpec.launchWorker

  /** v0 = 20 rows across several files; v1 = a merge rewriting EVERY
    * key, so all of v0's files are unreferenced by the kept snapshot.
    */
  private def buildTable(): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-vacrace-").toString
    val rows = (1L to 20L).map(k => (k, s"v0:$k")).toDF("k", "v")
      .repartition(4)
    TxTable.create(rows, root)
    val rewrite = (1L to 20L).map(k => (k, s"v1:$k", false))
      .toDF("k", "v", "_del")
    TxTable.mergeInto(root, rewrite, "k", Seq("v"), "_del")
    assert(TxTable.versions(spark, root) == Seq(0L, 1L))
    root
  }

  private def holdAndVacuum(retentionMs: Long): (Int, String) = {
    val root = buildTable()
    val signal = Files.createTempDirectory("graft-vacsig-")
      .resolve("go").toString
    val (p, out) = launchWorker(Seq("readhold", root, "0", signal))
    // wait until the worker has PINNED v0's file list
    val deadline = System.currentTimeMillis() + 60000L
    while (!out.synchronized(out.result()).contains("resolved=0") &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(out.synchronized(out.result()).contains("resolved=0"),
      s"worker never resolved v0:\n${out.result()}")

    TxTable.vacuum(spark, root, keepVersions = 1, retentionMs = retentionMs)
    // v0's manifest is gone either way: new time travel fails NOW
    intercept[Exception] { TxTable.readVersion(spark, root, 0L) }
    // v1 stays intact either way
    assert(TxTable.read(spark, root).count() === 20L)

    Files.createFile(Paths.get(signal))
    val exit = p.exitValue()
    (exit, out.synchronized(out.result()))
  }

  test("reader inside the retention window survives vacuum " +
    "(manifest dropped, bytes retained)") {
    val (exit, log) = holdAndVacuum(retentionMs = 3600L * 1000)
    assert(exit === 0, s"reader failed inside retention:\n$log")
    assert(log.contains("count=20"), s"wrong row count:\n$log")
  }

  test("reader outside the retention window loses the race " +
    "(retention 0 physically deletes the pinned files)") {
    val (exit, log) = holdAndVacuum(retentionMs = 0L)
    assert(exit === 3, s"expected readfail exit 3, got $exit:\n$log")
    assert(log.contains("readfail="), s"no readfail marker:\n$log")
  }
}
