package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._

import scala.sys.process._

/** Two-PROCESS TxTable commit race: two separate Spark driver JVMs
  * (not threads — different FileSystem instances, no shared JVM state)
  * blind-append concurrently to one table path. The
  * `FileContext.rename(…, Rename.NONE)` publish is the only arbiter,
  * so this is the real harvest-while-serving contention test:
  * exactly one winner per version, no lost updates, contiguous
  * version history.
  */
class TxRaceSpec extends SparkSpec {

  private val addOpens = Seq(
    "--add-opens=java.base/java.nio=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens=java.base/java.lang=ALL-UNNAMED",
    "--add-opens=java.base/java.util=ALL-UNNAMED")

  test("two driver JVMs racing append: one winner per version, no lost rows") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-txrace-").toString
    TxTable.create(Seq(("seed", -1L)).toDF("worker", "seq"), root)

    val javaBin = System.getProperty("java.home") + "/bin/java"
    // the worker main lives in main classes; Spark jars come from the
    // same unmanaged dir the build uses
    val cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    val perWorker = 5
    def launch(id: String): (Process, StringBuilder) = {
      val out = new StringBuilder
      val logger = ProcessLogger(line => out.synchronized {
        out.append(line).append('\n')
      }, _ => ())
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.tools.TxRaceWorker", root, id, perWorker.toString)
      (Process(cmd, new java.io.File("/root/repo")).run(logger), out)
    }
    val (p1, out1) = launch("w1")
    val (p2, out2) = launch("w2")
    val ex1 = p1.exitValue() // blocks
    val ex2 = p2.exitValue()
    assert(ex1 == 0, s"worker 1 failed:\n${out1.result().takeRight(2000)}")
    assert(ex2 == 0, s"worker 2 failed:\n${out2.result().takeRight(2000)}")

    // version history: contiguous 0..2n, exactly one manifest each
    val vs = TxTable.versions(spark, root)
    assert(vs == (0L to (2L * perWorker)),
      s"non-contiguous version history: $vs")

    // no lost updates: every (worker, seq) row survives exactly once
    val rows = TxTable.read(spark, root)
      .groupBy(col("worker"), col("seq"))
      .agg(count(lit(1)).as("n")).collect()
    val expected = (Seq(("seed", -1L)) ++
      (0 until perWorker).flatMap(i => Seq(("w1", i.toLong), ("w2", i.toLong))))
      .toSet
    assert(rows.forall(_.getLong(2) == 1L),
      s"duplicated rows: ${rows.filter(_.getLong(2) != 1L).mkString(",")}")
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet == expected,
      "row set mismatch — an append was lost or fabricated")

    // the winners' own commit logs agree with the manifest count:
    // 2n committed versions were claimed, all distinct
    val claimed = (out1.result() + out2.result()).linesIterator
      .filter(_.startsWith("[txrace]"))
      .map(_.split("version=")(1).trim.toLong).toSeq
    assert(claimed.size == 2 * perWorker, s"claims: $claimed")
    assert(claimed.distinct.size == claimed.size,
      s"two workers claimed one version: $claimed")
  }
}
