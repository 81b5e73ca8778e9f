package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import graft.SparkSpec
import graft.sources.{TxTable, XmlRecords}

import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The streaming twin of the `pipeline_oai_loop` gate, end to end:
  * OAI-PMH harvest pages LAND INCREMENTALLY in a drop directory, the
  * continuous-harvest stream (`XmlRecords.readStream`) parses each
  * micro-batch, `TxTable.addStreamingBatch` commits it exactly-once,
  * and `CorpusMonitor.qualityByWindow` runs over the served table —
  * asserted EQUAL to the same composition on the batch face
  * (`XmlRecords.read` over the same pages), which is what the
  * `pipeline_oai_monitor` gate anchors to DuckDB. One spec, the whole
  * harvest-while-serving cycle: render → drop → stream-parse →
  * ACID-commit → monitor ≡ batch.
  */
class StreamingOaiLoopSpec extends SparkSpec {

  private def moveAll(from: Path, into: Path, prefix: String): Unit =
    Files.list(from).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".xml"))
      .foreach { p =>
        Files.move(p, into.resolve(s"$prefix-${p.getFileName}"),
          StandardCopyOption.ATOMIC_MOVE)
      }

  test("drop-dir harvest stream -> exactly-once TxTable -> monitor " +
    "equals the batch face") {
    val s = spark
    import s.implicits._
    // two harvest waves over a hand corpus: ids spread across langs,
    // datestamps (id % 365 days), and the id % 13 deleted marker
    val docs = (1L to 40L).map { id =>
      val lang = Seq("en", "de", "fr")((id % 3).toInt)
      (id, lang, s"src${id % 2}",
        s"the quick document $id with some plain words and the end")
    }.toDF("doc_id", "lang", "source", "text")
    val wave1 = docs.filter(col("doc_id") <= 20)
    val wave2 = docs.filter(col("doc_id") > 20)

    val drop = Files.createTempDirectory("graft-oai-drop-")
    val stage1 = Files.createTempDirectory("graft-oai-w1-")
    val stage2 = Files.createTempDirectory("graft-oai-w2-")
    XmlRecords.write(wave1, stage1.toString, numPartitions = 2)
    XmlRecords.write(wave2, stage2.toString, numPartitions = 2)

    val root = Files.createTempDirectory("graft-oai-table-").toString
    val ckpt = Files.createTempDirectory("graft-oai-ckpt-").toString
    // seed the table with the schema (a pre-existing serving table)
    val seed = Seq(("seed", "1970-01-01", false, "", "en", "seed doc"))
      .toDF("identifier", "datestamp", "deleted", "sets", "language",
        "text")
    TxTable.create(seed, root)

    // wave 1 lands before the stream starts; wave 2 lands mid-stream
    moveAll(stage1, drop, "w1")
    val q = XmlRecords.readStream(s, drop.toString, maxFilesPerTrigger = 2)
      .drop("file", "_corrupt")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          TxTable.addStreamingBatch(batch, root, "harvest", id): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      moveAll(stage2, drop, "w2")
      q.processAllAvailable()
    } finally q.stop()

    // the served table carries exactly the 40 harvested records once
    // (plus the seed), across >= 2 exactly-once streaming commits
    val served = TxTable.read(s, root).filter(col("identifier") =!= "seed")
    assert(served.count() == 40L)
    assert(served.select("identifier").distinct().count() == 40L)
    val streamCommits = TxTable.latestSnapshot(s, root)
      .headers.get("stream:harvest").map(_.toLong)
    assert(streamCommits.exists(_ >= 1L),
      s"expected multiple streaming batches, got $streamCommits")

    // monitor over the STREAM-served table == monitor over the BATCH
    // face (the pipeline_oai_monitor gate composition), bit for bit
    def monitor(parsed: org.apache.spark.sql.DataFrame) =
      CorpusMonitor.qualityByWindow(
          parsed.filter(!col("deleted"))
            .select(col("text"),
              col("datestamp").cast("timestamp").as("ts")),
          "ts", "text", windowDuration = "24 hours")
        .orderBy("window_start", "lang_pred")
        .collect().toSeq
    val viaStream = monitor(served)
    val viaBatch = monitor(XmlRecords.read(s, drop.toString))
    assert(viaStream == viaBatch,
      s"batch/stream monitor diverged:\n$viaStream\nvs\n$viaBatch")
    assert(viaStream.nonEmpty)

    // deleted records (id % 13 = 0) were parsed but carry no metadata
    val deleted = served.filter(col("deleted")).select("identifier")
      .collect().map(_.getString(0)).toSet
    assert(deleted == Set("oai:graft:13", "oai:graft:26", "oai:graft:39"))
  }
}
