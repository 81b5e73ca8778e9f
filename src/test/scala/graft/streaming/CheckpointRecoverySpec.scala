package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once progress across restarts: a query killed mid-stream and
  * restarted from its checkpoint must not re-emit already-committed
  * batches — the property a real harvest ingest relies on when executors
  * or the driver die mid-run.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("restarted query resumes from checkpoint without duplicate offsets") {
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-stream-out").toString

    def start(maxRecords: Long) =
      spark.readStream
        .format(classOf[HarvestSourceProvider].getName)
        .option("recordsPerBatch", "100")
        .option("maxRecords", maxRecords.toString)
        .option("partitions", "2")
        .load()
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()

    // phase 1: drain 300 records, stop cleanly
    val q1 = start(maxRecords = 300)
    q1.processAllAvailable(); q1.stop()
    val afterPhase1 = spark.read.parquet(out).count()
    assert(afterPhase1 == 300)

    // phase 2: "more data arrived" (source cap raised); a NEW query
    // instance restarts from the same checkpoint
    val q2 = start(maxRecords = 500)
    q2.processAllAvailable(); q2.stop()

    val finalDf = spark.read.parquet(out)
    assert(finalDf.count() == 500) // no re-emission of the first 300
    // offsets are contiguous and unique: every generated record exactly once
    val distinctTitles = finalDf.select("title").distinct().count()
    assert(distinctTitles == 500)
  }
}
