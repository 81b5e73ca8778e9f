package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end Structured Streaming → [[TxTable]] ingest: foreachBatch
  * routes every micro-batch through [[TxTable.addStreamingBatch]], and
  * a checkpointed RESTART (which re-delivers the last batch — the
  * at-least-once contract this sink exists to absorb) must not
  * duplicate rows: the manifest's per-stream high-water batch id makes
  * the redelivered commit a no-op.
  */
class TxTableSinkSpec extends SparkSpec {

  test("foreachBatch ingest survives restart without duplicate rows") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-txsink-").toString
    val ckpt = Files.createTempDirectory("graft-txsink-ckpt-").toString
    TxTable.create(Seq((0L, "seed")).toDF("id", "text"), root)

    val in = MemoryStream[(Long, String)](s)
    def start() = in.toDS().toDF("id", "text")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        TxTable.addStreamingBatch(batch, root, "ingest", id): Unit
      }
      .start()

    val q1 = start()
    try {
      in.addData((1L, "a"))
      in.addData((2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()

    val afterFirst = TxTable.read(spark, root).collect()
      .map(_.getLong(0)).toSet
    assert(afterFirst == Set(0L, 1L, 2L))

    // restart from the same checkpoint: Structured Streaming replays
    // any batch not yet marked committed in ITS log; whether or not it
    // re-runs our foreachBatch, the table must stay exactly-once
    val q2 = start()
    try {
      in.addData((3L, "c"))
      q2.processAllAvailable()
    } finally q2.stop()

    val afterSecond = TxTable.read(spark, root).collect()
      .map(_.getLong(0)).toSet
    assert(afterSecond == Set(0L, 1L, 2L, 3L))

    // belt and braces: force a literal redelivery of an old batch id
    val dup = Seq((99L, "dup")).toDF("id", "text")
    assert(TxTable.addStreamingBatch(dup, root, "ingest", 0L).isEmpty)
    assert(TxTable.read(spark, root).count() == 4L)
  }
}
