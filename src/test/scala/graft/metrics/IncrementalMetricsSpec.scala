package graft.metrics

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.RecordStatus
import graft.sources.TxTable

/** The batch-fold must equal the full recount after any typed change
  * traffic — including the two contribution-moving update shapes
  * (status flip, publisher move) and null publishers.
  */
class IncrementalMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def studies(
      rows: Seq[(Long, String, Boolean)]): DataFrame =
    rows.toDF("doc_id", "pub", "del")
      .select(col("doc_id"), col("pub").as("_direct_base_url"),
        struct(when(col("del"), RecordStatus.Deleted)
          .otherwise(RecordStatus.Created).as("status")).as("_metadata"))

  private def assertFoldEqualsRecount(root: String,
      state: IncrementalMetrics.CountsState): Unit = {
    val folded = state.toAggMetrics
    val recount = MetricsJob.run(TxTable.read(spark, root))
    assert(folded.recordsTotal == recount.recordsTotal)
    assert(folded.recordsTotalWithoutDeleted ==
      recount.recordsTotalWithoutDeleted)
    assert(folded.perPublisher == recount.perPublisher)
  }

  test("fold equals recount across insert, status flip, publisher " +
    "move, tombstone, and DV delete — null publisher in totals only") {
    val root = Files.createTempDirectory("graft-incmetrics-").toString
    TxTable.create(studies(Seq(
      (1L, "pubA", false), (2L, "pubA", true), (3L, "pubB", false),
      (4L, null, false))), root)                                   // v0
    TxTable.setChangeFeed(spark, root, enabled = true)             // v1
    var state = IncrementalMetrics.bootstrap(
      TxTable.readVersion(spark, root, 0L))
    assert(state.toAggMetrics.recordsTotal == 4L)
    assert(state.toAggMetrics.publishersTotal == 2L) // null not named

    TxTable.append(studies(Seq((5L, "pubC", false))), root)        // v2
    // one merge: status flip (1), publisher move (3), tombstone (2),
    // fresh insert (6)
    TxTable.mergeInto(root,
      studies(Seq((1L, "pubA", true), (3L, "pubC", false),
        (6L, "pubB", false)))
        .withColumn("_del", lit(false))
        .unionByName(studies(Seq((2L, "pubA", true)))
          .withColumn("_del", lit(true))),
      "doc_id", Seq("_direct_base_url", "_metadata"), "_del")      // v3
    TxTable.deleteWhere(spark, root, col("doc_id") === 4L)         // v4

    (1L to 4L).foreach { v =>
      state = IncrementalMetrics.applyTyped(state,
        TxTable.readChangesTyped(spark, root, v - 1, v))
    }
    assertFoldEqualsRecount(root, state)
    // spot-check the moved/flipped shape: pubA = {1 deleted},
    // pubB = {6}, pubC = {3, 5}
    assert(state.toAggMetrics.perPublisher == Seq(
      PublisherCounts("pubA", 1L, 0L),
      PublisherCounts("pubB", 1L, 1L),
      PublisherCounts("pubC", 2L, 2L)))
  }

  test("a publisher whose last record leaves drops from the state " +
    "entirely (no zero-count gauges)") {
    val root = Files.createTempDirectory("graft-incmetrics-").toString
    TxTable.create(studies(Seq((1L, "pubX", false),
      (2L, "pubY", false))), root)                                 // v0
    TxTable.setChangeFeed(spark, root, enabled = true)             // v1
    var state = IncrementalMetrics.bootstrap(
      TxTable.readVersion(spark, root, 0L))
    TxTable.deleteWhere(spark, root, col("doc_id") === 1L)         // v2
    (1L to 2L).foreach { v =>
      state = IncrementalMetrics.applyTyped(state,
        TxTable.readChangesTyped(spark, root, v - 1, v))
    }
    assert(!state.counts.contains(Some("pubX")))
    assertFoldEqualsRecount(root, state)
  }
}
