package graft.metrics

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.RecordStatus
import graft.sources.TxTable

/** The serving-face consumer loop: gauges maintained off the change
  * stream must equal a full recount at EVERY step, survive redelivery
  * (fresh checkpoint restarts), and re-anchor across a vacuumed feed
  * gap instead of failing or serving stale counts.
  */
class MetricsMaintainerSpec extends SparkSpec {

  import spark.implicits._

  private def studies(
      rows: Seq[(Long, String, Boolean)]): DataFrame =
    rows.toDF("doc_id", "pub", "del")
      .select(col("doc_id"), col("pub").as("_direct_base_url"),
        struct(when(col("del"), RecordStatus.Deleted)
          .otherwise(RecordStatus.Created).as("status")).as("_metadata"))

  private def assertGaugesEqualRecount(
      m: MetricsMaintainer, root: String): Unit = {
    val g = m.gauges
    val recount = MetricsJob.run(TxTable.read(spark, root))
    assert(g.recordsTotal == recount.recordsTotal)
    assert(g.recordsTotalWithoutDeleted ==
      recount.recordsTotalWithoutDeleted)
    assert(g.perPublisher == recount.perPublisher)
  }

  test("gauges track the change stream batch by batch, equal to a " +
    "recount at every step, without corpus reads on the scrape path") {
    val root = Files.createTempDirectory("graft-metmaint-").toString
    TxTable.create(studies(Seq(
      (1L, "pubA", false), (2L, "pubA", true), (3L, "pubB", false))),
      root)                                                        // v0
    TxTable.setChangeFeed(spark, root, enabled = true)             // v1
    val m = new MetricsMaintainer(spark, root)
    val q = m.start(Files.createTempDirectory("graft-metmaint-ck-").toString)
    try {
      q.processAllAvailable()
      assertGaugesEqualRecount(m, root)
      // N batches of mixed traffic: append, contribution-moving merge,
      // DV delete — gauges re-checked against a recount after each
      TxTable.append(studies(Seq((4L, "pubC", false))), root)      // v2
      q.processAllAvailable()
      assertGaugesEqualRecount(m, root)
      TxTable.mergeInto(root,
        studies(Seq((1L, "pubA", true), (3L, "pubC", false),
          (5L, "pubB", false))).withColumn("_del", lit(false)),
        "doc_id", Seq("_direct_base_url", "_metadata"), "_del")    // v3
      q.processAllAvailable()
      assertGaugesEqualRecount(m, root)
      TxTable.deleteWhere(spark, root, col("doc_id") === 2L)       // v4
      q.processAllAvailable()
      assertGaugesEqualRecount(m, root)
      assert(m.prometheusText.contains("records_total"))
    } finally q.stop()
  }

  test("a fresh-checkpoint restart redelivers old versions but folds " +
    "nothing twice (version high-water idempotence)") {
    val root = Files.createTempDirectory("graft-metmaint2-").toString
    TxTable.create(studies(Seq((1L, "pubA", false))), root)        // v0
    TxTable.setChangeFeed(spark, root, enabled = true)             // v1
    val m = new MetricsMaintainer(spark, root)
    val q1 = m.start(Files.createTempDirectory("graft-mm2-ck1-").toString)
    try {
      TxTable.append(studies(Seq((2L, "pubB", false))), root)      // v2
      q1.processAllAvailable()
      assertGaugesEqualRecount(m, root)
    } finally q1.stop()
    // redelivery: directly re-fold the already-applied version range —
    // the high-water must make it a no-op
    val before = m.gauges
    m.fold(TxTable.readChangesTyped(spark, root, 1L, 2L))
    assert(m.gauges == before)
    // restart with a FRESH checkpoint (offsets replay from the
    // high-water, not from zero): still recount-equal after new traffic
    val q2 = m.start(Files.createTempDirectory("graft-mm2-ck2-").toString)
    try {
      TxTable.append(studies(Seq((3L, "pubC", false))), root)      // v3
      q2.processAllAvailable()
      assertGaugesEqualRecount(m, root)
    } finally q2.stop()
  }

  test("bootstrap-on-gap: a vacuum past the high-water re-anchors " +
    "with one exact recount instead of failing") {
    val root = Files.createTempDirectory("graft-metmaint3-").toString
    TxTable.create(studies(Seq((1L, "pubA", false))), root)        // v0
    TxTable.setChangeFeed(spark, root, enabled = true)             // v1
    val m = new MetricsMaintainer(spark, root)
    val q1 = m.start(Files.createTempDirectory("graft-mm3-ck1-").toString)
    try q1.processAllAvailable() finally q1.stop()
    assertGaugesEqualRecount(m, root)
    // the consumer sleeps; traffic + a vacuum sweep past its high-water
    TxTable.append(studies(Seq((2L, "pubB", false))), root)        // v2
    TxTable.deleteWhere(spark, root, col("doc_id") === 1L)         // v3
    TxTable.append(studies(Seq((3L, "pubC", false))), root)        // v4
    TxTable.vacuum(spark, root, keepVersions = 1)
    assert(TxTable.versions(spark, root).min > 2L,
      "test setup: vacuum must sweep past the maintainer's high-water")
    val q2 = m.start(Files.createTempDirectory("graft-mm3-ck2-").toString)
    try {
      q2.processAllAvailable()
      assertGaugesEqualRecount(m, root)
      // and the re-anchored consumer keeps tracking new traffic
      TxTable.append(studies(Seq((4L, "pubD", false))), root)
      q2.processAllAvailable()
      assertGaugesEqualRecount(m, root)
    } finally q2.stop()
  }
}
