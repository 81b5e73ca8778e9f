package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The [[Materialize]] knob: every iterative operator must return
  * bit-identical results whether per-round frames are local-checkpoint
  * blocks (default) or reliable DFS checkpoints
  * (`spark.graft.checkpoint.dir` set) — the strategy only truncates
  * lineage, it can never touch values. Also pins that the reliable
  * path REALLY writes checkpoint files (the fault-tolerance property
  * is the files' existence, not a config no-op).
  */
class CheckpointStrategySpec extends graft.SparkSpec {

  override def afterAll(): Unit = {
    spark.conf.unset(Materialize.DirKey)
    super.afterAll()
  }

  private def edges = {
    val s = spark
    import s.implicits._
    // two chains + a triangle + an isolated self-contained pair
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 20L), (30L, 31L))
      .toDF("src", "dst")
  }

  private def withStrategy[T](dir: Option[String])(body: => T): T = {
    dir match {
      case Some(d) => spark.conf.set(Materialize.DirKey, d)
      case None    => spark.conf.unset(Materialize.DirKey)
    }
    try body finally spark.conf.unset(Materialize.DirKey)
  }

  test("components and pagerank are identical under both strategies") {
    val dir = Files.createTempDirectory("graft-ckpt-").toString
    def run() = {
      val comp = ConnectedComponents.components(edges, "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val nodes = edges.select(col("src").as("id"))
        .unionByName(edges.select(col("dst").as("id"))).distinct()
      val pr = PageRank.pagerank(nodes, "id", edges, "src", "dst",
          iterations = 5)
        .collect().map(r => r.toSeq).toSet
      (comp, pr)
    }
    val local = withStrategy(None)(run())
    val reliable = withStrategy(Some(dir))(run())
    assert(local == reliable)
    assert(local._1.nonEmpty && local._2.nonEmpty)
  }

  test("reliable strategy writes checkpoint files to the configured dir") {
    val dir = Files.createTempDirectory("graft-ckpt-files-").toString
    withStrategy(Some(dir)) {
      ConnectedComponents.components(edges, "src", "dst").collect()
    }
    val written = new java.io.File(dir).listFiles()
    assert(written != null && written.nonEmpty,
      s"expected RDD checkpoint dirs under $dir")
  }

  test("kcore and label propagation are identical under both strategies") {
    val dir = Files.createTempDirectory("graft-ckpt2-").toString
    def run() = {
      val kc = GraphMetrics.kCorePeel(edges, "src", "dst", k = 2)
        .collect().map(r => r.toSeq).toSet
      val s2 = spark
      import s2.implicits._
      val seeds = Seq(1L).toDF("id")
      val bfs = GraphMetrics.bfsLayers(edges, "src", "dst", seeds, "id",
          maxDepth = 6)
        .collect().map(r => r.toSeq).toSet
      (kc, bfs)
    }
    val local = withStrategy(None)(run())
    val reliable = withStrategy(Some(dir))(run())
    assert(local == reliable)
  }
}
