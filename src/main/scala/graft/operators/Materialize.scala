package graft.operators

import org.apache.spark.sql.DataFrame

/** Strategy-aware lineage truncation for every operator
  * materialization point — iterative per-round frames (connected
  * components, PageRank/HITS/k-core/BFS/LPA rounds, BPE merges) and
  * multi-consumer corpus-scale frames (dedup cluster keys, sentence
  * stats, sketch bottom-k).
  *
  * Default (`spark.graft.checkpoint.dir` unset): `localCheckpoint`,
  * eager — executor-memory blocks, zero filesystem traffic, the right
  * call in local mode and for short-lived frames. The caveat at
  * cluster scale: local checkpoint blocks are NOT recomputable, so a
  * lost executor mid-iteration kills the job, and the blocks pin
  * executor memory for the run.
  *
  * Opt-in (`spark.conf.set("spark.graft.checkpoint.dir", dir)` with a
  * DFS path): RELIABLE `checkpoint` — each materialized frame is
  * written to `dir` and re-read from storage, so executor loss costs a
  * re-read instead of the job, and executor memory is released. The
  * knob governs every operator uniformly; results are bit-identical
  * under both strategies (a checkpoint only truncates lineage, it
  * never reorders or re-rounds anything — spec-locked in
  * CheckpointStrategySpec). The SparkContext checkpoint dir is set
  * from the conf on first use and kept for the session; enable
  * `spark.cleaner.referenceTracking.cleanCheckpoints` for automatic
  * file cleanup on long-lived drivers.
  */
object Materialize {

  /** Runtime conf key: a DFS directory enables reliable checkpoints. */
  val DirKey = "spark.graft.checkpoint.dir"

  // last dir pushed to SparkContext.setCheckpointDir — the context
  // rewrites the dir to a per-context UUID subdirectory, so "is it
  // already set" can't be answered by comparing getCheckpointDir
  @volatile private var configuredDir: Option[String] = None

  def frame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (!configuredDir.contains(dir)) synchronized {
          if (!configuredDir.contains(dir)) {
            spark.sparkContext.setCheckpointDir(dir)
            configuredDir = Some(dir)
          }
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  implicit final class MaterializeOps(private val df: DataFrame)
      extends AnyVal {
    /** [[Materialize.frame]], chainable where `.localCheckpoint(true)`
      * used to sit.
      */
    def materialized: DataFrame = Materialize.frame(df)
  }
}
