package graft.tools
import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Time one gate end-to-end AND break it into its Spark jobs, so
  * optimization targets the phase that actually costs (guide §1:
  * measure first; §7.1: find where the time goes). Usage:
  *   runMain graft.tools.JobProfile <gate> [sfDir] [cpus] [iters]
  * Prints per-job (duration, stages, tasks, task-time, callsite) for
  * the LAST iteration plus the per-iteration wall times; first
  * iteration is warmup. Durations use the event timestamps Spark
  * stamps at job start/end (epoch ms), not listener-delivery time, so
  * a lagging listener bus cannot skew the breakdown.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: JobProfile <gate> [sfDir] [cpus] [iters]\n" +
          s"gates: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val fns = names.map { n =>
      n -> SparkEntry.queries.getOrElse(n, {
        System.err.println(s"unknown gate '$n'; valid gates:\n  " +
          SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
        sys.exit(2)
        throw new IllegalStateException
      })
    }
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.drop(2).headOption.getOrElse("32")
    val iters = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap[Int, (Long, String)]()
    // jobId -> (durSec, site); stage rollups keyed by jobId
    val rows = collection.mutable.ArrayBuffer[(Int, Double, String)]()
    val stageJob = TrieMap[Int, Int]() // stageId -> jobId
    // jobId -> (stages, tasks, taskTimeMs, first stage name)
    val jobTasks = TrieMap[Int, (Int, Int, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))
            .orElse(Option(p.getProperty("spark.job.description"))))
          .getOrElse("?")
        js.stageIds.foreach(sid => stageJob(sid) = js.jobId)
        starts(js.jobId) = (js.time, site)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageJob.get(si.stageId).foreach { jid =>
          val (s, t, ms, nm) = jobTasks.getOrElse(jid, (0, 0, 0L, ""))
          val taskMs = si.taskMetrics match {
            case null => 0L
            case m => m.executorRunTime
          }
          val name = if (nm.isEmpty) si.name.take(60) else nm
          jobTasks(jid) = (s + 1, t + si.numTasks, ms + taskMs, name)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          rows.synchronized {
            rows += ((je.jobId, (je.time - t0) / 1e3, site))
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // warmup identical to Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    fns.foreach { case (name, fn) =>
      (1 to iters).foreach { i =>
        rows.synchronized(rows.clear())
        starts.clear(); stageJob.clear(); jobTasks.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // deterministic drain: poll until every started job has ended
        val deadline = System.nanoTime() + 5_000_000_000L
        while (starts.nonEmpty && System.nanoTime() < deadline) Thread.sleep(20)
        val jobs = rows.synchronized(rows.sortBy(_._1).toVector)
        println(f"[profile] $name iter=$i wall=$wall%.3f s jobs=${jobs.size}")
        if (i == iters) {
          jobs.foreach { case (jid, dur, site) =>
            val (st, tk, ms, nm) = jobTasks.getOrElse(jid, (0, 0, 0L, "?"))
            val label = if (site == "?") nm else site
            println(f"[profile]   job=$jid%-4d $dur%7.3f s stages=$st%-2d tasks=$tk%-4d taskTime=${ms / 1e3}%7.3f s  $label")
          }
          println(f"[profile]   sum-of-jobs=${jobs.map(_._2).sum}%.3f s (gaps = driver/planning/IO)")
        }
      }
    }
    spark.stop()
  }
}
