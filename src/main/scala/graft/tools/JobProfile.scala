package graft.tools
import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Time one gate end-to-end AND break it into its Spark jobs, so
  * optimization targets the phase that actually costs (guide §1:
  * measure first; §7.1: find where the time goes). Usage:
  *   runMain graft.tools.JobProfile <gate> [sfDir] [cpus] [iters]
  * Prints per-job (callsite, duration) for the LAST iteration plus the
  * per-iteration wall times; first iteration is warmup.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
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
    val rows = collection.mutable.ArrayBuffer[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts(js.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          rows.synchronized {
            rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, site))
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // warmup identical to Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      rows.synchronized(rows.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the listener bus drain job-end events
      val jobs = rows.synchronized(rows.sortBy(_._1).toVector)
      println(f"[profile] $name iter=$i wall=$wall%.3f s jobs=${jobs.size}")
      if (i == iters) {
        val agg = jobs.groupBy(_._3).view
          .mapValues(v => (v.size, v.map(_._2).sum)).toSeq.sortBy(-_._2._2)
        agg.foreach { case (site, (n, tot)) =>
          println(f"[profile]   $tot%7.3f s  n=$n%-3d $site")
        }
        println(f"[profile]   sum-of-jobs=${jobs.map(_._2).sum}%.3f s (gaps = driver/planning/IO)")
      }
    }
    spark.stop()
  }
}
