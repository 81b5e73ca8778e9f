package graft.tools
import java.nio.file.{Files, Paths}

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named gates into
  * `<outDir>/<gate><suffix>.txt` — the plan evidence the round
  * deliverables commit (plans/rNN/<query>_before|_after.txt). Usage:
  *   runMain graft.tools.PlanDump <g1,g2,...> <outDir> [suffix] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = Paths.get(args(1))
    val suffix = args.drop(2).headOption.getOrElse("")
    val sfDir = args.drop(3).headOption.getOrElse("/root/testdata/sf0.01")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"$n$suffix.txt"), txt)
      println(s"[plandump] wrote $n$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
