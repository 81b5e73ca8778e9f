package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan hygiene audit: for every SparkEntry query, report shuffle count,
  * pushed filters, and scan schema width — the things that decide whether
  * a plan survives a 100× scale-up. Run:
  *   sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.01"
  */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Optional comma-separated gate filter (the Verify convention) for
    // auditing just the gates a round touched.
    val only = sys.env.get("SPARK_GRAFT_AUDIT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // materialize THIS query execution so AQE finalizes
        // final plan only (AQE prints the initial plan below it)
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val shuffles = "Exchange".r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
        val schemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq
        val scanWidth = schemas.map(s => s.count(_ == ',') + 1).sum
        // whole-stage-codegen spans render as *(n) prefixes
        val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(f"$name%-28s shuffles=$shuffles%-3d codegenSpans=$wsc%-3d scanCols=$scanWidth%-4d ${pushed.take(90)}")
      } catch {
        case e: Throwable => println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
