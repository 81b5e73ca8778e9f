package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Audit a single gate's executed plan (PlanAudit for one name). */
object AuditOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    println(s"[audit] $name shuffles=" +
      "Exchange".r.findAllIn(plan).length + " reused=" +
      "ReusedExchange".r.findAllIn(plan).length + " joins=" +
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)"
        .r.findAllIn(plan).toSeq.groupBy(identity)
        .map { case (k, v) => s"$k:${v.size}" }.mkString(","))
    // SPARK_GRAFT_AUDIT_PLAN=1 dumps the full final physical plan
    if (sys.env.get("SPARK_GRAFT_AUDIT_PLAN").contains("1")) println(plan)
    spark.stop()
  }
}
