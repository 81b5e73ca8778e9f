package graft.tools

import graft.Tables
import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.SparkSession

/** One-off timing probe for the two components gates (hot queries in
  * BENCH); kept as a tool so round-over-round numbers are reproducible.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"[ccbench] $tag median=${ts.map(_._1).sorted.apply(1)}%.2f s rows=${ts.head._2}")
    }
    val docs = Tables(spark, sfDir).documents
    time("labelprop") {
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.95)
      ConnectedComponents.components(pairs, "id_a", "id_b").count()
    }
    time("star") {
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.95)
      ConnectedComponents.componentsStar(pairs, "id_a", "id_b").count()
    }
    spark.stop()
  }
}
