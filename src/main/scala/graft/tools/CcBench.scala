package graft.tools

import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted A/B timing for the connected-components plans: the sf0.1
  * near-dup pair graph (the `dedup_components*` gate input), each path
  * with and without per-partition union-find pre-contraction.
  *
  *   sbt "runMain graft.tools.CcBench [sfDir] [iters]"
  */
object CcBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-cc-bench").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.95)
      .select("id_a", "id_b").localCheckpoint(true)
    println(s"[cc] pairs = ${pairs.count()}")

    def time(name: String)(f: => Long): Unit = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = runs.map(_._1).sorted.apply(iters / 2)
      println(f"[cc] $name%-28s median $med%6.2f s  (${runs.map(r => f"${r._1}%.2f").mkString(", ")})  rows=${runs.head._2}")
    }

    time("labelprop_contracted") {
      ConnectedComponents.components(pairs, "id_a", "id_b").count()
    }
    time("labelprop_plain") {
      ConnectedComponents.components(pairs, "id_a", "id_b",
        preContract = false).count()
    }
    time("star_contracted") {
      ConnectedComponents.componentsStar(pairs, "id_a", "id_b").count()
    }
    time("star_plain") {
      ConnectedComponents.componentsStar(pairs, "id_a", "id_b",
        preContract = false).count()
    }
    spark.stop()
  }
}
