package graft.tools

import graft.sources.TxTable

import org.apache.spark.sql.SparkSession

/** One competitor in the multi-PROCESS TxTable commit race: a separate
  * Spark driver JVM that appends `n` single-row frames to a shared
  * table path, retrying through lost optimistic races. Launched twice
  * concurrently by TxRaceSpec (and usable by hand for longer soaks) to
  * exercise the real harvest-while-serving contention the in-JVM retry
  * specs cannot: two drivers, two FileSystem instances, one directory,
  * with the `FileContext.rename(…, Rename.NONE)` fail-if-exists
  * publish as the only arbiter.
  *
  *   java -cp … graft.tools.TxRaceWorker <tableRoot> <workerId> <n>
  *
  * Prints one `[txrace] worker=… seq=… version=…` line per commit;
  * exits non-zero if any append exhausts its retries.
  */
object TxRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, workerId, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-txrace-$workerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      (0 until n).foreach { i =>
        val v = TxTable.append(
          Seq((workerId, i.toLong)).toDF("worker", "seq"),
          root, maxRetries = 200)
        // stdout is the race log the orchestrator asserts over
        println(s"[txrace] worker=$workerId seq=$i version=$v")
      }
    } finally spark.stop()
  }
}
