package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the "pre-partition the studies table by
  * its join key" design from SURVEY.md §4: both sides bucketed on the key
  * into the same bucket count join WITHOUT a shuffle exchange on either
  * side. This spec materializes bucketed tables and proves the exchange
  * disappears from the physical plan.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join with no shuffle exchange") {
    val warehouse = Files.createTempDirectory("graft-wh").toString
    val s = spark
    import s.implicits._
    s.sql(s"CREATE DATABASE IF NOT EXISTS graftbuckets")
    try {
      val orders = s.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val lineitem = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouse/orders_b")
        .saveAsTable("graftbuckets.orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouse/lineitem_b")
        .saveAsTable("graftbuckets.lineitem_b")

      val joined = s.table("graftbuckets.lineitem_b")
        .join(s.table("graftbuckets.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the JOIN itself must not shuffle either side: the only exchange
      // allowed is the final aggregation's
      val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(!exchanges.exists(_.contains("orderkey")),
        s"join keys were shuffled: $exchanges\n$plan")

      // correctness unchanged vs plain parquet join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val actual = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(actual == expected)
    } finally {
      s.sql("DROP TABLE IF EXISTS graftbuckets.lineitem_b")
      s.sql("DROP TABLE IF EXISTS graftbuckets.orders_b")
      s.sql("DROP DATABASE IF EXISTS graftbuckets")
    }
  }
}
