package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    val s = spark
    import s.implicits._
    // heavy skew: 90% of rows share key 1
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2"))
      .toDF("sk", "label")
    val plain = large.join(small, col("k") === col("sk"))
      .select("k", "payload", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(
        large, small, "k", "sk", factor = 8, saltSource = col("payload"))
      .select("k", "payload", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 900)
  }

  test("salt spreads the hot key across reducers") {
    val s = spark
    import s.implicits._
    val large = (1 to 1000).map(i => (1L, i)).toDF("k", "payload")
    val saltCounts = large
      .withColumn("_salt", pmod(hash(col("payload")), lit(8)))
      .groupBy("_salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8)      // all 8 salt buckets used
    assert(saltCounts.max < 1000 * 0.3) // no bucket holds the whole key
  }
}
