package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified take keeps ceil(frac*n) smallest-ordered rows per group") {
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = Sampling.stratifiedTake(docs, "lang", "doc_id", 0.2)
    val got = sample.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) == math.ceil(0.2 * n).toLong, s"lang=$lang")
    }
    // determinism: the sample is exactly the lowest doc_ids per group
    val minIds = sample.groupBy("lang").agg(max("doc_id").as("mx"))
      .join(docs, "lang")
      .filter(col("doc_id") < col("mx"))
    // every doc below the per-group max sampled id must itself be sampled
    val below = minIds.count()
    val sampledBelow = minIds.join(sample.select("doc_id"), "doc_id").count()
    assert(below == sampledBelow)
  }

  test("hash split is stable and covers all buckets disjointly") {
    val split = Sampling.hashSplit(docs, "doc_id", 10)
    val counts = split.groupBy("split_bucket").count().collect()
    assert(counts.map(_.getLong(1)).sum == docs.count())
    assert(counts.length == 10) // 500 docs land in all 10 buckets
    val again = Sampling.hashSplit(docs, "doc_id", 10)
      .select("doc_id", "split_bucket").collect().toSet
    assert(again == split.select("doc_id", "split_bucket").collect().toSet)
  }
}
