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

  test("shuffle shards: a bijective permutation, contiguous positions") {
    val sharded = Sampling.shuffleShards(docs, "doc_id", 8)
    val rows = sharded.select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == docs.count())
    // every shard's positions are exactly 0..n-1 (dense, no gaps)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard=$shard")
    }
    // the permutation actually shuffles: within some shard, ascending
    // position must NOT be ascending doc_id
    val monotone = rows.groupBy(_._2).values.forall { rs =>
      val byPos = rs.sortBy(_._3).map(_._1)
      byPos.sorted.toSeq == byPos.toSeq
    }
    assert(!monotone)
    // deterministic across runs
    val again = Sampling.shuffleShards(docs, "doc_id", 8)
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet)
  }

  test("weighted take applies per-group rates with a default") {
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 1.0, "de" -> 0.5)
    val got = Sampling.weightedTake(docs, "lang", "doc_id", weights, 0.1)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      val rate = weights.getOrElse(lang, 0.1)
      assert(got(lang) == math.ceil(rate * n).toLong, s"lang=$lang")
    }
  }

  test("weighted take at rate 1.0 keeps every row of that group") {
    val en = docs.filter(col("lang") === "en")
    val kept = Sampling.weightedTake(docs, "lang", "doc_id",
        Map("en" -> 1.0), 0.0)
    assert(kept.count() == en.count())
    assert(kept.exceptAll(en).isEmpty)
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

  test("score buckets: tercile labels match direct quantile comparison") {
    val s = spark
    import s.implicits._
    // 9 known scores: terciles at quantile_cont(1/3)=3.666…, (2/3)=6.333…
    val scored = (1L to 9L).map(i => (i, i.toDouble)).toDF("id", "score")
    val out = Sampling.bucketByScore(scored, "score")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 3L).forall(out(_) == "tail"))
    assert((4L to 6L).forall(out(_) == "middle"))
    assert((7L to 9L).forall(out(_) == "head"))
    // tier sizes on real data are balanced to within rounding/ties
    val q = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
    val sizes = Sampling.bucketByScore(q, "q")
      .groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("tail", "middle", "head"))
    assert(sizes.values.sum == docs.count())
    val n = docs.count().toDouble
    assert(sizes.values.forall(c => c > n / 6 && c < n / 2)) // ties allowed
    // invalid configs fail fast
    intercept[IllegalArgumentException] {
      Sampling.bucketByScore(scored, "score", cuts = Seq(0.8, 0.2),
        labels = Seq("a", "b", "c"))
    }
    intercept[IllegalArgumentException] {
      Sampling.bucketByScore(scored, "score", labels = Seq("a", "b"))
    }
  }
}
