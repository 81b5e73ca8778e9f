package graft.operators

import graft.SparkSpec

class MatryoshkaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("long prefix top-k overlaps the full-dim top-k") {
    val emb = graft.Tables(spark, sf).embeddings
    val full = Similarity.topKCosine(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pre = Similarity.topKCosineTruncated(emb, "vec_id", "embedding",
        0L, 10, dims = 56)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // the synthetic embeddings are RANDOM, not MRL-trained — short
    // prefixes rank near-independently (measured: dims=32 overlaps
    // 0/10). dims=56 keeps 7/8 of the mass and measured 4/10; pin a
    // conservative floor that a wrong slice (suffix, off-by-one)
    // would still break
    assert(pre.intersect(full).size >= 2,
      s"overlap ${pre.intersect(full).size}: full=$full pre=$pre")
  }

  test("dims = full dimension reproduces the untruncated ranking exactly") {
    val emb = graft.Tables(spark, sf).embeddings
    val full = Similarity.topKCosine(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val same = Similarity.topKCosineTruncated(emb, "vec_id", "embedding",
        1L, 10, dims = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == same)
  }

  test("truncation really scores on the prefix only") {
    val s = spark
    import s.implicits._
    // query (1,0,...) 4-dim; doc 10 matches in the PREFIX (first 2
    // dims), doc 11 only in the suffix — dims=2 must rank 10 first and
    // score 11 as orthogonal (dropped: zero-norm prefix has no cosine)
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (10L, Array(1f, 0f, 9f, 9f)),
      (11L, Array(0f, 0f, 1f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.topKCosineTruncated(emb, "vec_id", "embedding",
        0L, 2, dims = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((10L, 1.0)))
  }
}
