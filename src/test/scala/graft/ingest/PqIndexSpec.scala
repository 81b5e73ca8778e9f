package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def freshPath(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"pq-$name").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/idx"
  }

  private def exactTopK(queryId: Long, k: Int): Seq[Long] = {
    val q = AnnIndex.lookupVector(emb, "vec_id", "embedding", queryId)
    val qLit = array(q.toSeq.map(lit): _*)
    emb.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        graft.operators.Similarity.cosine(col("embedding").cast("array<double>"), qLit).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k).collect().map(_.getLong(0)).toSeq
  }

  test("codes have m entries, each within [0, ksub)") {
    val path = PqIndex.writeIvfPq(emb, "vec_id", "embedding",
      freshPath("shape"), numCentroids = 4, m = 8, ksub = 16)
    val codes = spark.read.parquet(path)
      .select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.nonEmpty)
    assert(codes.forall(_.size == 8))
    assert(codes.forall(_.forall(c => c >= 0 && c < 16)))
    // sidecars present and consistent
    val cb = spark.read.parquet(s"$path/_codebooks")
    assert(cb.count() == 8 * 16)
    assert(spark.read.parquet(s"$path/_centroids").count() == 4)
  }

  test("index build is deterministic across rebuilds") {
    // NOTE not across partitionings: the coarse k-means fit (Spark ml)
    // sums doubles in partition order, like any distributed float fit
    val a = PqIndex.writeIvfPq(emb.repartition(4), "vec_id", "embedding",
      freshPath("det-a"), numCentroids = 4, m = 8, ksub = 16)
    val b = PqIndex.writeIvfPq(emb.repartition(4), "vec_id", "embedding",
      freshPath("det-b"), numCentroids = 4, m = 8, ksub = 16)
    def dump(p: String) = spark.read.parquet(p)
      .select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    assert(dump(a) == dump(b))
  }

  test("ADC all-cell probe ranks true neighbours near the top") {
    val path = PqIndex.pqIndexFor(emb, "vec_id", "embedding", "spec001",
      numCentroids = 4, m = 8, ksub = 16)
    val q = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    val adc = PqIndex.ivfPqTopK(spark, path, "vec_id", "embedding",
        q, k = 50, nProbes = 4, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSeq
    assert(adc.size == 50)
    val exact = exactTopK(0L, 10)
    val overlap = exact.count(adc.contains)
    // PQ at 8×4-bit codes on random 64-dim data is a coarse sketch;
    // the shortlist property (true neighbours surface in a 10%-corpus
    // shortlist) is what the two-stage probe relies on
    assert(overlap >= 5, s"only $overlap/10 exact neighbours in ADC top-50")
  }

  test("rerank returns exact cosine scores over the ADC shortlist") {
    val path = PqIndex.pqIndexFor(emb, "vec_id", "embedding", "spec001",
      numCentroids = 4, m = 8, ksub = 16)
    val q = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    val got = PqIndex.ivfPqTopK(spark, path, "vec_id", "embedding",
        q, k = 10, nProbes = 4, excludeId = Some(0L),
        rerank = Some(emb), shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.size == 10)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
    // reranked scores must equal the brute-force cosine for those ids
    val brute = graft.operators.Similarity
      .topKCosine(emb, "vec_id", "embedding", 0L, 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, sim) =>
      assert(brute.get(id).forall(_ == sim), s"id $id sim $sim != ${brute.get(id)}")
    }
  }
}
