package graft.expressions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native expression equals the HOF formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val q = emb.limit(1).select(col("embedding")).collect().head
      .getAs[scala.collection.Seq[Float]](0)
    val qLit = array(q.toSeq.map(v => lit(v)): _*)
    val both = emb.select(
      call_function("cosine_sim", col("embedding"), qLit).as("fast"),
      Similarity.cosine(col("embedding"), qLit).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    }
    assert(both.length == emb.count())
  }

  test("expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = emb.select(
      call_function("cosine_sim", col("embedding"), col("embedding")).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // codegen'd spans print with *(n) prefixes; the projection holding
    // cosine_sim must be inside one
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, plan)
  }

  test("SQL registration via extensions builder shape") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_cs")
    val r = spark.sql(
      "SELECT round(cosine_sim(embedding, embedding), 9) AS s FROM emb_cs LIMIT 5")
      .collect()
    assert(r.forall(_.getDouble(0) == 1.0))
  }

  test("implicit cast lets float arrays flow in directly") {
    GraftFunctions.register(spark)
    // embeddings are array<float>; no explicit cast in the call
    val s = emb.select(
      call_function("cosine_sim", col("embedding"), col("embedding")))
      .collect().head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)
  }
}
