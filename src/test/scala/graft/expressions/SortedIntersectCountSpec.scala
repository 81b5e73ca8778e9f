package graft.expressions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {

  test("merge-walk count equals size(array_intersect) on distinct sorted arrays") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sets = docs.select(col("doc_id"),
      array_sort(transform(array_distinct(Dedup.words("text")),
        w => xxhash64(w))).as("hs"))
    val pairs = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .limit(5000)
      .select(
        call_function("sorted_intersect_count", col("a.hs"), col("b.hs")).as("fast"),
        size(array_intersect(col("a.hs"), col("b.hs"))).as("builtin"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("jaccardSorted equals the kernel-computed jaccard on real pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kernel = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sets = docs.select(col("doc_id"),
      array_sort(transform(array_distinct(Dedup.words("text")),
        w => xxhash64(w))).as("hs"))
    val expr = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Dedup.jaccardSorted(spark, col("a.hs"), col("b.hs")).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(expr.keySet == kernel.keySet)
    expr.foreach { case (k, v) =>
      assert(math.abs(v - kernel(k)) < 1e-12, s"$k: $v vs ${kernel(k)}")
    }
    assert(expr.nonEmpty)
  }

  test("interpreted fallback equals codegen path") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L), Array(2L, 3L, 4L)),
      (Array(1L, 1L, 2L), Array(1L, 1L, 1L)), // multiset merge semantics
      (Array.empty[Long], Array(1L))).toDF("a", "b")
    val viaExpr = df.select(
      call_function("sorted_intersect_count", col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(viaExpr == Seq(2, 2, 0))
    // interpreted path: evaluate the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    def lit64(xs: Seq[Long]) =
      Literal.create(ArrayData.toArrayData(xs.toArray),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val interp = SortedIntersectCount(
      lit64(Seq(1L, 1L, 2L)), lit64(Seq(1L, 1L, 1L))).eval(null)
    assert(interp == 2)
  }
}
