package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntersectPrefilterRuleSpec extends SparkSpec {

  private def frame(): DataFrame = {
    val s = spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // RDD-backed, not a LocalRelation — ConvertToLocalRelation would
    // otherwise evaluate the whole filter at optimization time and the
    // plan under test disappears (the JaroWinklerSpec lesson)
    val rows = Seq(
      Row(1L, Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L, 9L)), // overlap 3
      Row(2L, Seq(1L, 2L), Seq(1L, 2L)), // overlap 2, sizes 2
      Row(3L, Seq(5L), Seq(5L, 6L, 7L))) // overlap 1, left size 1
    s.createDataFrame(s.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType),
        StructField("a", ArrayType(LongType)),
        StructField("b", ArrayType(LongType)))))
  }

  test("derived size conjuncts appear in the optimized plan") {
    val s = spark
    GraftFunctions.register(s)
    IntersectPrefilter.install(s)
    val df = frame().filter(
      call_function("sorted_intersect_count", col("a"), col("b")) >= 3)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("size("),
      s"no derived size prefilter in: $optimized")
    // both sides guarded
    assert("size\\(".r.findAllIn(optimized).length >= 2, optimized)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("rule changes no results, only the plan") {
    val s = spark
    GraftFunctions.register(s)
    val base = frame()
    def run(threshold: Int): Seq[Long] =
      base.filter(call_function("sorted_intersect_count",
          col("a"), col("b")) >= threshold)
        .collect().map(_.getLong(0)).toSeq.sorted
    IntersectPrefilter.install(s)
    val withRule = (1 to 4).map(run)
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations.filterNot(_ == IntersectPrefilterRule)
    try {
      val without = (1 to 4).map(run)
      assert(withRule == without)
    } finally IntersectPrefilter.install(s)
  }

  test("idempotent: double install and double application add nothing") {
    val s = spark
    GraftFunctions.register(s)
    IntersectPrefilter.install(s)
    IntersectPrefilter.install(s)
    assert(s.experimental.extraOptimizations
      .count(_ == IntersectPrefilterRule) == 1)
    val df = frame().filter(
      call_function("sorted_intersect_count", col("a"), col("b")) >= 2)
    val once = IntersectPrefilterRule(df.queryExecution.optimizedPlan)
    val twice = IntersectPrefilterRule(once)
    assert(once == twice, "second application must be a no-op")
  }

  test("non-matching filters pass through untouched") {
    val s = spark
    IntersectPrefilter.install(s)
    val df = frame().filter(col("id") >= 2)
    assert(df.count() == 2)
    assert(!df.queryExecution.optimizedPlan.toString.contains("size("))
  }
}
