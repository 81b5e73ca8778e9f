package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic record-linkage reference values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(jw("a", "a") == 1.0)
    assert(jw("small ring", "small king") == 0.96)
  }

  test("edge semantics pinned to the DuckDB contract") {
    // EITHER side empty → 0.0, including both empty (DuckDB has no
    // equal-strings shortcut); window 0 on length-2 swaps → no matches
    assert(jw("", "") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("ab", "ba") == 0.0)
    assert(jw("x", "y") == 0.0)
  }

  test("boost applies only above 0.7 and caps the prefix at 4") {
    // jaro("small ring","hot gear") < 0.7 → no boost
    assert(math.abs(jw("small ring", "hot gear") - 0.4472222222222222) < 1e-12)
    // long shared prefix: boost uses min(4, prefix)
    val base = jw("abcdefgh", "abcdexgh")
    val jaro = (7.0 / 8 + 7.0 / 8 + 7.0 / 7) / 3
    assert(math.abs(base - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("codegen and interpreted modes agree, and the call stays in codegen") {
    val s = spark
    GraftFunctions.register(s)
    // RDD-backed, not a LocalRelation — ConvertToLocalRelation would
    // otherwise fold the expression before any codegen happens
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""),
      ("small ring", "small king")).map { case (a, b) => Row(a, b) }
    val df = s.createDataFrame(
      s.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
      .withColumn("jw", call_function("jaro_winkler", col("a"), col("b")))
    val fromPlan = df.collect().map(_.getDouble(2))
    val direct = Seq(jw("martha", "marhta"), jw("dixon", "dicksonx"),
      jw("", ""), jw("small ring", "small king"))
    fromPlan.zip(direct).foreach { case (p, d) => assert(p == d) }
    val ks = df.queryExecution.executedPlan.collect {
      case p => p.getClass.getSimpleName
    }
    assert(ks.exists(_.contains("WholeStageCodegen")),
      s"jaro_winkler fell out of codegen: $ks")
  }

  test("null inputs yield null") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val df = Seq((Option("a"), Option.empty[String]),
      (Option.empty[String], Option("b"))).toDF("a", "b")
      .withColumn("jw", call_function("jaro_winkler", col("a"), col("b")))
    assert(df.collect().forall(_.isNullAt(2)))
  }
}
