package graft.expressions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

class StripAccentsSpec extends SparkSpec {

  private def sa(s: String): String =
    StripAccents.strip(UTF8String.fromString(s)).toString

  test("combining-mark letters fold to bare base (DuckDB strip_accents parity)") {
    // values cross-checked against DuckDB `strip_accents` one by one
    assert(sa("é") == "e"); assert(sa("è") == "e"); assert(sa("ê") == "e")
    assert(sa("ë") == "e"); assert(sa("á") == "a"); assert(sa("ä") == "a")
    assert(sa("ï") == "i"); assert(sa("ö") == "o"); assert(sa("ü") == "u")
    assert(sa("ñ") == "n"); assert(sa("ç") == "c"); assert(sa("ý") == "y")
    assert(sa("å") == "a"); assert(sa("É") == "E"); assert(sa("Ñ") == "N")
    assert(sa("Café Noël déjà") == "Cafe Noel deja")
  }

  test("no canonical decomposition → kept verbatim, not transliterated") {
    // DuckDB keeps all three; mark removal is NOT transliteration
    assert(sa("ß") == "ß")
    assert(sa("ø") == "ø")
    assert(sa("œ") == "œ")
    assert(sa("Sørensen Œuvre Größe") == "Sørensen Œuvre Große")
  }

  test("pure-ASCII input is an identity (and the zero-copy fast path)") {
    val in = UTF8String.fromString("plain ascii, unchanged! 123")
    assert(StripAccents.strip(in) eq in)
    assert(sa("") == "")
  }

  test("codegen and interpreted agree, and the call stays in codegen") {
    val s = spark
    GraftFunctions.register(s)
    val vals = Seq("Café", "Größe", "naïve", "ascii", "Ångström")
    val df = s.createDataFrame(
      s.sparkContext.parallelize(vals.map(Row(_)), 2),
      StructType(Seq(StructField("t", StringType))))
      .withColumn("f", call_function("strip_accents", col("t")))
    val fromPlan = df.collect().map(_.getString(1))
    assert(fromPlan.toSeq == vals.map(sa))
    val ks = df.queryExecution.executedPlan.collect {
      case p => p.getClass.getSimpleName
    }
    assert(ks.exists(_.contains("WholeStageCodegen")),
      s"strip_accents fell out of codegen: $ks")
  }

  test("normalizeForMatch: lower, fold, collapse, trim") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val df = Seq("  Déjà   Vu\tÜber ", "Größe  naïve").toDF("t")
      .select(TextAnalysis.normalizeForMatch(col("t")).as("n"))
    assert(df.as[String].collect().toSeq == Seq("deja vu uber", "große naive"))
  }

  test("null input yields null") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val df = Seq(Option.empty[String], Option("é")).toDF("t")
      .withColumn("f", call_function("strip_accents", col("t")))
    val got = df.collect()
    assert(got.exists(_.isNullAt(1)) && got.exists(r => !r.isNullAt(1)))
  }
}
