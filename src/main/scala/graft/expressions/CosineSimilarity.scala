package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order (b)): the
  * built-in formulation `aggregate(zip_with(a,b,*), 0d, +) / (norm·norm)`
  * is correct but its higher-order lambdas evaluate INTERPRETED, per
  * element, and allocate an intermediate array per row-pair. This
  * expression emits a single fused Java loop via `doGenCode` — no
  * allocation, stays inside whole-stage codegen — which matters when a
  * similarity join evaluates it 10⁹ times. Interpreted fallback
  * (`nullSafeEval`) implements the identical fold order, so results are
  * bit-for-bit equal between modes.
  *
  * Both inputs implicit-cast to array<double> (so array<float> embedding
  * columns work directly). Arrays must be equal length; null elements are
  * treated as 0 by Spark's ArrayData.getDouble contract caveat — callers
  * hold the no-null-elements invariant embeddings satisfy.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Function registration — both paths:
  *  - [[GraftFunctions.register]] for an existing session (used by the
  *    operators lazily), and
  *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions` /
  *    `spark.sql.extensions=graft.expressions.GraftExtensions`, the
  *    deployment-grade injection point.
  */
object GraftFunctions {

  /** Builder: inputs are cast to array<double> here (AbstractDataType /
    * ImplicitCastInputTypes are private[sql], so the cast lives in the
    * builder instead) — float embedding columns work directly.
    */
  def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "cosine_sim(a, b) takes two arrays")
    CosineSimilarity(
      Cast(exprs.head, ArrayType(DoubleType)),
      Cast(exprs(1), ArrayType(DoubleType)))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", buildIntersect, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", buildBloomProbe, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", buildJaroWinkler, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents", buildStripAccents, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "maxsim_token_max", buildMaxSimTokenMax, "scala_udf")
  }

  /** Builder for [[MaxSimTokenMax]]; inputs cast to array<array<double>>
    * resp. array<double> (the same private[sql] ImplicitCastInputTypes
    * workaround as [[build]]).
    */
  def buildMaxSimTokenMax(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "maxsim_token_max(token_vecs, query_vec) takes two args")
    MaxSimTokenMax(
      Cast(exprs.head, ArrayType(ArrayType(DoubleType))),
      Cast(exprs(1), ArrayType(DoubleType)))
  }

  /** Builder for [[StripAccents]]; input cast to string (same
    * private[sql] ImplicitCastInputTypes workaround as [[build]]).
    */
  def buildStripAccents(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "strip_accents(s) takes one string")
    StripAccents(Cast(exprs.head, org.apache.spark.sql.types.StringType))
  }

  /** Builder for [[JaroWinkler]]; inputs cast to string here (same
    * private[sql] ImplicitCastInputTypes workaround as [[build]]).
    */
  def buildJaroWinkler(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "jaro_winkler(a, b) takes two strings")
    JaroWinkler(
      Cast(exprs.head, org.apache.spark.sql.types.StringType),
      Cast(exprs(1), org.apache.spark.sql.types.StringType))
  }

  /** Builder exposing Catalyst's codegen'd `BloomFilterMightContain`
    * (the engine's own runtime-filter probe) for [[graft.operators
    * .BloomJoin]]: arg 0 is the serialized filter as a foldable binary
    * literal, arg 1 the probe key (cast to long — the filter is built
    * over long keys by `DataFrameStatFunctions.bloomFilter`, and both
    * sides address the same `putLong`/`mightContainLong` hash path).
    */
  def buildBloomProbe(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "bloom_might_contain(filter, key) takes two args")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      exprs.head, Cast(exprs(1), org.apache.spark.sql.types.LongType))
  }

  /** Builder for [[SortedIntersectCount]] — inputs must already be
    * array<long> sorted ascending (the dedup kernels' invariant); no
    * implicit cast, a wrong type should fail analysis loudly.
    */
  def buildIntersect(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "sorted_intersect_count(a, b) takes two arrays")
    SortedIntersectCount(exprs.head, exprs(1))
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => GraftFunctions.build(exprs)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => GraftFunctions.buildIntersect(exprs)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => GraftFunctions.buildBloomProbe(exprs)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => GraftFunctions.buildJaroWinkler(exprs)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("strip_accents"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[StripAccents].getName, "strip_accents"),
      (exprs: Seq[Expression]) => GraftFunctions.buildStripAccents(exprs)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("maxsim_token_max"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MaxSimTokenMax].getName, "maxsim_token_max"),
      (exprs: Seq[Expression]) => GraftFunctions.buildMaxSimTokenMax(exprs)))
    ext.injectOptimizerRule(_ => IntersectPrefilterRule)
  }
}
