package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler string similarity
  * (Winkler 1990, public literature; the standard record-linkage /
  * entity-resolution scorer for short names).
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order (b)): Spark
  * ships `levenshtein` but no Jaro–Winkler, and a Scala UDF would box
  * both strings per evaluation and fall out of whole-stage codegen. The
  * same pattern as Spark's own `Levenshtein` applies: `doGenCode` emits
  * a call to one shared static kernel ([[JaroWinkler.similarity]]), so
  * generated and interpreted paths are the SAME code — no result drift
  * between modes — and the expression stays inside codegen spans.
  *
  * Semantics are pinned to the cross-engine contract the
  * `text_jaro_winkler` gate proves against DuckDB's
  * `jaro_winkler_similarity` (validated case-by-case, including the
  * corner DuckDB chose): match window ⌊max(|a|,|b|)/2⌋−1,
  * half-transpositions /2, Winkler boost `p=0.1` over the first ≤4
  * agreeing chars applied only when jaro > 0.7, and EITHER side empty
  * → 0.0 (DuckDB returns 0 even for two empty strings — no
  * equal-strings shortcut). Comparison is per UTF-16 char; for the
  * ASCII dictionaries this operator targets that is identical to
  * DuckDB's byte-wise walk.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** One shared kernel for both execution modes. O(|a|·window) time,
    * two boolean scratch arrays — no per-call boxing beyond them.
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched chars out of order, counted pairwise
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var prefix = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
