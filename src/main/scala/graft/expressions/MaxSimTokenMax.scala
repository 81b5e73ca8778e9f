package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: the MaxSim inner loop — over an array of
  * doc token vectors, the MAXIMUM 6-dp-rounded cosine to one query
  * token vector.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order (b)): the
  * composed form `aggregate(tv, -inf, (acc, t) -> greatest(acc,
  * round(cosine_sim(t, q), 6)))` is correct but the higher-order
  * aggregate evaluates its lambda INTERPRETED per token with per-step
  * NaN guards in expression plumbing; MaxSim evaluates it |q tokens| ×
  * |doc tokens| times per document. This emits one fused Java loop —
  * cosine, HALF_UP 6-dp round, NaN skip, running max — inside
  * whole-stage codegen.
  *
  * Contract (bit-for-bit the composed form's):
  *  - cosine = dot/(‖t‖·‖q‖) over min length, per [[CosineSimilarity]];
  *  - finite cosines round via `BigDecimal.valueOf(c).setScale(6,
  *    HALF_UP)` — exactly Spark's `Round` on doubles — then `+ 0.0`
  *    (the signed-zero normalization of `Numerics.roundz`);
  *  - NaN cosines (zero-norm token) and NULL token elements are
  *    skipped; ±Inf passes through unrounded (Spark's Round contract);
  *  - no valid token → -Infinity (the caller's excluded-doc marker).
  */
case class MaxSimTokenMax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "maxsim_token_max"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val tv = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var ti = 0
    val nt = tv.numElements()
    while (ti < nt) {
      if (!tv.isNullAt(ti)) {
        val t = tv.getArray(ti)
        val n = math.min(t.numElements(), q.numElements())
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        var i = 0
        while (i < n) {
          val x = t.getDouble(i); val y = q.getDouble(i)
          dot += x * y; nx += x * x; ny += y * y
          i += 1
        }
        var c = dot / (math.sqrt(nx) * math.sqrt(ny))
        if (!java.lang.Double.isNaN(c)) {
          if (!java.lang.Double.isInfinite(c))
            c = java.math.BigDecimal.valueOf(c)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          c = c + 0.0
          if (c > best) best = c
        }
      }
      ti += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ti = ctx.freshName("ti")
      val nt = ctx.freshName("nt")
      val t = ctx.freshName("t")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |int $nt = $a.numElements();
         |for (int $ti = 0; $ti < $nt; $ti++) {
         |  if (!$a.isNullAt($ti)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $t = $a.getArray($ti);
         |    int $n = java.lang.Math.min($t.numElements(), $b.numElements());
         |    double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = $t.getDouble($i);
         |      double $y = $b.getDouble($i);
         |      $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |    }
         |    double $c = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |    if (!java.lang.Double.isNaN($c)) {
         |      if (!java.lang.Double.isInfinite($c)) {
         |        $c = java.math.BigDecimal.valueOf($c)
         |          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |      }
         |      $c = $c + 0.0;
         |      if ($c > $best) $best = $c;
         |    }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSimTokenMax =
    copy(left = newLeft, right = newRight)
}
