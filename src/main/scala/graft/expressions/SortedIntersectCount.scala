package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: |A ∩ B| for two SORTED long arrays via a
  * merge walk — the verify kernel of every set-similarity join (jaccard
  * = c / (|A| + |B| − c)).
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order (b)): the
  * built-in `size(array_intersect(a, b))` hashes one side per ROW-PAIR
  * (an O(|A|) allocation + build each time) and evaluates outside the
  * fused loop; on pre-sorted inputs — which the dedup pipeline already
  * materializes for its kernels — the merge walk is allocation-free and
  * stays inside whole-stage codegen. A verify join evaluates this once
  * per candidate pair: at 10⁹ candidates the difference is the stage.
  *
  * Inputs MUST be sorted ascending (the caller's invariant, as with the
  * sorted-hash arrays `ngramJaccardPairs`/`minhashNearDups` build); on
  * unsorted input the count is undefined. Duplicate elements count like
  * the multiset merge (matching the JVM kernels' semantics).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
