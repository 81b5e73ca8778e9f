package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, GreaterThan, GreaterThanOrEqual, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Custom optimizer rule (SURVEY.md §7.3 preference order (c), the
  * `Rule[LogicalPlan]` rung next to the AsOfJoin `SparkStrategy`):
  * derive cheap size prefilters for intersection-count thresholds.
  *
  * `sorted_intersect_count(a, b) >= k` implies `size(a) >= k` and
  * `size(b) >= k` — |A∩B| can never exceed either side. `Size` is O(1)
  * on an array column while the merge walk is O(|a|+|b|), so
  * prepending the derived conjuncts lets the Filter's short-circuit
  * skip the walk for every pair that cannot possibly pass (conjuncts
  * evaluate left-to-right in generated code). On a decontamination /
  * overlap-verify join the skipped pairs are the short-document
  * majority.
  *
  * The rule runs in the extension batch AFTER the main optimizer, so
  * the derived predicates are NOT further pushed through joins in the
  * same pass — the win here is per-row short-circuiting at the Filter
  * itself; a caller that wants scan-level pruning states `size(...)`
  * bounds explicitly (as [[graft.operators.Dedup.ngramJaccardPairs]]'s
  * prefix filter already does). Sound for >= and > against a
  * non-negative integral literal; idempotent (derived conjuncts are
  * semantic-checked before being added, so a second application — or
  * a second install — is a no-op).
  */
object IntersectPrefilterRule extends Rule[LogicalPlan] {

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  private def sizeGe(arr: Expression, lit: Literal): Expression = {
    val s = Size(arr)
    if (lit.dataType == IntegerType) GreaterThanOrEqual(s, lit)
    else GreaterThanOrEqual(Cast(s, lit.dataType), lit)
  }

  private def derivedFor(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(sic: SortedIntersectCount, l: Literal)
        if l.value != null =>
      Seq(sizeGe(sic.left, l), sizeGe(sic.right, l))
    case GreaterThan(sic: SortedIntersectCount, l: Literal)
        if l.value != null =>
      // c > k implies c >= k (+1 would also hold; >= k is sound and
      // keeps the literal untouched across integral types)
      Seq(sizeGe(sic.left, l), sizeGe(sic.right, l))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitAnd(cond)
      val derived = conjuncts.flatMap(derivedFor)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter(And(derived.reduce(And), cond), child)
  }
}

object IntersectPrefilter {

  /** Install the rule on the session (idempotent). Uses the public
    * `experimental.extraOptimizations` hook so ad-hoc sessions get it
    * with one call; [[GraftExtensions]] injects the same rule for
    * sessions built with `spark.sql.extensions`.
    */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(IntersectPrefilterRule)) {
      spark.experimental.extraOptimizations = cur :+ IntersectPrefilterRule
    }
  }
}
