package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both dimensions): the rows
  * no other row dominates, where q dominates p iff q.x ≤ p.x ∧
  * q.y ≤ p.y with at least one strict — the classic "cheapest AND
  * smallest" multi-criteria shortlist (Börzsönyi et al., ICDE'01).
  * Exact duplicates on (x, y) do not dominate each other, so all
  * copies of a frontier point surface.
  *
  * Both dimensions must be integral (cents / sizes — the house
  * fixed-point contract), so every comparison is exact.
  *
  * Scale shape: the naive formulation is an n² NOT EXISTS. This one
  * is two passes, neither n²:
  *
  *  1. PREFILTER — bucket x into ≤ `buckets` fixed-width ranges (the
  *     bounds row is a broadcast 1-row cross join, no driver sync),
  *     take per-bucket min(y) (hash aggregate, map-side combined),
  *     running-min over STRICTLY EARLIER buckets (a ≤`buckets`-row
  *     window), broadcast back. A row with an earlier bucket's
  *     min-y ≤ its own y is dominated by that bucket's witness
  *     (strictly smaller x, no-larger y) and is dropped. On any
  *     non-adversarial distribution this leaves ~O(buckets + frontier)
  *     candidates out of n.
  *  2. EXACT — on the survivors only: running min(y) over x strictly
  *     less (RANGE frame to -1 on the integral x), plus the same-x
  *     partition min. p survives iff no strictly-smaller-x row has
  *     y ≤ p.y and no same-x row has y < p.y. The global-order window
  *     runs AFTER the prefilter, so its single-partition sort sees
  *     the candidate set, not the corpus.
  *
  * Worst case (x sorted ascending with y descending — every row on
  * the frontier) degrades to the frontier's own size, which is the
  * output; no pairs-shaped blow-up exists at any input.
  */
object Skyline {

  /** Skyline rows of `df` minimizing (`xCol`, `yCol`), both integral.
    * Output: `idCol`, `xCol`, `yCol` for each non-dominated row.
    */
  def skyline2dMin(
      df: DataFrame, idCol: String, xCol: String, yCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets")
    val base = df.select(col(idCol), col(xCol).cast("long").as("_x"),
      col(yCol).cast("long").as("_y"))
    val bounds = base.agg(min(col("_x")).as("_minx"),
      max(col("_x")).as("_maxx"))
    val bucketed = base.crossJoin(broadcast(bounds))
      .withColumn("_b", expr("CAST((_x - _minx) div " +
        s"greatest(CAST(1 AS BIGINT), (_maxx - _minx + $buckets) div $buckets) AS LONG)"))
      .drop("_minx", "_maxx")
    // per-bucket witness min, then min over strictly earlier buckets
    val bmin = bucketed.groupBy(col("_b")).agg(min(col("_y")).as("_by"))
      .withColumn("_prevMin",
        min(col("_by")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_b"), col("_prevMin"))
    val candidates = bucketed
      .join(broadcast(bmin), Seq("_b"))
      .filter(col("_prevMin").isNull || col("_prevMin") > col("_y"))
      .drop("_b", "_prevMin")
    // exact pass over the pruned candidate set
    val wLess = Window.orderBy(col("_x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy(col("_x"))
    candidates
      .withColumn("_minLess", min(col("_y")).over(wLess))
      .withColumn("_minSame", min(col("_y")).over(wSame))
      .filter((col("_minLess").isNull || col("_minLess") > col("_y")) &&
        col("_y") === col("_minSame"))
      .select(col(idCol), col("_x").as(xCol), col("_y").as(yCol))
  }
}
