package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over a bounded graph (the near-dup similarity
  * graph, a domain-link graph, ...) — the centrality signal data
  * curation pipelines use to pick canonical survivors and weight
  * sources. Brin & Page 1998 power iteration, damping d = 0.85.
  *
  * ALL arithmetic is 64-bit integer at a fixed 1e12 scale: rank_fp =
  * floor(rank · 1e12). Integer sums are order-independent and
  * engine-identical, so a fixed iteration count is EXACTLY reproducible
  * by unrolled SQL (`//` in DuckDB, `div` in Spark) — no float-sum
  * nondeterminism, no decimal-division scale-rule mismatch. The
  * truncation bias per step is < 1e-12 · degree, orders below any
  * ranking decision.
  *
  * Dangling mass (nodes with no out-edges keep their rank out of
  * circulation) is dropped, the standard simplification for similarity
  * graphs where isolated nodes are the common case and only relative
  * order within components matters.
  *
  * Scale: each iteration is one join of the edge list against the
  * current ranks plus one groupBy on dst — both keyed shuffles bounded
  * by |E|, which for a near-dup graph is output-bounded (pairs over
  * threshold), not corpus-bounded. Ranks are checkpointed per round so
  * the plan does not grow with the iteration count.
  *
  * Reference scope: extension surface (SURVEY.md §2.6) — the reference
  * has no graph operators.
  */
object PageRank {

  val Scale: Long = 1000000000000L

  /** (id, rank_fp) for EVERY node in `nodes` — total assignment, like
    * a cluster labelling. `edges` is directed (src, dst); symmetrize
    * before calling for an undirected graph.
    *
    * rank⁰ = SCALE div N;
    * rankⁱ⁺¹(v) = (15·SCALE) div (100·N)
    *            + (85 · Σ_{u→v} (rankⁱ(u) div deg(u))) div 100.
    */
  def pagerank(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "at least one power iteration")
    val n = nodes.select(col(idCol)).distinct().localCheckpoint(true)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree travels with the edge so each iteration's contribution is
    // a single projection over the pre-joined frame
    val eDeg = e.join(deg, "src").localCheckpoint(true)
    val nCount = n.count()
    val base = (15L * Scale) / (100L * nCount)
    var ranks = n.select(col(idCol).as("id"), lit(Scale / nCount).as("r"))
    var i = 0
    while (i < iterations) {
      val inMass = eDeg
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("m"))
      ranks = n.select(col(idCol).as("id"))
        .join(inMass.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("85 * coalesce(m, 0L) div 100")).as("r"))
        .localCheckpoint(true)
      i += 1
    }
    ranks.select(col("id").as(idCol), col("r").as("rank_fp"))
  }
}
