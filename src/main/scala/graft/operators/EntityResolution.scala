package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution over a name/title dictionary: blocking →
  * pairwise Jaro–Winkler scoring → transitive clustering. The
  * classical record-linkage pipeline (Fellegi–Sunter framing, Winkler
  * 1990 scoring; blocking per the survey literature, e.g. Christen
  * 2012) composed from this repo's own primitives — the
  * [[graft.expressions.JaroWinkler]] codegen'd expression for the
  * scorer and [[ConnectedComponents]] for the transitive closure.
  *
  * Why blocking: JW admits no sound pruning bound (unlike the q-gram
  * count filter backing [[EditDistance]]), so scalable ER REQUIRES a
  * candidate-restriction contract. The standard one is multi-pass
  * blocking: score only pairs that agree on at least one cheap block
  * key, here the lowercase 2-char prefix OR 2-char suffix. Multiple
  * passes recover most pairs a single key would miss (a leading typo
  * still matches on the suffix key); pairs disagreeing on every key
  * are unscored BY DESIGN — that trade-off is the operator's contract,
  * stated rather than hidden, and the oracle enforces the exact same
  * blocking.
  *
  * 100 TB shape: each pass is a hash equi-join on the block key (never
  * a nested loop — plan-locked by the gate), so candidate volume is
  * Σ_blocks |b|², bounded by the key's selectivity, not corpus².
  * Scoring runs inside codegen on the joined rows; clustering reuses
  * the O(log n)-round label propagation. Skewed blocks (a dominant
  * 2-char prefix) are the same hazard as any skewed join key — at
  * cluster scale pair a hot-block salt or a frequency cap with this
  * operator; the gate's dictionary keys are near-uniform.
  */
object EntityResolution {

  /** Scored candidate pairs (id_a < id_b, jw ≥ threshold), each pair
    * scored once no matter how many block keys it shares. `threshold`
    * compares against the 6-dp-ROUNDED score — the cross-engine
    * contract (a raw `>=` on an unrounded double would let a 1-ulp
    * engine difference flip pairs at the boundary).
    */
  def scoredPairs(
      df: DataFrame, strCol: String, idCol: String,
      threshold: Double, prefixLen: Int = 2): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    graft.expressions.GraftFunctions.register(spark)
    val base = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // multi-pass blocking: prefix key and (tagged) suffix key; one
    // frame, exploded — the join below stays a single hash join
    val keyed = base.select(col("id"), col("s"),
      explode(array(
        substring(lower(col("s")), 1, prefixLen),
        // tag the suffix pass so its keyspace never collides with the
        // prefix pass (an untagged collision would silently widen both
        // blocks' candidate sets)
        concat(lit("sfx:"), expr(s"right(lower(s), $prefixLen)")))).as("bk"))
    val a = keyed.select(col("bk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = keyed.select(col("bk"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      // a pair agreeing on both keys arrives twice — dedup BEFORE the
      // scorer so each survivor is scored exactly once
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      .withColumn("jw",
        round(call_function("jaro_winkler", col("s_a"), col("s_b")), 6))
      .filter(col("jw") >= threshold)
      .select(col("id_a"), col("id_b"), col("jw"))
  }

  /** Every input row labelled with its entity cluster: the min id
    * reachable through the ≥-threshold match graph, the row's own id
    * when nothing matched (singletons keep their identity — ER output
    * is a total assignment, not just the matched subset).
    */
  def clusters(
      df: DataFrame, strCol: String, idCol: String,
      threshold: Double, prefixLen: Int = 2): DataFrame = {
    val pairs = scoredPairs(df, strCol, idCol, threshold, prefixLen)
    val comp = ConnectedComponents.components(pairs, "id_a", "id_b")
    df.select(col(idCol).cast("long").as("id"))
      .join(comp.select(col("node").as("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
  }
}
