package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A-priori frequent-pair mining (Agrawal & Srikant 1994, levels 1-2)
  * — the market-basket co-occurrence report: which item pairs appear
  * together in at least `minSupport` baskets. A training-data pipeline
  * uses the same shape for tag/label co-occurrence and for
  * prompt-template × source contingency audits.
  *
  * Scale shape, in order:
  *  1. basket-item DISTINCT — one fact-scale shuffle keyed by
  *     (basket, item), the only corpus-scale exchange;
  *  2. level-1 prune — item supports are vocabulary-bounded; items
  *     below `minSupport` CANNOT belong to a frequent pair (the
  *     a-priori monotonicity), so they drop before any pair forms,
  *     and the surviving item list broadcasts;
  *  3. the within-basket self-join generates Σ_b |frequent items in
  *     b|² candidates — bounded by the prune, the classic a-priori
  *     bound (PCY bucket hashing slots in here if level-1 survives
  *     too much);
  *  4. pair supports aggregate on a ≤|vocab|² domain.
  *
  * All outputs are exact integers (support, per-item counts, basket
  * total) so confidence/lift divisions happen downstream, engine-
  * agnostic.
  */
object FrequentItemsets {

  def frequentPairs(
      df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport > 0, s"minSupport must be positive, got $minSupport")
    val items = df
      .select(col(basketCol).cast("string").as("_basket"),
        col(itemCol).cast("string").as("_item"))
      .filter(col("_item").isNotNull && col("_basket").isNotNull)
      .distinct()
    val freq = items.groupBy("_item")
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= minSupport)
    val fi = items.join(broadcast(freq), Seq("_item"))
    val tot = items.agg(countDistinct(col("_basket")).as("n_baskets"))
    val a = fi.select(col("_basket"), col("_item").as("item_a"),
      col("_cnt").as("count_a"))
    val b = fi.select(col("_basket"), col("_item").as("item_b"),
      col("_cnt").as("count_b"))
    a.join(b, Seq("_basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"), col("count_a"), col("count_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .crossJoin(broadcast(tot))
      .select(col("item_a"), col("item_b"), col("support"),
        col("count_a"), col("count_b"), col("n_baskets"))
  }

  /** Directional association rules from the [[frequentPairs]] output:
    * each frequent pair unfolds to antecedent→consequent BOTH ways
    * with confidence = support/count(antecedent) and
    * lift = support·n_baskets / (count_a·count_b) — the "customers
    * who X also Y" readout with the base-rate correction that keeps
    * popular items from dominating. The expensive part (pair support)
    * is the one basket-keyed join inside frequentPairs; the rule
    * unfold is a 2× projection of the pair-bounded frame. Lift
    * multiplies count_a·count_b as DOUBLES (the ARI overflow lesson);
    * confidence/lift are the only floats, rounded at 6.
    */
  def associationRules(
      df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, minConfidencePct: Long = 0L): DataFrame = {
    val pairs = frequentPairs(df, basketCol, itemCol, minSupport)
    val fwd = pairs.select(col("item_a").as("antecedent"),
      col("item_b").as("consequent"), col("support"),
      col("count_a").as("n_antecedent"), col("count_b").as("n_consequent"),
      col("n_baskets"))
    val rev = pairs.select(col("item_b").as("antecedent"),
      col("item_a").as("consequent"), col("support"),
      col("count_b").as("n_antecedent"), col("count_a").as("n_consequent"),
      col("n_baskets"))
    fwd.unionByName(rev)
      // integer-exact confidence threshold: 100·support ≥ pct·n_ant
      .filter(lit(100) * col("support") >=
        lit(minConfidencePct) * col("n_antecedent"))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_antecedent"), col("n_consequent"),
        Numerics.roundz(col("support").cast("double") /
          col("n_antecedent").cast("double"), 6).as("confidence"),
        Numerics.roundz(col("support").cast("double") *
          col("n_baskets").cast("double") /
          (col("n_antecedent").cast("double") *
            col("n_consequent").cast("double")), 6).as("lift"))
  }
}
