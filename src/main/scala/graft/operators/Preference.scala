package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair aggregation — the curation layer for RLHF /
  * arena-style comparison data: battles (model_a, model_b, outcome)
  * fold into per-matchup statistics and a tournament ranking.
  *
  * Everything is exact integer counting plus one final rounded
  * division per surfaced rate, so the whole family sits under the
  * cross-engine oracle (no fixed-point MLE by design — a converged
  * Bradley–Terry fit is float-iteration-order dependent and belongs
  * behind a spec, not a hash gate; [[bradleyTerryTwoStep]] instead
  * unrolls a FIXED MM step count with deterministic fold order, and
  * Copeland's majority-matchup score is the standard deterministic
  * tournament rank needing nothing beyond the win matrix).
  *
  * Scale shape: one hash aggregate over canonicalized pairs (a < b,
  * outcome flipped to match), then a model-scale explode of the
  * matchup frame — |models|² rows at most, broadcast territory; the
  * battle stream itself never shuffles twice.
  */
object Preference {

  /** Per-matchup stats on CANONICAL pairs (model_a < model_b;
    * outcomes flipped to match): battles, wins for each side, ties,
    * and a 6-dp win rate for the lower-id side. `outcome`: 0 = first
    * model won, 1 = second won, 2 = tie; anything else raises.
    */
  def winMatrix(
      battles: DataFrame, aCol: String, bCol: String,
      outcomeCol: String): DataFrame = {
    val oc = col(outcomeCol).cast("long")
    val checked = when(oc.isin(0L, 1L, 2L), oc)
      .otherwise(raise_error(concat(
        lit("winMatrix: outcome must be 0|1|2, got "), oc)))
    // a non-integral or null model id would cast to null, making
    // least/greatest/inequality silently drop the row (an empty
    // matrix, not an error) — so the cast is VALIDATED: any id that
    // does not survive the long cast raises, matching the outcome
    // check's style
    def checkedId(c: String) = {
      // try_cast, not cast: under ANSI a malformed id raises a generic
      // CAST_INVALID_INPUT and with ANSI off it silently nulls — this
      // pins ONE deterministic, named failure either way
      val casted = col(c).try_cast("long")
      when(casted.isNotNull, casted).otherwise(raise_error(concat(
        lit(s"winMatrix: model id in '$c' must be integral, got "),
        coalesce(col(c).cast("string"), lit("null")))))
    }
    val ida = checkedId(aCol)
    val idb = checkedId(bCol)
    val canon = battles.select(
      least(ida, idb).as("model_a"),
      greatest(ida, idb).as("model_b"),
      when(ida <= idb, checked)
        .otherwise(
          // flipped pair: swap win sides, ties stay ties
          when(checked === 0L, lit(1L)).when(checked === 1L, lit(0L))
            .otherwise(lit(2L))).as("_o"))
      .filter(col("model_a") =!= col("model_b"))
    canon.groupBy(col("model_a"), col("model_b"))
      .agg(count(lit(1)).as("n_battles"),
        sum(when(col("_o") === 0L, 1L).otherwise(0L)).as("wins_a"),
        sum(when(col("_o") === 1L, 1L).otherwise(0L)).as("wins_b"),
        sum(when(col("_o") === 2L, 1L).otherwise(0L)).as("ties"))
      .withColumn("win_rate_a", Numerics.roundz(
        col("wins_a").cast("double") / col("n_battles"), 6))
  }

  /** Copeland tournament ranking over the [[winMatrix]]: a matchup is
    * WON by the side with strictly more wins (ties in the matchup
    * majority count for neither). copeland = matchups won − matchups
    * lost; equal scores share a dense rank, so the readout is
    * reproducible under re-partitioning. The rank window is global —
    * fine on a model-scale (not corpus-scale) frame.
    */
  def copelandRanking(
      battles: DataFrame, aCol: String, bCol: String,
      outcomeCol: String): DataFrame = {
    val m = winMatrix(battles, aCol, bCol, outcomeCol)
    val perSide = m.select(col("model_a").as("model"),
        when(col("wins_a") > col("wins_b"), 1L).otherwise(0L).as("_w"),
        when(col("wins_b") > col("wins_a"), 1L).otherwise(0L).as("_l"))
      .unionByName(m.select(col("model_b").as("model"),
        when(col("wins_b") > col("wins_a"), 1L).otherwise(0L).as("_w"),
        when(col("wins_a") > col("wins_b"), 1L).otherwise(0L).as("_l")))
    val scored = perSide.groupBy(col("model"))
      .agg(count(lit(1)).as("n_matchups"), sum(col("_w")).as("won"),
        sum(col("_l")).as("lost"))
      .withColumn("copeland", col("won") - col("lost"))
    val w = Window.orderBy(col("copeland").desc)
    scored.withColumn("rank", dense_rank().over(w))
      .select(col("model"), col("n_matchups"), col("won"), col("lost"),
        col("copeland"), col("rank").cast("long").as("rank"))
  }

  /** Two fixed minorization–maximization steps of the Bradley–Terry
    * strength fit (Hunter 2004's MM update π'_i = W_i / Σ_j
    * n_ij/(π_i+π_j)), from the uniform start π=1 — decisive battles
    * only, ties excluded. NOT the fixed point (which is float-
    * iteration-order dependent and stays spec-side per the object
    * doc); a FIXED unrolled step count with deterministic fold order
    * is hash-gateable, the same trick as the unrolled PageRank gates.
    *
    *   step 1 from π=1: π¹_i = W_i / (G_i/2) = 2·W_i/G_i — exact
    *   integer-ratio doubles;
    *   step 2 folds Σ_j n_ij/(π¹_i+π¹_j) in opponent order (sorted
    *   collect over a models-scale frame), so the oracle replays it
    *   with `list_sum(list(… ORDER BY j))`.
    *
    * π¹_i+π¹_j > 0 whenever i,j met decisively (their head-to-head
    * had a winner, so at least one of them has a win), so the step-2
    * division is total. Scale: one shuffle over the battle stream to
    * the participant frame; everything after is |models|²-bounded.
    */
  def bradleyTerryTwoStep(
      battles: DataFrame, aCol: String, bCol: String,
      outcomeCol: String): DataFrame = {
    val oc = col(outcomeCol).cast("long")
    val dec = battles.filter(oc.isin(0L, 1L))
      .select(col(aCol).cast("long").as("_a"),
        col(bCol).cast("long").as("_b"), oc.as("_o"))
    val part = dec.select(col("_a").as("_m"), col("_b").as("_j"),
        when(col("_o") === 0L, 1L).otherwise(0L).as("_w"))
      .unionByName(dec.select(col("_b").as("_m"), col("_a").as("_j"),
        when(col("_o") === 1L, 1L).otherwise(0L).as("_w")))
    val nij = part.groupBy(col("_m"), col("_j"))
      .agg(count(lit(1)).as("_n"))
    val pi1 = part.groupBy(col("_m"))
      .agg(sum(col("_w")).as("wins"), count(lit(1)).as("games"))
      .withColumn("_pi1",
        lit(2.0) * col("wins").cast("double") / col("games").cast("double"))
    val den = nij
      .join(pi1.select(col("_m"), col("_pi1")), Seq("_m"))
      .join(pi1.select(col("_m").as("_j"), col("_pi1").as("_pij")),
        Seq("_j"))
      .groupBy(col("_m"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("_j"),
          (col("_n").cast("double") / (col("_pi1") + col("_pij")))
            .as("_t")))),
        lit(0.0), (acc, s) => acc + s.getField("_t")).as("_den"))
    pi1.join(den, Seq("_m"))
      .select(col("_m").as("model"), col("wins"), col("games"),
        Numerics.roundz(col("_pi1"), 6).as("pi1"),
        Numerics.roundz(
          col("wins").cast("double") / col("_den"), 6).as("pi2"))
  }
}
