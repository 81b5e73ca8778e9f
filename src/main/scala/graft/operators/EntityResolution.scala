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
  * 2-char prefix — real name dictionaries are Zipfian) are the
  * classic quadratic-task hazard: [[scoredPairsCapped]] bounds it with
  * the standard blocking mitigation (Christen 2012 §4.2) — hot keys
  * are SUB-BLOCKED by extending the key, and keys still over the cap
  * after extension are DROPPED, so no block ever exceeds `maxBlock`
  * and per-task work is provably ≤ maxBlock² per block. [[scoredPairs]]
  * stays the uncapped contract for near-uniform dictionaries.
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
    scoreKeyed(keyed, threshold)
  }

  /** Skew-hardened scored pairs: same multi-pass blocking and scoring
    * as [[scoredPairs]], but no block is ever allowed to exceed
    * `maxBlock` rows. A key over the cap is SUB-BLOCKED once — the key
    * is extended with the next `subLen` lowercase chars (prefix pass:
    * the chars after the prefix; suffix pass: the chars before the
    * suffix) — and an extended key STILL over the cap is dropped
    * entirely: its pairs are unscored by declared contract, the same
    * stated trade-off as blocking itself. Result: candidate volume per
    * key ≤ maxBlock², so one Zipf-hot key ("ma", "jo" in a person-name
    * dictionary) can no longer pin a single task at |corpus|² work.
    *
    * The cap decision uses the block-count frame (|distinct keys| rows,
    * broadcast back) — two map-side-combined aggregates, no extra wide
    * shuffle over the dictionary.
    */
  def scoredPairsCapped(
      df: DataFrame, strCol: String, idCol: String,
      threshold: Double, prefixLen: Int = 2, maxBlock: Int = 50,
      subLen: Int = 6): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    require(subLen >= 1, s"subLen must be >= 1, got $subLen")
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    graft.expressions.GraftFunctions.register(spark)
    val base = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // one-level sub-block + cap for one blocking pass: the keyed frame
    // carries its extension chars; hot keys swap to key#ext, and keys
    // hot even after extension are filtered out
    def capPass(pass: DataFrame): DataFrame = {
      val c1 = pass.groupBy(col("bk")).agg(count(lit(1)).as("cnt"))
      val extended = pass.join(broadcast(c1), Seq("bk"))
        .select(col("id"), col("s"),
          when(col("cnt") <= maxBlock, col("bk"))
            .otherwise(concat(col("bk"), lit("#"), col("ext"))).as("bk"))
      val c2 = extended.groupBy(col("bk")).agg(count(lit(1)).as("cnt"))
      extended.join(broadcast(c2), Seq("bk"))
        .filter(col("cnt") <= maxBlock)
        .select(col("id"), col("s"), col("bk"))
    }
    val pre = base.select(col("id"), col("s"),
      substring(lower(col("s")), 1, prefixLen).as("bk"),
      substring(lower(col("s")), prefixLen + 1, subLen).as("ext"))
    val suf = base.select(col("id"), col("s"),
      concat(lit("sfx:"), expr(s"right(lower(s), $prefixLen)")).as("bk"),
      expr(s"substring(right(lower(s), ${prefixLen + subLen}), 1, $subLen)")
        .as("ext"))
    scoreKeyed(capPass(pre).unionByName(capPass(suf)), threshold)
  }

  /** Total cluster assignment over the CAPPED pair graph — the
    * skew-hardened composition for Zipfian dictionaries: same
    * transitive-closure semantics as [[clusters]], candidates bounded
    * per [[scoredPairsCapped]].
    */
  def clustersCapped(
      df: DataFrame, strCol: String, idCol: String,
      threshold: Double, prefixLen: Int = 2, maxBlock: Int = 50,
      subLen: Int = 6): DataFrame = {
    val pairs = scoredPairsCapped(
      df, strCol, idCol, threshold, prefixLen, maxBlock, subLen)
    val comp = ConnectedComponents.components(pairs, "id_a", "id_b")
    df.select(col(idCol).cast("long").as("id"))
      .join(comp.select(col("node").as("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
  }

  /** Shared candidate join + scorer over a (id, s, bk) keyed frame. */
  private def scoreKeyed(keyed: DataFrame, threshold: Double): DataFrame = {
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
  /** Survivorship / golden-record selection: one canonical row per
    * cluster, chosen by an explicit priority order (completeness,
    * recency, quality — caller-supplied sort columns with a unique
    * final tiebreak), plus the cluster size. The step after matching
    * that actually DEDUPLICATES: every cluster keeps exactly its best
    * representative, deterministically.
    *
    * One hash shuffle by cluster; the rank window and the size count
    * share it (count(*) over the same partition — no second
    * exchange). Skewed giant clusters cost a per-cluster sort, not a
    * join — the usual mega-cluster diagnosis applies upstream at
    * pair-generation time, not here.
    */
  def goldenRecord(
      records: DataFrame, clusterCol: String,
      priority: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(priority.nonEmpty, "priority order must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol)).orderBy(priority: _*)
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol))
    records
      .withColumn("_rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(cw))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  def clusters(
      df: DataFrame, strCol: String, idCol: String,
      threshold: Double, prefixLen: Int = 2): DataFrame = {
    val pairs = scoredPairs(df, strCol, idCol, threshold, prefixLen)
    val comp = ConnectedComponents.components(pairs, "id_a", "id_b")
    df.select(col(idCol).cast("long").as("id"))
      .join(comp.select(col("node").as("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
  }

  /** Fellegi–Sunter match/unmatch weight estimation over blocked
    * candidate pairs: per comparison field, the m-probability
    * (agreement given match), u-probability (agreement given
    * non-match), and the log₂ agreement/disagreement weights the
    * classical linkage decision rule sums — fitted by TWO UNROLLED EM
    * steps from the fixed start (π=0.1, m=0.9, u=0.1), the same
    * fixed-iteration-count trick the PageRank/Bradley–Terry gates use
    * to make an iterative fit exactly SQL-replayable.
    *
    * Scale shape: the ONLY corpus-scale work is one hash aggregate
    * collapsing the pair stream to its agreement-PATTERN counts — at
    * most 2^F rows for F binary fields (here F=3 → ≤8). Both EM steps
    * run on that tiny frame; every float sum over it is an ordered
    * fold (pattern-key order), so the result is a deterministic
    * double chain, not a partition-order accident. Missing patterns
    * contribute 0 to every sum, so only observed ones are needed.
    *
    * `pairs` must carry the 0/1 agreement indicator columns `fields`.
    * Output: one row per field — (field, m, u, w_agree, w_disagree)
    * plus the shared match prevalence π and pair count.
    */
  def fellegiSunterWeights(
      pairs: DataFrame, fields: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    require(fields.size >= 2 && fields.size <= 8,
      s"2..8 comparison fields, got ${fields.size}")
    val idx = fields.indices
    val pat = pairs
      .select(fields.zipWithIndex.map { case ((_, c), i) =>
        c.cast("int").as(s"_g$i") }: _*)
      .groupBy(idx.map(i => col(s"_g$i")): _*)
      .agg(count(lit(1)).as("_cnt"))
    val patKey = struct(idx.map(i => col(s"_g$i")): _*)
    // one EM step: scalars is a 1-row frame carrying _N, _G{i} (exact
    // integer margins) and the current _pi, _m{i}, _u{i}; per-pattern
    // membership weight w, then 1+F ordered folds in pattern-key order
    def step(scalars: DataFrame): DataFrame = {
      val joined = pat.crossJoin(broadcast(scalars))
      val pm = idx.foldLeft(col("_pi")) { (acc, i) =>
        acc * when(col(s"_g$i") === 1, col(s"_m$i"))
          .otherwise(lit(1.0) - col(s"_m$i")) }
      val pu = idx.foldLeft(lit(1.0) - col("_pi")) { (acc, i) =>
        acc * when(col(s"_g$i") === 1, col(s"_u$i"))
          .otherwise(lit(1.0) - col(s"_u$i")) }
      val terms = joined.select(
        (Seq(col("_tot")) ++ idx.map(i => col(s"_ag$i")) ++
          Seq(patKey.as("_k"), (col("_cnt") * (pm / (pm + pu))).as("_t")) ++
          idx.map(i => (col("_cnt") * (pm / (pm + pu)) * col(s"_g$i"))
            .as(s"_t$i"))): _*)
      def fold(termCol: String) =
        aggregate(
          array_sort(collect_list(struct(col("_k"), col(termCol)))),
          lit(0.0), (acc, s) => acc + s.getField(termCol))
      val folded = terms
        .groupBy((Seq(col("_tot")) ++ idx.map(i => col(s"_ag$i"))): _*)
        .agg(fold("_t").as("_SW"),
          idx.map(i => fold(s"_t$i").as(s"_SW$i")): _*)
      // clamp every probability into [1e-6, 1-1e-6] — the standard EM
      // degeneracy guard (a field agreeing on ALL pairs would push u
      // to exactly 1 and the disagreement weight to log(1/0)); the
      // oracle mirrors the identical least/greatest chain
      def clamp(c: org.apache.spark.sql.Column) =
        least(greatest(c, lit(1e-6)), lit(1.0) - lit(1e-6))
      folded.select(
        (Seq(col("_tot")) ++ idx.map(i => col(s"_ag$i")) ++
          Seq(clamp(col("_SW") / col("_tot").cast("double")).as("_pi")) ++
          idx.flatMap(i => Seq(
            clamp(col(s"_SW$i") / col("_SW")).as(s"_m$i"),
            clamp((col(s"_ag$i").cast("double") - col(s"_SW$i")) /
              (col("_tot").cast("double") - col("_SW"))).as(s"_u$i")))): _*)
    }
    val start = pat.agg(
      sum(col("_cnt")).as("_tot"),
      (idx.map(i => sum(col("_cnt") * col(s"_g$i")).as(s"_ag$i")) ++
        Seq(lit(0.1).as("_pi")) ++
        idx.flatMap(i =>
          Seq(lit(0.9).as(s"_m$i"), lit(0.1).as(s"_u$i")))): _*)
    val fitted = step(step(start))
    val rows = fields.zipWithIndex.map { case ((name, _), i) =>
      fitted.select(lit(name).as("field"),
        col("_tot").as("n_pairs"),
        Numerics.roundz(col("_pi"), 6).as("pi"),
        Numerics.roundz(col(s"_m$i"), 6).as("m"),
        Numerics.roundz(col(s"_u$i"), 6).as("u"),
        Numerics.roundz(log2(col(s"_m$i") / col(s"_u$i")), 6)
          .as("w_agree"),
        Numerics.roundz(log2((lit(1.0) - col(s"_m$i")) /
          (lit(1.0) - col(s"_u$i"))), 6).as("w_disagree"))
    }
    rows.reduce(_ unionByName _).orderBy("field")
  }
}
