package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan-shape regression locks for the perf-critical gates: the shapes
  * that make these queries survive a 100× scale-up are asserted here so
  * a refactor that silently un-pushes a filter, drops a broadcast, or
  * adds a shuffle FAILS CI instead of quietly shipping a scan-the-
  * corpus plan. Assertions walk the AQE-final executed plan at
  * sf0.001 (string rendering truncates; the tree does not).
  */
class PlanRegressionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def finalPlan(gate: String): SparkPlan = {
    val df = SparkEntry.queries(gate)(spark, sfDir)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan
  }

  /** All nodes, recursing through AQE wrappers and reused stages. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children ++ nested ++ p.subqueries).flatMap(nodes)
  }

  private def scans(gate: String): Seq[FileSourceScanExec] =
    nodes(finalPlan(gate)).collect { case f: FileSourceScanExec => f }

  private def pushedFilters(gate: String): String =
    scans(gate).flatMap(_.metadata.get("PushedFilters")).mkString(" ")

  private def kinds(gate: String): Seq[String] =
    nodes(finalPlan(gate)).map(_.getClass.getSimpleName)

  test("tpch_q6: every predicate reaches the parquet scan") {
    val pushed = pushedFilters("tpch_q6_forecast_revenue")
    assert(pushed.contains("l_shipdate"), s"shipdate not pushed: $pushed")
    assert(pushed.contains("l_discount"), s"discount not pushed: $pushed")
    assert(pushed.contains("l_quantity"), s"quantity not pushed: $pushed")
  }

  test("q11 projection pushdown: scan reads only the projected columns") {
    val widths = scans("q11_projection_pushdown").map(_.schema.fields.length)
    assert(widths.nonEmpty)
    widths.foreach(w => assert(w <= 8, s"scan reads $w columns"))
  }

  test("sample_weighted: no exchange at all (projection + TakeOrdered)") {
    val ks = kinds("sample_weighted")
    assert(!ks.exists(_.contains("Exchange")), s"unexpected shuffle: $ks")
    assert(ks.contains("TakeOrderedAndProjectExec"), s"no top-k operator: $ks")
  }

  test("join_broadcast_dim: the dimension side broadcasts") {
    val ks = kinds("join_broadcast_dim")
    assert(ks.contains("BroadcastHashJoinExec"), s"no broadcast join: $ks")
  }

  test("sim_topk_bruteforce: zero shuffles, top-k via TakeOrdered") {
    val ks = kinds("sim_topk_bruteforce")
    assert(!ks.exists(_.contains("Exchange")), s"unexpected shuffle: $ks")
    assert(ks.contains("TakeOrderedAndProjectExec"), s"no top-k operator: $ks")
  }

  test("q2 filtered scan: datestamp range is pushed") {
    val pushed = pushedFilters("q2_filtered_scan")
    assert(pushed.replace("[]", "").contains("["), s"nothing pushed: $pushed")
  }

  test("events_asof_join_exec: custom exec present, no window operator") {
    val ks = kinds("events_asof_join_exec")
    assert(ks.contains("AsOfJoinExec"), s"custom exec missing: $ks")
    assert(!ks.contains("WindowExec"), s"window crept back in: $ks")
  }

  test("tpch_q14: part dimension broadcasts, date filters pushed") {
    val ks = kinds("tpch_q14_promo_revenue")
    assert(ks.contains("BroadcastHashJoinExec"), s"no broadcast join: $ks")
    assert(pushedFilters("tpch_q14_promo_revenue").contains("l_shipdate"))
  }

  test("text_js_divergence: no group×vocab grid — single broadcast cross") {
    // The Q-side absent-mass closed form means the ONLY cross join is the
    // broadcast of the 1-row corpus total; the dense #groups × |vocab|
    // grid (a second nested-loop join + an outer join to fill absences)
    // must never come back — at web scale it is ~10¹⁰ rows.
    val ks = kinds("text_js_divergence")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
    assert(ks.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"grid cross join came back: $ks")
    val joins = nodes(finalPlan("text_js_divergence")).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType
    }
    assert(joins.forall(_.sql != "LEFT OUTER"),
      s"absent-term fill join came back: $joins")
  }

  test("dedup_edit_distance: candidate join is hash-based, never cartesian") {
    // the q-gram count filter exists to REPLACE the quadratic all-pairs
    // join; a refactor that degrades the gram equi-join into a nested
    // loop (e.g. by moving the length band into the join condition
    // wrong) would scan-the-corpus² at scale
    val ks = kinds("dedup_edit_distance")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
    assert(!ks.exists(_.contains("BroadcastNestedLoopJoin")),
      s"nested-loop join crept in: $ks")
  }

  test("events_markov_transitions: one user-window shuffle, totals broadcast") {
    val ks = kinds("events_markov_transitions")
    assert(ks.contains("WindowExec"), s"no window: $ks")
    assert(ks.contains("BroadcastHashJoinExec"),
      s"type-bounded totals should broadcast: $ks")
  }

  test("text_jaro_winkler: the dictionary self-join broadcasts (documented NL)") {
    // JW admits no sound candidate filter — the operator contract is a
    // VOCABULARY-bounded dictionary, so the nested loop must at least
    // broadcast its small side, never shuffle-replicate both
    val ks = kinds("text_jaro_winkler")
    assert(ks.exists(_.contains("BroadcastNestedLoopJoin")), s"plan: $ks")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
  }

  test("agg gates keep partial aggregation (map-side combine)") {
    // two HashAggregates (partial + final) around the exchange
    Seq("a4_per_publisher_counts", "agg_histogram").foreach { gate =>
      val ks = kinds(gate)
      assert(ks.count(_.contains("HashAggregate")) >= 2,
        s"$gate lost partial aggregation: $ks")
    }
  }

  test("pagerank rounds never sort-merge the edge list") {
    // the shuffled-hash pin: checkpointed ranks have unknown stats, and
    // without the hint AQE flips rounds 2+ to SMJ (2 s -> 25 s per
    // round at 38.6M rehearsal edges)
    Seq("graph_pagerank", "graph_pagerank_seeded").foreach { gate =>
      val ks = kinds(gate)
      assert(!ks.exists(_.contains("SortMergeJoin")),
        s"$gate edge join degenerated to sort-merge: $ks")
    }
  }

  test("scan-local gates carry only their orderBy exchange") {
    // the operator itself is shuffle-free; the single range exchange is
    // the gate's deterministic orderBy for the driver dump
    Seq("text_blocklist", "text_compression_ratio", "pipeline_split_hash")
      .foreach { gate =>
        val ks = kinds(gate)
        assert(ks.count(_.contains("Exchange")) <= 1,
          s"$gate grew a shuffle beyond the orderBy: $ks")
      }
  }

  test("dangling pagerank keeps the shuffled-hash pin and adds no joins") {
    // the dangling variant adds ONE node-scale aggregate per round —
    // never an extra edge-scale join, and never a sort-merge round
    val ks = kinds("graph_pagerank_dangling")
    assert(!ks.exists(_.contains("SortMergeJoin")),
      s"dangling edge join degenerated to sort-merge: $ks")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
  }

  test("capped ER stays a hash equi-join through sub-blocking") {
    // the cap machinery (two block-count joins + key rewrite) must not
    // degrade the candidate join into a nested loop — the whole point
    // is bounding the equi-join's per-key work
    val ks = kinds("er_scored_pairs_capped")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
    assert(!ks.exists(_.contains("BroadcastNestedLoopJoin")),
      s"nested-loop join crept in: $ks")
  }

  test("warc extract and jpeg decode carry only their orderBy exchange") {
    // both are file/partition-local kernels (record parser, codec);
    // the single range exchange is the gate's deterministic orderBy
    Seq("io_warc_extract", "multimodal_jpeg_decode").foreach { gate =>
      val ks = kinds(gate)
      assert(ks.count(_.contains("Exchange")) <= 1,
        s"$gate grew a shuffle beyond the orderBy: $ks")
    }
  }

  test("blocklist monitor: window stats broadcast, no degenerate join") {
    // the z-score stats frame is metric-vocabulary-sized and must
    // broadcast back onto the window rows, not shuffle them
    val ks = kinds("events_blocklist_monitor")
    assert(ks.contains("BroadcastHashJoinExec"),
      s"stats should broadcast: $ks")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
  }

  test("tpch_q2: all dims broadcast; the only wide shuffle is the catalog distinct") {
    // part/supplier/nation and the per-part min all ride broadcasts —
    // at 100 TB the DISTINCT (partkey, suppkey) catalog is the one
    // fact-scale exchange, so a refactor that turns a dim join into a
    // sort-merge join must fail here.
    val ks = kinds("tpch_q2_min_cost_supplier")
    assert(ks.contains("BroadcastHashJoinExec"), s"no broadcast join: $ks")
    assert(!ks.contains("SortMergeJoinExec"), s"dim join degraded: $ks")
  }

  test("tpch_q9: part and supplier dims broadcast, name filter not on the fact scan") {
    val ks = kinds("tpch_q9_product_profit")
    assert(ks.count(_ == "BroadcastHashJoinExec") >= 2,
      s"dims not broadcast: $ks")
  }

  test("tpch_q20: nested-IN chain stays semi/broadcast, never cartesian") {
    val ks = kinds("tpch_q20_promotion_suppliers")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
    assert(pushedFilters("tpch_q20_promotion_suppliers")
      .contains("l_shipdate"), "date range not pushed to the fact scan")
  }

  test("io_merkle_digest: exactly one exchange, map-side partials collapse") {
    // the digest's entire value is that every task reduces to
    // <= nBuckets partial rows before the single bucket-keyed shuffle;
    // a second exchange (e.g. a sneaky sort or re-aggregate) means the
    // O(1)-state contract broke
    val ks = kinds("io_merkle_digest")
    val shuffles = ks.count(_ == "ShuffleExchangeExec")
    assert(shuffles <= 2, s"digest plan grew exchanges: $ks") // agg + orderBy
    assert(ks.count(_ == "HashAggregateExec") >= 2,
      s"no partial aggregation: $ks")
  }

  test("join_bloom_portable: bit set broadcasts, no fact-scale join") {
    val ks = kinds("join_bloom_portable")
    assert(ks.contains("BroadcastHashJoinExec"), s"bits not broadcast: $ks")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
  }

  test("frequent pairs: level-1 prune broadcasts into the pair join") {
    // the gate's minSupport empties the result at sf0.001 (AQE then
    // collapses every join to a LocalTableScan), so the lock drives
    // the operator with a support that survives this corpus
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(org.apache.spark.sql.functions.col("user_id").cast("string")
        .as("basket"),
        org.apache.spark.sql.functions.col("event_type"))
    val df = graft.operators.FrequentItemsets.frequentPairs(
      ev, "basket", "event_type", 2L)
    df.collect()
    val ks = nodes(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    assert(ks.contains("BroadcastHashJoinExec"),
      s"frequent-item prune not broadcast: $ks")
  }

  test("dedup_source_overlap: labels stream past broadcast pairs, text never joins") {
    val plan = finalPlan("dedup_source_overlap")
    val joins = nodes(plan).filter(_.getClass.getSimpleName.contains("Join"))
    joins.foreach { j =>
      j.children.foreach { side =>
        assert(!side.output.map(_.name).contains("text"),
          s"join side carries text: ${side.output.map(_.name)}")
      }
    }
    assert(kinds("dedup_source_overlap").contains("BroadcastHashJoinExec"))
  }

  test("snapshot diff joins digests, not document text") {
    // both sides project (id, md5) BEFORE the full-outer exchange — the
    // join input schemas must not carry the text column
    val joins = nodes(finalPlan("pipeline_snapshot_diff"))
      .filter(_.getClass.getSimpleName.contains("Join"))
    assert(joins.nonEmpty)
    joins.foreach { j =>
      j.children.foreach { side =>
        val cols = side.output.map(_.name)
        assert(!cols.contains("text"),
          s"join side carries text: $cols")
      }
    }
  }

  test("join_spatial_grid: candidate join is a cell-key equi-join") {
    // the whole point of grid blocking is to never cross-join points;
    // the 9-cell probe explode must feed a HASH join on (_cx, _cy)
    val ks = kinds("join_spatial_grid")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
    assert(!ks.exists(_.contains("BroadcastNestedLoopJoin")),
      s"nested loop: $ks")
    assert(ks.exists(k => k.contains("HashJoin") || k.contains("SortMergeJoin")),
      s"no equi-join found: $ks")
  }

  test("agg_gini_by_group: ranks ride (group, range-bucket) windows, not whole-group sorts") {
    // the rank window must partition on (group, Ranks range bucket) so
    // a few huge groups still spread over `buckets` tasks — a bare
    // partitionBy(group) window (parallelism capped at the group
    // count) must not come back
    val plan = finalPlan("agg_gini_by_group")
    val windows = nodes(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase => w
    }
    assert(windows.nonEmpty, "rank window missing")
    windows.foreach(w => assert(w.partitionSpec.size >= 2,
      s"whole-group sort window came back: ${w.partitionSpec}"))
    val exchanges = nodes(plan)
      .count(_.getClass.getSimpleName.contains("ShuffleExchange"))
    assert(exchanges <= 4, // bucket window + group agg + orderBy (+AQE)
      s"$exchanges exchanges: ${kinds("agg_gini_by_group")}")
  }

  test("events_ewma: rank filter prunes before the fold aggregate") {
    // the per-key state is <= k rows because the row_number filter sits
    // UNDER the collect_list aggregate; losing it makes state O(history)
    val plan = finalPlan("events_ewma")
    val ks = nodes(plan).map(_.getClass.getSimpleName)
    assert(ks.contains("WindowExec"), s"no window: $ks")
    assert(nodes(plan).exists(p =>
      p.getClass.getSimpleName == "FilterExec" &&
        p.toString.contains("_rn")), s"rank filter missing: $ks")
  }

  test("profile_inclusion_deps: FK distinct precedes the PK semi-join") {
    val ks = kinds("profile_inclusion_deps")
    assert(!ks.exists(_.contains("CartesianProduct") &&
      !ks.exists(_.contains("BroadcastExchange"))), s"plan: $ks")
    assert(nodes(finalPlan("profile_inclusion_deps")).exists { p =>
      val s = p.getClass.getSimpleName
      s.contains("HashJoin") || s.contains("SortMergeJoin")
    }, "no join for the semi-join probe")
  }

  test("join_skyline_2d: prefilter prunes before the global-order window") {
    // the exact pass's single-partition RANGE window must sit ABOVE
    // the _prevMin bucket filter — losing the filter feeds the whole
    // corpus into one task's sort
    val plan = finalPlan("join_skyline_2d")
    val prunes = nodes(plan).filter(p =>
      p.getClass.getSimpleName == "FilterExec" &&
        p.toString.contains("_prevMin"))
    assert(prunes.nonEmpty, "bucket prefilter missing")
    // and the window operators exist for the exact pass
    assert(nodes(plan).count(_.getClass.getSimpleName == "WindowExec") >= 2,
      "exact-pass windows missing")
    // no filter-free path: every WindowExec over the global x order
    // must have the prefilter somewhere beneath it
    val globalWins = nodes(plan).filter(p =>
      p.getClass.getSimpleName == "WindowExec" &&
        p.toString.contains("_minLess"))
    globalWins.foreach { w =>
      assert(nodes(w).exists(p =>
        p.getClass.getSimpleName == "FilterExec" &&
          p.toString.contains("_prevMin")),
        "global-order window not fed by the pruned candidate set")
    }
  }

  test("er_fellegi_sunter: corpus-scale work is one aggregate, EM stays on the pattern frame") {
    // the blocked pair join feeds ONE hash aggregate to <=8 pattern
    // rows; both EM steps must run above it (object-hash aggregates on
    // the tiny frame), never re-joining the pair stream
    val ks = kinds("er_fellegi_sunter")
    assert(!ks.exists(_.contains("CartesianProduct")), s"cartesian: $ks")
    val scanCount = scans("er_fellegi_sunter")
      .count(_.metadata.get("Location").exists(_.contains("part.parquet")))
    assert(scanCount <= 4, s"part scanned $scanCount times")
  }

  test("events_asof_nearest: both window frames ride ONE key exchange, no join") {
    // the backward last() and forward first() share the same
    // (key, ts, is_left) sort — a refactor that materializes two sorts
    // or falls back to a range join doubles the corpus shuffle
    val ks = kinds("events_asof_nearest")
    assert(!ks.exists(_.contains("Join")), s"unexpected join: $ks")
    val exchanges = ks.count(_.contains("ShuffleExchange"))
    assert(exchanges <= 3, // union key hash + final orderBy + AQE read
      s"$exchanges exchanges: $ks")
    assert(ks.count(_ == "WindowExec") <= 2, s"window blowup: $ks")
  }

  test("agg_weighted_median: value pre-aggregate sits UNDER the cumulative window") {
    // the window frame must be the per-(group, value) aggregate, not
    // corpus rows — losing the pre-aggregate makes window state O(rows)
    val plan = finalPlan("agg_weighted_median")
    val ns = nodes(plan)
    val ks = ns.map(_.getClass.getSimpleName)
    assert(ks.contains("WindowExec"), s"no window: $ks")
    def hasAggBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      nodes(p).drop(1).exists(_.getClass.getSimpleName
        .contains("HashAggregate"))
    val windows = ns.filter(_.getClass.getSimpleName == "WindowExec")
    assert(windows.forall(hasAggBelow),
      "cumulative window runs over raw corpus rows, not the (group, value) frame")
  }

  test("events_theil_sen: pair join is key-equi (never cartesian), trailing-K filter under it") {
    val plan = finalPlan("events_theil_sen")
    val ks = nodes(plan).map(_.getClass.getSimpleName)
    assert(!ks.exists(_.contains("CartesianProduct")) &&
      !ks.exists(_.contains("BroadcastNestedLoop")),
      s"pair join degenerated to cartesian: $ks")
    assert(nodes(plan).exists(p =>
      p.getClass.getSimpleName == "FilterExec" &&
        p.toString.contains("_rn")), s"trailing-K filter missing: $ks")
  }

  test("sql_recursive_hierarchy: executes through UnionLoopExec with bounded depth") {
    val ks = kinds("sql_recursive_hierarchy")
    assert(ks.exists(_.contains("UnionLoop")),
      s"recursive CTE did not plan as UnionLoop: $ks")
  }

  test("sql_lateral_topk: per-row limit stays under the correlated join") {
    // the lateral subquery must keep its LIMIT (top-2) — losing it
    // turns the per-customer probe into a full orders scan per row
    val plan = finalPlan("sql_lateral_topk")
    val s = plan.toString
    assert(nodes(plan).exists(p => {
      val n = p.getClass.getSimpleName
      n.contains("Limit") || n.contains("TakeOrdered") ||
        n.contains("Window") // row_number rewrite is also acceptable
    }), s"no per-group limit operator in: ${s.take(500)}")
  }

  test("events_kaplan_meier: survival fold rides the death-time frame, not rows") {
    // the ordered-list fold must sit above the lifetime-histogram
    // aggregate: a refactor that folds over per-user rows makes the
    // collect_list state O(users)
    val plan = finalPlan("events_kaplan_meier")
    val ns = nodes(plan)
    val ks = ns.map(_.getClass.getSimpleName)
    assert(ks.count(_.contains("HashAggregate")) >= 2,
      s"lifetime histogram aggregate missing: $ks")
    assert(!ks.exists(_.contains("CartesianProduct")) ||
      ns.exists(_.getClass.getSimpleName.contains("Broadcast")),
      s"non-broadcast cartesian: $ks")
  }

  test("sim_kmeans_sse: E-step broadcasts centroids, corpus never self-joins") {
    val ks = kinds("sim_kmeans_sse")
    assert(ks.exists(_.contains("BroadcastNestedLoop")) ||
      ks.exists(_.contains("BroadcastExchange")),
      s"centroids not broadcast: $ks")
    assert(!ks.exists(_.contains("SortMergeJoin")),
      s"corpus-scale join in the assignment step: $ks")
  }

  test("global-rank gates: no unpartitioned window anywhere (single-partition sort ban)") {
    // these five gates used to run `ntile()` / `row_number()` over
    // Window.orderBy(…) with NO partition key — Spark executes that as
    // ONE task holding every row. They now rank via Ranks' range
    // buckets; any WindowExec with an empty partitionSpec here means
    // the single-partition sort crept back.
    for (gate <- Seq("events_rfm_grid", "events_rfm_segments",
        "eval_lift_gains", "sim_quantile_bins", "sim_rank_correlation",
        "events_conversion_lag", "stats_quantile_normalize",
        "sample_stratified_take", "sim_rank_normalize")) {
      val windows = nodes(finalPlan(gate)).collect {
        case w: org.apache.spark.sql.execution.window.WindowExecBase => w
      }
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$gate: unpartitioned WindowExec (single-partition sort): " +
          w.windowExpression.mkString(", ")))
    }
  }

  test("LM scorers and PMI: corpus counts are aggregates joined back, never hot-key windows") {
    // these three used to attach corpus term/bigram counts as
    // sum().over(partitionBy(term)) windows — a stopword's posting list
    // is corpus-sized and a window pins the whole hot partition to ONE
    // task (pmi additionally ran an EMPTY-partition window for N). They
    // are now vocabulary-bounded aggregates joined back (AQE broadcasts
    // small, skew-splits large); any WindowExec here means the
    // unsplittable hot-partition sort crept back.
    for (gate <- Seq("text_unigram_logprob", "text_bigram_logprob",
        "text_pmi_bigrams")) {
      val windows = nodes(finalPlan(gate)).collect {
        case w: org.apache.spark.sql.execution.window.WindowExecBase => w
      }
      assert(windows.isEmpty,
        s"$gate: window crept back over the count frame: " +
          windows.map(_.windowExpression.mkString(",")).mkString(" | "))
    }
  }

  test("text_zipf_slope: per-group top-k is salted two-stage, no whole-group sort") {
    // the heavy rank pass must partition on (group, salt) — a bare
    // partitionBy(group) window sorts each group's ENTIRE vocabulary in
    // one task. The final (group)-partitioned window is fine: it only
    // sees the <= salts·k survivors.
    val windows = nodes(finalPlan("text_zipf_slope")).collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase => w
    }
    assert(windows.nonEmpty, "rank windows missing")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window: ${w.windowExpression.mkString(",")}"))
    assert(windows.exists(_.partitionSpec.size >= 2),
      s"salted local top-k pass missing: " +
        windows.map(_.partitionSpec.mkString(",")).mkString(" | "))
  }

  test("pipeline_curriculum: per-source ranks ride (source, range-bucket) windows") {
    // a bare partitionBy(source) window caps parallelism at the source
    // count (a handful) with each task sorting a whole source; the
    // Ranks rewrite partitions every rank window on (source, bucket)
    val windows = nodes(finalPlan("pipeline_curriculum")).collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase => w
    }
    assert(windows.nonEmpty, "rank window missing")
    windows.foreach(w => assert(w.partitionSpec.size >= 2,
      s"whole-source sort window came back: ${w.partitionSpec}"))
  }

  test("sim_maxsim_topk: one corpus scan, scan-local scoring, salted top-k") {
    // MaxSim must never explode or join the corpus: the query tokens
    // ride as literals, scoring folds scan-local, and the only
    // shuffles serve the salted exact top-k (+ the gate's orderBy)
    val plan = finalPlan("sim_maxsim_topk")
    val ks = nodes(plan).map(_.getClass.getSimpleName)
    assert(!ks.exists(_.contains("Join")), s"unexpected join: $ks")
    val embScans = scans("sim_maxsim_topk")
      .count(_.metadata.get("Location").exists(_.contains("embeddings")))
    assert(embScans == 1, s"embeddings scanned $embScans times")
    val windows = nodes(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase => w
    }
    assert(windows.nonEmpty, "top-k rank windows missing")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window: ${w.windowExpression.mkString(",")}"))
    assert(windows.exists(_.partitionSpec.size >= 2),
      "salted local top-k pass missing")
  }

  test("text_unigram_lm_roundtrip: encode is shuffle-free scan work " +
    "(orderBy exchange only)") {
    // the piece table broadcasts and each word segments independently;
    // the only exchange the gate may carry is its own orderBy range
    // exchange (training runs driver-side before the plan exists)
    val ks = kinds("text_unigram_lm_roundtrip")
    val exchanges = ks.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"encode shuffled: $ks")
    assert(!ks.exists(_.contains("Join")), s"unexpected join: $ks")
  }

  test("stats_psi / stats_mutual_information: one corpus aggregate each, no join back") {
    for (gate <- Seq("stats_psi", "stats_mutual_information",
        "stats_chi2_independence")) {
      val docScans = scans(gate)
        .count(_.metadata.get("Location").exists(_.contains("documents")))
      assert(docScans <= 2, s"$gate: documents scanned $docScans times")
      assert(!kinds(gate).exists(_.contains("CartesianProduct")) ||
        kinds(gate).count(_.contains("BroadcastExchange")) > 0,
        s"$gate: unbroadcast cartesian")
    }
  }
}
