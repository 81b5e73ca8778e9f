package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Data-profiling + distribution-statistics gates (round 10): the
  * structural checks run over a fresh 100 TB drop before training —
  * inequality/concentration readout, leading-digit sanity, k-group
  * rank test, functional- and inclusion-dependency audits. Every gate
  * is exact integer arithmetic until one final documented double
  * chain (`Numerics.roundz` / `+ 0` on both sides).
  */
object ProfilingQueries extends QueryGroup {

  /** Per-priority Gini of order value
    * ([[graft.operators.Inequality.giniByGroup]]): cents fixed-point,
    * per-group rank window, exact Σi·x and Σx — the closed-form
    * sorted-values Gini with one double division at the end.
    */
  val gini: QueryDef = QueryDef(
    "agg_gini_by_group",
    (s, dir) =>
      graft.operators.Inequality.giniByGroup(
          Tables(s, dir).orders, "o_orderpriority", "o_totalprice",
          "o_orderkey")
        .orderBy("o_orderpriority"),
    Some(
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
        |    o_orderkey AS id FROM orders),
        |r AS (SELECT g, c,
        |    row_number() OVER (PARTITION BY g ORDER BY c, id) AS i FROM v)
        |SELECT g AS o_orderpriority, count(*)::BIGINT AS n,
        |  sum(c)::BIGINT AS sum_cents,
        |  round((2 * sum(i * c) - (count(*) + 1) * sum(c))::DOUBLE /
        |    (count(*) * sum(c))::DOUBLE, 6) + 0 AS gini
        |FROM r GROUP BY g ORDER BY o_orderpriority""".stripMargin))

  /** Benford first-digit profile of order totals
    * ([[graft.operators.Profiling.benfordDigits]]): digit from the
    * integer cents' decimal string (no float log10 on the data path),
    * expectation ln(1+1/d)/ln(10) as the identical chain both sides.
    */
  val benford: QueryDef = QueryDef(
    "stats_benford_digits",
    (s, dir) =>
      graft.operators.Profiling.benfordDigits(
          Tables(s, dir).orders, "o_totalprice")
        .orderBy("digit"),
    Some(
      """WITH d AS (SELECT CAST(left(CAST(CAST(round(o_totalprice * 100, 0)
        |      AS BIGINT) AS VARCHAR), 1) AS INT) AS digit
        |    FROM orders WHERE o_totalprice > 0),
        |pd AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
        |t AS (SELECT sum(n)::BIGINT AS tot FROM pd)
        |SELECT digit, n,
        |  round(n::DOUBLE / tot::DOUBLE, 6) + 0 AS obs_share,
        |  round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) + 0
        |    AS exp_share,
        |  round((n::DOUBLE / tot::DOUBLE
        |      - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
        |    * (n::DOUBLE / tot::DOUBLE
        |      - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
        |    / (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
        |    * tot::DOUBLE, 4) + 0 AS chi2_term
        |FROM pd CROSS JOIN t ORDER BY digit""".stripMargin))

  /** Kruskal–Wallis H over document length by source
    * ([[graft.operators.Evaluation.kruskalWallis]]): integer rank
    * sums via the per-distinct-value aggregate, tie-corrected H as a
    * fixed double chain; the cross-group Σ R²/n runs as an ordered
    * fold (`list_sum(list(… ORDER BY g))` on the oracle).
    */
  val kruskal: QueryDef = QueryDef(
    "stats_kruskal_wallis",
    (s, dir) =>
      graft.operators.Evaluation.kruskalWallis(
        Tables(s, dir).documents, "n_chars", "source"),
    Some(
      """WITH pv AS (SELECT n_chars AS v, source AS g, count(*) AS n
        |    FROM documents GROUP BY 1, 2),
        |nv AS (SELECT v, sum(n) AS nv FROM pv GROUP BY v),
        |rk AS (SELECT v, 2 * coalesce(sum(nv) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + nv + 1 AS r2 FROM nv),
        |pg AS (SELECT g, sum(n)::BIGINT AS ng,
        |    sum(n * r2)::BIGINT AS r2g
        |  FROM pv JOIN rk USING (v) GROUP BY g),
        |ts AS (SELECT sum(nv * nv * nv - nv)::BIGINT AS ties FROM nv),
        |ag AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
        |    list_sum(list(r2g::DOUBLE * r2g::DOUBLE / (4.0 * ng::DOUBLE)
        |      ORDER BY g)) AS rs
        |  FROM pg)
        |SELECT k, n, ties,
        |  round((12.0 / (n::DOUBLE * (n::DOUBLE + 1.0)) * rs
        |      - 3.0 * (n::DOUBLE + 1.0))
        |    / (1.0 - ties::DOUBLE
        |      / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)), 6) + 0
        |    AS h
        |FROM ag CROSS JOIN ts""".stripMargin))

  /** Functional-dependency audit
    * ([[graft.operators.Profiling.fdViolation]]): g3 violation share
    * for two candidate FDs — documents source→lang and part
    * p_type→p_brand — two hash aggregates each, no sort.
    */
  val fd: QueryDef = QueryDef(
    "profile_fd_violations",
    (s, dir) => {
      val t = Tables(s, dir)
      graft.operators.Profiling.fdViolation(
          t.documents, "documents.source->lang",
          col("source"), col("lang"))
        .unionByName(graft.operators.Profiling.fdViolation(
          t.part, "part.p_type->p_brand", col("p_type"), col("p_brand")))
        .orderBy("fd")
    },
    Some(
      """WITH p1 AS (SELECT source AS l, lang AS r, count(*) AS n
        |    FROM documents GROUP BY 1, 2),
        |g1 AS (SELECT l, sum(n) AS tot, max(n) AS keep, count(*) AS nr
        |    FROM p1 GROUP BY l),
        |f1 AS (SELECT 'documents.source->lang' AS fd,
        |    sum(tot)::BIGINT AS n_rows, count(*)::BIGINT AS n_lhs,
        |    sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_violating_lhs,
        |    sum(tot - keep)::BIGINT AS n_violating_rows,
        |    round(sum(tot - keep)::DOUBLE / sum(tot)::DOUBLE, 6) + 0 AS g3
        |  FROM g1),
        |p2 AS (SELECT p_type AS l, p_brand AS r, count(*) AS n
        |    FROM part GROUP BY 1, 2),
        |g2 AS (SELECT l, sum(n) AS tot, max(n) AS keep, count(*) AS nr
        |    FROM p2 GROUP BY l),
        |f2 AS (SELECT 'part.p_type->p_brand' AS fd,
        |    sum(tot)::BIGINT AS n_rows, count(*)::BIGINT AS n_lhs,
        |    sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_violating_lhs,
        |    sum(tot - keep)::BIGINT AS n_violating_rows,
        |    round(sum(tot - keep)::DOUBLE / sum(tot)::DOUBLE, 6) + 0 AS g3
        |  FROM g2)
        |SELECT * FROM f1 UNION ALL SELECT * FROM f2 ORDER BY fd"""
        .stripMargin))

  /** Inclusion-dependency (FK coverage) audit
    * ([[graft.operators.Profiling.inclusionCoverage]]): distinct FK
    * values semi-joined against the PK side — lineitem.l_partkey ⊆
    * part.p_partkey and orders.o_custkey ⊆ customer.c_custkey.
    */
  val ind: QueryDef = QueryDef(
    "profile_inclusion_deps",
    (s, dir) => {
      val t = Tables(s, dir)
      graft.operators.Profiling.inclusionCoverage(
          t.lineitem, "l_partkey", t.part, "p_partkey",
          "lineitem.l_partkey<=part.p_partkey")
        .unionByName(graft.operators.Profiling.inclusionCoverage(
          t.orders, "o_custkey", t.customer, "c_custkey",
          "orders.o_custkey<=customer.c_custkey"))
        .orderBy("ind")
    },
    Some(
      """WITH fk1 AS (SELECT DISTINCT l_partkey AS k FROM lineitem
        |    WHERE l_partkey IS NOT NULL),
        |i1 AS (SELECT 'lineitem.l_partkey<=part.p_partkey' AS ind,
        |    (SELECT count(*) FROM fk1)::BIGINT AS n_distinct_fk,
        |    (SELECT count(*) FROM fk1
        |      WHERE k IN (SELECT p_partkey FROM part))::BIGINT
        |      AS n_matched),
        |fk2 AS (SELECT DISTINCT o_custkey AS k FROM orders
        |    WHERE o_custkey IS NOT NULL),
        |i2 AS (SELECT 'orders.o_custkey<=customer.c_custkey' AS ind,
        |    (SELECT count(*) FROM fk2)::BIGINT AS n_distinct_fk,
        |    (SELECT count(*) FROM fk2
        |      WHERE k IN (SELECT c_custkey FROM customer))::BIGINT
        |      AS n_matched)
        |SELECT ind, n_distinct_fk, n_matched,
        |  round(n_matched::DOUBLE / n_distinct_fk::DOUBLE, 6) + 0
        |    AS coverage
        |FROM (SELECT * FROM i1 UNION ALL SELECT * FROM i2)
        |ORDER BY ind""".stripMargin))

  /** Degree assortativity of the near-dup similarity graph
    * ([[graft.operators.GraphMetrics.degreeAssortativity]]) — the
    * same cached t=0.95 pair list the components/PageRank gates use,
    * symmetrized; six exact integer sums then one double chain.
    */
  val assortativity: QueryDef = QueryDef(
    "graph_degree_assortativity",
    (s, dir) => {
      val pairs = PipelineQueries.jaccardPairsFor(s, dir)
      val edges = pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs
          .select(col("id_b").as("src"), col("id_a").as("dst")))
      graft.operators.GraphMetrics.degreeAssortativity(edges, "src", "dst")
    },
    Some(
      """WITH tk AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
        |cj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |      FROM tk a JOIN tk b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM cj JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.95),
        |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |      UNION ALL SELECT id_b, id_a FROM pairs),
        |deg AS (SELECT nd, count(*) AS d FROM
        |      (SELECT src AS nd FROM e UNION ALL SELECT dst FROM e)
        |      GROUP BY nd),
        |j AS (SELECT du.d AS du, dv.d AS dv FROM e
        |      JOIN deg du ON du.nd = e.src JOIN deg dv ON dv.nd = e.dst),
        |ag AS (SELECT count(*)::BIGINT AS m, sum(du)::BIGINT AS su,
        |    sum(dv)::BIGINT AS sv, sum(du * dv)::BIGINT AS suv,
        |    sum(du * du)::BIGINT AS squ, sum(dv * dv)::BIGINT AS sqv
        |  FROM j)
        |SELECT m AS m_edges,
        |  round((m * suv - su * sv)::DOUBLE /
        |    (sqrt((m * squ - su * su)::DOUBLE) *
        |     sqrt((m * sqv - sv * sv)::DOUBLE)), 6) + 0 AS assortativity
        |FROM ag""".stripMargin))

  /** Decile lift / cumulative gains
    * ([[graft.operators.Evaluation.liftGains]]): documents ranked by
    * length, positives = English docs — standard SQL ntile on both
    * engines with a doc_id tiebreak, exact counts, integer-ratio lift.
    */
  val lift: QueryDef = QueryDef(
    "eval_lift_gains",
    (s, dir) =>
      graft.operators.Evaluation.liftGains(
        Tables(s, dir).documents, "n_chars", "doc_id",
        col("lang") === "en"),
    Some(
      """WITH r AS (SELECT doc_id, n_chars,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS bucket
        |  FROM documents),
        |pt AS (SELECT bucket, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
        |  FROM r GROUP BY bucket),
        |tt AS (SELECT sum(n)::BIGINT AS nn, sum(n_pos)::BIGINT AS p FROM pt),
        |c AS (SELECT bucket, n, n_pos,
        |    sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_n,
        |    sum(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |      AS cum_pos
        |  FROM pt)
        |SELECT bucket::BIGINT AS bucket, n, n_pos, cum_pos::BIGINT AS cum_pos,
        |  round(cum_pos::DOUBLE / p::DOUBLE, 6) + 0 AS gain,
        |  round((n_pos * nn)::DOUBLE / (n * p)::DOUBLE, 6) + 0 AS lift,
        |  round((cum_pos * nn)::DOUBLE / (cum_n * p)::DOUBLE, 6) + 0
        |    AS cum_lift
        |FROM c CROSS JOIN tt ORDER BY bucket""".stripMargin))

  /** Golden-record survivorship over the near-dup clusters
    * ([[graft.operators.EntityResolution.goldenRecord]]): every doc
    * joins its component (isolated docs are their own cluster) and
    * each cluster keeps exactly its best representative by
    * (n_chars desc, doc_id) — the step that turns matching into an
    * actual deduplicated corpus.
    */
  val golden: QueryDef = QueryDef(
    "er_golden_record",
    (s, dir) => {
      val pairs = PipelineQueries.jaccardPairsFor(s, dir)
      val comp = graft.operators.ConnectedComponents.components(
        pairs, "id_a", "id_b")
      val clustered = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"))
        .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"),
          "left")
        .withColumn("cluster", coalesce(col("component"), col("doc_id")))
        .select(col("cluster"), col("doc_id"), col("n_chars"))
      graft.operators.EntityResolution.goldenRecord(
          clustered, "cluster",
          Seq(col("n_chars").desc, col("doc_id")))
        .select(col("cluster"), col("doc_id").as("golden_doc"),
          col("n_chars"), col("n_members"))
        .orderBy("cluster")
    },
    Some(
      """WITH RECURSIVE
        |tk AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
        |cj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |      FROM tk a JOIN tk b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM cj JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.95),
        |eg AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |       UNION SELECT id_b, id_a FROM pairs),
        |nn AS (SELECT DISTINCT src AS node FROM eg),
        |reach(node, r) AS (
        |  SELECT node, node FROM nn
        |  UNION
        |  SELECT eg.dst, reach.r FROM reach JOIN eg ON eg.src = reach.node),
        |comp AS (SELECT node AS doc_id, min(r) AS component
        |         FROM reach GROUP BY node),
        |cl AS (SELECT d.doc_id, d.n_chars,
        |         coalesce(c.component, d.doc_id) AS cluster
        |       FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
        |rk AS (SELECT cluster, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY cluster
        |           ORDER BY n_chars DESC, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY cluster) AS n_members
        |       FROM cl)
        |SELECT cluster, doc_id AS golden_doc, n_chars,
        |  n_members::BIGINT AS n_members
        |FROM rk WHERE rn = 1 ORDER BY cluster""".stripMargin))

  /** Chao1 vocabulary-richness estimate per language
    * ([[graft.operators.TextAnalysis.chao1Richness]]): observed types
    * plus the bias-corrected f1/f2 term — "is this slice's vocabulary
    * saturated"; same tokenization contract as the vocab gates.
    */
  val chao1: QueryDef = QueryDef(
    "text_chao1_vocab",
    (s, dir) =>
      graft.operators.TextAnalysis.chao1Richness(
          Tables(s, dir).documents, "text", "lang")
        .withColumnRenamed("grp", "lang")
        .orderBy("lang"),
    Some(
      """WITH tk AS (SELECT lang AS grp,
        |    unnest(string_split_regex(lower(text), '\s+')) AS w
        |  FROM documents),
        |c AS (SELECT grp, w, count(*) AS c FROM tk WHERE w <> ''
        |      GROUP BY 1, 2),
        |a AS (SELECT grp, count(*)::BIGINT AS n_types,
        |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
        |    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
        |  FROM c GROUP BY grp)
        |SELECT grp AS lang, n_types, f1, f2,
        |  round(n_types::DOUBLE + (f1 * (f1 - 1))::DOUBLE /
        |    (2 * (f2 + 1))::DOUBLE, 4) + 0 AS chao1
        |FROM a ORDER BY lang""".stripMargin))

  /** Temporal split with embargo gaps
    * ([[graft.operators.Sampling.temporalSplit]]): 80/10/10 cuts of
    * the observed micros span with a 1-day embargo band excluded
    * before each cut — exact long DIV on both engines, no float on
    * any boundary.
    */
  val temporal: QueryDef = QueryDef(
    "pipeline_temporal_split",
    (s, dir) =>
      graft.operators.Sampling.temporalSplit(Tables(s, dir).events, "ts")
        .orderBy("split"),
    Some(
      """WITH e AS (SELECT epoch_us(ts) AS us FROM events),
        |b AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
        |s AS (SELECT us, lo + (hi - lo) * 80 // 100 AS c1,
        |    lo + (hi - lo) * 90 // 100 AS c2
        |  FROM e CROSS JOIN b),
        |a AS (SELECT CASE
        |    WHEN us < c1 - 86400000000 THEN 'train'
        |    WHEN us < c1 THEN 'embargo1'
        |    WHEN us < c2 - 86400000000 THEN 'val'
        |    WHEN us < c2 THEN 'embargo2'
        |    ELSE 'test' END AS split, us FROM s)
        |SELECT split, count(*)::BIGINT AS n, min(us) AS min_us,
        |  max(us) AS max_us
        |FROM a GROUP BY split ORDER BY split""".stripMargin))

  /** Brown–Forsythe equal-variance test of doc length across sources
    * ([[graft.operators.Evaluation.leveneBrownForsythe]]): exact
    * integer deviations around per-group medians (doubled to clear
    * the .5), ANOVA F with the ordered cross-group fold.
    */
  val levene: QueryDef = QueryDef(
    "stats_levene_bf",
    (s, dir) =>
      graft.operators.Evaluation.leveneBrownForsythe(
        Tables(s, dir).documents, "n_chars", "source"),
    Some(
      """WITH v AS (SELECT source AS g, n_chars AS v FROM documents),
        |md AS (SELECT g, quantile_cont(v, 0.5) AS med FROM v GROUP BY g),
        |z AS (SELECT v.g, abs(2 * v.v - CAST(2.0 * med AS BIGINT)) AS z2
        |      FROM v JOIN md ON md.g = v.g),
        |pg AS (SELECT g, count(*)::BIGINT AS n, sum(z2)::BIGINT AS s,
        |    sum(z2 * z2)::BIGINT AS q FROM z GROUP BY g),
        |ag AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
        |    sum(s)::BIGINT AS ts, sum(q)::BIGINT AS tq,
        |    list_sum(list(s::DOUBLE * s::DOUBLE / n::DOUBLE ORDER BY g))
        |      AS fold
        |  FROM pg)
        |SELECT k, n,
        |  round(((fold - ts::DOUBLE * ts::DOUBLE / n::DOUBLE)
        |      / (k::DOUBLE - 1.0))
        |    / ((tq::DOUBLE - fold) / (n::DOUBLE - k::DOUBLE)), 6) + 0
        |    AS f
        |FROM ag""".stripMargin))

  /** Chi-square independence of lang × source
    * ([[graft.operators.Evaluation.chi2Independence]]): full margin
    * grid with zero cells materialized, per-cell (o−e)²/e chains
    * summed in cell order, Cramér's V effect size.
    */
  val chi2: QueryDef = QueryDef(
    "stats_chi2_independence",
    (s, dir) =>
      graft.operators.Evaluation.chi2Independence(
        Tables(s, dir).documents, "lang", "source"),
    Some(
      """WITH o AS (SELECT lang AS a, source AS b, count(*)::BIGINT AS o
        |    FROM documents GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o)::BIGINT AS r FROM o GROUP BY a),
        |cb AS (SELECT b, sum(o)::BIGINT AS c FROM o GROUP BY b),
        |tt AS (SELECT sum(o)::BIGINT AS n FROM o),
        |g AS (SELECT ra.a, cb.b, ra.r, cb.c, coalesce(o.o, 0) AS o
        |      FROM ra CROSS JOIN cb
        |      LEFT JOIN o ON o.a = ra.a AND o.b = cb.b),
        |t AS (SELECT a, b,
        |    (o::DOUBLE - (r * c)::DOUBLE / n::DOUBLE)
        |      * (o::DOUBLE - (r * c)::DOUBLE / n::DOUBLE)
        |      / ((r * c)::DOUBLE / n::DOUBLE) AS t
        |  FROM g CROSS JOIN tt),
        |ag AS (SELECT list_sum(list(t ORDER BY a, b)) AS chi2 FROM t),
        |ks AS (SELECT (SELECT count(*) FROM ra)::BIGINT AS ka,
        |    (SELECT count(*) FROM cb)::BIGINT AS kb)
        |SELECT n, (ka - 1) * (kb - 1) AS dof,
        |  round(chi2, 4) + 0 AS chi2,
        |  round(sqrt(chi2 / (n::DOUBLE * least(ka - 1, kb - 1)::DOUBLE)),
        |    6) + 0 AS cramers_v
        |FROM ag CROSS JOIN tt CROSS JOIN ks""".stripMargin))

  /** N-gram novelty of the 'src0' slice vs the rest
    * ([[graft.operators.TextAnalysis.ngramNovelty]]): distinct
    * trigram sets both sides, one anti join — the acquisition
    * signal's gate.
    */
  val novelty: QueryDef = QueryDef(
    "text_ngram_novelty",
    (s, dir) =>
      graft.operators.TextAnalysis.ngramNovelty(
        Tables(s, dir).documents, "text", col("source") === "src0"),
    Some(
      """WITH w AS (SELECT source = 'src0' AS h,
        |    string_split_regex(lower(trim(text)), '\s+') AS ws
        |  FROM documents),
        |sh AS (SELECT h, list_distinct(CASE WHEN len(ws) < 3
        |    THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(1, len(ws) - 1),
        |      i -> array_to_string(list_slice(ws, i, i + 2), ' ')) END)
        |    AS shs FROM w),
        |t AS (SELECT h, unnest(shs) AS g FROM sh),
        |tr AS (SELECT DISTINCT g FROM t WHERE NOT h),
        |he AS (SELECT DISTINCT g FROM t WHERE h),
        |un AS (SELECT count(*)::BIGINT AS n_unseen FROM he
        |       WHERE g NOT IN (SELECT g FROM tr)),
        |hc AS (SELECT count(*)::BIGINT AS n_heldout_grams FROM he)
        |SELECT n_heldout_grams, n_unseen,
        |  round(n_unseen::DOUBLE / n_heldout_grams::DOUBLE, 6) + 0
        |    AS novelty
        |FROM hc CROSS JOIN un""".stripMargin))

  /** Per-source modal language ([[graft.operators.Profiling
    * .modePerGroup]]): deterministic tie-break, distinct count, and
    * the mode's share.
    */
  val mode: QueryDef = QueryDef(
    "agg_mode_per_group",
    (s, dir) =>
      graft.operators.Profiling.modePerGroup(
          Tables(s, dir).documents, "source", "lang")
        .orderBy("source"),
    Some(
      """WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
        |    FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, lang, n,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n DESC, lang) AS rn,
        |    sum(n) OVER (PARTITION BY source) AS tot,
        |    count(*) OVER (PARTITION BY source) AS n_distinct
        |  FROM c)
        |SELECT source, lang AS mode, n AS n_mode,
        |  n_distinct::BIGINT AS n_distinct,
        |  round(n::DOUBLE / tot::DOUBLE, 6) + 0 AS share
        |FROM r WHERE rn = 1 ORDER BY source""".stripMargin))

  /** Coarse quantile normalization of doc length across sources
    * ([[graft.operators.Profiling.quantileNormalize]]): 20 ntile
    * buckets per source (doc_id tiebreak), each mapped to the
    * cross-source bucket mean — exact integer sums, one division.
    */
  val qnorm: QueryDef = QueryDef(
    "stats_quantile_normalize",
    (s, dir) =>
      graft.operators.Profiling.quantileNormalize(
          Tables(s, dir).documents, "source", "n_chars", "doc_id", 20)
        .orderBy("source", "bucket"),
    Some(
      """WITH r AS (SELECT source AS g, n_chars::BIGINT AS v,
        |    ntile(20) OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id)::BIGINT AS bucket
        |  FROM documents),
        |per AS (SELECT g, bucket, count(*)::BIGINT AS n,
        |    sum(v)::BIGINT AS s FROM r GROUP BY 1, 2),
        |cr AS (SELECT bucket, sum(s)::BIGINT AS cs, sum(n)::BIGINT AS cn
        |  FROM per GROUP BY bucket)
        |SELECT g AS source, per.bucket, n,
        |  round(s::DOUBLE / n::DOUBLE, 6) + 0 AS group_mean,
        |  round(cs::DOUBLE / cn::DOUBLE, 6) + 0 AS normalized_mean
        |FROM per JOIN cr ON cr.bucket = per.bucket
        |ORDER BY source, per.bucket""".stripMargin))

  /** Equi-width histogram quantiles of doc length
    * ([[graft.operators.Profiling.histogramQuantiles]]): 64 integer
    * bins, cumulative counts, first bin reaching ceil(p·N/100) —
    * the deterministic mergeable-sketch quantile, pure BIGINTs.
    */
  val histQuantiles: QueryDef = QueryDef(
    "agg_histogram_quantiles",
    (s, dir) =>
      graft.operators.Profiling.histogramQuantiles(
        Tables(s, dir).documents, "n_chars", 64, Seq(25, 50, 90, 99)),
    Some(
      """WITH b AS (SELECT n_chars::BIGINT AS v FROM documents
        |    WHERE n_chars IS NOT NULL),
        |bd AS (SELECT min(v) AS mn, max(v) AS mx, count(*)::BIGINT AS nn
        |  FROM b),
        |bn AS (SELECT (v - mn) // ((mx - mn) // 64 + 1) AS bin
        |  FROM b CROSS JOIN bd),
        |g AS (SELECT bin, count(*)::BIGINT AS n FROM bn GROUP BY bin),
        |c AS (SELECT bin, sum(n)
        |    OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
        |  FROM g),
        |q AS (SELECT t.p::BIGINT AS p, min(c.bin)::BIGINT AS bin
        |  FROM (VALUES (25), (50), (90), (99)) t(p)
        |  CROSS JOIN bd JOIN c ON c.cum * 100 >= bd.nn * t.p
        |  GROUP BY t.p)
        |SELECT q.p, q.bin,
        |  (bd.mn + q.bin * ((bd.mx - bd.mn) // 64 + 1))::BIGINT
        |    AS lo_edge,
        |  c.cum AS cum_count
        |FROM q JOIN c ON c.bin = q.bin CROSS JOIN bd
        |ORDER BY p""".stripMargin))

  /** PSI of the lang distribution, src0 slice vs rest
    * ([[graft.operators.Profiling.psi]]): Laplace-smoothed shares
    * over the union category domain, terms folded in category order.
    */
  val psiGate: QueryDef = QueryDef(
    "stats_psi",
    (s, dir) =>
      graft.operators.Profiling.psi(
        Tables(s, dir).documents, "lang", col("source") === "src0"),
    Some(
      """WITH c AS (SELECT lang AS cat, source = 'src0' AS s,
        |    count(*)::BIGINT AS n FROM documents GROUP BY 1, 2),
        |a AS (SELECT cat, n AS na FROM c WHERE s),
        |b AS (SELECT cat, n AS nb FROM c WHERE NOT s),
        |g AS (SELECT coalesce(a.cat, b.cat) AS cat,
        |    coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM a FULL OUTER JOIN b ON a.cat = b.cat),
        |t AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb,
        |    count(*)::BIGINT AS n_bins FROM g),
        |p AS (SELECT cat, n_bins,
        |    (na + 1)::DOUBLE / (ta + n_bins)::DOUBLE AS p,
        |    (nb + 1)::DOUBLE / (tb + n_bins)::DOUBLE AS q
        |  FROM g CROSS JOIN t),
        |f AS (SELECT n_bins,
        |    list_sum(list((p - q) * ln(p / q) ORDER BY cat)) AS psi
        |  FROM p GROUP BY n_bins)
        |SELECT n_bins, round(psi, 6) + 0 AS psi FROM f""".stripMargin))

  /** Heaps'-law vocabulary-growth fit across sources
    * ([[graft.operators.TextAnalysis.heapsLaw]]): one (ln N, ln V)
    * point per source, OLS folded in slice order.
    */
  val heaps: QueryDef = QueryDef(
    "text_heaps_law",
    (s, dir) =>
      graft.operators.TextAnalysis.heapsLaw(
        Tables(s, dir).documents, "source", "text"),
    Some(
      """WITH tok AS (SELECT source AS s,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |pts AS (SELECT s, ln(count(*)::DOUBLE) AS x,
        |    ln(count(DISTINCT w)::DOUBLE) AS y FROM tok GROUP BY s),
        |f AS (SELECT count(*)::BIGINT AS n_slices,
        |    list_sum(list(x ORDER BY s)) AS sx,
        |    list_sum(list(y ORDER BY s)) AS sy,
        |    list_sum(list(x * y ORDER BY s)) AS sxy,
        |    list_sum(list(x * x ORDER BY s)) AS sxx
        |  FROM pts)
        |SELECT n_slices,
        |  round((n_slices::DOUBLE * sxy - sx * sy) /
        |    (n_slices::DOUBLE * sxx - sx * sx), 6) + 0 AS beta,
        |  round(exp((sy - ((n_slices::DOUBLE * sxy - sx * sy) /
        |      (n_slices::DOUBLE * sxx - sx * sx)) * sx) /
        |    n_slices::DOUBLE), 4) + 0 AS k
        |FROM f""".stripMargin))

  /** One-way ANOVA F of order value across priority arms
    * ([[graft.operators.Evaluation.anovaF]]): per-group exact moments
    * (Σv² through DECIMAL(38,0)/HUGEINT), the cross-group Σ S²/n fold
    * replayed in sorted group order on both sides.
    */
  val anova: QueryDef = QueryDef(
    "stats_anova_f",
    (s, dir) =>
      graft.operators.Evaluation.anovaF(
        Tables(s, dir).orders, "o_totalprice", "o_orderpriority"),
    Some(
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS v
        |  FROM orders),
        |pg AS (SELECT g, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
        |    sum(v::HUGEINT * v::HUGEINT) AS q FROM v GROUP BY g),
        |f AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
        |    sum(s)::BIGINT AS ts, sum(q) AS tq,
        |    list_sum(list(s::DOUBLE * s::DOUBLE / n::DOUBLE ORDER BY g))
        |      AS ssqn
        |  FROM pg)
        |SELECT k, n,
        |  round((ssqn - ts::DOUBLE * ts::DOUBLE / n::DOUBLE) /
        |    ((ssqn - ts::DOUBLE * ts::DOUBLE / n::DOUBLE)
        |      + (tq::DOUBLE - ssqn)), 6) + 0 AS eta_squared,
        |  round(((ssqn - ts::DOUBLE * ts::DOUBLE / n::DOUBLE)
        |      / (k::DOUBLE - 1.0)) /
        |    ((tq::DOUBLE - ssqn) / (n::DOUBLE - k::DOUBLE)), 6) + 0 AS f
        |FROM f""".stripMargin))

  /** Exact weighted median of line price by return flag, weighted by
    * quantity ([[graft.operators.Inequality.weightedMedianByGroup]]):
    * all-integer pick condition 2·cumw ≥ totw over the per-(group,
    * value) pre-aggregate.
    */
  val wmedian: QueryDef = QueryDef(
    "agg_weighted_median",
    (s, dir) =>
      graft.operators.Inequality.weightedMedianByGroup(
          Tables(s, dir).lineitem, "l_returnflag", "l_extendedprice",
          "l_quantity")
        .orderBy("l_returnflag"),
    Some(
      """WITH v AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c,
        |    CAST(round(l_quantity, 0) AS BIGINT) AS w FROM lineitem),
        |pv AS (SELECT g, c, sum(w)::BIGINT AS wv FROM v GROUP BY g, c),
        |cw AS (SELECT g, c, wv,
        |    sum(wv) OVER (PARTITION BY g ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(wv) OVER (PARTITION BY g) AS tot FROM pv)
        |SELECT g AS l_returnflag, any_value(tot)::BIGINT AS total_weight,
        |  round(min(c)::DOUBLE / 100.0, 2) + 0 AS weighted_median
        |FROM cw WHERE 2 * cum >= tot
        |GROUP BY g ORDER BY l_returnflag""".stripMargin))

  /** The 100 TB two-phase weighted median
    * ([[graft.operators.Inequality.weightedMedianByGroupBucketed]]):
    * bucket histogram → exact pass inside the median bucket only.
    * SAME oracle as `agg_weighted_median` — the hash proves the
    * pruned two-phase walk is answer-identical to the plain pick.
    */
  val wmedianBucketed: QueryDef = QueryDef(
    "agg_weighted_median_bucketed",
    (s, dir) =>
      graft.operators.Inequality.weightedMedianByGroupBucketed(
          Tables(s, dir).lineitem, "l_returnflag", "l_extendedprice",
          "l_quantity")
        .orderBy("l_returnflag"),
    wmedian.oracle)

  def defs: Seq[QueryDef] =
    Seq(gini, benford, kruskal, fd, ind, assortativity, lift,
      golden, chao1, temporal, levene, chi2, novelty, mode,
      qnorm, histQuantiles, psiGate, heaps, anova, wmedian,
      wmedianBucketed)
}
