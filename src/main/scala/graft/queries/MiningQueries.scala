package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-10 mining / structure gates: Pareto skyline, jackknife
  * uncertainty for ratio metrics, mutual information, per-node
  * clustering coefficient, directed-transition reciprocity, and the
  * cross-source vocabulary overlap map. Same contract as every other
  * group: exact integers until one documented double chain, `roundz`
  * / `+ 0` signed-zero normalization on both sides.
  */
object MiningQueries extends QueryGroup {

  /** 2-D Pareto skyline of part on (price, size), both minimized
    * ([[graft.operators.Skyline.skyline2dMin]]): the bucket-prefilter
    * + window path must equal the oracle's literal NOT EXISTS
    * dominance scan — the gate proves the pruning loses nothing.
    */
  val skyline: QueryDef = QueryDef(
    "join_skyline_2d",
    (s, dir) =>
      graft.operators.Skyline.skyline2dMin(
          Tables(s, dir).part.select(col("p_partkey"),
            expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("price_cents"),
            col("p_size").cast("long").as("p_size")),
          "p_partkey", "price_cents", "p_size")
        .orderBy("p_partkey"),
    Some(
      """WITH t AS (SELECT p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_cents,
        |    p_size::BIGINT AS p_size FROM part)
        |SELECT p_partkey, price_cents, p_size FROM t p
        |WHERE NOT EXISTS (SELECT 1 FROM t q
        |  WHERE q.price_cents <= p.price_cents AND q.p_size <= p.p_size
        |    AND (q.price_cents < p.price_cents OR q.p_size < p.p_size))
        |ORDER BY p_partkey""".stripMargin))

  /** Jackknife SE of the discount-share ratio over lineitem
    * ([[graft.operators.Evaluation.jackknifeRatioSE]]): both sides in
    * 1e-4 fixed-point units, every leave-one-out replicate an integer
    * division at scale 1e9, exact Σr / Σr² — the oracle replays the
    * identical fixed-point pipeline in HUGEINT.
    */
  val jackknife: QueryDef = QueryDef(
    "eval_jackknife_ratio",
    (s, dir) =>
      graft.operators.Evaluation.jackknifeRatioSE(
        Tables(s, dir).lineitem,
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT)"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 10000 " +
          "AS BIGINT)")),
    Some(
      """WITH b AS (SELECT
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      CAST(l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT) AS y,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 10000
        |      AS BIGINT) AS x
        |  FROM lineitem),
        |t AS (SELECT sum(y)::BIGINT AS sy, sum(x)::BIGINT AS sx,
        |    count(*)::BIGINT AS n FROM b),
        |r AS (SELECT n, sy, sx,
        |    (CAST(sy - y AS HUGEINT) * 1000000000) //
        |      CAST(sx - x AS HUGEINT) AS r
        |  FROM b CROSS JOIN t),
        |ag AS (SELECT n, sy, sx, sum(r) AS s, sum(r * r) AS sq
        |  FROM r GROUP BY n, sy, sx)
        |SELECT n, round(sy::DOUBLE / sx::DOUBLE, 6) + 0 AS ratio,
        |  round(sqrt(((n::DOUBLE - 1.0) / n::DOUBLE) *
        |    (sq::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)) / 1e9,
        |    8) + 0 AS se_jackknife
        |FROM ag""".stripMargin))

  /** Mutual information of lang × source
    * ([[graft.operators.Evaluation.mutualInformation]]): observed
    * cells only (0·log0 = 0), cell terms folded in (a, b) order,
    * margin entropies in key order, sqrt-normalized NMI.
    */
  val mi: QueryDef = QueryDef(
    "stats_mutual_information",
    (s, dir) =>
      graft.operators.Evaluation.mutualInformation(
        Tables(s, dir).documents, "lang", "source"),
    Some(
      """WITH o AS (SELECT lang AS a, source AS b, count(*)::BIGINT AS o
        |    FROM documents GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o)::BIGINT AS r FROM o GROUP BY a),
        |cb AS (SELECT b, sum(o)::BIGINT AS c FROM o GROUP BY b),
        |tt AS (SELECT sum(o)::BIGINT AS n FROM o),
        |mi AS (SELECT list_sum(list(
        |      (o.o::DOUBLE / n::DOUBLE) *
        |      ln((o.o::DOUBLE * n::DOUBLE) / (r::DOUBLE * c::DOUBLE))
        |      ORDER BY o.a, o.b)) AS mi
        |  FROM o JOIN ra ON ra.a = o.a JOIN cb ON cb.b = o.b
        |  CROSS JOIN tt),
        |ha AS (SELECT list_sum(list(
        |      -(r::DOUBLE / n::DOUBLE) * ln(r::DOUBLE / n::DOUBLE)
        |      ORDER BY a)) AS ha FROM ra CROSS JOIN tt),
        |hb AS (SELECT list_sum(list(
        |      -(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE)
        |      ORDER BY b)) AS hb FROM cb CROSS JOIN tt)
        |SELECT n, round(mi, 6) + 0 AS mi_nats,
        |  round(ha, 6) + 0 AS h_a, round(hb, 6) + 0 AS h_b,
        |  round(mi / sqrt(ha * hb), 6) + 0 AS nmi_sqrt
        |FROM mi CROSS JOIN ha CROSS JOIN hb CROSS JOIN tt""".stripMargin))

  /** Per-node local clustering coefficient over the near-dup pair
    * graph ([[graft.operators.GraphMetrics.localClustering]]):
    * template cliques read ~1, organic chains ~0; the oracle
    * enumerates triangles directly and joins the degree frame.
    */
  val lcc: QueryDef = QueryDef(
    "graph_clustering_coeff",
    (s, dir) => {
      val pairs = PipelineQueries.jaccardPairsFor(s, dir)
      graft.operators.GraphMetrics.localClustering(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("degree"),
          col("triangles"), col("lcc"))
        .orderBy("doc_id")
    },
    Some(
      """WITH tk AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
        |cj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |      FROM tk a JOIN tk b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM cj JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.95),
        |e AS (SELECT id_a AS u, id_b AS v FROM pairs
        |      UNION ALL SELECT id_b, id_a FROM pairs),
        |deg AS (SELECT u AS id, count(*)::BIGINT AS d FROM e GROUP BY u),
        |tr AS (SELECT ab.id_a AS a, ab.id_b AS b, bc.id_b AS c
        |       FROM pairs ab JOIN pairs bc ON ab.id_b = bc.id_a
        |       JOIN pairs ac ON ac.id_a = ab.id_a AND ac.id_b = bc.id_b),
        |cr AS (SELECT a AS id FROM tr UNION ALL SELECT b FROM tr UNION ALL SELECT c FROM tr),
        |ct AS (SELECT id, count(*)::BIGINT AS t FROM cr GROUP BY id)
        |SELECT deg.id AS doc_id, deg.d AS degree,
        |  coalesce(ct.t, 0)::BIGINT AS triangles,
        |  round(CASE WHEN deg.d < 2 THEN 0.0
        |    ELSE (2 * coalesce(ct.t, 0))::DOUBLE /
        |      (deg.d * (deg.d - 1))::DOUBLE END, 6) + 0 AS lcc
        |FROM deg LEFT JOIN ct ON ct.id = deg.id
        |ORDER BY doc_id""".stripMargin))

  /** Reciprocity of the event-type transition graph
    * ([[graft.operators.GraphMetrics.reciprocity]]): consecutive
    * per-user transitions (ordered by ts with event_id tiebreak)
    * define the directed edges; the readout is the share with a
    * reverse edge.
    */
  val recip: QueryDef = QueryDef(
    "graph_reciprocity",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = ev
        .withColumn("_next", lead(col("event_type"), 1).over(w))
        .filter(col("_next").isNotNull)
        .select(col("event_type").as("src"), col("_next").as("dst"))
      graft.operators.GraphMetrics.reciprocity(trans, "src", "dst")
    },
    Some(
      """WITH s AS (SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b
        |  FROM events),
        |e AS (SELECT DISTINCT a, b FROM s
        |      WHERE b IS NOT NULL AND a <> b),
        |r AS (SELECT count(*)::BIGINT AS n_reciprocal
        |      FROM e x JOIN e y ON x.a = y.b AND x.b = y.a),
        |c AS (SELECT count(*)::BIGINT AS n_edges FROM e)
        |SELECT n_edges, n_reciprocal,
        |  round(n_reciprocal::DOUBLE / n_edges::DOUBLE, 6) + 0
        |    AS reciprocity
        |FROM c CROSS JOIN r""".stripMargin))

  /** Cross-source vocabulary Jaccard
    * ([[graft.operators.TextAnalysis.sourceVocabJaccard]]): the
    * which-feeds-are-clones overlap map, 45 pairs for 10 sources.
    */
  val vocabJaccard: QueryDef = QueryDef(
    "text_source_vocab_jaccard",
    (s, dir) =>
      graft.operators.TextAnalysis.sourceVocabJaccard(
          Tables(s, dir).documents, "source", "text")
        .orderBy("src_a", "src_b"),
    Some(
      """WITH v AS (SELECT DISTINCT source AS s,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |sz AS (SELECT s, count(*)::BIGINT AS n FROM v GROUP BY s),
        |cm AS (SELECT a.s AS src_a, b.s AS src_b, count(*)::BIGINT
        |      AS common
        |    FROM v a JOIN v b ON a.w = b.w AND a.s < b.s GROUP BY 1, 2)
        |SELECT src_a, src_b, common, sa.n AS n_a, sb.n AS n_b,
        |  round(common::DOUBLE / (sa.n + sb.n - common)::DOUBLE, 6) + 0
        |    AS jaccard
        |FROM cm JOIN sz sa ON sa.s = src_a JOIN sz sb ON sb.s = src_b
        |ORDER BY src_a, src_b""".stripMargin))

  /** Fellegi–Sunter m/u weights over (brand, size)-blocked part pairs
    * ([[graft.operators.EntityResolution.fellegiSunterWeights]]):
    * three binary agreement fields (first name word, price within
    * $100, exact type), TWO UNROLLED EM steps from the fixed
    * (π=0.1, m=0.9, u=0.1) start — the corpus-scale work is one
    * aggregate to ≤8 pattern counts; the oracle replays both steps
    * over that frame with every float sum folded in pattern order.
    */
  val fellegiSunter: QueryDef = QueryDef(
    "er_fellegi_sunter",
    (s, dir) => {
      val p = Tables(s, dir).part.select(
        col("p_partkey"), col("p_brand"), col("p_size"), col("p_type"),
        split(col("p_name"), " ").getItem(0).as("_w1"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("_cents"))
      val pairs = p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      graft.operators.EntityResolution.fellegiSunterWeights(pairs, Seq(
        "name_first_word" -> (col("a._w1") === col("b._w1")),
        "price_within_100" ->
          (abs(col("a._cents") - col("b._cents")) <= 10000L),
        "type_exact" -> (col("a.p_type") === col("b.p_type"))))
    },
    Some(
      """WITH p AS (SELECT p_partkey, p_brand, p_size, p_type,
        |    split_part(p_name, ' ', 1) AS w1,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM part),
        |pr AS (SELECT
        |    CASE WHEN a.w1 = b.w1 THEN 1 ELSE 0 END AS g0,
        |    CASE WHEN abs(a.cents - b.cents) <= 10000 THEN 1 ELSE 0 END
        |      AS g1,
        |    CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS g2
        |  FROM p a JOIN p b ON a.p_brand = b.p_brand
        |    AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey),
        |pat AS (SELECT g0, g1, g2, count(*)::BIGINT AS n
        |  FROM pr GROUP BY 1, 2, 3),
        |mg AS (SELECT sum(n)::BIGINT AS nn, sum(n * g0)::BIGINT AS gg0,
        |    sum(n * g1)::BIGINT AS gg1, sum(n * g2)::BIGINT AS gg2
        |  FROM pat),
        |s1 AS (SELECT g0, g1, g2, n,
        |    0.1::DOUBLE * (CASE WHEN g0 = 1 THEN 0.9::DOUBLE ELSE 1.0::DOUBLE - 0.9::DOUBLE END)
        |      * (CASE WHEN g1 = 1 THEN 0.9::DOUBLE ELSE 1.0::DOUBLE - 0.9::DOUBLE END)
        |      * (CASE WHEN g2 = 1 THEN 0.9::DOUBLE ELSE 1.0::DOUBLE - 0.9::DOUBLE END) AS pm,
        |    (1.0::DOUBLE - 0.1::DOUBLE)
        |      * (CASE WHEN g0 = 1 THEN 0.1::DOUBLE ELSE 1.0::DOUBLE - 0.1::DOUBLE END)
        |      * (CASE WHEN g1 = 1 THEN 0.1::DOUBLE ELSE 1.0::DOUBLE - 0.1::DOUBLE END)
        |      * (CASE WHEN g2 = 1 THEN 0.1::DOUBLE ELSE 1.0::DOUBLE - 0.1::DOUBLE END) AS pu
        |  FROM pat),
        |f1 AS (SELECT
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) ORDER BY g0, g1, g2)) AS sw,
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) * g0 ORDER BY g0, g1, g2)) AS sw0,
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) * g1 ORDER BY g0, g1, g2)) AS sw1,
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) * g2 ORDER BY g0, g1, g2)) AS sw2
        |  FROM s1),
        |e1 AS (SELECT nn, gg0, gg1, gg2,
        |    least(greatest(sw / nn::DOUBLE, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS pi,
        |    least(greatest(sw0 / sw, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS m0, least(greatest((gg0::DOUBLE - sw0) / (nn::DOUBLE - sw), 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS u0,
        |    least(greatest(sw1 / sw, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS m1, least(greatest((gg1::DOUBLE - sw1) / (nn::DOUBLE - sw), 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS u1,
        |    least(greatest(sw2 / sw, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS m2, least(greatest((gg2::DOUBLE - sw2) / (nn::DOUBLE - sw), 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS u2
        |  FROM f1 CROSS JOIN mg),
        |s2 AS (SELECT g0, g1, g2, n,
        |    pi * (CASE WHEN g0 = 1 THEN m0 ELSE 1.0::DOUBLE - m0 END)
        |       * (CASE WHEN g1 = 1 THEN m1 ELSE 1.0::DOUBLE - m1 END)
        |       * (CASE WHEN g2 = 1 THEN m2 ELSE 1.0::DOUBLE - m2 END) AS pm,
        |    (1.0::DOUBLE - pi)
        |       * (CASE WHEN g0 = 1 THEN u0 ELSE 1.0::DOUBLE - u0 END)
        |       * (CASE WHEN g1 = 1 THEN u1 ELSE 1.0::DOUBLE - u1 END)
        |       * (CASE WHEN g2 = 1 THEN u2 ELSE 1.0::DOUBLE - u2 END) AS pu
        |  FROM pat CROSS JOIN e1),
        |f2 AS (SELECT
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) ORDER BY g0, g1, g2)) AS sw,
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) * g0 ORDER BY g0, g1, g2)) AS sw0,
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) * g1 ORDER BY g0, g1, g2)) AS sw1,
        |    list_sum(list(n::DOUBLE * (pm / (pm + pu)) * g2 ORDER BY g0, g1, g2)) AS sw2
        |  FROM s2),
        |e2 AS (SELECT nn, gg0, gg1, gg2,
        |    least(greatest(sw / nn::DOUBLE, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS pi,
        |    least(greatest(sw0 / sw, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS m0, least(greatest((gg0::DOUBLE - sw0) / (nn::DOUBLE - sw), 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS u0,
        |    least(greatest(sw1 / sw, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS m1, least(greatest((gg1::DOUBLE - sw1) / (nn::DOUBLE - sw), 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS u1,
        |    least(greatest(sw2 / sw, 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS m2, least(greatest((gg2::DOUBLE - sw2) / (nn::DOUBLE - sw), 0.000001::DOUBLE), 1.0::DOUBLE - 0.000001::DOUBLE) AS u2
        |  FROM f2 CROSS JOIN mg)
        |SELECT * FROM (
        |  SELECT 'name_first_word' AS field, nn AS n_pairs,
        |    round(pi, 6) + 0 AS pi, round(m0, 6) + 0 AS m,
        |    round(u0, 6) + 0 AS u,
        |    round(log2(m0 / u0), 6) + 0 AS w_agree,
        |    round(log2((1.0::DOUBLE - m0) / (1.0::DOUBLE - u0)), 6) + 0
        |      AS w_disagree
        |  FROM e2
        |  UNION ALL
        |  SELECT 'price_within_100', nn, round(pi, 6) + 0,
        |    round(m1, 6) + 0, round(u1, 6) + 0,
        |    round(log2(m1 / u1), 6) + 0,
        |    round(log2((1.0::DOUBLE - m1) / (1.0::DOUBLE - u1)), 6) + 0
        |  FROM e2
        |  UNION ALL
        |  SELECT 'type_exact', nn, round(pi, 6) + 0,
        |    round(m2, 6) + 0, round(u2, 6) + 0,
        |    round(log2(m2 / u2), 6) + 0,
        |    round(log2((1.0::DOUBLE - m2) / (1.0::DOUBLE - u2)), 6) + 0
        |  FROM e2)
        |ORDER BY field""".stripMargin))

  /** Rich-club coefficient of the near-dup graph at thresholds
    * 2/4/8 ([[graft.operators.GraphMetrics.richClub]]): edge density
    * among nodes of degree > k — template families light this up.
    */
  val richClubGate: QueryDef = QueryDef(
    "graph_rich_club",
    (s, dir) => {
      val pairs = PipelineQueries.jaccardPairsFor(s, dir)
      graft.operators.GraphMetrics.richClub(pairs, "id_a", "id_b",
        Seq(2, 4, 8))
    },
    Some(
      """WITH tk AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
        |cj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |      FROM tk a JOIN tk b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM cj JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.95),
        |e AS (SELECT id_a AS u, id_b AS v FROM pairs
        |      UNION ALL SELECT id_b, id_a FROM pairs),
        |deg AS (SELECT u AS id, count(*)::BIGINT AS d FROM e GROUP BY u),
        |ks AS (SELECT k::BIGINT AS k FROM (VALUES (2), (4), (8)) t(k)),
        |club AS (SELECT ks.k, deg.id FROM ks JOIN deg ON deg.d > ks.k),
        |nn AS (SELECT k, count(*)::BIGINT AS n_nodes FROM club GROUP BY k),
        |ne AS (SELECT cu.k, count(*)::BIGINT AS n_edges
        |  FROM pairs p JOIN club cu ON cu.id = p.id_a
        |  JOIN club cv ON cv.id = p.id_b AND cv.k = cu.k
        |  GROUP BY cu.k)
        |SELECT ks.k, coalesce(nn.n_nodes, 0)::BIGINT AS n_nodes,
        |  coalesce(ne.n_edges, 0)::BIGINT AS n_edges,
        |  round(CASE WHEN coalesce(nn.n_nodes, 0) < 2 THEN 0.0
        |    ELSE (2 * coalesce(ne.n_edges, 0))::DOUBLE /
        |      (nn.n_nodes * (nn.n_nodes - 1))::DOUBLE END, 6) + 0 AS phi
        |FROM ks LEFT JOIN nn ON nn.k = ks.k LEFT JOIN ne ON ne.k = ks.k
        |ORDER BY ks.k""".stripMargin))

  /** t-closeness over (lang, source) classes with the doc-length
    * bucket as ordinal sensitive value
    * ([[graft.operators.Governance.tCloseness]]): per-class ordered
    * EMD vs the corpus distribution, |Δcum| folded in value order
    * over the full global domain, normalized by K−1.
    */
  val tClosenessGate: QueryDef = QueryDef(
    "gov_t_closeness",
    (s, dir) =>
      graft.operators.Governance.tCloseness(
          Tables(s, dir).documents
            .withColumn("len_bucket", expr("n_chars div 100")),
          Seq("lang", "source"), "len_bucket")
        .orderBy("lang", "source"),
    Some(
      """WITH cells AS (SELECT lang, source, n_chars // 100 AS v,
        |    count(*)::BIGINT AS n FROM documents GROUP BY 1, 2, 3),
        |cls AS (SELECT lang, source, sum(n)::BIGINT AS ng
        |  FROM cells GROUP BY 1, 2),
        |dom AS (SELECT v, sum(n)::BIGINT AS nv FROM cells GROUP BY v),
        |domc AS (SELECT v, sum(nv)
        |    OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS cumall
        |  FROM dom),
        |tt AS (SELECT sum(nv)::BIGINT AS tot, count(*)::BIGINT AS k
        |  FROM dom),
        |grid AS (SELECT cls.lang, cls.source, cls.ng, domc.v,
        |    domc.cumall, coalesce(cells.n, 0) AS n
        |  FROM cls CROSS JOIN domc
        |  LEFT JOIN cells ON cells.lang = cls.lang
        |    AND cells.source = cls.source AND cells.v = domc.v),
        |gc AS (SELECT lang, source, ng, v, cumall,
        |    sum(n) OVER (PARTITION BY lang, source ORDER BY v
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cumg
        |  FROM grid),
        |f AS (SELECT lang, source, ng,
        |    list_sum(list(abs(cumg::DOUBLE / ng::DOUBLE -
        |      cumall::DOUBLE / tot::DOUBLE) ORDER BY v)) AS s
        |  FROM gc CROSS JOIN tt GROUP BY 1, 2, 3)
        |SELECT lang, source, ng AS n,
        |  round(s / (k - 1)::DOUBLE, 6) + 0 AS t
        |FROM f CROSS JOIN tt ORDER BY lang, source""".stripMargin))

  /** Kendall τ-b between quantity and price bucket over lineitem
    * ([[graft.operators.Evaluation.kendallTauB]]): concordant/
    * discordant from contingency-cell pairs, exact integer tie
    * correction — the O(n²) definition collapsed to cell-frame work.
    */
  val kendall: QueryDef = QueryDef(
    "eval_kendall_tau_b",
    (s, dir) =>
      graft.operators.Evaluation.kendallTauB(
        Tables(s, dir).lineitem.select(
          col("l_quantity").cast("long").as("qty_bucket"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 " +
            "AS BIGINT) div 1000000").as("price_bucket")),
        "qty_bucket", "price_bucket"),
    Some(
      """WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS a,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) // 1000000 AS bb
        |  FROM lineitem),
        |cells AS (SELECT a, bb, count(*)::BIGINT AS n
        |  FROM b GROUP BY 1, 2),
        |cd AS (SELECT
        |    sum(CASE WHEN c2.bb > c1.bb THEN c1.n * c2.n ELSE 0
        |      END)::BIGINT AS concordant,
        |    sum(CASE WHEN c2.bb < c1.bb THEN c1.n * c2.n ELSE 0
        |      END)::BIGINT AS discordant
        |  FROM cells c1 JOIN cells c2 ON c2.a > c1.a),
        |ta AS (SELECT sum((t * (t - 1)) // 2)::BIGINT AS n1t,
        |    sum(t)::BIGINT AS nn
        |  FROM (SELECT a, sum(n)::BIGINT AS t FROM cells GROUP BY a)),
        |tb AS (SELECT sum((t * (t - 1)) // 2)::BIGINT AS n2t
        |  FROM (SELECT bb, sum(n)::BIGINT AS t FROM cells GROUP BY bb))
        |SELECT nn AS n, concordant, discordant,
        |  round((concordant - discordant)::DOUBLE /
        |    sqrt((((nn * (nn - 1)) // 2)::DOUBLE - n1t::DOUBLE) *
        |      (((nn * (nn - 1)) // 2)::DOUBLE - n2t::DOUBLE)), 6) + 0
        |    AS tau_b
        |FROM cd CROSS JOIN ta CROSS JOIN tb""".stripMargin))

  /** Cliff's delta of doc length, English slice vs rest
    * ([[graft.operators.Evaluation.cliffsDelta]]): exact
    * greater/less pair counts from one cumulative window.
    */
  val cliffs: QueryDef = QueryDef(
    "eval_cliffs_delta",
    (s, dir) =>
      graft.operators.Evaluation.cliffsDelta(
        Tables(s, dir).documents, "n_chars", col("lang") === "en"),
    Some(
      """WITH pv AS (SELECT n_chars::BIGINT AS v,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS nb
        |  FROM documents GROUP BY 1),
        |c AS (SELECT v, na, nb, sum(nb)
        |    OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS cumb
        |  FROM pv),
        |t AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb
        |  FROM pv),
        |ag AS (SELECT sum(na * (cumb - nb))::BIGINT AS n_gt,
        |    sum(na * (tb - cumb))::BIGINT AS n_lt
        |  FROM c CROSS JOIN t)
        |SELECT ta AS n_a, tb AS n_b, n_gt, n_lt,
        |  round((n_gt - n_lt)::DOUBLE / (ta * tb)::DOUBLE, 6) + 0
        |    AS delta
        |FROM ag CROSS JOIN t""".stripMargin))

  /** Directional association rules over (user, day) behavioral
    * baskets ([[graft.operators.FrequentItemsets.associationRules]]):
    * confidence and lift on top of the gated pair support — the
    * "users who X also Y, corrected for base rates" readout.
    */
  val assocRules: QueryDef = QueryDef(
    "mining_association_rules",
    (s, dir) =>
      graft.operators.FrequentItemsets.associationRules(
          Tables(s, dir).events
            .select(concat_ws("@", col("user_id").cast("string"),
              to_date(col("ts")).cast("string")).as("basket"),
              col("event_type")),
          "basket", "event_type", minSupport = 570L,
          minConfidencePct = 30L)
        .orderBy("antecedent", "consequent"),
    Some(
      """WITH it AS (SELECT DISTINCT
        |    user_id::VARCHAR || '@' || ts::DATE::VARCHAR AS basket,
        |    event_type AS item
        |  FROM events),
        |f AS (SELECT item, count(*) AS cnt FROM it GROUP BY item
        |      HAVING count(*) >= 570),
        |tot AS (SELECT count(DISTINCT basket)::BIGINT AS nb FROM it),
        |fi AS (SELECT basket, it.item, f.cnt
        |       FROM it JOIN f ON f.item = it.item),
        |p AS (SELECT a.item AS ia, b.item AS ib,
        |    a.cnt::BIGINT AS ca, b.cnt::BIGINT AS cb,
        |    count(*)::BIGINT AS s
        |  FROM fi a JOIN fi b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 570),
        |r AS (SELECT ia AS antecedent, ib AS consequent, s,
        |        ca AS na, cb AS nc FROM p
        |      UNION ALL SELECT ib, ia, s, cb, ca FROM p)
        |SELECT antecedent, consequent, s AS support,
        |  na AS n_antecedent, nc AS n_consequent,
        |  round(s::DOUBLE / na::DOUBLE, 6) + 0 AS confidence,
        |  round(s::DOUBLE * nb::DOUBLE / (na::DOUBLE * nc::DOUBLE), 6)
        |    + 0 AS lift
        |FROM r CROSS JOIN tot
        |WHERE 100 * s >= 30 * na
        |ORDER BY antecedent, consequent""".stripMargin))

  /** k-anonymity enforcement by suppression
    * ([[graft.operators.Governance.kAnonymizeSuppress]]): rows in
    * sub-k (lang, source) cells get both QI columns masked; the
    * row-level masking decision is under the hash.
    */
  val kSuppress: QueryDef = QueryDef(
    "gov_k_suppress",
    (s, dir) =>
      graft.operators.Governance.kAnonymizeSuppress(
          Tables(s, dir).documents.select("doc_id", "lang", "source"),
          Seq("lang", "source"), k = 25)
        .select("doc_id", "lang", "source", "suppressed")
        .orderBy("doc_id"),
    Some(
      """WITH c AS (SELECT lang, source, count(*)::BIGINT AS cn
        |  FROM documents GROUP BY lang, source),
        |j AS (SELECT d.doc_id, d.lang, d.source, c.cn < 25 AS suppressed
        |  FROM documents d JOIN c
        |    ON d.lang IS NOT DISTINCT FROM c.lang
        |   AND d.source IS NOT DISTINCT FROM c.source)
        |SELECT doc_id,
        |  CASE WHEN suppressed THEN '*' ELSE lang END AS lang,
        |  CASE WHEN suppressed THEN '*' ELSE source END AS source,
        |  suppressed
        |FROM j ORDER BY doc_id""".stripMargin))

  /** Power-law degree exponent MLE
    * ([[graft.operators.GraphMetrics.powerLawAlpha]]): CSN α over the
    * near-dup graph's degrees ≥ 2, log fold in sorted degree order
    * over the degree-domain frame.
    */
  val powerLaw: QueryDef = QueryDef(
    "graph_powerlaw_alpha",
    (s, dir) => {
      val pairs = PipelineQueries.jaccardPairsFor(s, dir)
      graft.operators.GraphMetrics.powerLawAlpha(pairs, "id_a", "id_b")
    },
    Some(
      """WITH tk AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
        |cj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |      FROM tk a JOIN tk b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM cj JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.95),
        |e AS (SELECT id_a AS u FROM pairs UNION ALL SELECT id_b FROM pairs),
        |deg AS (SELECT u, count(*)::BIGINT AS d FROM e GROUP BY u),
        |dd AS (SELECT d, count(*)::BIGINT AS m FROM deg
        |       WHERE d >= 2 GROUP BY d)
        |SELECT sum(m)::BIGINT AS n_nodes,
        |  round(1.0 + sum(m)::DOUBLE /
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(m::DOUBLE * ln(d::DOUBLE / 1.5) ORDER BY d)),
        |      (a, b) -> a + b), 6) + 0 AS alpha
        |FROM dd""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(skyline, jackknife, mi, lcc, recip, vocabJaccard, fellegiSunter,
      richClubGate, tClosenessGate, kendall, cliffs, assocRules,
      kSuppress, powerLaw)
}
