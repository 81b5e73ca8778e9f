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

  def defs: Seq[QueryDef] =
    Seq(skyline, jackknife, mi, lcc, recip, vocabJaccard)
}
