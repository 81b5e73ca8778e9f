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

  def defs: Seq[QueryDef] = Seq(gini, benford, kruskal, fd, ind)
}
