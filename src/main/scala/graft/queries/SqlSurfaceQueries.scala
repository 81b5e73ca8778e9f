package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Remaining relational-SQL surface a migrating user expects (SURVEY.md
  * §2.6): scalar subqueries, null-safe equality, pivot, set operations,
  * and semi-structured (JSON) extraction — each under the DuckDB oracle.
  */
object SqlSurfaceQueries extends QueryGroup {

  /** Scalar-subquery shape: rows above the global mean. The comparison is
    * multiplied through (price·n > Σprice) so it stays in EXACT decimal —
    * a divided average would round differently per engine and flip rows
    * at the boundary. The aggregate side is one row, broadcast into the
    * comparison; no correlated re-execution.
    */
  val aboveAverage: QueryDef = QueryDef(
    "scalar_subquery_above_avg",
    (s, dir) => {
      val t = Tables(s, dir)
      val aggDf = t.orders.agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"),
        count(lit(1)).as("n"))
      t.orders.crossJoin(broadcast(aggDf))
        .filter(col("o_totalprice").cast(DecimalType(18, 2)) * col("n") > col("total"))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    },
    Some(
      "SELECT o_orderkey FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) * " +
        "(SELECT count(*) FROM orders) > " +
        "(SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders) " +
        "ORDER BY o_orderkey"))

  /** Null-safe equality (<=> / IS NOT DISTINCT FROM) over a nullable
    * derived column.
    */
  val nullSafeEq: QueryDef = QueryDef(
    "null_safe_equality",
    (s, dir) =>
      Tables(s, dir).events
        .withColumn("flag",
          when(col("event_type") === "error", lit(null).cast("string"))
            .otherwise(col("event_type")))
        .filter(col("flag") <=> lit(null).cast("string"))
        .select("event_id")
        .orderBy("event_id"),
    Some(
      """SELECT event_id FROM (
        |  SELECT event_id,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS flag
        |  FROM events) WHERE flag IS NOT DISTINCT FROM NULL
        |ORDER BY event_id""".stripMargin))

  /** Pivot: order counts per segment spread across status columns.
    * Pivot values are declared explicitly — at scale an implicit pivot
    * needs an extra distinct pass to discover them.
    */
  val pivot: QueryDef = QueryDef(
    "pivot_status_by_segment",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("c_mktsegment")
    },
    Some(
      """SELECT c_mktsegment,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Set operations: high-balance customers EXCEPT those with open
    * orders, UNION the very top tier — distinct semantics on both ops.
    */
  val setOps: QueryDef = QueryDef(
    "setop_union_except",
    (s, dir) => {
      val t = Tables(s, dir)
      val rich = t.customer.filter(col("c_acctbal") > 9000).select("c_custkey")
      val open = t.orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      val top = t.customer.filter(col("c_acctbal") > 9900).select("c_custkey")
      rich.except(open).union(top).distinct().orderBy("c_custkey")
    },
    Some(
      """SELECT DISTINCT c_custkey FROM (
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |   EXCEPT
        |   SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O')
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
        |ORDER BY c_custkey""".stripMargin))

  /** Semi-structured extraction: JSON props parsed to a typed MAP and
    * probed — schema-on-read without a UDF.
    */
  val jsonMap: QueryDef = QueryDef(
    "json_map_extract",
    (s, dir) =>
      Tables(s, dir).events
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))("k")
            .as("k_value"))
        .orderBy("event_id"),
    Some(
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) " +
        "AS k_value FROM events ORDER BY event_id"))

  /** The ranking-window family in one result: rank, dense_rank,
    * percent_rank, cume_dist, ntile — the remaining window surface a
    * migrating user expects beyond row_number (`topk_per_group`) and
    * the frame-based windows (`events_moving_window`). The fractional
    * ranks divide the same exact integers on both engines and round
    * to 6 dp.
    *
    * Scale note: this gate DEMONSTRATES the SQL window API over a
    * handful of segments; ranking a corpus-scale frame by a
    * low-cardinality group belongs on [[graft.operators.Ranks]]
    * (withGroupRank / withGroupNtile / topKPerGroup), which spreads
    * each group over range sub-buckets instead of one task.
    */
  val rankFamily: QueryDef = QueryDef(
    "window_rank_family",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables(s, dir).customer
        .select(col("c_mktsegment"), col("c_custkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    },
    Some(
      """SELECT c_mktsegment, c_custkey,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  ntile(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin))

  /** UNPIVOT (wide → long): per-flag measure columns stacked into
    * (measure, value) rows — the reshaping step metric exporters and
    * drift reports run; `stack` stays a projection (no shuffle beyond
    * the aggregate that built the wide frame).
    */
  val unpivot: QueryDef = QueryDef(
    "unpivot_stack",
    (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .select(col("l_returnflag"), expr(
          "stack(3, 'n_rows', n_rows, 'n_orders', n_orders, " +
            "'n_parts', n_parts) AS (measure, value)"))
        .orderBy("l_returnflag", "measure"),
    Some(
      """WITH w AS (SELECT l_returnflag, count(*) AS n_rows,
        |    count(DISTINCT l_orderkey) AS n_orders,
        |    count(DISTINCT l_partkey) AS n_parts
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'n_rows' AS measure, n_rows AS value FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'n_orders', n_orders FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'n_parts', n_parts FROM w)
        |ORDER BY l_returnflag, measure""".stripMargin))

  /** Value-RANGE window frame — `RANGE BETWEEN 30 PRECEDING AND
    * CURRENT ROW` over order-date days: the trailing-30-day customer
    * spend that ROWS frames (`events_moving_window`) cannot express
    * (peers at the same day all join the frame; gaps in the date
    * axis shrink it). Money sums go through DECIMAL(18,2) on both
    * engines (the order-independence contract), then one double cast.
    */
  val rangeFrame: QueryDef = QueryDef(
    "window_range_frame",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val o = Tables(s, dir).orders.select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01"))
          .cast("long").as("d"),
        col("o_totalprice"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
        .rangeBetween(-30, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("d"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("spend_30d"))
        .orderBy("o_orderkey")
    },
    Some(
      """SELECT o_orderkey, o_custkey,
        |  date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS d,
        |  sum(o_totalprice::DECIMAL(18,2)) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate::DATE)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)::DOUBLE AS spend_30d
        |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** RECURSIVE CTE (Spark 4.1 `UnionLoop`): ancestor-walk depth in the
    * implicit doc_id binary hierarchy (child → id div 2) — bounded
    * recursion (⌈log₂ N⌉ iterations), each step a self-reference over
    * the shrinking frontier, gated against DuckDB's WITH RECURSIVE on
    * the identical walk. The SQL-surface row a migrating user checks
    * before trusting hierarchy rollups to the engine.
    */
  val recursiveCte: QueryDef = QueryDef(
    "sql_recursive_hierarchy",
    (s, dir) => {
      Tables(s, dir).documents.createOrReplaceTempView("documents_rec")
      s.sql(
        """WITH RECURSIVE anc AS (
          |  SELECT doc_id, doc_id AS cur, 0 AS depth
          |  FROM documents_rec WHERE doc_id % 11 = 0
          |  UNION ALL
          |  SELECT doc_id, cur div 2 AS cur, depth + 1 AS depth
          |  FROM anc WHERE cur > 1)
          |SELECT doc_id, CAST(max(depth) AS BIGINT) AS depth_to_root
          |FROM anc GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    },
    Some(
      """WITH RECURSIVE anc AS (
        |  SELECT doc_id, doc_id AS cur, 0 AS depth
        |  FROM documents WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, cur // 2 AS cur, depth + 1 AS depth
        |  FROM anc WHERE cur > 1)
        |SELECT doc_id, max(depth)::BIGINT AS depth_to_root
        |FROM anc GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT: top-2
    * orders per customer — the "top-N per group without a window"
    * idiom. Both engines run the same correlated-lateral SQL text
    * modulo the decimal cast.
    */
  val lateralTopK: QueryDef = QueryDef(
    "sql_lateral_topk",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.createOrReplaceTempView("customer_lat")
      t.orders.createOrReplaceTempView("orders_lat")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey,
          |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
          |    AS totalprice
          |FROM customer_lat c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_lat
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    },
    Some(
      """SELECT c.c_custkey, o.o_orderkey,
        |  CAST(o.o_totalprice AS DECIMAL(18,2))::DOUBLE AS totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c_custkey, o_orderkey""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(aboveAverage, nullSafeEq, pivot, setOps, jsonMap, rankFamily,
      unpivot, rangeFrame, recursiveCte, lateralTopK)
}
