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

  def defs: Seq[QueryDef] =
    Seq(aboveAverage, nullSafeEq, pivot, setOps, jsonMap)
}
