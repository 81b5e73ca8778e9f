package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core query operators — one QueryDef per DocStore-DSL operator in
  * SURVEY.md §2.1 (Q1..Q12), expressed over the driver testdata with the
  * same Spark primitive the Study engine uses (see graft.query.FilterDsl).
  *
  * Reference semantics (cited file:line in each def) come from
  * cessda.cdc.aggregator.oai-pmh-repo-handler; the shapes here are the
  * testdata analogues the DuckDB oracle can check.
  */
object CoreQueries extends QueryGroup {

  /** Exact decimal sum surfaced as double: decimal arithmetic is
    * order-independent, so the hash matches DuckDB regardless of Spark's
    * partial-aggregation order (a double sum would not).
    */
  private def dsum(c: Column, alias: String): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double").as(alias)

  /** Q1 point lookup — reference `query_single` on `_aggregator_identifier`
    * (metadataformats.py:477-478): key-equality filter + narrow projection.
    * At scale this is a parquet scan with min/max row-group skipping on the
    * pushed `o_orderkey = 42` predicate.
    */
  val q1PointLookup: QueryDef = QueryDef(
    "q1_point_lookup",
    (s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderkey") === 42)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
    Some(
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey = 42"))

  /** Q2 filtered scan — `query_multiple` with datestamp filter + projection
    * (tests/test_serve.py:1342,1384-1424). Filter and 4-column projection
    * must both reach the parquet scan (PushedFilters + ReadSchema).
    */
  val q2FilteredScan: QueryDef = QueryDef(
    "q2_filtered_scan",
    (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
    Some(
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag " +
        "FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01' " +
        "ORDER BY l_orderkey, l_linenumber"))

  /** Q3 distinct values, flat field — `query_distinct` on
    * `_direct_base_url` (metrics.py:179). Partial-aggregate distinct:
    * map-side dedup before the single shuffle.
    */
  val q3DistinctFlat: QueryDef = QueryDef(
    "q3_distinct_flat",
    (s, dir) =>
      Tables(s, dir).documents
        .select("source").distinct().orderBy("source"),
    Some("SELECT DISTINCT source FROM documents ORDER BY source"))

  /** Q3 distinct values of an array-derived field — `query_distinct` on
    * `study_titles.language` (tests/test_serve.py:1199-1203): explode the
    * per-record array, then distinct. explode is narrow; the only shuffle
    * is the distinct's hash aggregate.
    */
  val q3DistinctArray: QueryDef = QueryDef(
    "q3_distinct_array",
    (s, dir) =>
      Tables(s, dir).documents
        .filter(col("lang") === "en")
        .select(explode(split(col("text"), " ")).as("word"))
        .distinct().orderBy("word"),
    Some(
      "SELECT DISTINCT word FROM (SELECT unnest(string_split(text, ' ')) AS word " +
        "FROM documents WHERE lang = 'en') ORDER BY word"))

  /** Q4 count — `query_count` (metrics.py:170-176). */
  val q4Count: QueryDef = QueryDef(
    "q4_count_filtered",
    (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("cnt")),
    Some("SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'"))

  /** Q5 equality predicate — `{field: value}` (metrics.py:182). */
  val q5Eq: QueryDef = QueryDef(
    "q5_eq_predicate",
    (s, dir) =>
      Tables(s, dir).events
        .filter(col("event_type") === "error")
        .select("event_id", "user_id")
        .orderBy("event_id"),
    Some(
      "SELECT event_id, user_id FROM events WHERE event_type = 'error' " +
        "ORDER BY event_id"))

  /** Q6 `$in` membership (metadataformats.py:294-295,786-788). */
  val q6In: QueryDef = QueryDef(
    "q6_in_membership",
    (s, dir) =>
      Tables(s, dir).customer
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey"),
    Some(
      "SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') ORDER BY c_custkey"))

  /** Q7 `$ne` — exclude soft-deleted (metrics.py:172-176). Spark's =!= is
    * null-rejecting exactly like Mongo `$ne` on an always-present field.
    */
  val q7Ne: QueryDef = QueryDef(
    "q7_ne_predicate",
    (s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderstatus") =!= "F")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus"),
    Some(
      "SELECT o_orderstatus, count(*) AS cnt FROM orders " +
        "WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus ORDER BY o_orderstatus"))

  /** Q8 `$lt` on ISO timestamp — selective-harvest upper bound
    * (tests/test_serve.py:1342). TimestampType comparison, pushed to the
    * scan for row-group pruning (the analogue of the reference's indexed
    * datestamp filter).
    */
  val q8LtTimestamp: QueryDef = QueryDef(
    "q8_lt_isodate",
    (s, dir) =>
      Tables(s, dir).events
        .filter(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("event_id", "event_type")
        .orderBy("event_id"),
    Some(
      "SELECT event_id, event_type FROM events " +
        "WHERE ts < TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id"))

  /** Q9 `$elemMatch` on array-of-struct (metadataformats.py:416-430):
    * "has an element with base_url = X AND direct = true". Spark primitive:
    * the higher-order `exists` over an array<struct> column — built here
    * from lineitem so the oracle can state it as an EXISTS subquery.
    *
    * BENCH NOTE: ~90% of this gate's measured time is the collect_list
    * group-by that CONSTRUCTS the array-of-struct input from flat TPC-H
    * rows, not the `exists` filter under test — a slow reading here is
    * gate-construction cost, not an operator regression.
    */
  val q9ElemMatch: QueryDef = QueryDef(
    "q9_elemmatch_exists",
    (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_quantity"), col("l_returnflag"))).as("items"))
        .filter(exists(
          col("items"),
          i => i.getField("l_quantity") > 49 && i.getField("l_returnflag") === "R"))
        .select("l_orderkey")
        .orderBy("l_orderkey"),
    Some(
      "SELECT DISTINCT l_orderkey FROM lineitem " +
        "WHERE l_quantity > 49 AND l_returnflag = 'R' ORDER BY l_orderkey"))

  /** Q10 `$and` conjunction (metrics.py:189-196): one Catalyst Filter node,
    * all three conjuncts pushed together.
    */
  val q10And: QueryDef = QueryDef(
    "q10_and_conjunction",
    (s, dir) =>
      Tables(s, dir).orders
        .filter(
          col("o_orderstatus") === "O" &&
            col("o_totalprice") < 50000 &&
            col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey")
        .orderBy("o_orderkey"),
    Some(
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' " +
        "AND o_totalprice < 50000 AND o_orderdate >= TIMESTAMP '1998-01-01' " +
        "ORDER BY o_orderkey"))

  /** Q11 projection pushdown — per-format field lists
    * (tests/test_serve.py:1379-1471): 2 of 6 columns read; ReadSchema in
    * the explain must show only these plus the filter column.
    */
  val q11Projection: QueryDef = QueryDef(
    "q11_projection_pushdown",
    (s, dir) =>
      Tables(s, dir).part
        .filter(col("p_size") === 10)
        .select("p_partkey", "p_brand")
        .orderBy("p_partkey"),
    Some(
      "SELECT p_partkey, p_brand FROM part WHERE p_size = 10 ORDER BY p_partkey"))

  /** Q12 pagination via keyset cursor (CHANGELOG.md:69-73): deterministic
    * order on a unique key + `key > cursor` + limit. Unlike OFFSET, the
    * cursor predicate is pushed to the scan so page N never rereads pages
    * 1..N-1 — the only resumption-token design that survives 100 TB.
    */
  val q12Pagination: QueryDef = QueryDef(
    "q12_pagination_keyset",
    (s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderkey") > 100)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .limit(100),
    Some(
      "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey > 100 " +
        "ORDER BY o_orderkey LIMIT 100"))

  /** Flagship pricing-summary aggregate (TPC-H Q1 shape): exercises the
    * partial-aggregate + single-shuffle groupBy the metrics workload (§2.4)
    * collapses to. All money sums go through exact decimal.
    */
  val aggPricingSummary: QueryDef = QueryDef(
    "agg_pricing_summary",
    (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), "sum_qty"),
          dsum(col("l_extendedprice"), "sum_base_price"),
          sum(
            col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"))

  override def defs: Seq[QueryDef] = Seq(
    q1PointLookup, q2FilteredScan, q3DistinctFlat, q3DistinctArray, q4Count,
    q5Eq, q6In, q7Ne, q8LtTimestamp, q9ElemMatch, q10And, q11Projection,
    q12Pagination, aggPricingSummary)
}
