package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join surface — SURVEY.md §2.6: the reference's sibling collections
  * (`variables`/`questions`, tests/test_serve.py:1283-1286) and set-
  * membership semi-joins (S4, metadataformats.py:287-295) need real joins
  * in the Spark engine. Dimension tables are broadcast (region: 5 rows,
  * nation: 25) so the fact side never shuffles for them.
  */
object JoinQueries extends QueryGroup {

  /** Broadcast dim join: revenue per market segment. customer is the
    * small side at any SF ratio — broadcast it; orders never shuffles.
    */
  val joinBroadcast: QueryDef = QueryDef(
    "join_broadcast_dim",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    },
    Some(
      "SELECT c_mktsegment, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
        "count(*) AS n_orders " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"))

  /** Multiway snowflake join: customer → nation → region, all dims
    * broadcast; one aggregate shuffle total.
    */
  val joinMultiway: QueryDef = QueryDef(
    "join_multiway_snowflake",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
            .as("total_acctbal"))
        .orderBy("r_name")
    },
    Some(
      "SELECT r_name, count(*) AS n_customers, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name ORDER BY r_name"))

  /** Left-semi join — the S4 configurable-set membership shape
    * (`studies ⋉ set_members`, metadataformats.py:287-295): orders that
    * have at least one high-quantity lineitem, without duplicating rows.
    */
  val joinSemi: QueryDef = QueryDef(
    "join_semi_membership",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .join(t.lineitem.filter(col("l_quantity") > 48).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    },
    Some(
      "SELECT o_orderkey FROM orders WHERE EXISTS (" +
        "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48) " +
        "ORDER BY o_orderkey"))

  /** Left-anti join — records NOT in any set (the complement enumeration
    * ListSets needs): customers with no orders.
    */
  val joinAnti: QueryDef = QueryDef(
    "join_anti_complement",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(
          t.orders.filter(col("o_totalprice") > 300000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    },
    Some(
      "SELECT c_custkey FROM customer WHERE NOT EXISTS (" +
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_totalprice > 300000) ORDER BY c_custkey"))

  /** FULL OUTER reconciliation: per-customer order stats stitched to
    * the customer dimension with both unmatched sides preserved —
    * customers that never ordered AND (synthetically restricted)
    * orders whose customer is outside the dimension slice. The
    * null-preserving join type the reconciliation/audit jobs need.
    */
  val joinFullOuter: QueryDef = QueryDef(
    "join_full_outer_reconcile",
    (s, dir) => {
      val t = Tables(s, dir)
      val dims = t.customer.filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      val facts = t.orders
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("total_spend"))
      dims.join(facts, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_mktsegment"), col("n_orders"), col("total_spend"))
        .orderBy("custkey")
    },
    Some(
      """WITH dims AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0),
        |facts AS (SELECT o_custkey, count(*) AS n_orders,
        |            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |          FROM orders GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_mktsegment,
        |       n_orders, total_spend
        |FROM dims FULL OUTER JOIN facts ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin))

  /** Bloom-prefiltered semi-join, gated: [[graft.operators.BloomJoin]]
    * builds a Bloom filter over the selective orders subset's keys and
    * drops lineitem rows MAP-SIDE before the join shuffle (the fact
    * side's exchange carries only `selectivity + fpp` of the table — the
    * 100 TB case where the build side outgrows broadcast but its key
    * set fits a few-MB filter). The oracle is the PLAIN semi-join,
    * proving pre-filter + exact join is result-identical — a Bloom
    * filter has no false negatives, and the exact join removes the ~fpp
    * false positives.
    */
  val joinBloomPrefilter: QueryDef = QueryDef(
    "join_bloom_prefilter",
    (s, dir) => {
      val t = Tables(s, dir)
      graft.operators.BloomJoin.semiJoin(
          t.lineitem,
          t.orders.filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 250000).select("o_orderkey"),
          "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },
    Some(
      "SELECT l_returnflag, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "count(*) AS cnt " +
        "FROM lineitem WHERE EXISTS (" +
        "SELECT 1 FROM orders WHERE o_orderkey = l_orderkey " +
        "AND o_orderpriority = '1-URGENT' AND o_totalprice > 250000) " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"))

  /** Portable md5-contract Bloom filter ([[graft.operators.BloomJoin
    * .portableBloomBits]] / `portableMightContain`): bit position j of
    * a key is md5(key ":" j) mod m, so DuckDB rebuilds the IDENTICAL
    * bit set and the gate hash-checks the filter's exact membership
    * verdicts — including which false positives occur (m=4096 over
    * ~1300 build keys yields true negatives, false positives,
    * and true positives at sf0.01). The twin pattern of
    * `join_bloom_prefilter`: that gate proves the xxhash64 path's
    * downstream identity; this one puts the filter itself under the
    * oracle.
    */
  val joinBloomPortable: QueryDef = QueryDef(
    "join_bloom_portable",
    (s, dir) => {
      val t = Tables(s, dir)
      val build = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
      val bits = graft.operators.BloomJoin
        .portableBloomBits(build, "k", m = 4096, k = 3)
      val verdicts = graft.operators.BloomJoin.portableMightContain(
        t.customer.select(col("c_custkey")), "c_custkey", bits,
        m = 4096, k = 3)
      verdicts
        .join(build.distinct().select(col("k").as("key"),
          lit(true).as("_p")), Seq("key"), "left_outer")
        .select(col("key"), col("might_contain"),
          coalesce(col("_p"), lit(false)).as("present"))
        .orderBy("key")
    },
    Some(
      """WITH ck AS (SELECT DISTINCT o_custkey AS key FROM orders
        |            WHERE o_orderpriority = '1-URGENT'),
        |bits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(key::VARCHAR || ':' || j), 1, 15))
        |      ::BIGINT % 4096 AS pos
        |  FROM ck, unnest(range(0, 3)) AS t(j)),
        |pp AS (SELECT DISTINCT c_custkey AS key,
        |    ('0x' || substr(md5(c_custkey::VARCHAR || ':' || j), 1, 15))
        |      ::BIGINT % 4096 AS pos
        |  FROM customer, unnest(range(0, 3)) AS t(j)),
        |need AS (SELECT key, count(*) AS need FROM pp GROUP BY key),
        |got AS (SELECT key, count(*) AS got
        |        FROM pp JOIN bits USING (pos) GROUP BY key)
        |SELECT need.key, coalesce(got.got, 0) = need.need AS might_contain,
        |  need.key IN (SELECT key FROM ck) AS present
        |FROM need LEFT JOIN got ON got.key = need.key
        |ORDER BY need.key""".stripMargin))

  /** Grid-blocked spatial distance self-join
    * ([[graft.operators.Spatial.gridNeighborPairs]]): synthetic
    * integer points derived from customer keys (multiplicative-hash
    * coordinates, exact long arithmetic both engines), all pairs
    * within Euclidean distance 20 000. The ORACLE IS ALL-PAIRS — the
    * gate proves the 3×3-cell blocking finds exactly the brute-force
    * pair set while candidate work stays Σ per-cell occupancy, never
    * n².
    */
  val joinSpatialGrid: QueryDef = QueryDef(
    "join_spatial_grid",
    (s, dir) => {
      val pts = Tables(s, dir).customer.select(
        col("c_custkey").as("id"),
        (col("c_custkey") * 2654435761L % 1000000L).as("x"),
        (col("c_custkey") * 2246822519L % 1000000L).as("y"))
      graft.operators.Spatial.gridNeighborPairs(pts, "id", "x", "y",
          maxDist = 20000L)
        .orderBy("id_a", "id_b")
    },
    Some(
      """WITH p AS (SELECT c_custkey AS id,
        |    (c_custkey * 2654435761) % 1000000 AS x,
        |    (c_custkey * 2246822519) % 1000000 AS y
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |  <= 400000000
        |ORDER BY id_a, id_b""".stripMargin))

  override def defs: Seq[QueryDef] =
    Seq(joinBroadcast, joinMultiway, joinSemi, joinAnti, joinFullOuter,
      joinBloomPrefilter, joinBloomPortable, joinSpatialGrid)
}
