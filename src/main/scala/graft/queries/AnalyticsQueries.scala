package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Wider analytics surface beyond the reference (SURVEY.md §2.6 notes the
  * reference has no joins/windows/grouping sets — a user migrating to this
  * engine gets them from Spark, verified here under the oracle): rollup,
  * per-group top-k, TPC-H-shaped multi-join aggregations, and the
  * approximate-distinct scale path.
  */
object AnalyticsQueries extends QueryGroup {

  private def dsum(c: org.apache.spark.sql.Column, alias: String) =
    sum(c.cast(DecimalType(18, 2))).cast("double").as(alias)

  /** ROLLUP grouping sets. NULLS FIRST ordering pinned explicitly — Spark
    * defaults nulls-first ascending, DuckDB nulls-last.
    */
  val rollup: QueryDef = QueryDef(
    "agg_rollup",
    (s, dir) =>
      Tables(s, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity"), "sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "count(*) AS cnt FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"))

  /** Top-k per group via ranked window (deterministic tiebreak on
    * key). API-surface demo over a handful of segments; the
    * corpus-scale form is [[graft.operators.Ranks.topKPerGroup]]
    * (salted two-stage, no whole-group sort).
    */
  val topKPerGroup: QueryDef = QueryDef(
    "topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables(s, dir).customer
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("c_mktsegment", "rk", "c_custkey")
        .orderBy("c_mktsegment", "rk")
    },
    Some(
      """SELECT c_mktsegment, rk, c_custkey FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin))

  /** TPC-H Q3 shape: 3-way join, filtered both sides, grouped revenue,
    * top-10. At scale: lineitem⨝orders shuffles on orderkey; customer is
    * the broadcast side of its join.
    */
  val shippingPriority: QueryDef = QueryDef(
    "tpch_q3_shipping_priority",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2))) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q5 shape: 6-way snowflake with a co-nation constraint. region/
    * nation broadcast; the customer⨝orders⨝lineitem⨝supplier chain
    * shuffles on its keys once each.
    */
  val localSupplierVolume: QueryDef = QueryDef(
    "tpch_q5_local_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      t.region.filter(col("r_name") === "ASIA")
        .join(broadcast(t.nation), col("n_regionkey") === col("r_regionkey"))
        .join(t.customer, col("c_nationkey") === col("n_nationkey"))
        .join(t.orders, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier,
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2))) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
          .cast("double").as("revenue"))
        .orderBy(col("n_name"))
    },
    Some(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Approximate distinct (HLL++) — the 100 TB path for A3; algorithms
    * differ across engines so this is a rows-only check (the exact
    * variant is oracle-checked as a3_distinct_publishers).
    */
  val approxDistinct: QueryDef = QueryDef(
    "a3_approx_distinct",
    (s, dir) =>
      Tables(s, dir).lineitem
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts")),
    None)

  /** CUBE grouping sets (all four combinations) — completes the
    * grouping-set family next to [[rollup]]; same NULLS FIRST pinning.
    */
  val cube: QueryDef = QueryDef(
    "agg_cube",
    (s, dir) =>
      Tables(s, dir).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity"), "sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "count(*) AS cnt FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"))

  /** TPC-H Q10 shape (returned-item reporting): date-windowed orders ⨝
    * returned lineitems ⨝ customer ⨝ broadcast nation, revenue per
    * customer, top 20. The canonical "who cost us money this quarter"
    * reporting join — shuffles on custkey/orderkey, dimension broadcast.
    */
  val returnedItems: QueryDef = QueryDef(
    "tpch_q10_returned_items",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables(s, dir).nation),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2))) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  /** Salted skew join, gated: the [[graft.operators.SkewJoin]] plan
    * (deterministic salt on the fact side, dimension replicated per
    * salt) aggregated per brand — the oracle is the PLAIN join, proving
    * the salted rewrite is result-identical, not just spec-equal.
    */
  val saltedJoin: QueryDef = QueryDef(
    "join_salted_skew",
    (s, dir) => {
      val t = Tables(s, dir)
      graft.operators.SkewJoin.saltedInnerJoin(
          t.lineitem, t.part, "l_partkey", "p_partkey",
          factor = 8, saltSource = col("l_orderkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_quantity"), "sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(col("p_brand"))
    },
    Some(
      """SELECT p_brand,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  /** Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    * per-returnflag and per-linestatus marginals in ONE pass over the
    * table — at scale this replaces two scans+aggregates with one
    * expand+aggregate.
    */
  val groupingSets: QueryDef = QueryDef(
    "agg_grouping_sets",
    (s, dir) =>
      Tables(s, dir).lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity"), "sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "count(*) AS cnt FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"))

  /** Exact percentiles (linear interpolation at p·(n−1)) per group —
    * Spark `percentile` vs DuckDB `quantile_cont`, two independent
    * implementations of the same definition. Quantities are small
    * integers stored as doubles, so every interpolation is exact in
    * binary — the comparison is strict, no rounding. (At 100 TB the
    * approximate path is `approx_percentile`, same shape.)
    */
  val percentiles: QueryDef = QueryDef(
    "agg_percentiles",
    (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag")),
    Some(
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** TPC-H Q18 shape (large-volume orders): aggregate lineitem ONCE,
    * filter groups on the aggregated quantity, then join the surviving
    * order keys (a tiny fraction) to orders and customer — the
    * aggregate-then-join plan that replaces Q18's correlated HAVING
    * subquery; the oracle states it as the direct group-by+HAVING.
    */
  val largeOrders: QueryDef = QueryDef(
    "tpch_q18_large_orders",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity"), "total_qty"))
        .filter(col("total_qty") > 250)
      t.orders.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    },
    Some(
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
        |HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin))

  /** Top-k per group via the custom bounded-heap
    * [[graft.operators.TopKAggregator]] — SAME oracle as the window
    * variant [[topKPerGroup]], so the k-bounded partial-aggregation
    * plan is proven result-identical to the full-sort window plan
    * while shuffling ≤ k rows per group per partition instead of the
    * whole table.
    */
  val topKPerGroupAgg: QueryDef = QueryDef(
    "topk_per_group_agg",
    (s, dir) => {
      import s.implicits._
      val ds = Tables(s, dir).customer
        .select(col("c_mktsegment"), col("c_acctbal").cast("double"),
          col("c_custkey").cast("long"))
        .as[(String, Double, Long)]
      ds.groupByKey(_._1)
        .agg(graft.operators.TopKAggregator.topK(3).toColumn.name("topk"))
        .toDF("c_mktsegment", "topk")
        .select(col("c_mktsegment"),
          posexplode(col("topk.ids")).as(Seq("pos", "c_custkey")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("int").as("rk"),
          col("c_custkey"))
        .orderBy("c_mktsegment", "rk")
    },
    Some(
      """SELECT c_mktsegment, rk, c_custkey FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin))

  /** Fixed-width value histogram (floor-divided buckets): one hash
    * aggregate, scan-local bucketing — the profiling primitive for
    * choosing partition bounds at scale. Bucket edges are IEEE
    * division+floor, identical across engines; min/max are exact
    * selections, no float accumulation.
    */
  val histogram: QueryDef = QueryDef(
    "agg_histogram",
    (s, dir) =>
      Tables(s, dir).orders
        .groupBy(floor(col("o_totalprice") / lit(20000.0)).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("bucket"),
    Some(
      """SELECT CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bucket,
        |  count(*) AS cnt, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Exact φ-heavy hitters over the document token stream via the
    * two-pass Misra–Gries scheme ([[graft.operators.HeavyHitters]]):
    * bounded-memory candidates, exact verify — the answer itself is
    * exact, so the oracle is a plain HAVING over the full aggregate.
    * φ·N is non-integral on this data, so the strict `>` cut cannot
    * sit on a count.
    */
  val heavyHitters: QueryDef = QueryDef(
    "agg_heavy_hitters",
    (s, dir) =>
      graft.operators.HeavyHitters.heavyHitters(
        Tables(s, dir).documents.select(
          explode(split(lower(trim(col("text"))), "\\s+")).as("w")),
        col("w"), phi = 0.034),
    Some(
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS item
        |           FROM documents)
        |SELECT item, count(*) AS cnt FROM t GROUP BY item
        |HAVING count(*) > 0.034 * (SELECT count(*) FROM t)
        |ORDER BY cnt DESC, item""".stripMargin))

  /** The streaming heavy-hitter monitor's BATCH contract under the hard
    * oracle: the same hash-group → per-group Misra–Gries machinery
    * ([[graft.streaming.StreamingHeavyHitters.heavyHittersViaGroups]]),
    * collapsed to the exact answer by verification — same HAVING oracle
    * as [[heavyHitters]], so the grouped candidate path must reach the
    * identical exact set. StreamingHeavyHittersSpec locks the streaming
    * monitor's verified candidates to this batch path.
    */
  val heavyHittersGrouped: QueryDef = QueryDef(
    "agg_heavy_hitters_grouped",
    (s, dir) => {
      import s.implicits._
      graft.streaming.StreamingHeavyHitters.heavyHittersViaGroups(
        Tables(s, dir).documents.select(
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
          .as[String],
        phi = 0.034, numGroups = 32)
    },
    Some(
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS item
        |           FROM documents)
        |SELECT item, count(*) AS cnt FROM t GROUP BY item
        |HAVING count(*) > 0.034 * (SELECT count(*) FROM t)
        |ORDER BY cnt DESC, item""".stripMargin))

  /** Mergeable approximate percentiles (Spark's built-in KLL-style
    * `percentile_approx` sketch) — the at-scale counterpart of the
    * exact `agg_percentiles` gate, completing the approx family
    * (HLL distinct / MG heavy hitters / quantile sketch). Rows-only
    * by design; AnalyticsSketchSpec bounds the rank error against the
    * exact quantiles.
    */
  val approxPercentiles: QueryDef = QueryDef(
    "agg_approx_percentiles",
    (s, dir) =>
      Tables(s, dir).orders
        .agg(percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("p"))
        .select(col("p").getItem(0).as("p50"),
          col("p").getItem(1).as("p90"),
          col("p").getItem(2).as("p99")),
    None)

  /** TPC-H Q14 (promo revenue share): date-windowed lineitem scan,
    * part dimension BROADCAST, one conditional decimal aggregate.
    * Decimal-exact sums cast to double only for the final ratio — the
    * repo-wide money convention, so the 4-dp round is engine-stable.
    */
  val promoRevenue: QueryDef = QueryDef(
    "tpch_q14_promo_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(28, 10))
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-03-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) *
            sum(when(col("p_type").startsWith("PROMO"), rev)
              .otherwise(lit(0).cast(DecimalType(28, 10)))).cast("double") /
            sum(rev).cast("double"), 4).as("promo_revenue"))
    },
    Some(
      """SELECT round(100.0 *
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
        |    ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE),
        |  4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin))

  /** TPC-H Q6 (forecast revenue change): the canonical pushdown
    * showcase — every predicate (date range, discount band, quantity
    * cap) reaches the parquet scan, the aggregate is one map-side-
    * combined decimal sum.
    */
  val forecastRevenue: QueryDef = QueryDef(
    "tpch_q6_forecast_revenue",
    (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(28, 10))).cast("double").as("revenue")),
    Some(
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin))

  /** md5-contract count-min sketch
    * ([[graft.operators.CountMinSketch]]): 4×256 counters over all
    * token occurrences, point estimates for five probe words next to
    * their exact counts. FULL oracle — row hashes, counter table, the
    * min-over-rows answer, and the exact recount all restate in SQL,
    * so the sketch's overestimate property sits under the hash
    * (estimate ≥ true on every row of the output, spec-asserted too).
    */
  val countMinPortable: QueryDef = QueryDef(
    "agg_countmin_portable",
    (s, dir) =>
      graft.operators.CountMinSketch.estimate(
          graft.Tables(s, dir).documents, "text",
          probes = Seq("agg", "key", "row", "scan", "zzz_absent"),
          depth = 4, width = 256)
        .orderBy("word"),
    Some(
      """WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk FROM documents),
        |tk AS (SELECT tk FROM tok WHERE tk <> ''),
        |rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
        |cells AS (SELECT row,
        |    ('0x' || substr(md5(row::VARCHAR || ':' || tk), 1, 7))::BIGINT % 256 AS bucket
        |  FROM tk CROSS JOIN rows_),
        |sk AS (SELECT row, bucket, count(*)::BIGINT AS cnt FROM cells GROUP BY 1, 2),
        |pr AS (SELECT unnest(['agg', 'key', 'row', 'scan', 'zzz_absent']) AS word),
        |pc AS (SELECT word, row,
        |    ('0x' || substr(md5(row::VARCHAR || ':' || word), 1, 7))::BIGINT % 256 AS bucket
        |  FROM pr CROSS JOIN rows_),
        |est AS (SELECT word, min(coalesce(cnt, 0))::BIGINT AS estimate
        |  FROM pc LEFT JOIN sk USING (row, bucket) GROUP BY word),
        |tr AS (SELECT tk AS word, count(*)::BIGINT AS true_count FROM tk
        |  WHERE tk IN ('agg', 'key', 'row', 'scan', 'zzz_absent') GROUP BY tk)
        |SELECT word, estimate, coalesce(true_count, 0)::BIGINT AS true_count
        |FROM est LEFT JOIN tr USING (word) ORDER BY word""".stripMargin))

  /** md5-contract HyperLogLog ([[graft.operators.HyperLogLog]]): the
    * full-oracle twin to `a3_approx_distinct` (engine-internal HLL,
    * rows-only by design). 64 registers over distinct document texts;
    * the gated columns stay in EXACT integer algebra (register maxes,
    * Σ 2^(r_max−reg), α·m²·2^r_max/denom — one double division, no
    * transcendental), with the true distinct count beside the
    * estimate. The ln-based small-range correction is spec-bounded
    * instead (libm ulp drift is not cross-engine hashable).
    */
  val hllPortable: QueryDef = QueryDef(
    "agg_hll_portable",
    (s, dir) =>
      graft.operators.HyperLogLog.summary(
          graft.Tables(s, dir).documents, "text", m = 64),
    Some(
      """WITH h AS (SELECT ('0x' || substr(md5(text), 1, 7))::BIGINT % 64 AS bucket,
        |  CASE WHEN ('0x' || substr(md5(text), 8, 15))::BIGINT = 0 THEN 61
        |       ELSE 61 - length(bin(('0x' || substr(md5(text), 8, 15))::BIGINT)) END AS rho
        |  FROM documents),
        |r AS (SELECT bucket, max(rho)::BIGINT AS reg FROM h GROUP BY bucket),
        |f AS (SELECT count(*)::BIGINT AS n_filled, max(reg)::BIGINT AS r_max,
        |  sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::BIGINT AS zero_filled FROM r),
        |d AS (SELECT sum(1::BIGINT << (f.r_max - reg)::INT)::BIGINT AS d_filled FROM r, f),
        |e AS (SELECT count(DISTINCT text)::BIGINT AS exact FROM documents)
        |SELECT 64::BIGINT AS m,
        |  (zero_filled + (64 - n_filled))::BIGINT AS n_zero,
        |  r_max,
        |  (d_filled + (64 - n_filled) * (1::BIGINT << r_max::INT))::BIGINT AS denom,
        |  round(0.709::DOUBLE * 64 * 64 * ((1::BIGINT << r_max::INT)::DOUBLE) /
        |    ((d_filled + (64 - n_filled) * (1::BIGINT << r_max::INT))::DOUBLE), 4) AS est_raw,
        |  exact
        |FROM f, d, e""".stripMargin))

  /** md5-contract KMV / bottom-k distinct sketch
    * ([[graft.operators.KmvSketch]]): the k = 128 smallest distinct
    * text hashes, estimate (k−1)·2²⁸/h_k beside the exact count —
    * exact integers into one double division, the whole sketch ORDER
    * BY hash LIMIT k restated in SQL.
    */
  val kmvPortable: QueryDef = QueryDef(
    "agg_kmv_portable",
    (s, dir) =>
      graft.operators.KmvSketch.summary(
          graft.Tables(s, dir).documents, "text", k = 128),
    Some(
      """WITH h AS (SELECT DISTINCT ('0x' || substr(md5(text), 1, 7))::BIGINT AS h FROM documents),
        |sk AS (SELECT h FROM h ORDER BY h LIMIT 128),
        |a AS (SELECT count(*)::BIGINT AS n_kept, max(h)::BIGINT AS h_k FROM sk),
        |e AS (SELECT count(DISTINCT text)::BIGINT AS exact FROM documents)
        |SELECT 128::BIGINT AS k, n_kept, h_k,
        |  round(CASE WHEN n_kept < 128 THEN n_kept::DOUBLE
        |    ELSE 127::DOUBLE * 268435456::DOUBLE / h_k::DOUBLE END, 4) AS est_distinct,
        |  exact
        |FROM a, e""".stripMargin))

  /** Per-group md5-contract HyperLogLog
    * ([[graft.operators.HyperLogLog.summaryByGroup]]): the
    * distinct-per-key profile (distinct texts per language) as one
    * register table of ≤ |langs|·64 rows — the corpus-profile shape a
    * 100 TB pipeline runs instead of |langs| exact count-distincts.
    * Same exact-integer algebra as `agg_hll_portable`, replayed per
    * group by the oracle.
    */
  val hllGrouped: QueryDef = QueryDef(
    "agg_hll_grouped",
    (s, dir) =>
      graft.operators.HyperLogLog.summaryByGroup(
          graft.Tables(s, dir).documents, "lang", "text", m = 64)
        .orderBy("lang"),
    Some(
      """WITH h AS (SELECT lang,
        |  ('0x' || substr(md5(text), 1, 7))::BIGINT % 64 AS bucket,
        |  CASE WHEN ('0x' || substr(md5(text), 8, 15))::BIGINT = 0 THEN 61
        |       ELSE 61 - length(bin(('0x' || substr(md5(text), 8, 15))::BIGINT)) END AS rho
        |  FROM documents),
        |r AS (SELECT lang, bucket, max(rho)::BIGINT AS reg FROM h GROUP BY lang, bucket),
        |f AS (SELECT lang, count(*)::BIGINT AS n_filled, max(reg)::BIGINT AS r_max,
        |  sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::BIGINT AS zero_filled
        |  FROM r GROUP BY lang),
        |d AS (SELECT r.lang, sum(1::BIGINT << (f.r_max - r.reg)::INT)::BIGINT AS d_filled
        |  FROM r JOIN f ON f.lang = r.lang GROUP BY r.lang),
        |e AS (SELECT lang, count(DISTINCT text)::BIGINT AS exact FROM documents GROUP BY lang)
        |SELECT f.lang AS lang, 64::BIGINT AS m,
        |  (zero_filled + (64 - n_filled))::BIGINT AS n_zero,
        |  r_max,
        |  (d_filled + (64 - n_filled) * (1::BIGINT << r_max::INT))::BIGINT AS denom,
        |  round(0.709::DOUBLE * 64 * 64 * ((1::BIGINT << r_max::INT)::DOUBLE) /
        |    ((d_filled + (64 - n_filled) * (1::BIGINT << r_max::INT))::DOUBLE), 4) AS est_raw,
        |  exact
        |FROM f JOIN d ON d.lang = f.lang JOIN e ON e.lang = f.lang
        |ORDER BY lang""".stripMargin))

  /** KMV sketch set algebra ([[graft.operators.KmvSketch.setSummary]]):
    * union / intersection / Jaccard estimates for two document subsets
    * (doc_id % 2 vs % 3 — true overlap on the % 6 docs plus shared
    * texts) from two 64-row sketches, never a corpus join — the
    * query-planning / snapshot-overlap primitive. Bottom-k ranking,
    * union-sketch membership, both estimators, and the sketch-not-full
    * exactness rule all replay in SQL beside the true counts.
    */
  val kmvSetOps: QueryDef = QueryDef(
    "agg_kmv_set_ops",
    (s, dir) => {
      val d = graft.Tables(s, dir).documents
      graft.operators.KmvSketch.setSummary(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 3 === 0),
        "text", k = 64)
    },
    Some(
      """WITH ha AS (SELECT DISTINCT ('0x'||substr(md5(text),1,7))::BIGINT AS h
        |    FROM documents WHERE doc_id % 2 = 0),
        |ka AS (SELECT h FROM ha ORDER BY h LIMIT 64),
        |hb AS (SELECT DISTINCT ('0x'||substr(md5(text),1,7))::BIGINT AS h
        |    FROM documents WHERE doc_id % 3 = 0),
        |kb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
        |ku AS (SELECT DISTINCT h FROM
        |    (SELECT h FROM ka UNION ALL SELECT h FROM kb) ORDER BY h LIMIT 64),
        |m AS (SELECT h,
        |    CASE WHEN h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
        |      THEN 1 ELSE 0 END AS in_both FROM ku),
        |a AS (SELECT count(*)::BIGINT AS n_kept, max(h)::BIGINT AS h_k,
        |    sum(in_both)::BIGINT AS n_both FROM m),
        |eu AS (SELECT count(DISTINCT text)::BIGINT AS exact_union
        |    FROM documents WHERE doc_id % 2 = 0 OR doc_id % 3 = 0),
        |ei AS (SELECT count(*)::BIGINT AS exact_intersection FROM
        |    (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0) ta
        |    JOIN (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0) tb
        |    USING (text))
        |SELECT 64::BIGINT AS k, n_kept, h_k,
        |  round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
        |    ELSE 63::DOUBLE * 268435456::DOUBLE / h_k::DOUBLE END, 4) AS est_union,
        |  round((n_both::DOUBLE / n_kept::DOUBLE) *
        |    (CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
        |     ELSE 63::DOUBLE * 268435456::DOUBLE / h_k::DOUBLE END), 4) AS est_intersection,
        |  round(n_both::DOUBLE / n_kept::DOUBLE, 6) AS jaccard_est,
        |  exact_union, exact_intersection
        |FROM a, eu, ei""".stripMargin))

  /** KMV join-size estimation
    * ([[graft.operators.KmvSketch.joinSizeEstimate]]): |orders ⋈
    * lineitem| estimated from two 128-row key sketches carrying
    * per-key multiplicities — the planner primitive that prices a
    * shuffle before paying for it. Sketch ranking, intersection
    * sampling, both estimators, and the exact Σ nA·nB (computed from
    * per-key counts on the RAW keys, never the 28-bit hashes) all
    * replay in SQL.
    */
  val kmvJoinEstimate: QueryDef = QueryDef(
    "agg_kmv_join_estimate",
    (s, dir) => {
      val t = Tables(s, dir)
      graft.operators.KmvSketch.joinSizeEstimate(
        t.orders, "o_orderkey", t.lineitem, "l_orderkey", k = 128)
    },
    Some(
      """WITH ca AS (SELECT o_orderkey AS key, count(*)::BIGINT AS na FROM orders GROUP BY 1),
        |cb AS (SELECT l_orderkey AS key, count(*)::BIGINT AS nb FROM lineitem GROUP BY 1),
        |ka AS (SELECT ('0x'||substr(md5(key::VARCHAR),1,7))::BIGINT AS h, na
        |    FROM ca ORDER BY h LIMIT 128),
        |kb AS (SELECT ('0x'||substr(md5(key::VARCHAR),1,7))::BIGINT AS h, nb
        |    FROM cb ORDER BY h LIMIT 128),
        |ku AS (SELECT DISTINCT h FROM
        |    (SELECT h FROM ka UNION ALL SELECT h FROM kb) ORDER BY h LIMIT 128),
        |u AS (SELECT count(*)::BIGINT AS n_kept, max(h)::BIGINT AS h_k,
        |    sum(CASE WHEN h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
        |      THEN 1 ELSE 0 END)::BIGINT AS n_both FROM ku),
        |sm AS (SELECT count(*)::BIGINT AS n_sample,
        |    coalesce(sum(na * nb), 0)::BIGINT AS sum_mult
        |    FROM ka JOIN kb USING (h)),
        |ex AS (SELECT coalesce(sum(na * nb), 0)::BIGINT AS exact_join_rows
        |    FROM ca JOIN cb USING (key))
        |SELECT 128::BIGINT AS k, n_kept, n_sample,
        |  round((n_both::DOUBLE / n_kept::DOUBLE) *
        |    (CASE WHEN n_kept < 128 THEN n_kept::DOUBLE
        |     ELSE 127::DOUBLE * 268435456::DOUBLE / h_k::DOUBLE END), 4)
        |    AS est_inter_keys,
        |  round(CASE WHEN n_sample > 0 THEN sum_mult::DOUBLE / n_sample::DOUBLE
        |    ELSE 0 END, 6) AS avg_mult,
        |  round((n_both::DOUBLE / n_kept::DOUBLE) *
        |    (CASE WHEN n_kept < 128 THEN n_kept::DOUBLE
        |     ELSE 127::DOUBLE * 268435456::DOUBLE / h_k::DOUBLE END) *
        |    (CASE WHEN n_sample > 0 THEN sum_mult::DOUBLE / n_sample::DOUBLE
        |     ELSE 0 END), 2) AS est_join_rows,
        |  exact_join_rows
        |FROM u, sm, ex""".stripMargin))

  /** TPC-H Q19 shape (disjunctive predicate revenue): lineitem ⨝ part
    * under an OR of three (brand, size-range, quantity-range) blocks —
    * the classic test that the optimizer extracts the common equi-join
    * key AND derives per-side disjunctive filters (part side gets
    * `p_brand IN (...)` pushed to the scan) instead of degrading to a
    * nested-loop join.
    */
  val disjunctiveRevenue: QueryDef = QueryDef(
    "tpch_q19_disjunctive",
    (s, dir) => {
      val t = Tables(s, dir)
      val cond =
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#17" && col("p_size").between(10, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(20, 40) &&
          col("l_quantity").between(20, 45))
      t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice").cast(DecimalType(18, 2))) *
            (lit(1).cast(DecimalType(18, 4)) -
              col("l_discount").cast(DecimalType(18, 4))))
            .cast("double").as("revenue"))
    },
    Some(
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 45)""".stripMargin))

  /** TPC-H Q16 shape (supplier diversity per part line): distinct
    * suppliers per (brand, type) among sold parts, EXCLUDING a
    * blocklisted supplier set (negative account balance standing in
    * for the complaints filter) via a left-anti join — anti join +
    * count-distinct + ranked output in one plan.
    */
  val supplierDiversity: QueryDef = QueryDef(
    "tpch_q16_supplier_cnt",
    (s, dir) => {
      val t = Tables(s, dir)
      val bad = t.supplier.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
        .limit(10)
    },
    Some(
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type LIMIT 10""".stripMargin))

  /** TPC-H Q21 shape (sole-blame supplier): suppliers with a returned
    * lineitem on orders where OTHER suppliers participated (EXISTS)
    * but NONE of them had returns (NOT EXISTS) — the classic
    * correlated-exists pair, planned as one semi-join plus one
    * anti-join on the same distinct (order, supplier) frames, never a
    * correlated subquery per row.
    */
  val soleBlame: QueryDef = QueryDef(
    "tpch_q21_sole_blame",
    (s, dir) => {
      val t = Tables(s, dir)
      val all = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
        .distinct().localCheckpoint(true)
      val ret = t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct().localCheckpoint(true)
      val otherAny = all.select(col("l_orderkey").as("o2"),
        col("l_suppkey").as("s2"))
      val otherRet = ret.select(col("l_orderkey").as("o3"),
        col("l_suppkey").as("s3"))
      val blamed = ret
        .join(otherAny, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(otherRet, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
      blamed.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t.supplier),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },
    Some(
      """WITH al AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |r AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |      WHERE l_returnflag = 'R'),
        |b AS (SELECT r.l_orderkey, r.l_suppkey FROM r
        |  WHERE EXISTS (SELECT 1 FROM al o WHERE o.l_orderkey = r.l_orderkey
        |                AND o.l_suppkey <> r.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM r o2 WHERE o2.l_orderkey = r.l_orderkey
        |                AND o2.l_suppkey <> r.l_suppkey))
        |SELECT s_name, count(*) AS numwait
        |FROM b JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin))

  /** Exact decimal revenue term shared by the Q4/Q7/Q8/Q15/Q17 shapes:
    * extendedprice × (1 − discount) in DECIMAL so both engines agree
    * bit-for-bit before the final cast to double.
    */
  private def drev: org.apache.spark.sql.Column =
    col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 4)) -
        col("l_discount").cast(DecimalType(18, 4)))

  private val drevSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  /** TPC-H Q4 shape (order priority checking): orders from one year with
    * at least one lineitem shipped >30 days after the order date (the
    * dataset has no commit/receipt dates — late shipping is the stand-in),
    * counted per priority. The correlated EXISTS plans as ONE left-semi
    * hash join on orderkey with the date comparison as its residual —
    * never a per-row subquery; at 100 TB both sides shuffle once on
    * orderkey and the year filter prunes the orders scan first.
    */
  val priorityChecking: QueryDef = QueryDef(
    "tpch_q4_priority_checking",
    (s, dir) => {
      val t = Tables(s, dir)
      val o = t.orders.filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      o.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_cnt"))
    },
    Some(
      """SELECT o_orderpriority, count(*) AS order_cnt
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority""".stripMargin))

  /** TPC-H Q7 shape (volume shipping between two nations, both
    * directions): supplier and customer frames are pre-filtered to the
    * two nations BEFORE touching the fact table — the scale-correct
    * plan is two broadcast joins against a lineitem⨝orders shuffle,
    * not a post-join nation filter over the full fact join.
    */
  val volumeShipping: QueryDef = QueryDef(
    "tpch_q7_volume_shipping",
    (s, dir) => {
      val t = Tables(s, dir)
      val nat = t.nation.filter(col("n_nationkey").isin(1, 2))
      val sup = t.supplier
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cus = t.customer
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(drev).cast("double").as("revenue"))
    },
    Some(
      s"""SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(volume) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year, $drevSql AS volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_nationkey IN (1, 2) AND n2.n_nationkey IN (1, 2)
        |    AND n1.n_nationkey <> n2.n_nationkey)
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin))

  /** TPC-H Q8 shape (national market share): of PROMO-part revenue sold
    * to customers in region 0, the share supplied by NATION_3, per
    * year. Numerator and denominator are exact decimal sums; only the
    * final share divides in double (rounded to 6 dp so both engines
    * agree). Part and the two nation-side dims broadcast; one fact
    * shuffle on orderkey.
    */
  val marketShare: QueryDef = QueryDef(
    "tpch_q8_market_share",
    (s, dir) => {
      val t = Tables(s, dir)
      val promo = t.part.filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val cusR = t.customer
        .join(t.nation.filter(col("n_regionkey") === 0),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sup = t.supplier
        .join(t.nation.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation")),
          col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      t.lineitem
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cusR), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", drev)
            .otherwise(lit(0).cast(DecimalType(18, 6)))).cast("double") /
            sum(drev).cast("double"), 6).as("mkt_share"))
    },
    Some(
      s"""SELECT year(o_orderdate) AS o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |        CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT o_orderdate, n2.n_name AS supp_nation, $drevSql AS volume
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE n1.n_regionkey = 0 AND p_type = 'PROMO')
        |GROUP BY year(o_orderdate)""".stripMargin))

  /** TPC-H Q12 shape (shipping priority split): lineitems shipped in
    * 1996 grouped by linestatus (no shipmode column in this schema),
    * split into high/low order-priority counts via conditional sums —
    * one fact shuffle on orderkey, map-side partial aggregation.
    */
  val priorityShipping: QueryDef = QueryDef(
    "tpch_q12_priority_split",
    (s, dir) => {
      val t = Tables(s, dir)
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t.lineitem
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_cnt"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_cnt"))
    },
    Some(
      """SELECT l_linestatus,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_cnt,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 0 ELSE 1 END)::BIGINT AS low_line_cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin))

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join customer→orders with the priority exclusion INSIDE the join
    * condition (so order-less customers survive as c_count=0), then the
    * distribution of counts. Two aggregations, each one shuffle; the
    * second is on the tiny (c_count) domain.
    */
  val custDist: QueryDef = QueryDef(
    "tpch_q13_custdist",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin))

  /** TPC-H Q15 shape (top supplier): per-supplier revenue over one
    * quarter, keep the supplier(s) hitting the max. The max is a 1-row
    * broadcast joined back on EXACT decimal equality (casting to double
    * before comparing would be a cross-engine tie hazard); only the
    * output casts to double.
    */
  val topSupplier: QueryDef = QueryDef(
    "tpch_q15_top_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(drev).as("rev_d"))
      val mx = rev.agg(max(col("rev_d")).as("mx"))
      rev.join(broadcast(mx), col("rev_d") === col("mx"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_d").cast("double").as("total_revenue"))
    },
    Some(
      s"""WITH rev AS (
        |  SELECT l_suppkey, sum($drevSql) AS rev_d
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_d = (SELECT max(rev_d) FROM rev)""".stripMargin))

  /** TPC-H Q17 shape (small-quantity-order revenue): lineitems of one
    * brand whose quantity is below 20% of that part's average quantity.
    * The avg threshold compare is restated multiplicatively in exact
    * decimals (5·q·cnt < Σq) so neither engine divides; per-part stats
    * join back as a broadcast (|parts of one brand| is tiny vs the fact).
    */
  val smallQtyRevenue: QueryDef = QueryDef(
    "tpch_q17_small_qty",
    (s, dir) => {
      val t = Tables(s, dir)
      val brandLi = t.lineitem
        .join(broadcast(t.part.filter(col("p_brand") === "Brand#4")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
      val stats = brandLi.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qsum"),
          count(lit(1)).as("qcnt"))
      brandLi.join(broadcast(stats), col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast(DecimalType(18, 2)) * 5 *
          col("qcnt") < col("qsum"))
        .agg(count(lit(1)).as("n_small"),
          dsum(col("l_extendedprice"), "total_price"))
    },
    Some(
      """WITH st AS (
        |  SELECT l_partkey AS pk,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qsum,
        |    count(*) AS qcnt
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#4' GROUP BY l_partkey)
        |SELECT count(*) AS n_small,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN st ON l_partkey = pk
        |WHERE p_brand = 'Brand#4'
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qcnt < qsum""".stripMargin))

  /** TPC-H Q22 shape (global sales opportunity): customers above the
    * positive-balance average with NO urgent orders (every customer has
    * SOME order in this dataset — the urgent subset keeps the anti-join
    * non-vacuous), bucketed by custkey mod 7 standing in for the phone
    * country code. The average compare is multiplicative in exact
    * decimals (bal·cnt > Σbal); the global stats ride a 1-row broadcast.
    */
  val salesOpportunity: QueryDef = QueryDef(
    "tpch_q22_sales_opportunity",
    (s, dir) => {
      val t = Tables(s, dir)
      val stats = t.customer.filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("bsum"),
          count(lit(1)).as("bcnt"))
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      t.customer
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(stats))
        .filter(col("c_acctbal").cast(DecimalType(18, 2)) * col("bcnt") >
          col("bsum"))
        .groupBy(pmod(col("c_custkey"), lit(7)).as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal"), "totacctbal"))
    },
    Some(
      """WITH st AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bsum,
        |    count(*) AS bcnt FROM customer WHERE c_acctbal > 0)
        |SELECT c_custkey % 7 AS cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer, st
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bcnt > bsum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_custkey % 7""".stripMargin))

  /** TPC-H Q2 shape (minimum-cost supplier): the dataset has no
    * partsupp table, so the supply catalog is the DISTINCT
    * (l_partkey, l_suppkey) pairs actually observed in lineitem and
    * s_acctbal stands in for ps_supplycost. The correlated min is
    * restated as a per-part aggregate joined back on EXACT double
    * equality (both engines read the same untouched parquet values —
    * no arithmetic happens before the compare). The catalog distinct
    * is the one fact-scale shuffle; part/supplier/nation dims all
    * broadcast.
    */
  val minCostSupplier: QueryDef = QueryDef(
    "tpch_q2_min_cost_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val ps = t.lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      val sup = t.supplier
        .join(t.nation.filter(col("n_regionkey") === 0),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_acctbal"), col("s_name"),
          col("n_name"))
      val parts = t.part
        .filter(col("p_size") === 15 && col("p_type") === "SMALL")
        .select(col("p_partkey"), col("p_brand"))
      val cand = ps
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_acctbal"),
          col("s_name"), col("n_name"))
      val mn = cand.groupBy(col("p_partkey").as("mpk"))
        .agg(min(col("s_acctbal")).as("mb"))
      cand.join(broadcast(mn),
          col("p_partkey") === col("mpk") && col("s_acctbal") === col("mb"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some(
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |sup AS (SELECT s_suppkey, s_acctbal, s_name, n_name
        |        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |        WHERE n_regionkey = 0),
        |cand AS (SELECT p_partkey, p_brand, s_acctbal, s_name, n_name
        |         FROM ps JOIN sup ON l_suppkey = s_suppkey
        |         JOIN part ON l_partkey = p_partkey
        |         WHERE p_size = 15 AND p_type = 'SMALL'),
        |mn AS (SELECT p_partkey AS mpk, min(s_acctbal) AS mb
        |       FROM cand GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        |FROM cand JOIN mn ON p_partkey = mpk AND s_acctbal = mb
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin))

  /** TPC-H Q9 shape (product-type profit): revenue minus a supply-cost
    * proxy (p_retailprice·l_quantity / 10 — the dataset has no
    * ps_supplycost), grouped by supplier nation and order year over
    * parts matching a name substring. Both sums stay in EXACT decimal
    * independently; the single divide-and-subtract happens once per
    * output row in double, identically ordered on both engines. The
    * 5-way join shuffles the fact on orderkey once; part, supplier,
    * and nation broadcast.
    */
  val productProfit: QueryDef = QueryDef(
    "tpch_q9_product_profit",
    (s, dir) => {
      val t = Tables(s, dir)
      val cost = col("p_retailprice").cast(DecimalType(18, 2)) *
        col("l_quantity").cast(DecimalType(18, 2))
      val sup = t.supplier
        .join(t.nation, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_name").contains("red"))
          .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(drev).cast("double") -
          sum(cost).cast("double") / 10, 4).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some(
      s"""WITH j AS (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |    $drevSql AS rev,
        |    CAST(p_retailprice AS DECIMAL(18,2)) *
        |      CAST(l_quantity AS DECIMAL(18,2)) AS cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE p_name LIKE '%red%')
        |SELECT nation, o_year,
        |  round(CAST(sum(rev) AS DOUBLE) -
        |        CAST(sum(cost) AS DOUBLE) / 10, 4) + 0 AS profit
        |FROM j GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin))

  /** TPC-H Q11 shape (important stock): per-part value
    * (Σ l_extendedprice over lineitems supplied from one nation —
    * the partsupp value proxy) kept where it exceeds 1/1000 of the
    * total. The fraction compare is restated multiplicatively on
    * EXACT decimals (pv·1000 > tv) so neither engine divides; the
    * total rides a 1-row broadcast. One fact-side aggregate keyed by
    * part — the same shape survives any scale-up because the output
    * is bounded by |part|.
    */
  val importantStock: QueryDef = QueryDef(
    "tpch_q11_important_stock",
    (s, dir) => {
      val t = Tables(s, dir)
      val natSup = t.supplier.filter(col("s_nationkey") === 1)
        .select(col("s_suppkey"))
      val v = t.lineitem
        .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("pv"))
      val tot = v.agg(sum(col("pv")).as("tv"))
      v.crossJoin(broadcast(tot))
        .filter(col("pv") * 1000 > col("tv"))
        .select(col("p_partkey"), col("pv").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    },
    Some(
      """WITH v AS (
        |  SELECT l_partkey AS p_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS pv
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 1 GROUP BY 1),
        |tot AS (SELECT sum(pv) AS tv FROM v)
        |SELECT p_partkey, CAST(pv AS DOUBLE) AS part_value
        |FROM v, tot WHERE pv * 1000 > tv
        |ORDER BY part_value DESC, p_partkey""".stripMargin))

  /** TPC-H Q20 shape (potential part promotion): suppliers in one
    * nation who shipped more than a quantity threshold of any
    * name-matched part in 1996 — the nested-IN chain restated as
    * semi-joins: part filter broadcasts into the fact, the
    * (suppkey, partkey) quantity aggregate replaces the
    * availqty-vs-half-shipped compare (no partsupp table), and the
    * surviving supplier keys semi-join the supplier dim. Quantity
    * sums stay in exact decimal up to the threshold compare.
    */
  val promotionSuppliers: QueryDef = QueryDef(
    "tpch_q20_promotion_suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val pk = t.part.filter(col("p_name").startsWith("small"))
        .select(col("p_partkey"))
      val big = t.lineitem
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sq"))
        .filter(col("sq") > 40)
        .select(col("l_suppkey")).distinct()
      t.supplier
        .join(big, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t.nation.filter(col("n_nationkey") === 3)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("s_acctbal").cast("double").as("s_acctbal"))
        .orderBy(col("s_name"))
    },
    Some(
      """WITH pk AS (SELECT p_partkey FROM part
        |            WHERE p_name LIKE 'small%'),
        |shipped AS (
        |  SELECT l_suppkey, l_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem JOIN pk ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |big AS (SELECT DISTINCT l_suppkey FROM shipped WHERE sq > 40)
        |SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        |FROM supplier JOIN big ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey = 3 ORDER BY s_name""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(rollup, topKPerGroup, shippingPriority, localSupplierVolume,
      approxDistinct, cube, returnedItems, saltedJoin, groupingSets,
      percentiles, largeOrders, topKPerGroupAgg, histogram, heavyHitters,
      heavyHittersGrouped, approxPercentiles, promoRevenue, forecastRevenue,
      countMinPortable, hllPortable, kmvPortable, hllGrouped, kmvSetOps,
      kmvJoinEstimate, disjunctiveRevenue, supplierDiversity, soleBlame,
      priorityChecking, volumeShipping, marketShare, priorityShipping,
      custDist, topSupplier, smallQtyRevenue, salesOpportunity,
      minCostSupplier, productProfit, importantStock, promotionSuppliers)
}
