package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  // RDD-backed frames, NOT LocalRelations — ConvertToLocalRelation would
  // otherwise fold the bloom filter away at optimization time and the
  // plan-shape tests would be vacuous.
  private def probeBuild = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // probe: 2000 rows over keys 1..500, some null-keyed
    val probeRows = (1 to 2000).map(i => Row((i % 500 + 1).toLong, i)) ++
      Seq(Row(null, 9001), Row(null, 9002))
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows, 4),
      StructType(Seq(StructField("k", LongType), StructField("payload", IntegerType))))
    // build: keys 1..100 plus duplicates (semi must not multiply rows)
    val build = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ((1 to 100) ++ (1 to 50)).map(i => Row(i.toLong)), 2),
      StructType(Seq(StructField("bk", LongType))))
    (probe, build)
  }

  test("bloom semi equals plain semi (nulls dropped, dup build keys ok)") {
    val (probe, build) = probeBuild
    val plain = probe.join(build, col("k") === col("bk"), "left_semi")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    val bloom = BloomJoin.semiJoin(probe, build, "k", "bk")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    assert(bloom == plain)
    assert(!plain.exists(_._1 == null)) // null keys match nothing
  }

  test("bloom anti equals plain anti (null-keyed rows always emitted)") {
    val (probe, build) = probeBuild
    val plain = probe.join(build, col("k") === col("bk"), "left_anti")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    val bloom = BloomJoin.antiJoin(probe, build, "k", "bk")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    assert(bloom == plain)
    assert(plain.exists(_._2 == 9001) && plain.exists(_._2 == 9002))
  }

  test("result-identical even at fpp=0.5 (false positives removed exactly)") {
    val (probe, build) = probeBuild
    val plainSemi = probe.join(build, col("k") === col("bk"), "left_semi").count()
    val plainAnti = probe.join(build, col("k") === col("bk"), "left_anti").count()
    assert(BloomJoin.semiJoin(probe, build, "k", "bk", fpp = 0.5).count() == plainSemi)
    assert(BloomJoin.antiJoin(probe, build, "k", "bk", fpp = 0.5).count() == plainAnti)
  }

  // string-keyed frames: the xxhash64 normalization path
  private def probeBuildStr = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val probeRows = (1 to 2000).map(i => Row(s"key_${i % 500 + 1}", i)) ++
      Seq(Row(null, 9001), Row(null, 9002))
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows, 4),
      StructType(Seq(StructField("k", StringType), StructField("payload", IntegerType))))
    val build = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ((1 to 100) ++ (1 to 50)).map(i => Row(s"key_$i")) :+ Row(null), 2),
      StructType(Seq(StructField("bk", StringType))))
    (probe, build)
  }

  test("string keys: bloom semi/anti equal plain (xxhash64 path, nulls handled)") {
    val (probe, build) = probeBuildStr
    val plainSemi = probe.join(build, col("k") === col("bk"), "left_semi")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    val plainAnti = probe.join(build, col("k") === col("bk"), "left_anti")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    val bloomSemi = BloomJoin.semiJoin(probe, build, "k", "bk")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    val bloomAnti = BloomJoin.antiJoin(probe, build, "k", "bk")
      .collect().map(r => (r.get(0), r.getInt(1))).toSet
    assert(bloomSemi == plainSemi && bloomSemi.nonEmpty)
    assert(bloomAnti == plainAnti)
    assert(bloomAnti.exists(_._2 == 9001)) // null-keyed rows emitted by anti
  }

  test("mismatched non-integral key types are refused loudly") {
    val (probe, _) = probeBuildStr
    val (_, buildLong) = probeBuild
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(probe, buildLong, "k", "bk")
    }
    assert(e.getMessage.contains("pre-cast"))
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

  test("probe predicate sits BELOW the join exchange (map-side prune)") {
    val (probe, build) = probeBuild
    // force a shuffle join — the operator's target regime is a build
    // side too large to broadcast
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val df = BloomJoin.semiJoin(probe, build, "k", "bk")
      df.collect()
      val plan = df.queryExecution.executedPlan
      val exchanges = nodes(plan).collect { case e: Exchange => e }
      assert(exchanges.nonEmpty, "expected a shuffle join in this regime")
      // the probe-side exchange's subtree must already contain the bloom
      // filter — i.e. pruning happened before rows crossed the wire
      val probeSideExchange = exchanges.find(e =>
        nodes(e).exists(_.toString.contains("might_contain")))
      assert(probeSideExchange.isDefined,
        s"bloom probe not below any exchange:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("predicate stays codegen (native expression, not a UDF)") {
    val (probe, build) = probeBuild
    val bytes = BloomJoin.buildKeyFilter(build, "bk")
    val df = probe.filter(BloomJoin.mightContain(probe, bytes, "k"))
    val ks = nodes(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    assert(ks.exists(_.contains("WholeStageCodegen")),
      s"bloom probe fell out of codegen: $ks")
    assert(df.count() > 0)
  }

  test("portable bloom: no false negatives, FPs only from bit collisions") {
    val s = spark
    import s.implicits._
    val build = (0L until 100L).map(i => i * 3).toDF("k")
    val bits = BloomJoin.portableBloomBits(build, "k", m = 64, k = 2)
    // m=64 over 100 keys: nearly saturated — every build key MUST pass
    val verdicts = BloomJoin
      .portableMightContain((0L until 300L).toDF("p"), "p", bits,
        m = 64, k = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 100L).map(_ * 3).foreach { k =>
      assert(verdicts(k), s"false negative on build key $k")
    }
    // and with a ROOMY filter, absent keys are mostly rejected
    val bigBits = BloomJoin.portableBloomBits(build, "k", m = 65536, k = 3)
    val roomy = BloomJoin
      .portableMightContain((1000L until 1300L).toDF("p"), "p", bigBits,
        m = 65536, k = 3)
      .collect().count(_.getBoolean(1))
    assert(roomy < 15, s"$roomy/300 absent keys passed a 64k-bit filter")
  }

  test("portable bloom verdicts are deterministic across partitionings") {
    val s = spark
    import s.implicits._
    val build = (0L until 50L).toDF("k")
    val probe = (0L until 200L).toDF("p")
    def run(parts: Int) = BloomJoin.portableMightContain(
        probe.repartition(parts), "p",
        BloomJoin.portableBloomBits(build.repartition(parts), "k", 256, 3),
        256, 3)
      .orderBy("key").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(run(1).sameElements(run(7)))
  }
}
