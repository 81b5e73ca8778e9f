package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranks]] must reproduce Spark's own global window rank/ntile
  * EXACTLY — same total order, same SQL ntile fill contract — from its
  * range-bucketed parallel plan, including ties, nulls, tiny inputs,
  * and n < k.
  */
class RanksSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random data with heavy ties and nulls
  private lazy val df: DataFrame = spark.range(0, 500)
    .select(col("id"),
      when(col("id") % 17 === 0, lit(null))
        .otherwise((col("id") * 7919) % 23).as("k"),
      ((col("id") * 104729) % 1000).as("v"))
    .repartition(7)

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.sorted.map(col).toSeq
    val left = a.select(cols: _*).collect().map(_.toSeq).sortBy(_.toString)
    val right = b.select(cols: _*).collect().map(_.toSeq).sortBy(_.toString)
    assert(left.length === right.length)
    left.zip(right).foreach { case (l, r) => assert(l === r) }
  }

  test("global rank matches unpartitioned row_number, ascending") {
    val expected = df.withColumn("r",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    val got = Ranks.withGlobalRank(df, "r", col("k"),
      ties = Seq(col("id")), buckets = 8)
    assertSame(got, expected)
  }

  test("global rank matches unpartitioned row_number, descending") {
    val expected = df.withColumn("r",
      row_number().over(Window.orderBy(col("k").desc, col("id")))
        .cast("long"))
    val got = Ranks.withGlobalRank(df, "r", col("k"), descending = true,
      ties = Seq(col("id")), buckets = 8)
    assertSame(got, expected)
  }

  test("global ntile matches unpartitioned ntile for several k") {
    for (k <- Seq(1, 3, 5, 10)) {
      val expected = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val got = Ranks.withGlobalNtile(df, "t", k, col("v"),
        ties = Seq(col("id")), buckets = 8)
      assertSame(got, expected)
    }
  }

  test("global ntile matches descending ntile with heavy ties") {
    val expected = df.withColumn("t",
      ntile(4).over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
    val got = Ranks.withGlobalNtile(df, "t", 4, col("k"),
      descending = true, ties = Seq(col("id")), buckets = 8)
    assertSame(got, expected)
  }

  test("n < k ntile matches (every row its own tile prefix)") {
    // deterministic 3-row subset — limit(3) would let Ranks' bounded
    // boundary/count jobs and the final pass each see DIFFERENT rows
    val tiny = df.filter(col("id") < 3)
    val expected = tiny.withColumn("t",
      ntile(10).over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val got = Ranks.withGlobalNtile(tiny, "t", 10, col("v"),
      ties = Seq(col("id")), buckets = 4)
    assertSame(got, expected)
  }

  test("single bucket degenerates to one sorted partition, still exact") {
    val expected = df.withColumn("r",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val got = Ranks.withGlobalRank(df, "r", col("v"),
      ties = Seq(col("id")), buckets = 1)
    assertSame(got, expected)
  }

  test("group rank matches per-group row_number") {
    val g = df.withColumn("grp", col("id") % 5)
    val expected = g.withColumn("r",
      row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("v"), col("id"))).cast("long"))
    val got = Ranks.withGroupRank(g, "r", Seq("grp"), col("v"),
      ties = Seq(col("id")), buckets = 4)
    assertSame(got, expected)
  }

  test("group ntile matches per-group ntile, including a null group") {
    val g = df.withColumn("grp",
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id") % 5))
    val expected = g.withColumn("t",
      ntile(3).over(Window.partitionBy(col("grp"))
        .orderBy(col("k"), col("id"))).cast("long"))
    val got = Ranks.withGroupNtile(g, "t", 3, Seq("grp"), col("k"),
      ties = Seq(col("id")), buckets = 4)
    assertSame(got, expected)
  }

  test("batched specs match three independent window ntiles/ranks") {
    val expected = df
      .withColumn("a", ntile(5).over(Window.orderBy(col("k"), col("id")))
        .cast("long"))
      .withColumn("b", ntile(3).over(Window.orderBy(col("v").desc,
        col("id"))).cast("long"))
      .withColumn("c", row_number().over(Window.orderBy(col("v"),
        col("id"))).cast("long"))
    val got = Ranks.withRanks(df, Seq(
        Ranks.RankSpec("a", col("k"), ntile = 5),
        Ranks.RankSpec("b", col("v"), descending = true, ntile = 3),
        Ranks.RankSpec("c", col("v"))),
      ties = Seq(col("id")), buckets = 8)
    assertSame(got, expected)
  }

  test("batched group specs match per-group windows") {
    val gdf = df.withColumn("grp", col("id") % 5)
    val expected = gdf
      .withColumn("a", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("b", ntile(4).over(Window.partitionBy(col("grp"))
        .orderBy(col("k").desc, col("id"))).cast("long"))
    val got = Ranks.withRanks(gdf, Seq(
        Ranks.RankSpec("a", col("v")),
        Ranks.RankSpec("b", col("k"), descending = true, ntile = 4)),
      groupCols = Seq("grp"), ties = Seq(col("id")), buckets = 4)
    assertSame(got, expected)
  }

  test("empty input yields empty output with the rank column") {
    val empty = df.filter(col("id") < 0)
    val got = Ranks.withGlobalNtile(empty, "t", 4, col("v"),
      ties = Seq(col("id")))
    assert(got.columns.contains("t"))
    assert(got.count() === 0L)
  }

  test("topKPerGroup matches per-group windowed top-k, desc with ties") {
    val gdf = df.withColumn("grp", col("id") % 3)
    val expected = gdf
      .withColumn("r", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("k").desc, col("id"))).cast("long"))
      .filter(col("r") <= 25)
    val got = Ranks.topKPerGroup(gdf, "r", 25, Seq("grp"), col("k"),
      descending = true, ties = Seq(col("id")), salts = 5)
    assertSame(got, expected)
  }

  test("topKPerGroup ascending, k larger than a group") {
    val gdf = df.withColumn("grp", col("id") % 100) // 5 rows per group
    val expected = gdf
      .withColumn("r", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("v"), col("id"))).cast("long"))
      .filter(col("r") <= 10)
    val got = Ranks.topKPerGroup(gdf, "r", 10, Seq("grp"), col("v"),
      descending = false, ties = Seq(col("id")), salts = 4)
    assertSame(got, expected)
  }

  test("topKPerGroup salts=1 degenerates to the plain window form") {
    val gdf = df.withColumn("grp", col("id") % 2)
    val expected = gdf
      .withColumn("r", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("k").desc, col("id"))).cast("long"))
      .filter(col("r") <= 7)
    val got = Ranks.topKPerGroup(gdf, "r", 7, Seq("grp"), col("k"),
      descending = true, ties = Seq(col("id")), salts = 1)
    assertSame(got, expected)
  }

  test("no unpartitioned window appears in the physical plan") {
    val got = Ranks.withGlobalNtile(df, "t", 5, col("v"),
      ties = Seq(col("id")), buckets = 8)
    val windows = got.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned WindowExec in Ranks plan: $w"))
  }

  // distinct-key frame with a null key and long gaps — the
  // withRunningSums contract (unique keys, integral values)
  private lazy val rsDf: DataFrame = spark.range(0, 400)
    .select(
      when(col("id") === 0, lit(null))
        .otherwise(col("id") * 37 % 10000).as("x"),
      (col("id") % 13 + 1).as("a"),
      (col("id") % 7).as("b"))
    .groupBy("x")
    .agg(sum("a").as("a"), sum("b").as("b"))
    .repartition(5)

  test("withRunningSums matches the unpartitioned cumulative window") {
    val w = Window.orderBy(col("x"))
    val expected = rsDf
      .withColumn("ca",
        sum(col("a")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cb", coalesce(
        sum(col("b")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("nx", lead(col("x"), 1).over(w))
    val got = Ranks.withRunningSums(rsDf, col("x"),
      Seq(Ranks.SumSpec("ca", col("a")),
        Ranks.SumSpec("cb", col("b"), inclusive = false)),
      nextKeyOut = Some("nx"), buckets = 8)
    assertSame(got, expected)
  }

  test("withRunningSums is exact with one bucket and with many") {
    val w = Window.orderBy(col("x"))
    val expected = rsDf.withColumn("c",
      sum(col("a")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    Seq(1, 3, 200).foreach { b =>
      val got = Ranks.withRunningSums(rsDf, col("x"),
        Seq(Ranks.SumSpec("c", col("a"))), buckets = b)
      assertSame(got, expected)
    }
  }

  test("withRunningSums on an empty frame yields empty output") {
    val empty = rsDf.filter(lit(false))
    val got = Ranks.withRunningSums(empty, col("x"),
      Seq(Ranks.SumSpec("c", col("a"))), nextKeyOut = Some("nx"))
    assert(got.count() === 0)
    assert(got.columns.contains("c") && got.columns.contains("nx"))
  }

  test("withRunningSums plan has no unpartitioned window") {
    val got = Ranks.withRunningSums(rsDf, col("x"),
      Seq(Ranks.SumSpec("c", col("a"))), nextKeyOut = Some("nx"),
      buckets = 8)
    val windows = got.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned WindowExec in withRunningSums plan: $w"))
  }
}
