package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** ORC sink/source: byte fidelity on a round trip, and the explicit
  * read schema actually pruning columns (the contract that makes the
  * source usable against wide tables at scale).
  */
class OrcSpec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-orc-spec/$name"

  test("round trip preserves rows, types, and nulls") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha", Some(10L)), (2L, "beta", None),
      (3L, "", Some(-5L))).toDF("id", "name", "v")
    val path = tmp("rt")
    Orc.write(df, path)
    val back = Orc.read(spark, path, df.schema).orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getString(1) == "alpha" && back(0).getLong(2) == 10L)
    assert(back(1).isNullAt(2), "null survives the round trip")
    assert(back(2).getString(1) == "" && back(2).getLong(2) == -5L)
  }

  test("explicit schema prunes to the requested columns") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    val path = tmp("prune")
    Orc.write(df, path)
    val narrow = new StructType()
      .add("id", LongType).add("name", StringType)
    val back = Orc.read(spark, path, narrow)
    assert(back.columns.toSeq == Seq("id", "name"))
    // the pruned schema must reach the scan, not just the projection
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") &&
      !plan.substring(plan.indexOf("ReadSchema")).takeWhile(_ != '\n')
        .contains("x"),
      s"scan should not read column x:\n$plan")
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
  }
}
