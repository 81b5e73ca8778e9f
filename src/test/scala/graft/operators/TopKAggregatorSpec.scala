package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  test("buffer state is k-bounded and ordered (score desc, id asc)") {
    val agg = TopKAggregator.topK(3)
    val fed = Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 8L), (1.0, 1L))
      .foldLeft(agg.zero) { case (b, (sc, id)) => agg.reduce(b, ("g", sc, id)) }
    assert(fed.ids.length == 3)
    assert(fed.scores.toSeq == Seq(9.0, 7.0, 5.0))
    // tie at 5.0 resolved to the LOWER id (3 beats 10)
    assert(fed.ids.toSeq == Seq(8L, 2L, 3L))
  }

  test("merge of partial buffers equals single-pass aggregation") {
    val agg = TopKAggregator.topK(2)
    val xs = Seq((4.0, 1L), (8.0, 2L), (6.0, 3L), (8.0, 4L), (2.0, 5L))
    val single = xs.foldLeft(agg.zero) { case (b, (sc, id)) =>
      agg.reduce(b, ("g", sc, id))
    }
    // every 2-way split of the input must merge to the same state
    (1 until xs.length).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val lb = l.foldLeft(agg.zero) { case (b, (sc, id)) => agg.reduce(b, ("g", sc, id)) }
      val rb = r.foldLeft(agg.zero) { case (b, (sc, id)) => agg.reduce(b, ("g", sc, id)) }
      val merged = agg.merge(lb, rb)
      assert(merged.scores.toSeq == single.scores.toSeq)
      assert(merged.ids.toSeq == single.ids.toSeq)
    }
  }

  test("dataset aggregation matches the ranked-window top-k exactly") {
    val s = spark
    import s.implicits._
    val customer = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
    val viaAgg = customer
      .select(col("c_mktsegment"), col("c_acctbal").cast("double"),
        col("c_custkey").cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .agg(TopKAggregator.topK(3).toColumn.name("topk"))
      .toDF("seg", "topk")
      .select(col("seg"), posexplode(col("topk.ids")).as(Seq("pos", "id")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val viaWindow = customer
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), (col("rk") - 1).cast("int"),
        col("c_custkey").cast("long"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("groups smaller than k return all their rows, ranked") {
    val s = spark
    import s.implicits._
    val got = Seq(("a", 1.0, 7L), ("b", 3.0, 1L), ("b", 2.0, 2L))
      .toDS()
      .groupByKey(_._1)
      .agg(TopKAggregator.topK(5).toColumn.name("topk"))
      .collect().map { case (g, buf) => g -> buf.ids.toSeq }.toMap
    assert(got == Map("a" -> Seq(7L), "b" -> Seq(1L, 2L)))
  }
}
