package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingHeavyHittersSpec extends SparkSpec {

  private def latest(name: String): Map[(Int, String), (Long, Long)] =
    spark.sql(s"SELECT group, item, cnt_lb, n_group FROM $name")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("hot items survive across batches with MG-bounded counters") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[String](s)
    val q = StreamingHeavyHitters.monitor(in.toDS(), phi = 0.1, numGroups = 4)
      .writeStream.format("memory").queryName("shh")
      .outputMode("update").start()
    try {
      val batch1 = Seq.fill(50)("hot") ++ (1 to 30).map(i => s"cold$i")
      in.addData(batch1: _*)
      q.processAllAvailable()
      val after1 = latest("shh")
      val hot1 = after1.collectFirst { case ((_, "hot"), v) => v }
      assert(hot1.isDefined, "hot item missing from summaries")
      // MG bound: true − n_group/k ≤ counter ≤ true (k = 10)
      val (c1, n1) = hot1.get
      assert(c1 <= 50 && c1 >= 50 - n1 / 10)
      // state bound: every group's summary holds ≤ k items
      after1.keys.groupBy(_._1).foreach { case (g, items) =>
        assert(items.size <= 10, s"group $g summary exceeded k")
      }
      // a second batch keeps accumulating the same item's counter
      in.addData(Seq.fill(40)("hot"): _*)
      q.processAllAvailable()
      val hot2 = latest("shh").collectFirst { case ((_, "hot"), v) => v }.get
      assert(hot2._1 > c1, "counter did not grow across batches")
      assert(hot2._1 <= 90 && hot2._1 >= 90 - hot2._2 / 10)
    } finally q.stop()
  }

  test("an item's occurrences always land in one group") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[String](s)
    val q = StreamingHeavyHitters.monitor(in.toDS(), phi = 0.05, numGroups = 8)
      .writeStream.format("memory").queryName("shh_groups")
      .outputMode("update").start()
    try {
      in.addData((1 to 200).flatMap(i => Seq(s"w$i", s"w$i")): _*)
      q.processAllAvailable()
      val groupsPerItem = latest("shh_groups").keys
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet)
      groupsPerItem.foreach { case (item, gs) =>
        assert(gs.size == 1, s"item $item appeared in groups $gs")
      }
    } finally q.stop()
  }

  test("streaming candidates + exact verify equal the batch path and exact MG") {
    val s = spark
    import s.implicits._
    // skewed corpus: 3 true heavy hitters over φ=0.1, long cold tail
    val items: Seq[String] = Seq.fill(60)("alpha") ++ Seq.fill(45)("beta") ++
      Seq.fill(35)("gamma") ++ (1 to 160).map(i => s"cold${i % 80}")
    val n = items.size.toLong
    def verify(candidates: Set[String]): Seq[(String, Long)] = {
      val counts = items.groupBy(identity).view.mapValues(_.size.toLong)
      candidates.toSeq.map(c => c -> counts.getOrElse(c, 0L))
        .filter(_._2 > 0.1 * n).sortBy { case (i, c) => (-c, i) }
    }
    // streaming: run the monitor over the stream, take the FINAL
    // candidate union, verify exactly
    val in = MemoryStream[String](s)
    val q = StreamingHeavyHitters.monitor(in.toDS(), phi = 0.1, numGroups = 4)
      .writeStream.format("memory").queryName("shh_contract")
      .outputMode("update").start()
    val streamed = try {
      in.addData(items.take(150): _*)
      q.processAllAvailable()
      in.addData(items.drop(150): _*)
      q.processAllAvailable()
      verify(latest("shh_contract").keys.map(_._2).toSet)
    } finally q.stop()
    // batch contract path (what the agg_heavy_hitters_grouped gate runs)
    val batch = StreamingHeavyHitters.heavyHittersViaGroups(
        items.toDS(), phi = 0.1, numGroups = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // ungrouped exact two-pass MG
    val exact = graft.operators.HeavyHitters.heavyHitters(
        items.toDF("item"), org.apache.spark.sql.functions.col("item"),
        phi = 0.1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(batch == Seq(("alpha", 60L), ("beta", 45L), ("gamma", 35L)))
    assert(streamed == batch)
    assert(exact == batch)
  }

  test("all-null and empty batch inputs yield an empty result, not a null row") {
    val s = spark
    import s.implicits._
    val allNull = Seq[String](null, null, null).toDS()
    assert(StreamingHeavyHitters.heavyHittersViaGroups(allNull, 0.2).count() == 0)
    assert(StreamingHeavyHitters.heavyHittersViaGroups(
      s.emptyDataset[String], 0.2).count() == 0)
  }

  test("rejects invalid phi and numGroups") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[String](s)
    intercept[IllegalArgumentException] {
      StreamingHeavyHitters.monitor(in.toDS(), phi = 0.0)
    }
    intercept[IllegalArgumentException] {
      StreamingHeavyHitters.monitor(in.toDS(), phi = 0.1, numGroups = 0)
    }
  }
}
