package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private def naive(items: Seq[String], phi: Double): Map[String, Long] = {
    val n = items.size
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > phi * n).toMap
  }

  test("exact answer on a skewed stream matches the naive aggregate") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // zipf-ish: item i drawn with weight 1/(i+1) over 200 distinct items
    val weights = (0 until 200).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val items = Seq.fill(20000) {
      val x = rnd.nextDouble() * total
      s"item_${cum.indexWhere(x <= _)}"
    }
    val df = items.toDF("w").repartition(8)
    val got = HeavyHitters.heavyHitters(df, col("w"), phi = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive(items, 0.02))
  }

  test("MG candidates always contain every true heavy hitter") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(5000)(s"v${rnd.nextInt(40)}") ++
      Seq.fill(800)("hot1") ++ Seq.fill(500)("hot2")
    val df = items.toDF("w").repartition(16)
    val phi = 0.05
    val k = math.ceil(1.0 / phi).toInt
    val (summary, n) = HeavyHitters.mgCandidates(df, col("w"), k)
    assert(n == items.size)
    val truth = naive(items, phi).keySet
    assert(truth.subsetOf(summary.keySet),
      s"missing ${truth -- summary.keySet} from MG candidates")
  }

  test("mgMerge keeps at most k counters and is order-insensitive on the answer") {
    val a = Map("x" -> 10L, "y" -> 6L, "z" -> 2L)
    val b = Map("x" -> 4L, "w" -> 9L, "q" -> 1L)
    val m1 = HeavyHitters.mgMerge(a, b, 3)
    val m2 = HeavyHitters.mgMerge(b, a, 3)
    assert(m1 == m2)
    assert(m1.size <= 3)
    assert(m1.contains("x")) // the dominant item must survive the cut
  }

  test("rejects phi outside (0,1)") {
    import spark.implicits._
    val df = Seq("a").toDF("w")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, col("w"), phi = 0.0)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, col("w"), phi = 1.5)
    }
  }
}
