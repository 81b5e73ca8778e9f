package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSketchSpec extends SparkSpec {

  test("percentile_approx tracks exact quantiles within rank error") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val approx = orders
      .agg(percentile_approx(col("o_totalprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("p"))
      .collect().head.getSeq[Double](0)
    val exact = orders
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").as("p"))
      .collect().head.getSeq[Double](0)
    // accuracy 10000 → rank error ≤ n/10000; at sf0.001 that is < 1 rank,
    // so the sketch must return a value adjacent to the exact quantile
    val sorted = orders.select("o_totalprice").collect()
      .map(_.getDouble(0)).sorted
    approx.zip(exact).foreach { case (a, e) =>
      val ia = sorted.indexWhere(_ >= a)
      val ie = sorted.indexWhere(_ >= e)
      assert(math.abs(ia - ie) <= math.max(1, sorted.length / 1000),
        s"approx $a vs exact $e drifted ${math.abs(ia - ie)} ranks")
    }
  }
}
