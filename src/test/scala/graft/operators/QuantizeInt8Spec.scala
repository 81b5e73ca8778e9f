package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeInt8Spec extends SparkSpec {

  private def emb = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),      // zero vector
      (2L, Array(100.0f, -100.0f, 1.0f, 0.004f))
    ).toDF("vec_id", "embedding")
  }

  test("codes bounded, scale is max|x|, zero vector -> zero codes") {
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Byte](2))).toMap
    assert(q(0L)._1 == 1.0)
    assert(q(0L)._2 == Seq[Byte](64, -127, 32, 0))
    assert(q(1L)._1 == 0.0 && q(1L)._2.forall(_ == 0))
    assert(q(2L)._2.forall(c => c >= -127 && c <= 127))
  }

  test("dequantization error is within half a quantization step") {
    val s = spark
    import s.implicits._
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val d = Similarity.dequantizeInt8(q, "codes", "scale")
      .join(emb, "vec_id")
      .select(col("vec_id"), col("approx"), col("embedding"))
      .as[(Long, Array[Double], Array[Float])]
      .collect()
    d.foreach { case (_, approx, orig) =>
      val scale = orig.map(x => math.abs(x.toDouble)).max
      val step = if (scale == 0) 0.0 else scale / 127.0
      approx.zip(orig).foreach { case (a, o) =>
        assert(math.abs(a - o) <= step / 2 + 1e-9,
          s"error ${math.abs(a - o)} exceeds half-step ${step / 2}")
      }
    }
  }
}
