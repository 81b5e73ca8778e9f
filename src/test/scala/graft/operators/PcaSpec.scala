package graft.operators

import graft.SparkSpec

/** Distributed PCA vs an independent dense reference: the projection
  * must recover the dominant direction of an anisotropic cloud (up to
  * the quantization contract), and the degenerate all-zero corpus must
  * fail loudly instead of dividing by zero.
  */
class PcaSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Dense reference: same quantization, Gram, power iteration, and
    * projection — written independently with plain collections.
    */
  private def reference(
      data: Seq[(Long, Seq[Float])], dims: Int, iters: Int): Map[Long, Double] = {
    val q = data.map { case (id, v) =>
      id -> (0 until dims).map(i => math.round(v(i).toDouble * 1000).toDouble)
    }
    val g = Array.tabulate(dims, dims)((i, j) =>
      q.map { case (_, x) => x(i) * x(j) }.sum)
    var v = Array.fill(dims)(1.0)
    (1 to iters).foreach { _ =>
      v = Array.tabulate(dims)(i => (0 until dims).map(j => g(i)(j) * v(j)).sum)
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    q.map { case (id, x) =>
      id -> BigDecimal((0 until dims).map(i => x(i) * v(i)).sum / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("projection matches the dense reference on an anisotropic cloud") {
    // dominant variance along (3, 1): points ±k·(3,1) plus small noise
    // in the orthogonal direction
    val data: Seq[(Long, Seq[Float])] = (0 until 12).map { k =>
      val t = (k - 6) * 0.25
      val o = (k % 3 - 1) * 0.03
      (k.toLong, Seq((3 * t - o).toFloat, (t + 3 * o).toFloat))
    }
    val got = Pca.powerProject(vecs(data: _*), "vec_id", "embedding",
        dims = 2, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = reference(data, dims = 2, iters = 3)
    assert(got == want, s"$got vs $want")
    // the dominant direction orders the projections like t does
    val byT = (0 until 12).sortBy(k => (k - 6) * 0.25).map(k => got(k.toLong))
    assert(byT == byT.sorted || byT == byT.sorted.reverse,
      s"projections must be monotone along the dominant axis: $byT")
  }

  test("higher-dim slice agrees with the reference too") {
    val data: Seq[(Long, Seq[Float])] = (0 until 8).map { k =>
      (k.toLong, (0 until 5).map(i =>
        (math.sin(k * 1.7 + i) * (if (i == 2) 2.0 else 0.4)).toFloat))
    }
    val got = Pca.powerProject(vecs(data: _*), "vec_id", "embedding",
        dims = 5, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == reference(data, dims = 5, iters = 3))
  }

  test("all-zero corpus fails loudly") {
    val z = vecs(1L -> Seq(0f, 0f), 2L -> Seq(0f, 0f))
    val e = intercept[IllegalArgumentException] {
      Pca.powerProject(z, "vec_id", "embedding", dims = 2)
    }
    assert(e.getMessage.contains("degenerate"))
  }
}
