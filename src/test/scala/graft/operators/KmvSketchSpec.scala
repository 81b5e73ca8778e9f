package graft.operators

import graft.SparkSpec

/** KMV sketch: duplicate-invariant, exact below k, and inside the
  * 1/√k error envelope above it.
  */
class KmvSketchSpec extends SparkSpec {

  private def values(vs: Seq[String]) = {
    val s = spark
    import s.implicits._
    vs.toDF("v")
  }

  test("bottom-k is invariant under duplication and sorted ascending") {
    val base = (0 until 300).map(i => s"v$i")
    val once = KmvSketch.bottomK(values(base), "v", 32)
      .collect().map(_.getLong(0)).toSeq
    val thrice = KmvSketch.bottomK(values(base ++ base ++ base), "v", 32)
      .collect().map(_.getLong(0)).toSeq
    assert(once == thrice)
    assert(once == once.sorted && once.size == 32)
  }

  test("below k the sketch is the distinct set and the estimate exact") {
    val r = KmvSketch.summary(values((0 until 20).map(i => s"x$i")), "v", 128)
      .head()
    assert(r.getLong(1) == 20 && r.getLong(4) == 20)
    assert(r.getDouble(3) == 20.0)
  }

  test("estimate lands in the 3/√k envelope at 5000 distinct") {
    val r = KmvSketch.summary(
      values((0 until 5000).map(i => s"doc-$i")), "v", 128).head()
    assert(r.getLong(4) == 5000)
    val est = r.getDouble(3)
    assert(math.abs(est - 5000) / 5000.0 < 3.0 / math.sqrt(128.0),
      s"est $est outside envelope")
  }
}
