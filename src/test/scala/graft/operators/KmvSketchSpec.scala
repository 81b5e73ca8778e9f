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

  test("setSummary: sketch-not-full case is exact set algebra") {
    // A = {x0..x29}, B = {x20..x49}: union 50, intersection 10
    val a = values((0 until 30).map(i => s"x$i"))
    val b = values((20 until 50).map(i => s"x$i"))
    val r = KmvSketch.setSummary(a, b, "v", 128).head()
    assert(r.getLong(0) == 128)
    assert(r.getLong(1) == 50) // n_kept = union size
    assert(r.getLong(6) == 50 && r.getLong(7) == 10) // exacts
    assert(r.getDouble(3) == 50.0) // est_union exact
    assert(math.abs(r.getDouble(4) - 10.0) < 1e-9) // est_intersection
    assert(math.abs(r.getDouble(5) - 0.2) < 1e-9) // jaccard 10/50
  }

  test("setSummary: full sketches estimate within the KMV envelope") {
    val a = values((0 until 3000).map(i => s"d$i"))
    val b = values((1500 until 4500).map(i => s"d$i"))
    val r = KmvSketch.setSummary(a, b, "v", 128).head()
    assert(r.getLong(6) == 4500 && r.getLong(7) == 1500)
    val eps = 3.0 / math.sqrt(128.0)
    assert(math.abs(r.getDouble(3) - 4500) / 4500.0 < eps,
      s"union ${r.getDouble(3)}")
    // intersection inherits union error + binomial rho error; loosen 2x
    assert(math.abs(r.getDouble(4) - 1500) / 1500.0 < 2 * eps + 0.15,
      s"intersection ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 0.15,
      s"jaccard ${r.getDouble(5)}")
  }

  test("joinSizeEstimate: sketch-not-full case reproduces the exact join size") {
    val s = spark
    import s.implicits._
    // A: key k appears (k%3)+1 times for k in 1..20; B: keys 10..30 twice
    val a = (1 to 20).flatMap(k => Seq.fill(k % 3 + 1)(k.toLong)).toDF("ka")
    val b = (10 to 30).flatMap(k => Seq.fill(2)(k.toLong)).toDF("kb")
    val r = KmvSketch.joinSizeEstimate(a, "ka", b, "kb", 128).head()
    val exact = (10 to 20).map(k => (k % 3 + 1) * 2L).sum
    assert(r.getLong(6) == exact)
    assert(r.getLong(2) == 11) // all 11 shared keys sampled
    assert(math.abs(r.getDouble(5) - exact) < 1e-6,
      s"est ${r.getDouble(5)} != $exact")
  }

  test("joinSizeEstimate: full sketches land within a loose envelope") {
    val s = spark
    import s.implicits._
    val a = (0 until 4000).map(_.toLong).toDF("ka") // na = 1 each
    val b = (2000 until 6000).flatMap(k => Seq.fill(3)(k.toLong)).toDF("kb")
    val r = KmvSketch.joinSizeEstimate(a, "ka", b, "kb", 128).head()
    val exact = 2000L * 3 // keys 2000..3999, na*nb = 3
    assert(r.getLong(6) == exact)
    val est = r.getDouble(5)
    // intersection-estimate error ~3/sqrt(k) plus sampling noise on
    // the (constant) multiplicity — constant mult means avg_mult is
    // exact, so the envelope is the set-intersection one
    assert(math.abs(est - exact) / exact.toDouble < 0.5,
      s"est $est vs exact $exact")
    assert(r.getDouble(4) == 3.0) // constant multiplicity sampled exactly
  }

  test("joinSizeEstimate: no shared keys estimates zero") {
    val s = spark
    import s.implicits._
    val a = (0 until 300).map(_.toLong).toDF("ka")
    val b = (1000 until 1300).map(_.toLong).toDF("kb")
    val r = KmvSketch.joinSizeEstimate(a, "ka", b, "kb", 64).head()
    assert(r.getLong(6) == 0L && r.getDouble(5) == 0.0)
  }

  test("setSummary: disjoint corpora estimate zero intersection") {
    val a = values((0 until 500).map(i => s"a$i"))
    val b = values((0 until 500).map(i => s"b$i"))
    val r = KmvSketch.setSummary(a, b, "v", 64).head()
    assert(r.getLong(7) == 0)
    // ρ can only be nonzero via a 2^-28 hash collision inside the sketch
    assert(r.getDouble(5) == 0.0 && r.getDouble(4) == 0.0)
  }
}
