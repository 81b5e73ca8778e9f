package graft.operators

import graft.SparkSpec

/** Count-min sketch: estimates must dominate true counts (never
  * undercount), equal them when no collision exists, and show the
  * collision overestimate when the width forces one.
  */
class CountMinSketchSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("estimate >= true count for every probe, absent word included") {
    val d = docs(1L -> "a b a c a b", 2L -> "b c d d")
    val out = CountMinSketch.estimate(d, "text",
        probes = Seq("a", "b", "c", "d", "nope"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.keySet == Set("a", "b", "c", "d", "nope"))
    out.foreach { case (w, (est, tru)) =>
      assert(est >= tru, s"$w: CMS undercounted ($est < $tru)")
    }
    assert(out("a")._2 == 3 && out("b")._2 == 3 && out("c")._2 == 2 &&
      out("d")._2 == 2 && out("nope")._2 == 0)
    // 256-wide rows over a 4-word vocabulary: collisions are
    // vanishingly unlikely, estimates should be exact here
    out.foreach { case (w, (est, tru)) =>
      assert(est == tru, s"$w: unexpected collision at width 256")
    }
  }

  test("width 2 forces collisions; min-over-rows still upper-bounds") {
    val d = docs(1L -> ("x ".repeat(7) + "y ".repeat(3) + "z"))
    val out = CountMinSketch.estimate(d, "text",
        probes = Seq("x", "y", "z", "w"), depth = 4, width = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("x")._2 == 7 && out("y")._2 == 3 && out("z")._2 == 1)
    out.foreach { case (w, (est, tru)) =>
      assert(est >= tru, s"$w: CMS undercounted ($est < $tru)")
    }
    // total mass per row is 11; with width 2 at least one probe must
    // absorb a collision (3 distinct words into 2 buckets per row)
    assert(out.exists { case (_, (est, tru)) => est > tru },
      s"expected at least one collision overestimate: $out")
  }

  test("sketch size is bounded by depth x width, not vocabulary") {
    val s = spark
    import s.implicits._
    val big = (0 until 2000).map(i => (i.toLong, s"tok$i unique$i"))
      .toDF("doc_id", "text")
    val n = CountMinSketch.sketch(big, "text", depth = 4, width = 64).count()
    assert(n <= 4L * 64L, s"sketch must stay cell-bounded, got $n rows")
  }
}
