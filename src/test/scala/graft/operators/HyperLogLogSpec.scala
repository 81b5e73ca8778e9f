package graft.operators

import graft.SparkSpec

/** HyperLogLog: registers must be duplicate-invariant (the sketch IS
  * the distinct count), the corrected estimate must land inside the
  * published error envelope, and the linear-counting branch must
  * engage on small cardinalities.
  */
class HyperLogLogSpec extends SparkSpec {

  private def values(vs: Seq[String]) = {
    val s = spark
    import s.implicits._
    vs.toDF("v")
  }

  test("registers are invariant under duplication") {
    val base = (0 until 200).map(i => s"value-$i")
    val once = HyperLogLog.registers(values(base), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val thrice = HyperLogLog.registers(values(base ++ base ++ base), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once == thrice)
  }

  test("summary: est_raw within the HLL error envelope at 2000 distinct") {
    val row = HyperLogLog.summary(
      values((0 until 2000).map(i => s"doc-$i")), "v").head()
    assert(row.getLong(0) == 64 && row.getLong(5) == 2000)
    val est = row.getDouble(4)
    // σ ≈ 1.04/√64 = 13%; allow 3σ
    assert(math.abs(est - 2000) / 2000.0 < 0.39, s"est_raw $est")
    // denom identity: every absent/zero register contributes 2^r_max
    assert(row.getLong(3) >= (1L << row.getLong(2).toInt) * row.getLong(1))
  }

  test("estimate: linear counting engages and is near-exact when sparse") {
    val est = HyperLogLog.estimate(
      values((0 until 5).map(i => s"x$i")), "v")
    assert(math.abs(est - 5.0) <= 2.0, s"sparse estimate $est")
    val est40 = HyperLogLog.estimate(
      values((0 until 40).map(i => s"y$i")), "v")
    assert(math.abs(est40 - 40.0) / 40.0 < 0.25, s"estimate $est40")
  }

  test("summaryByGroup: each group's row equals its own global summary") {
    val s = spark
    import s.implicits._
    val df = ((0 until 700).map(i => ("a", s"doc-$i")) ++
      (0 until 90).map(i => ("b", s"other-$i")) ++
      Seq(("c", "solo"))).toDF("g", "v")
    val grouped = HyperLogLog.summaryByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getLong(6))).toMap
    assert(grouped.keySet == Set("a", "b", "c"))
    for ((g, n) <- Seq(("a", 700), ("b", 90), ("c", 1))) {
      val solo = HyperLogLog.summary(df.filter($"g" === g), "v").head()
      assert(grouped(g) == ((solo.getLong(0), solo.getLong(1),
        solo.getLong(2), solo.getLong(3), solo.getDouble(4),
        solo.getLong(5))), s"group $g mismatch")
      assert(grouped(g)._6 == n)
    }
  }
}
