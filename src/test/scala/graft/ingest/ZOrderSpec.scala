package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleave reproduces known Morton codes") {
    import spark.implicits._
    // (a,b) -> z: classic 2-bit cases: a=3(11),b=0 -> 0101=5;
    // a=0,b=3 -> 1010=10; a=3,b=3 -> 1111=15
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("a", "b")
    val got = df.select(ZOrder.interleave(col("a"), col("b"), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a=2(10),b=1(01): even bits from a -> 0100, odd bits from b -> 0010 => 0110=6
    assert(got == Seq(5L, 10L, 15L, 6L))
  }

  test("z-order layout prunes a 2-D box on BOTH dimensions; sorts do not") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(20000)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(df, s"$base/z", "x", "y", numFiles = 16, bits = 10)
    // comparison layout: single-column range sort on x
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/xsort")
    // predicate on y ONLY: every x-sorted file spans (nearly) all of y,
    // so the x-sort scans all 16 files; z-order files are compact in
    // BOTH dims and most miss the y-band. (A 2-D box on both dims is
    // boundary-sensitive to repartitionByRange's sampling — the
    // one-dimension contrast is the invariant worth pinning.)
    def scanned(path: String): (Long, Long) = {
      val r = ZOrder.pruningStats(spark, path, "x", "y",
        0, 999, 100, 200).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val (nz, hitZ) = scanned(s"$base/z")
    val (nx, hitX) = scanned(s"$base/xsort")
    assert(nz == 16 && nx == 16)
    assert(hitX == 16, s"x-sorted files unexpectedly pruned a y-band: $hitX")
    assert(hitZ <= 8, s"z-order scanned $hitZ/$nz for a ~10% y-band")
    // and the band must still find every matching row (no data loss)
    val want = df.filter(col("y").between(100, 200)).count()
    val gotZ = spark.read.parquet(s"$base/z")
      .filter(col("y").between(100, 200)).count()
    assert(gotZ == want)
  }

  test("zValue is deterministic and within range") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val a = ZOrder.zValue(orders, "o_custkey", "o_totalprice", bits = 8)
      .select("o_orderkey", "z").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ZOrder.zValue(orders, "o_custkey", "o_totalprice", bits = 8)
      .select("o_orderkey", "z").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(z => z >= 0 && z < (1L << 16)))
  }
}
