package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Portable (md5-contract) sketches: the hash must equal its SQL
  * restatement, the banding must be provably complete (simhash) or
  * S-curve-predictable (minhash), and the pair sets must match the
  * brute-force definitions they replace.
  */
class PortableSketchesSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hash60 equals Spark SQL's conv(substr(md5, 1, 15), 16, 10)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val words = Seq("hello", "WORLD", "", "naïve", "123", "a b")
    val fromSql = spark.sql(
      words.map(w => s"SELECT cast(conv(substr(md5('${w.replace("'", "''")}'), 1, 15), 16, 10) AS bigint)")
        .mkString(" UNION ALL "))
      .collect().map(_.getLong(0))
    val fromKernel = words.map(PortableSketches.hash60(md, _))
    assert(fromKernel == fromSql.toSeq,
      s"kernel $fromKernel != sql ${fromSql.toSeq}")
  }

  test("portable hash family is md5-derived and in range") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val fam = PortableSketches.portableHashFamily(32)
    assert(fam.length == 32)
    fam.foreach { case (a, b) =>
      assert(a >= 1 && a < PortableSketches.Prime)
      assert(b >= 0 && b < PortableSketches.Prime)
    }
    // the contract: a_i = h28("a"+i) % (p-1) + 1
    val a5 = PortableSketches.hash28(md, "a5") % (PortableSketches.Prime - 1) + 1
    assert(fam(5)._1 == a5)
  }

  test("simhash banding finds EXACTLY the brute-force hamming<=3 pairs") {
    // near-identical docs (1 token swapped) + unrelated ones
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val d = docs(
      1L -> base,
      2L -> (base + " extra"),
      3L -> base.replace("token7", "tokenX"),
      4L -> (1 to 30).map(i => s"other$i").mkString(" "),
      5L -> (1 to 30).map(i => s"third$i").mkString(" "))
    val banded = PortableSketches.simhashPairs(d, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = PortableSketches.simhashSignatures60(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded == brute, s"banded $banded != brute $brute")
  }

  test("identical texts land in one signature cluster, pairs at hamming 0") {
    val d = docs(1L -> "same words here", 2L -> "same words here",
      3L -> "same words here", 4L -> "completely different tokens now")
    val pairs = PortableSketches.simhashPairs(d, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("minhash pairs = banded candidates ∩ exact jaccard >= t") {
    // an exact copy (jaccard 1.0), one high-overlap pair, one distinct
    val ws = (1 to 20).map(i => s"w$i")
    val d = docs(
      1L -> ws.mkString(" "),
      2L -> ws.mkString(" "),
      3L -> (ws.take(19) :+ "x1").mkString(" "),
      4L -> (1 to 20).map(i => s"z$i").mkString(" "))
    val got = PortableSketches.minhashPairs(d, "text", "doc_id", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
      s"exact copy pair missing: $got")
    // doc3 shares 17 of its 18 3-gram shingles with doc1: 17/19 = 0.894
    // — above threshold, caught when any of the 8 bands agrees; assert
    // nothing BELOW threshold leaked (the verify filter is exact)
    assert(got.forall(_._3 >= 0.8), s"below-threshold pair leaked: $got")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct doc paired: $got")
  }

  test("minhash signature matches a direct recomputation of the contract") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val text = "alpha beta gamma delta"
    val d = docs(1L -> text)
    val sig = PortableSketches.minhashSignatures60(d, "text", "doc_id", 8)
      .select("signature").head().getSeq[Long](0)
    val p = PortableSketches.Prime
    val fam = PortableSketches.portableHashFamily(8)
    // the element set is the 3-gram shingle set ("alpha beta gamma",
    // "beta gamma delta"), not single words
    val xs = Dedup.shingleStrings(text, 3)
      .map(s0 => PortableSketches.hash60(md, s0) % p)
    assert(xs.length == 2)
    val expect = fam.map { case (a, b) => xs.map(x => (a * x + b) % p).min }
    assert(sig == expect.toSeq, s"$sig != ${expect.toSeq}")
  }

  test("band join is a hash equi-join, never a nested loop") {
    val d = docs((1L to 40L).map(i => i -> s"doc $i words w$i v$i"): _*)
    val plan = PortableSketches.minhashPairs(d, "text", "doc_id", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"band join degenerated:\n$plan")
  }
}
