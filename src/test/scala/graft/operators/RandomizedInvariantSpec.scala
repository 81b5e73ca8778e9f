package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized invariants for the algorithmic cores — the cases a
  * hand-picked fixture misses (odd graph shapes, adversarial ids,
  * oversize mixes). Seeds are FIXED so every run tests the identical
  * inputs: these are deterministic regression tests over a wider input
  * space, not flaky fuzzing.
  */
class RandomizedInvariantSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("star contraction equals union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 4) {
      val n = 10 + rnd.nextInt(50)
      val density = 0.02 + rnd.nextDouble() * 0.1
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < density
      } yield (a, b)) ++ Seq((1L, 2L)) // never empty
      val got = ConnectedComponents
        .componentsStar(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(edges), s"trial $trial n=$n density=$density")
    }
  }

  test("shuffle shards stay dense and deterministic on adversarial ids") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // negatives, > 2^31 (mod-p collisions possible), dense small runs
    val ids = (Seq(-5L, -1L, 0L, Int.MaxValue.toLong, Int.MaxValue + 1L,
      (1L << 40) + 3, (1L << 40) + 3 + 2147483647L) ++
      Seq.fill(200)(rnd.nextLong() % (1L << 45))).distinct
    val df = ids.toDF("doc_id")
    val out = Sampling.shuffleShards(df, "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == ids.length)
    out.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"gaps in shard $shard")
    }
    val again = Sampling.shuffleShards(df, "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
  }

  test("best-fit packing invariants hold on random size mixes") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    // lengths 1..40 with a few oversize (> seqLen 32) mixed in
    val df = (0L until 150L).map { id =>
      val n = 1 + rnd.nextInt(40)
      (id, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Packing.packBestFit(df, "text", "doc_id", seqLen = 32, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.map(_._1).distinct.length == 150)
    out.groupBy(x => (x._2, x._4)).foreach { case ((shard, bin), rs) =>
      if (rs.exists(_._5)) assert(rs.length == 1, s"oversize shares $shard/$bin")
      else assert(rs.map(_._3).sum <= 32, s"overfull bin $shard/$bin")
    }
    out.foreach { case (_, _, n, _, over) => assert(over == (n > 32)) }
  }

  test("redaction leaves no residual PII pattern behind") {
    val s = spark
    import s.implicits._
    val rnd = new Random(23)
    def noise(n: Int) =
      Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString).mkString(" ")
    val rows = (1L to 40L).map { id =>
      val pii = rnd.nextInt(3) match {
        case 0 => s"u${rnd.nextInt(999)}.x+y@host${rnd.nextInt(9)}.example.org"
        case 1 => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
        case _ => s"+${100000000L + math.abs(rnd.nextLong() % 899999999L)}"
      }
      (id, s"${noise(3)} $pii ${noise(3)}")
    }
    val out = Redaction.redactDocs(rows.toDF("doc_id", "text"), "text", "doc_id")
      .collect()
    out.foreach { r =>
      val t = r.getString(1)
      assert(!t.matches(s".*${Redaction.EmailRe}.*"), s"email left: $t")
      assert(!t.matches(s".*${Redaction.Ipv4Re}.*"), s"ip left: $t")
      assert(!t.matches(s".*${Redaction.PhoneRe}.*"), s"phone left: $t")
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) >= 1, s"nothing redacted: $t")
    }
  }

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[(Long, String)] = {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1L to nDocs.toLong).map { id =>
      val base = Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      // sprinkle exact and near copies to exercise the dup paths
      val text =
        if (rnd.nextBoolean() && id > 1) null // replaced below with a copy
        else base.mkString(" ")
      (id, text)
    }.foldLeft(Vector.empty[(Long, String)]) { case (acc, (id, t)) =>
      acc :+ (id -> (if (t != null) t else acc(rnd.nextInt(acc.size))._2))
    }
  }

  test("containment pairs equal the naive reference on random dup-heavy corpora") {
    val s = spark
    import s.implicits._
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val corpus = randomCorpus(rnd, 20 + rnd.nextInt(30))
      val t = 0.5 + rnd.nextInt(4) * 0.1
      val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text"),
          "text", "doc_id", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val sets = corpus.map { case (id, text) =>
        (id, Dedup.shingleStrings(text, 3).toSet)
      }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        c = (sa intersect sb).size.toDouble / sa.size
        if c >= t
      } yield (a, b, BigDecimal(c).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      assert(got == want, s"trial $trial t=$t")
    }
  }

  test("winnowing guarantee: fingerprints ⊆ shingle hashes, every window covered") {
    val s = spark
    import s.implicits._
    val rnd = new Random(29)
    val corpus = randomCorpus(rnd, 30)
    val fps = TextAnalysis.winnowFingerprints(
        corpus.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpus.foreach { case (id, text) =>
      val w = text.toLowerCase.trim.split("\\s+")
      val sh = if (w.length < 3) Array(w.mkString(" "))
        else Array.tabulate(w.length - 2)(i => w.slice(i, i + 3).mkString(" "))
      val hs = sh.map(TextAnalysis.polyHash)
      assert(fps(id).subsetOf(hs.toSet), s"doc $id emitted a non-shingle hash")
      // guarantee: every window of 4 consecutive hashes contains a selected fp
      if (hs.length > 4) {
        (0 to hs.length - 4).foreach { p =>
          assert(hs.slice(p, p + 4).exists(fps(id)), s"doc $id window $p uncovered")
        }
      }
    }
  }

  test("weighted reservoir: zero-weight-free, exact-k, dominated by heavy rows") {
    val s = spark
    import s.implicits._
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(300)
      val rows = (1L to n.toLong).map(i => (i, 1L + rnd.nextInt(100).toLong))
      val k = 20 + rnd.nextInt(30)
      val got = Sampling.weightedReservoirTake(
          rows.toDF("doc_id", "w"), "doc_id", "w", k)
        .collect().map(_.getLong(0))
      assert(got.length == k, s"trial $trial")
      assert(got.distinct.length == k, s"trial $trial duplicated draws")
      // mean weight of the sample should exceed the population mean
      val wm = rows.toMap
      val sampleMean = got.map(wm).sum.toDouble / k
      val popMean = rows.map(_._2).sum.toDouble / n
      assert(sampleMean > popMean, s"trial $trial: $sampleMean <= $popMean")
    }
  }
}
