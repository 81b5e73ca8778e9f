package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior for the round-4 operators: empty corpora,
  * single rows, and all-identical content must return empty/identity
  * results, never throw — the shapes a driver edge run (tiny SF, heavy
  * filter) actually produces.
  */
class EdgeCaseSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("containment pairs: empty and single-doc corpora yield no pairs") {
    assert(Dedup.containmentPairs(docs(), "text", "doc_id", 0.8).count() == 0)
    assert(Dedup.containmentPairs(docs(1L -> "aa bb cc dd"),
      "text", "doc_id", 0.8).count() == 0)
  }

  test("containment pairs: an all-identical corpus emits every ordered pair") {
    val out = Dedup.containmentPairs(
        docs(1L -> "aa bb cc dd", 2L -> "aa bb cc dd", 3L -> "aa bb cc dd"),
        "text", "doc_id", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 6) // 3 docs × 2 ordered partners
    assert(out.forall(_._3 == 1.0))
  }

  test("heavy hitters: empty input returns an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("w")
    assert(HeavyHitters.heavyHitters(empty, col("w"), 0.1).count() == 0)
    // all-null items are skipped, not counted
    val nulls = Seq[Option[String]](None, None, Some("x")).toDF("w")
    val got = HeavyHitters.heavyHitters(nulls, col("w"), 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("x", 1L)))
  }

  test("semantic dedup: single-member clusters all keep") {
    import spark.implicits._
    val one = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedup(one, "vec_id", "embedding", "label", 0.5)
      .collect()
    assert(out.forall(_.getBoolean(2)))
  }

  test("winnowing: empty text yields the empty-string fingerprint, not a crash") {
    val out = TextAnalysis.winnowFingerprints(docs(1L -> ""), "text", "doc_id")
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == TextAnalysis.polyHash(""))
  }

  test("weighted sampling: k larger than the corpus returns everything") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L)).toDF("doc_id", "w")
    assert(Sampling.weightedReservoirTake(df, "doc_id", "w", 100).count() == 2)
  }

  test("BPE: single-char vocabulary trains zero merges, encode still works") {
    import spark.implicits._
    val df = Seq("a a a").toDF("text")
    val merges = Bpe.trainMerges(df, "text", 10)
    // "a</w>" is a single symbol — no adjacent pair ever exists
    assert(merges.isEmpty)
    val toks = Bpe.encode(df, "text", merges)
      .select("tokens").collect().head.getSeq[String](0)
    assert(toks == Seq("a" + Bpe.Eow, "a" + Bpe.Eow, "a" + Bpe.Eow))
  }

  test("JS divergence: a group with one word is maximally far from a disjoint corpus") {
    import spark.implicits._
    val df = Seq((1L, "aa aa aa", "g1"), (2L, "bb bb bb", "g2"))
      .toDF("doc_id", "text", "source")
    val jsd = TextAnalysis.jsDivergenceByGroup(df, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // disjoint supports halve into M: JSD normalized by ln 2 is bounded
    // well above 0 but below 1 (each group is half the corpus)
    assert(jsd.values.forall(v => v > 0.2 && v <= 1.0))
  }

  test("merkle digest: empty corpus yields an empty digest frame") {
    assert(DataProfile.merkleDigest(docs(), "doc_id", "text", 16)
      .count() == 0)
  }

  test("changedBuckets: empty-vs-nonempty labels every bucket added") {
    val cur = docs(1L -> "aa", 2L -> "bb")
    val out = DataProfile.changedBuckets(docs(), cur, "doc_id", "text", 16)
      .collect().map(_.getString(3))
    assert(out.nonEmpty && out.forall(_ == "added"))
  }

  test("key skew profile: k above the key count returns every key") {
    import spark.implicits._
    val out = DataProfile.keySkewProfile(
      Seq("a", "a", "b").toDF("k"), "k", 10).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("share_bp")).sum <= 10000)
  }

  test("frequent pairs: empty input and single-item baskets yield no pairs") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("basket", "item")
    assert(FrequentItemsets.frequentPairs(empty, "basket", "item", 1).count() == 0)
    val singles = Seq(("b1", "x"), ("b2", "y")).toDF("basket", "item")
    assert(FrequentItemsets.frequentPairs(singles, "basket", "item", 1).count() == 0)
  }

  test("audio frames: frameSize beyond the clip yields one short frame") {
    implicit val s = spark
    val media = Multimodal.syntheticAudioTable(
      docs(3L -> "unused").select(col("doc_id")))
    val n = Multimodal.synthSampleCount(3L)
    val fr = Multimodal.audioFrameFeatures(media, frameSize = 10000)
      .collect()
    assert(fr.length == 1 && fr.head.n == n)
  }

  test("scene cuts: a single-frame clip emits no cut rows") {
    implicit val s = spark
    import spark.implicits._
    // synthFrames >= 2 always, so hand-build a 1-frame GIF
    val img = new java.awt.image.BufferedImage(
      3, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    val media = Seq(Multimodal.MediaRow(1L, out.toByteArray))
      .toDF("doc_id", "payload")
    assert(Multimodal.sceneCuts(media, 2L).count() == 0)
  }

  test("portable bloom: empty build side rejects every probe") {
    import spark.implicits._
    val bits = BloomJoin.portableBloomBits(
      Seq.empty[Long].toDF("k"), "k", 64, 3)
    val out = BloomJoin.portableMightContain(
      (0L until 10L).toDF("p"), "p", bits, 64, 3).collect()
    assert(out.length == 10 && out.forall(!_.getBoolean(1)))
  }

  test("luhn: single digit and empty-adjacent candidates never crash the fold") {
    import spark.implicits._
    val out = Redaction.redactCards(
      Seq((1L, "short 123 stays"), (2L, "")).toDF("doc_id", "text"),
      "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "short 123 stays")
    assert(out(0).getLong(2) == 0L) // 3 digits: not a candidate
    assert(out(1).getString(1) == "")
  }

  // ---- signed-zero contract (round 8's red gate class) ----------------
  // DuckDB's round keeps IEEE sign (-1e-10 → -0.0) while Spark's goes
  // through BigDecimal (→ +0.0); the driver's exact value hash fails on
  // a single such cell. Every rounded surface whose inner expression
  // can be negative carries `roundz` + the oracle's `+ 0` mirror. These
  // tests CONSTRUCT epsilon-negative inputs and assert the Spark output
  // is positive zero at the raw-bits level (sign bit clear).

  private def isPosZero(x: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(x) == 0L

  test("roundz: epsilon-negative and raw -0.0 normalize to +0.0; null passes through") {
    import spark.implicits._
    val r = Seq((lit(-1e-10), "eps"), (lit(-0.0), "negzero"),
        (lit(null).cast("double"), "null"))
      .foldLeft(Seq.empty[(String, Option[Double])]) { case (acc, (c, tag)) =>
        val v = spark.range(1).select(Numerics.roundz(c, 6).as("v"))
          .collect().head
        acc :+ (tag, if (v.isNullAt(0)) None else Some(v.getDouble(0)))
      }.toMap
    assert(r("eps").exists(isPosZero))
    assert(r("negzero").exists(isPosZero))
    assert(r("null").isEmpty)
  }

  test("ols trend: an epsilon-negative slope rounds to POSITIVE zero") {
    import spark.implicits._
    // two points 10^6 s apart with a -0.0001 value drop: exact slope
    // -1e-10, which rounds to zero at 6 dp — the r08 red-gate shape.
    val ev = Seq(
        (27L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0)),
          new java.math.BigDecimal("0.0001")),
        (27L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000000)),
          new java.math.BigDecimal("0.0000")))
      .toDF("user_id", "ts", "value")
    val row = EventSequences.olsTrend(ev).collect().head
    val slope = row.getDouble(row.fieldIndex("slope"))
    assert(slope == 0.0 && isPosZero(slope),
      s"slope must be +0.0, got raw bits ${java.lang.Double.doubleToRawLongBits(slope)}")
  }

  test("vocab diversity: a single-type corpus yields +0.0 entropy (not -0.0)") {
    // -sum(1·ln 1) is IEEE -0.0 before the round — THE classic case.
    val out = TextAnalysis.vocabDiversity(
        docs(1L -> "same same same").withColumn("src", lit("a")),
        "text", "src").collect().head
    val h = out.getDouble(out.fieldIndex("entropy"))
    assert(h == 0.0 && isPosZero(h))
  }

  test("target encoding / spearman / modularity: zero-valued outputs carry a clear sign bit") {
    import spark.implicits._
    // target encoding of an all-zero y: enc = 0 on every category
    val enc = Features.targetEncode(
        Seq(("a", 0.0), ("a", 0.0), ("b", 0.0)).toDF("cat", "y"),
        "cat", "y", m = 10).collect()
    assert(enc.forall(r => isPosZero(r.getDouble(r.fieldIndex("enc")))))
    // modularity of a 2-community graph engineered near zero keeps +0.0
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("id", "community")
    val m = GraphMetrics.modularity(edges, "src", "dst", comm, "id",
      "community").collect().head
    val mod = m.getDouble(m.fieldIndex("modularity"))
    assert(!(mod == 0.0) || isPosZero(mod))
  }
}
