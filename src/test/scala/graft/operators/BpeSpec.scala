package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  /** Independent reference trainer over a word-frequency dict (the
    * classic in-memory algorithm, written separately from the operator).
    */
  /** UTF-8 byte order — Spark SQL's string ordering, which both product
    * trainers use for count ties; Scala's String ordering (UTF-16 code
    * units) disagrees on supplementary-plane symbols, so the reference
    * must not use it.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def naiveTrain(
      wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var seqs: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      val chars = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      (chars.init :+ (chars.last + Bpe.Eow)) -> f
    }
    val out = Seq.newBuilder[(String, String)]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) stop = true
      else {
        // ties break (count desc, l, r) in UTF-8 BYTE order — Scala's
        // default String ordering (UTF-16 code units) would disagree on
        // supplementary-plane symbols
        val best = counts.toSeq.reduceLeft { (p, q) =>
          val ((pl, pr), pc) = p
          val ((ql, qr), qc) = q
          val better =
            if (qc != pc) qc > pc
            else if (ql != pl) utf8Lt(ql, pl)
            else utf8Lt(qr, pr)
          if (better) q else p
        }._1
        out += best
        val (l, r) = best
        seqs = seqs.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result() -> f
        }
        k += 1
      }
    }
    out.result()
  }

  private def corpusDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def wordFreq(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("learned merges match the reference trainer, in order") {
    val texts = Seq("low low low low low", "lower lower newest newest",
      "newest newest newest newest widest widest widest")
    val got = Bpe.trainMerges(corpusDf(texts), "text", 10)
      .map { case (l, r, _) => (l, r) }
    val want = naiveTrain(wordFreq(texts), 10)
    assert(got == want)
  }

  test("training is partitioning-independent and stops when pairs run out") {
    val texts = Seq("ab ab", "cd")
    val one = Bpe.trainMerges(corpusDf(texts).repartition(1), "text", 50)
    val many = Bpe.trainMerges(corpusDf(texts).repartition(9), "text", 50)
    assert(one == many)
    // (a, b</w>) and (c, d</w>) each fully merge in one step — then
    // no adjacent pair remains anywhere
    assert(one.map { case (l, r, _) => (l, r) } ==
      Seq(("a", "b</w>"), ("c", "d</w>")))
  }

  test("encode applies merges in rank order and round-trips the text") {
    val texts = Seq("low low lower lowest")
    val merges = Bpe.trainMerges(corpusDf(texts), "text", 8)
    val enc = Bpe.encode(corpusDf(texts), "text", merges)
      .select("tokens", "n_tokens").collect().head
    val tokens = enc.getSeq[String](0)
    assert(enc.getLong(1) == tokens.size)
    // concatenating tokens and stripping markers reproduces the words
    assert(tokens.mkString("").replace(Bpe.Eow, " ").trim ==
      "low low lower lowest")
    // the fully-learned frequent word is a single token
    assert(tokens.contains("low" + Bpe.Eow))
  }

  test("driver trainer and distributed trainer learn identical merges") {
    val texts = Seq("low low low low low", "lower lower newest newest",
      "newest newest newest newest widest widest widest",
      "wide wide widen lowly newly newly")
    val driver = Bpe.trainMerges(corpusDf(texts), "text", 30)
    val dist = Bpe.trainMergesDistributed(corpusDf(texts), "text", 30)
    assert(driver == dist)
  }

  test("1000 merges train driver-side in one Spark job's worth of work") {
    // deterministic pseudo-word corpus with enough symbol diversity to
    // sustain 1000 merges (~500 distinct words × ~12 chars)
    val rng = new scala.util.Random(42)
    val words = (0 until 500).map { _ =>
      (0 until (6 + rng.nextInt(8))).map(_ => ('a' + rng.nextInt(26)).toChar)
        .mkString
    }
    val texts = (0 until 2000).map(i => words(rng.nextInt(words.size)) + " " +
      words(rng.nextInt(words.size)))
    val merges = Bpe.trainMerges(corpusDf(texts), "text", 1000)
    assert(merges.size == 1000)
    // learning order is exactly the reference trainer's
    assert(merges.map { case (l, r, _) => (l, r) } ==
      naiveTrain(wordFreq(texts), 1000))
  }

  test("vocab cap turns training into the documented top-V bounded mode") {
    // cap = 1: only the most frequent word is seen, so every merge
    // comes from inside it
    val texts = Seq("aaaa aaaa aaaa bcd bcd xyz")
    val merges = Bpe.trainMerges(corpusDf(texts), "text", 10, maxDriverVocab = 1)
    val symsUsed = merges.map { case (l, r, _) => l + r }
    assert(symsUsed.forall(s => s.replace(Bpe.Eow, "").forall(_ == 'a')))
  }

  test("supplementary-plane count ties break in UTF-8 byte order in all three trainers") {
    // "！" (U+FF01, UTF-8 EF BC 81) vs "𐀀" (U+10000, UTF-8 F0 90 80 80):
    // UTF-8 byte order puts ！ first, UTF-16 code-unit order puts 𐀀
    // (high surrogate D800) first — a tie on these two merge candidates
    // distinguishes the orderings. Both words appear once → pure tie.
    val texts = Seq("a！ a𐀀")
    val driver = Bpe.trainMerges(corpusDf(texts), "text", 2)
      .map { case (l, r, _) => (l, r) }
    val dist = Bpe.trainMergesDistributed(corpusDf(texts), "text", 2)
      .map { case (l, r, _) => (l, r) }
    val naive = naiveTrain(wordFreq(texts), 2)
    assert(driver == naive)
    assert(dist == naive)
    // UTF-8 order: the fullwidth-! pair merges before the U+10000 pair
    assert(naive == Seq(("a", "！" + Bpe.Eow),
      ("a", "𐀀" + Bpe.Eow)))
  }

  test("encode round-trips supplementary-plane characters as whole code points") {
    val texts = Seq("𐀀z 𐀀z")
    val merges = Bpe.trainMerges(corpusDf(texts), "text", 2)
    val toks = Bpe.encode(corpusDf(texts), "text", merges)
      .select("tokens").collect().head.getSeq[String](0)
    // the learned word is one token containing the intact surrogate pair
    assert(toks.forall(_.contains("𐀀")))
    assert(toks.mkString("").replace(Bpe.Eow, " ").trim ==
      "𐀀z 𐀀z")
  }

  test("encode of an unseen word falls back to character symbols") {
    val merges = Bpe.trainMerges(corpusDf(Seq("aa aa aa")), "text", 3)
    val toks = Bpe.encode(corpusDf(Seq("zq")), "text", merges)
      .select("tokens").collect().head.getSeq[String](0)
    assert(toks == Seq("z", "q" + Bpe.Eow))
  }

  /** Portable merge chain: the replace-all contract hand-checked,
    * including a cascading merge (t,h then th,e), the non-overlapping
    * left-to-right rule, normalization, and the empty-doc zero.
    */
  test("portableMergeChain: hand-computed chain on 'the thin threads'") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "The thin TH-reads!"), (2L, ""), (3L, "zzz 123"))
      .toDF("doc_id", "text")
    val got = Bpe.portableMergeChain(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // "the thin threads" -> chars; t+h -> th everywhere; th+e -> the;
    // i+n -> in; r+e -> re; remaining letters stay single
    assert(got(1L) == ((10L, "the| |th|in| |th|re|a|d|s")),
      s"got ${got(1L)}")
    assert(got(2L) == ((0L, "")), "empty text -> zero tokens")
    assert(got(3L) == ((4L, "z|z|z| ")), "digits stripped, space kept")
  }

  test("portableMergeChain: overlapping pair merges left-to-right") {
    val s = spark
    import s.implicits._
    // "ttth" -> t,t,t,h: the single t+h merge fires once at the end
    // ("ananan" exercises a+n thrice, non-overlapping: an|an|an -> and?)
    val df = Seq((1L, "ttth"), (2L, "ananan")).toDF("doc_id", "text")
    val got = Bpe.portableMergeChain(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "t|t|th")
    // a+n -> an,an,an; then an+d has no d -> stays
    assert(got(2L) == "an|an|an")
  }

  test("detokenized recovers the whitespace-stripped normalized text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The QUICK  brown fox"), (2L, "ünïcødé Text"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 8)
    val got = Bpe.detokenized(Bpe.encode(docs, "text", merges))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("detok")).toMap
    assert(got(1L) == "thequickbrownfox")
    assert(got(2L) == "ünïcødétext")
  }
}
