package graft.operators

import graft.SparkSpec

/** Unigram-LM tokenizer locked to hand-computed EM and Viterbi values
  * (Kudo 2018 semantics): one exact EM step on a 3-token corpus, the
  * integer-milli Viterbi argmax with both documented tie-breaks, the
  * unseen-code-point penalty path, pruning determinism, and the
  * lossless round trip (supplementary-plane characters included).
  */
class UnigramLmSpec extends SparkSpec {

  test("trainOnWordDict: one EM step matches the hand-computed posterior") {
    // corpus "ab ab b": dict ab(2), b(1); singles a, b; candidate "ab".
    // Seed: a=2, b=3, ab=2 (tot 7) -> p(a)=2/7, p(b)=3/7, p(ab)=2/7.
    // E-step word "ab" (f=2): P([a,b]) = 6/49, P([ab]) = 14/49,
    //   Z = 20/49 -> E[ab] = 2*0.7 = 1.4, E[a] = E[b] += 2*0.3 = 0.6.
    // word "b" (f=1): E[b] += 1. Counts: a=0.6, b=1.6, ab=1.4 (tot 3.6)
    // -> p(a)=1/6, p(b)=4/9, p(ab)=7/18.
    val pieces = UnigramLm.trainOnWordDict(
      Array(("ab", 2L), ("b", 1L)), vocabSize = 100, maxPieceLen = 2,
      maxCandidates = 100, emIters = 1, pruneKeep = 0.8)
    val m = pieces.toMap
    assert(m.keySet == Set("a", "b", "ab"))
    assert(m("a") == math.round(math.log(1.0 / 6.0) * 1000)) // -1792
    assert(m("b") == math.round(math.log(4.0 / 9.0) * 1000)) // -811
    assert(m("ab") == math.round(math.log(7.0 / 18.0) * 1000)) // -944
  }

  test("encode: Viterbi picks the best integer-milli segmentation") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("ab")).toDF("text")
    // [ab] = -150 beats [a, b] = -200
    val best = UnigramLm.encode(df, "text",
      Seq(("a", -100L), ("b", -100L), ("ab", -150L)))
      .select("tokens").head().getSeq[String](0)
    assert(best == Seq("ab"))
    // equal score (-200 both ways): fewer tokens wins
    val fewer = UnigramLm.encode(df, "text",
      Seq(("a", -100L), ("b", -100L), ("ab", -200L)))
      .select("tokens").head().getSeq[String](0)
    assert(fewer == Seq("ab"))
  }

  test("encode: equal score and token count breaks to the smallest " +
    "start index (longest final piece)") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("abc")).toDF("text")
    // [ab,c] and [a,bc] both score -300 with 2 tokens; the transition
    // into position 3 from i=1 (piece "bc") wins over i=2 (piece "c")
    val toks = UnigramLm.encode(df, "text",
      Seq(("a", -100L), ("b", -100L), ("c", -100L),
        ("ab", -200L), ("bc", -200L)))
      .select("tokens").head().getSeq[String](0)
    assert(toks == Seq("a", "bc"))
  }

  test("encode: unseen code points become single-cp tokens under the " +
    "penalty and still round-trip") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("axb")).toDF("text")
    val enc = UnigramLm.encode(df, "text",
      Seq(("a", -100L), ("b", -100L), ("ab", -150L)))
    val toks = enc.select("tokens").head().getSeq[String](0)
    assert(toks == Seq("a", "x", "b"))
    assert(UnigramLm.detokenized(enc).select("detok").head()
      .getString(0) == "axb")
  }

  test("trainPieces + encode: lossless round trip, supplementary plane " +
    "included; vocab respects the target size") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the clef 𝄞 sings", "the the banana band",
      "abracadabra banana", "clef banana the").toDF("text")
    val pieces = UnigramLm.trainPieces(docs, "text", vocabSize = 24,
      maxPieceLen = 3, maxCandidates = 64, emIters = 2)
    // singles survive pruning unconditionally; size is bounded
    val singles = pieces.map(_._1)
      .filter(p => p.codePointCount(0, p.length) == 1)
    assert(singles.contains("𝄞"))
    assert(pieces.size <= math.max(24, singles.size))
    assert(pieces.forall(_._2 <= 0L))
    val enc = UnigramLm.encode(docs, "text", pieces)
    val got = UnigramLm.detokenized(enc)
      .selectExpr("detok",
        "regexp_replace(lower(trim(text)), '\\\\s+', '') AS want")
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"round trip broke: ${r.getString(0)} != ${r.getString(1)}"))
    // multi-cp pieces actually formed (the model learned something)
    val multiUsed = enc.selectExpr("explode(tokens) AS t")
      .where("length(t) > 1").count()
    assert(multiUsed > 0, "no multi-cp piece ever chosen")
  }

  test("trainPiecesDistributed: exact agreement with the driver trainer " +
    "on the hand corpus (micro-quantized E-step)") {
    val s = spark
    import s.implicits._
    val docs = Seq(Tuple1("ab ab b")).toDF("text")
    val drv = UnigramLm.trainPieces(docs, "text", vocabSize = 100,
      maxPieceLen = 2, maxCandidates = 100, emIters = 1)
    val dist = UnigramLm.trainPiecesDistributed(docs, "text",
      vocabSize = 100, maxPieceLen = 2, maxCandidates = 100, emIters = 1)
    assert(dist == drv)
    assert(dist.toMap.apply("ab") ==
      math.round(math.log(7.0 / 18.0) * 1000))
  }

  test("trainPiecesDistributed: lossless round trip, pruning to the " +
    "target, deterministic across invocations") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the clef sings a long tune", "the the banana band plays",
      "abracadabra banana magic", "clef banana the chorus").toDF("text")
    val a = UnigramLm.trainPiecesDistributed(docs, "text", vocabSize = 24,
      maxPieceLen = 3, maxCandidates = 64, emIters = 2)
    val b = UnigramLm.trainPiecesDistributed(docs, "text", vocabSize = 24,
      maxPieceLen = 3, maxCandidates = 64, emIters = 2)
    assert(a == b)
    val singles = a.map(_._1).filter(p => p.codePointCount(0, p.length) == 1)
    assert(a.size <= math.max(24, singles.size))
    val enc = UnigramLm.encode(docs, "text", a)
    val got = UnigramLm.detokenized(enc)
      .selectExpr("detok",
        "regexp_replace(lower(trim(text)), '\\\\s+', '') AS want")
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("trainPieces: deterministic across invocations") {
    val s = spark
    import s.implicits._
    val docs = Seq("pack my box with five dozen liquor jugs",
      "the quick brown fox jumps over the lazy dog").toDF("text")
    val a = UnigramLm.trainPieces(docs, "text", vocabSize = 40,
      maxPieceLen = 3, maxCandidates = 48, emIters = 2)
    val b = UnigramLm.trainPieces(docs, "text", vocabSize = 40,
      maxPieceLen = 3, maxCandidates = 48, emIters = 2)
    assert(a == b)
  }
}
