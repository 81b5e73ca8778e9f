package graft.operators

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def tokensOf(text: String, vocab: Set[String],
      maxWordChars: Int = 200): Seq[String] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    WordPiece.encode(df, "text", vocab, maxWordChars)
      .select("tokens").as[Seq[String]].head()
  }

  // the published BERT example: hand vocab, greedy longest-match-first
  private val bertVocab = Set(
    "un", "##aff", "##able", "aff", "able", "a", "##a", "##f", "##b",
    "##l", "##e", "u", "##n", "f", "b", "l", "e")

  test("greedy longest-match with ## continuations (BERT example)") {
    assert(tokensOf("unaffable", bertVocab) ===
      Seq("un", "##aff", "##able"))
  }

  test("longest match wins over shorter prefixes at every position") {
    // at pos 0 "un" beats "u"; at pos 2 "##aff" beats "##a"/"##f"
    assert(tokensOf("una", bertVocab) === Seq("un", "##a"))
    // word-initial "aff" only exists bare; "able" alone uses the bare form
    assert(tokensOf("able", bertVocab) === Seq("able"))
    assert(tokensOf("affable", bertVocab) === Seq("aff", "##able"))
  }

  test("whole word becomes [UNK] when any position fails to match") {
    // 'z' has no piece — the entire word collapses, not a partial emit
    assert(tokensOf("unz", bertVocab) === Seq(WordPiece.Unk))
    // continuation gap: "x" word-initial missing entirely
    assert(tokensOf("xun", bertVocab) === Seq(WordPiece.Unk))
  }

  test("words over maxWordChars code points become [UNK] unmatched") {
    assert(tokensOf("aaaa", Set("a", "##a"), maxWordChars = 3) ===
      Seq(WordPiece.Unk))
    assert(tokensOf("aaa", Set("a", "##a"), maxWordChars = 3) ===
      Seq("a", "##a", "##a"))
  }

  test("normalization matches the Bpe contract: lowercase, trim, split") {
    assert(tokensOf("  UNA  able ", bertVocab) ===
      Seq("un", "##a", "able"))
  }

  test("supplementary-plane code points never split mid-surrogate") {
    val gclef = new String(Character.toChars(0x1D11E)) // 𝄞 (2 chars)
    val vocab = Set(gclef, "##" + gclef, "a", "##a")
    assert(tokensOf(gclef + "a" + gclef, vocab) ===
      Seq(gclef, "##a", "##" + gclef))
  }

  test("vocabFromCorpus: merges in both forms + char seed, no [UNK]") {
    val docs = Seq(
      (1L, "low lower lowest"),
      (2L, "new newer newest"),
      (3L, "low new low")).toDF("doc_id", "text")
    val vocab = WordPiece.vocabFromCorpus(docs, "text", numMerges = 8)
    // every single corpus char is seeded in both positional forms
    for (c <- "lowernst".map(_.toString)) {
      assert(vocab.contains(c), s"missing bare '$c'")
      assert(vocab.contains("##" + c), s"missing continuation '##$c'")
    }
    assert(vocab.contains(WordPiece.Unk))
    // encode the corpus: zero [UNK], lossless detok per doc
    val enc = WordPiece.encode(docs, "text", vocab)
    val unks = enc.select(org.apache.spark.sql.functions.explode($"tokens"))
      .filter($"col" === WordPiece.Unk).count()
    assert(unks === 0L)
    val detok = WordPiece.detokenized(enc)
      .select("doc_id", "detok").as[(Long, String)].collect().toMap
    assert(detok(1L) === "lowlowerlowest")
    assert(detok(2L) === "newnewernewest")
    assert(detok(3L) === "lownewlow")
  }

  test("detokenized strips ## markers and concatenates") {
    val df = Seq((1L, Seq("un", "##aff", "##able", "able")))
      .toDF("doc_id", "tokens")
    val d = WordPiece.detokenized(df).select("detok").as[String].head()
    assert(d === "unaffableable")
  }

  test("null and empty text encode to zero tokens") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "   "))
      .toDF("doc_id", "text")
    val n = WordPiece.encode(df, "text", bertVocab)
      .select("n_tokens").as[Long].collect().toSeq
    assert(n === Seq(0L, 0L))
  }
}
