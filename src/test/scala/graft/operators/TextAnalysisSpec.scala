package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  private def eval(text: String, c: org.apache.spark.sql.Column): Any =
    one(text).select(c).collect().head.get(0)

  test("html to text: tags stripped, script/style dropped, entities decoded") {
    import org.apache.spark.sql.functions.col
    val html = "<html><head><title>T</title><style>p{color:red}</style>" +
      "<script>var x = '<p>not text</p>';</script></head>" +
      "<body><h1>Head</h1><p>Tom &amp; Jerry &lt;3 &quot;quoted&quot;</p></body></html>"
    assert(eval(html, TextAnalysis.htmlToText(col("text"))) ==
      "T Head Tom & Jerry <3 \"quoted\"")
  }

  test("html to text: amp decodes LAST so double-escapes never cascade") {
    import org.apache.spark.sql.functions.col
    // &amp;lt; is the ESCAPED text "&lt;" — must render as the literal
    // string "&lt;", not cascade-decode to "<"
    assert(eval("<p>&amp;lt;tag&amp;gt;</p>",
      TextAnalysis.htmlToText(col("text"))) == "&lt;tag&gt;")
  }

  test("html to text: malformed nesting degrades to whitespace, not error") {
    import org.apache.spark.sql.functions.col
    assert(eval("<p>open <b>bold <i>never closed",
      TextAnalysis.htmlToText(col("text"))) == "open bold never closed")
    assert(eval("plain text, no markup at all",
      TextAnalysis.htmlToText(col("text"))) == "plain text, no markup at all")
  }

  test("token counts: whitespace and bpe-ish") {
    assert(eval("the quick  brown fox", TextAnalysis.tokenCount(col("text"))) == 4)
    assert(eval("ab, cd3", TextAnalysis.bpeishTokenCount(col("text"))) == 4)
    assert(eval("hello world!", TextAnalysis.bpeishTokenCount(col("text"))) == 3)
  }

  test("punct and stopword ratios") {
    assert(eval("ab!!", TextAnalysis.punctRatio(col("text"))) == 0.5)
    assert(eval("the cat is here", TextAnalysis.stopwordRatio(col("text"))) == 0.5)
  }

  test("quality score is in [0,1] and favors clean text") {
    val clean = eval(
      ("word " * 120).trim, TextAnalysis.qualityScore(col("text")))
      .asInstanceOf[Double]
    val noisy = eval("!!! ??? ### $$$ %%%", TextAnalysis.qualityScore(col("text")))
      .asInstanceOf[Double]
    assert(clean > noisy)
    assert(clean <= 1.0 && noisy >= 0.0)
  }

  test("language id picks marker-majority language, und fallback") {
    assert(eval("the cat and the dog is here", TextAnalysis.langId(col("text"))) == "en")
    assert(eval("der hund und die katze ist", TextAnalysis.langId(col("text"))) == "de")
    assert(eval("xyzzy plugh", TextAnalysis.langId(col("text"))) == "und")
  }

  test("fingerprint: deterministic, order-sensitive") {
    val a = eval("alpha beta gamma", TextAnalysis.fingerprint(col("text")))
    val b = eval("alpha beta gamma", TextAnalysis.fingerprint(col("text")))
    val c = eval("gamma beta alpha", TextAnalysis.fingerprint(col("text")))
    assert(a == b)
    assert(a != c) // rolling hash is position-sensitive
  }

  test("rarity terms rank rare-and-repeated over ubiquitous") {
    val s = spark
    import s.implicits._
    // "rare" repeats in doc 1 and exists nowhere else (tf=2, df=1);
    // "the" is in every doc (df=3) — rare must outrank it
    val docs = Seq(
      (1L, "the rare rare word"),
      (2L, "the common word"),
      (3L, "the common word")).toDF("doc_id", "text")
    val top = TextAnalysis.topRarityTerms(docs, "text", "doc_id", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "rare")
    // doc 2/3: "common"/"word" (df=2) outrank "the" (df=3);
    // tie between them breaks alphabetically
    assert(top(2L) == "common")
  }

  test("repetition metrics: dup-word and top-bigram ratios") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "a a a a"),          // dup 0.75; bigrams all "a a" -> 1.0
      (2L, "a b c d"),          // dup 0.0; every bigram unique -> 1/3
      (3L, "x"),                // no bigram -> 0.0
      (4L, "go go stop go go")) // top bigram "go go" = 2 of 4
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        round(TextAnalysis.dupWordRatio(col("text")), 6).as("d"),
        round(TextAnalysis.topBigramRatio(col("text")), 6).as("t"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 0.75, 1.0),
      (2L, 0.0, 0.333333),
      (3L, 0.0, 0.0),
      (4L, 0.6, 0.5)))
  }

  test("unigram log-prob: common-word docs outscore rare-word docs") {
    val s2 = spark
    import s2.implicits._
    // "the" appears 8x in the corpus, "zyx"/"qwv" once each — doc 1's
    // tokens are all common, doc 3's all rare
    val df = Seq(
      (1L, "the the the the"),
      (2L, "the the the the zyx"),
      (3L, "zyx qwv"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProbScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val n = 11.0 // total tokens: 4 + 5 + 2... recounted below
    assert(got(1L)._1 == 4L && got(2L)._1 == 5L && got(3L)._1 == 2L)
    assert(got(1L)._2 > got(2L)._2 && got(2L)._2 > got(3L)._2)
    // exact value check for doc 1: all tokens "the" (8 of 11 corpus
    // tokens) -> avg logprob = ln(8/11)
    assert(math.abs(got(1L)._2 - math.log(8.0 / n)) < 1e-6)
  }

  test("unigram log-prob is invariant to word order") {
    val s2 = spark
    import s2.implicits._
    val df = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta alpha alpha gamma"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProbScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == got(2L))
  }

  test("gopher rules: each rule rejects its own failure mode") {
    val s2 = spark
    import s2.implicits._
    val good = "the quick brown cat jumped over a sleeping dog and it is quite warm today"
    val cases = Seq(
      (1L, good),                                       // passes all
      (2L, "the cat is in a bag"),                      // 6 words: r_wordcount
      (3L, "the incomprehensibilities of antidisestablishmentarianism and " +
        "counterrevolutionaries in pseudopseudohypoparathyroidism is " +
        "overwhelming straightforwardly"),              // mwl > 10: r_wordlen
      (4L, "111 222 333 444 555 666 777 888 999 000 the of " +
        "12 34 56 78 90 11 22 33"),                     // digits: r_alpha
      (5L, "the!!! cat??? sat### on$$$ a%%% mat^^^ and&&& it*** is((( " +
        "warm))) here___ today+++"),                    // symbols: r_punct
      (6L, "cat sat mat warm here today fine ok yes sure why not"))
      // ^ no stopwords from the list: r_stopwords
    val df = cases.toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(col("text"))
    val out = df.select(col("doc_id"), r.as("r"),
        TextAnalysis.gopherKeep(r).as("keep"))
      .select(col("doc_id"), col("r.*"), col("keep"))
      .collect()
      .map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3),
          x.getBoolean(4), x.getBoolean(5), x.getBoolean(6)))
      .toMap
    assert(out(1L) == ((true, true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._6)  // word count
    assert(!out(3L)._2 && !out(3L)._6)  // mean word length
    assert(!out(4L)._3 && !out(4L)._6)  // alpha fraction
    assert(!out(5L)._4 && !out(5L)._6)  // punct ratio
    assert(!out(6L)._5 && !out(6L)._6)  // stopwords
    // keep is exactly the conjunction on every row
    out.values.foreach { case (a, b, c, d, e, k) =>
      assert(k == (a && b && c && d && e))
    }
  }

  test("bigram log-prob matches a hand computation with add-1 smoothing") {
    val s2 = spark
    import s2.implicits._
    // corpus: "a b a b" and "a b c"; V = 3
    // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; context counts a=3 b=3 c=1
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProbScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def p(cbg: Long, cl: Long) = math.log(cbg + 1.0) - math.log(cl + 3.0)
    val d1 = (2 * p(3, 3) + p(1, 3)) / 3 // a b, a b twice; b a once
    val d2 = (p(3, 3) + p(1, 3)) / 2     // a b; b c
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, r4(d1))))
    assert(got(2L) == ((2L, r4(d2))))
  }

  test("Kneser-Ney matches a hand computation, discount and continuation") {
    val s2 = spark
    import s2.implicits._
    // corpus: "a b a b" and "a c"
    // bigram types: (a,b)=2, (b,a)=1, (a,c)=1; B=3
    // left stats: a -> cl=3, N1+(a,.)=2; b -> cl=1, N1+(b,.)=1
    // right stats: N1+(.,b)=1, N1+(.,a)=1, N1+(.,c)=1
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyLogProbScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pBgivenA = (math.max(2 - 0.75, 0) + 0.75 * (2 * 1) / 3.0) / 3.0 // 1.75/3
    val pAgivenB = (math.max(1 - 0.75, 0) + 0.75 * (1 * 1) / 3.0) / 1.0 // 0.5
    val pCgivenA = (math.max(1 - 0.75, 0) + 0.75 * (2 * 1) / 3.0) / 3.0 // 0.75/3
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (2 * math.log(pBgivenA) + math.log(pAgivenB)) / 3
    assert(got(1L) == ((3L, r4(d1))))
    assert(got(2L) == ((1L, r4(math.log(pCgivenA)))))
  }

  test("Kneser-Ney continuation: versatile words score higher after rare contexts") {
    val s2 = spark
    import s2.implicits._
    // "the" follows many distinct contexts; "francisco" follows only
    // "san" — a bigram (x, the) unseen-ish gets more smoothing mass
    // than (x, francisco) even at equal raw counts. Build: several
    // contexts each followed by "the"; "san francisco" repeated.
    val corpus = Seq(
      "over the", "under the", "near the", "behind the",
      "san francisco", "san francisco", "san francisco", "san francisco")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // probe doc: "x the" vs "y francisco" — both bigrams have raw count
    // 1 in the probe-extended corpus
    val df = (corpus ++ Seq((100L, "probe the"), (101L, "probe francisco")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyLogProbScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(100L) > got(101L),
      s"high-continuation word must get more smoothing mass: $got")
  }

  test("bigram log-prob is order-aware where the unigram score is not") {
    val s2 = spark
    import s2.implicits._
    // same unigram profile, different order: the in-order doc repeats
    // the corpus-frequent bigrams, the shuffled doc uses rare ones
    val base = Seq.fill(10)("the quick brown fox").mkString(" ")
    val df = Seq((1L, base), (2L, "fox the brown quick quick fox the brown"),
      (3L, base)).toDF("doc_id", "text")
    val bg = TextAnalysis.bigramLogProbScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bg(1L) > bg(2L))
    val un = TextAnalysis.unigramLogProbScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // unigram: both docs draw from the same token pool — near-equal
    assert(math.abs(un(1L) - un(2L)) < 0.2)
  }

  test("PMI: perfect collocation scores ln(N/c), independent pair near 0") {
    val s2 = spark
    import s2.implicits._
    // "new york" always adjacent (perfect collocation); "the cat/dog"
    // mixes freely
    val df = Seq(
      "new york the cat the dog new york",
      "the dog new york the cat").toDF("text")
    val got = TextAnalysis.pmiBigrams(df, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // bigram positions: doc1 (8 tokens) has 7, doc2 (6 tokens) has 5
    // -> N = 12; c(new,york)=3, c(new,·)=3, c(·,york)=3
    // -> PMI = ln(3·12/9) = ln 4
    val (cnt, pmi) = got(("new", "york"))
    assert(cnt == 3L)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi == r4(math.log(4.0)))
    // a frequent-but-free pair scores lower than the collocation
    got.get(("the", "cat")).foreach { case (_, p) => assert(p < pmi) }
  }

  test("winnowing: shared substrings share a fingerprint, density shrinks") {
    val s2 = spark
    import s2.implicits._
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"one two three $common four five six seven eight nine ten"),
      (2L, s"totally different prefix words here $common and a different tail"),
      (3L, "nothing in common with those documents at all whatsoever")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // SWA guarantee: an 8-token shared run (6 shared 3-gram shingles >
    // window+shingle) must surface at least one common fingerprint
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // density: fingerprints ≪ shingles (window-min selection)
    val nShingles1 = df.filter(col("doc_id") === 1L).head.getString(1)
      .split("\\s+").length - 2
    assert(fps(1L).size < nShingles1)
  }

  test("JS divergence: zero against itself, bounded, shift-sensitive") {
    val s2 = spark
    import s2.implicits._
    // one source == the corpus -> JSD 0
    val single = Seq((1L, "aa bb cc", "s0"), (2L, "bb cc dd", "s0"))
      .toDF("doc_id", "text", "source")
    val zero = TextAnalysis.jsDivergenceByGroup(single, "text", "source")
      .collect().map(_.getDouble(1))
    assert(zero.toSeq == Seq(0.0))
    // a drifted source scores strictly above an on-distribution one
    val mixed = (
      Seq.tabulate(20)(i => (i.toLong, "aa bb cc dd ee", "base")) ++
      Seq.tabulate(20)(i => (100L + i, "aa bb cc dd ee", "same")) ++
      Seq.tabulate(20)(i => (200L + i, "zz yy xx ww vv", "shifted")))
      .toDF("doc_id", "text", "source")
    val jsd = TextAnalysis.jsDivergenceByGroup(mixed, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(jsd.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(jsd("shifted") > jsd("same"))
    assert(jsd("shifted") > 0.3)
    assert(jsd("same") == jsd("base")) // symmetric halves of the corpus
  }

  test("winnowing short-doc fallback: one whole-text fingerprint") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "just two")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "text", "doc_id").collect()
    assert(fps.length == 1)
    assert(fps.head.getLong(1) == TextAnalysis.polyHash("just two"))
  }

  test("compression ratio orders repetitive < prose < high-entropy") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val df = Seq(
      (1L, "spam spam spam " * 150),
      (2L, ("the quick brown fox jumps over the lazy dog and then " +
        "considers a second, rather different sentence about rivers. ") * 20),
      (3L, noise),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._2 < got(2L)._2 && got(2L)._2 < got(3L)._2,
      s"signal ordering broken: $got")
    assert(got(1L)._2 < 0.05, s"pure repetition must crush: ${got(1L)}")
    assert(got(4L) == ((0L, 0.0)), "empty text: zero bytes, zero ratio")
    // deterministic across partitionings (stateless per-row kernel)
    val again = TextAnalysis.compressionRatio(df.repartition(5), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == got)
  }

  test("script counts and dominant script with deterministic tie-break") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "plain latin words only",
      "данные поток текст",
      "δεδομένα ροή",
      "数据 流 处理",
      "data данные",  // 4 latin vs 6 cyrillic → cyrillic
      "αβ 数据",      // 2 greek vs 2 cjk → tie → greek
      "1234 !?")      // nothing → all zero → tie chain → latin
      .toDF("t")
    val counts = TextAnalysis.scriptCounts(col("t"))
    val got = df.select(
        Seq(col("t")) ++ counts.map { case (n, c) => c.as(n) } :+
          TextAnalysis.dominantScript(col("t")).as("dom"): _*)
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getString(5)))
    assert(got(0) == ((19, 0, 0, 0, "latin")))
    assert(got(1) == ((0, 16, 0, 0, "cyrillic")))
    assert(got(2) == ((0, 0, 11, 0, "greek")))
    assert(got(3) == ((0, 0, 0, 5, "cjk")))
    assert(got(4) == ((4, 6, 0, 0, "cyrillic")))
    assert(got(5) == ((0, 0, 2, 2, "greek")))
    assert(got(6) == ((0, 0, 0, 0, "latin")))
  }

  test("trendingTerms ranks per bucket with the term tiebreak") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "aa aa bb"), (1L, "bb cc"), (2L, "zz"))
      .toDF("m", "text")
    val got = TextAnalysis.trendingTerms(df, "text", col("m"), k = 2)
      .orderBy("bucket", "rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // bucket 1: aa×2, bb×2 — tie breaks alphabetically; cc misses k=2
    assert(got.toSeq == Seq(
      (1L, "aa", 2L, 1L), (1L, "bb", 2L, 2L), (2L, "zz", 1L, 1L)))
  }

  test("vocabDiversity: uniform distribution hits ln(n_types) entropy") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u", "aa bb cc dd"),    // uniform over 4 types → H = ln 4
      ("k", "aa aa aa aa"))    // single type → H = 0
      .toDF("g", "text")
    val got = TextAnalysis.vocabDiversity(df, "text", "g")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got(0) == (("k", 4L, 1L, 0.0, 0.25)))
    assert(got(1)._4 == math.rint(math.log(4) * 1e4) / 1e4)
    assert(got(1) == (("u", 4L, 4L, got(1)._4, 1.0)))
  }

  test("doc keywords: ubiquity cap, integer weights, per-doc top-k") {
    val sp = spark
    import sp.implicits._
    // "common" is in every doc (df 3 > 3*0.7 -> excluded);
    // alpha (df 2 <= 2.1) survives the cap;
    // doc 1's best keyword is "rare" (tf 2, df 1 -> score 2_000_000)
    val df = Seq(
      (1L, "common rare rare alpha"),
      (2L, "common alpha beta"),
      (3L, "common beta"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.docKeywords(df, "doc_id", "text", k = 2,
        dfMaxShare = 0.7)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
    assert(!out.values.flatten.exists(_._2 == "common"))
    val d1 = out(1L).sortBy(_._4)
    assert(d1.head._2 == "rare" && d1.head._3 == 2000000L)
    // alpha: tf 1, df 2 -> 500000, rank 2 in doc 1
    assert(d1(1)._2 == "alpha" && d1(1)._3 == 500000L)
  }

  test("token offsets: prefix-sum positions over the normalized form") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "  ab cde  f ")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenOffsets(df, "doc_id", "text")
      .orderBy("idx").collect()
      .map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
    // normalized form "ab cde f": ab@[0,2), cde@[3,6), f@[7,8)
    assert(out.toSeq == Seq(("ab", 0L, 2L), ("cde", 3L, 6L), ("f", 7L, 8L)))
    // reconstruct: each token slice of the normalized text matches
    val norm = "ab cde f"
    out.foreach { case (tok, s0, e0) =>
      assert(norm.substring(s0.toInt, e0.toInt) == tok)
    }
  }

  test("sourceCommonPrefix: group LCP via order extremes, cap respected") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("s1", "Subject: hello world"), ("s1", "Subject: hello there"),
      ("s1", "Subject: hola"),        // LCP "Subject: h"
      ("s2", "alpha"), ("s2", "beta"), // no common prefix
      ("s3", "same"), ("s3", "same")) // identical → full string
      .toDF("source", "text")
    val out = TextAnalysis.sourceCommonPrefix(df, "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(("s1", 10L, "Subject: h"), ("s2", 0L, ""),
      ("s3", 4L, "same")))
    // cap truncates a longer-than-cap shared head
    val long = Seq(("s", "x" * 100 + "a"), ("s", "x" * 100 + "b"))
      .toDF("source", "text")
    assert(TextAnalysis.sourceCommonPrefix(long, "source", "text", cap = 8)
      .head().getLong(2) == 8L)
  }

  test("codeDetect: symbol counts exact, flag needs braces AND density") {
    val sp = spark
    import sp.implicits._
    val code = "int f(int x) { return g(x); }" // 29 chars
    val prose = "plain text with one; semicolon but no braces at all"
    val sparseBraces = "{x}" + " a" * 200 // braces but low density
    val df = Seq((1L, code), (2L, prose), (3L, sparseBraces))
      .toDF("doc_id", "text")
    val out = TextAnalysis.codeDetect(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // code: 2 braces, 1 semi, 4 parens → 7 symbols / 29 chars
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3)) ==
      ((2L, 1L, 4L)))
    assert(out(0).getBoolean(5))
    assert(!out(1).getBoolean(5)) // no braces
    assert(!out(2).getBoolean(5)) // braces but 2/403 < 8‰
  }

  test("redundancyRatio counts CODE POINTS like the Catalyst twin: " +
    "supplementary characters are one gram slot, not two") {
    val s = spark
    import s.implicits._
    // 🚀 = U+1F680, a surrogate PAIR in UTF-16: 10 code points but 12
    // code units. n_grams must be 10 − 7 = 3 (unit counting says 5).
    val emoji = "ab🚀cd🚀ef" + "gh"
    assert(emoji.length == 12 && emoji.codePointCount(0, emoji.length) == 10)
    // 8 code points exactly (9 units) — one gram; and a pure-BMP twin
    val eight = "a🚀bcdefg"
    val df = Seq((1L, emoji), (2L, eight), (3L, "abcdefgh"),
      (4L, "aaaaaaaaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.redundancyRatio(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert((out(0).getLong(1), out(0).getLong(2)) == ((3L, 3L)))
    assert((out(1).getLong(1), out(1).getLong(2)) == ((1L, 1L)))
    assert((out(2).getLong(1), out(2).getLong(2)) == ((1L, 1L)))
    // repetitive BMP fast path: 3 grams, 1 distinct
    assert((out(3).getLong(1), out(3).getLong(2)) == ((3L, 1L)))
    // bit-identical to the declarative code-point form for ALL rows
    val decl = df.select(col("doc_id"),
      when(length(col("text")) >= 8,
        transform(sequence(lit(1), length(col("text")) - 7),
          i => col("text").substr(i, lit(8))))
        .otherwise(array()).as("g"))
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        size(array_distinct(col("g"))).as("n_distinct"))
      .orderBy("doc_id").collect()
    out.zip(decl).foreach { case (k, d) =>
      assert(k.getLong(1) == math.max(0L, d.getInt(1).toLong) &&
        k.getLong(2) == (if (d.getInt(1) <= 0) 0L else d.getInt(2).toLong),
        s"kernel ${k} vs declarative ${d}")
    }
  }

  test("textRankTerms: the adjacency hub outranks its spokes") {
    val s = spark
    import s.implicits._
    // 'b' is adjacent to three distinct words; each spoke touches only
    // 'b' — the hub must take rank 1. Self-pairs ("e e") are dropped.
    val df = Seq((1L, "a b"), (2L, "c b"), (3L, "d b"), (4L, "e e"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textRankTerms(df, "text",
      iterations = 2, topK = 10).collect()
    assert(out.head.getString(0) == "b")
    // vocabulary smaller than topK: every term ranked exactly once
    assert(out.map(_.getString(0)).toSet == Set("a", "b", "c", "d", "e"))
    // ranks are the fixed-point longs, strictly ordered desc then term
    val ranks = out.map(r => (r.getLong(1), r.getString(0)))
    assert(ranks.sortBy { case (r, t) => (-r, t) }.toSeq == ranks.toSeq)
  }
}
