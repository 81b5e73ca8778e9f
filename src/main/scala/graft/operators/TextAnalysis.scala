package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document corpus — all pure column
  * expressions (whole-stage codegen, no UDFs): at 100 TB these run as one
  * narrow projection pass over the parquet scan, shuffle-free.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Unicode accent folding ([[graft.expressions.StripAccents]] — NFD +
    * combining-mark removal, codegen'd; ASCII rows are a zero-copy
    * pass-through). Requires `GraftFunctions.register(spark)` first.
    */
  def stripAccents(text: Column): Column =
    call_function("strip_accents", text)

  /** Canonical match key for multilingual text: Unicode lowercase →
    * accent fold → whitespace collapse → trim. The normalization every
    * dedup/decontamination key and cross-lingual join should share; one
    * codegen'd projection, zero shuffles. Characters with no canonical
    * decomposition (`ß ø œ`) are KEPT — this is mark removal, not
    * transliteration (contract proved cross-engine by the
    * `text_normalize_unicode` gate vs DuckDB `strip_accents`).
    */
  def normalizeForMatch(text: Column): Column =
    trim(regexp_replace(stripAccents(lower(text)), "\\s+", " "))

  /** Per-script character counts — the multilingual routing signal in
    * front of language ID ([[langId]] is marker-word based and
    * Latin-only; script counts are the coarse pass that routes a doc to
    * the right per-script model). Four counting classes over BMP
    * ranges: Latin letters, Cyrillic U+0400–04FF, Greek U+0370–03FF,
    * CJK unified U+4E00–9FFF. Pure codegen'd regexp counts — one
    * scan-local projection, zero shuffles; every class is replayable by
    * any RE2 engine (`[^\x{0400}-\x{04FF}]`).
    */
  def scriptCounts(text: Column): Seq[(String, Column)] = Seq(
    "latin" -> length(regexp_replace(text, "[^A-Za-z]", "")),
    "cyrillic" -> length(regexp_replace(text, "[^Ѐ-ӿ]", "")),
    "greek" -> length(regexp_replace(text, "[^Ͱ-Ͽ]", "")),
    "cjk" -> length(regexp_replace(text, "[^一-鿿]", "")))

  /** Syllable estimate for readability scoring: vowel-group runs
    * (`[aeiouy]+`) across the text, plus one per word with NO vowel
    * group (numerals, initialisms — every pronounced word carries at
    * least one syllable). The standard cheap estimator behind Flesch;
    * a pure codegen'd regexp count, replayable by RE2.
    */
  def syllableCount(text: Column): Column = {
    val groups = size(regexp_extract_all(lower(text),
      lit("[aeiouy]+"), lit(0)))
    val words = filter(split(trim(text), "\\s+"), w => w =!= "")
    val zeroVowel = size(filter(words, w => !w.rlike("[aeiouyAEIOUY]")))
    groups + zeroVowel
  }

  /** Flesch reading ease from the three counts:
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    * 4-dp — the classic document-quality feature (a curation filter
    * drops the unreadable tails on both ends). Callers supply the
    * counts so the sentence contract stays explicit
    * ([[SentenceDedup.sentences]] is the gated one).
    */
  def fleschScore(nWords: Column, nSentences: Column,
      nSyllables: Column): Column =
    Numerics.roundz(lit(206.835)
      - lit(1.015) * (nWords.cast("double") / nSentences)
      - lit(84.6) * (nSyllables.cast("double") / nWords), 4)

  /** Dominant script with the fixed tie-break latin > cyrillic > greek
    * > cjk (deterministic, mirrored in the oracle SQL).
    */
  def dominantScript(text: Column): Column = {
    val c = scriptCounts(text).toMap
    when(c("latin") >= c("cyrillic") && c("latin") >= c("greek") &&
      c("latin") >= c("cjk"), lit("latin"))
      .when(c("cyrillic") >= c("greek") && c("cyrillic") >= c("cjk"),
        lit("cyrillic"))
      .when(c("greek") >= c("cjk"), lit("greek"))
      .otherwise(lit("cjk"))
  }

  /** Heuristic HTML→text extraction as one codegen'd column-expression
    * chain — the crawl front end's boilerplate step (CCNet/Gopher-style
    * pipelines start from exactly this shape after WARC/HTTP split):
    * drop `<script>`/`<style>` blocks, strip remaining tags, decode the
    * six commonest entities (`&amp;` LAST, so double-escaped sequences
    * like `&amp;lt;` decode to the literal `&lt;` and never cascade),
    * collapse whitespace. The CONTRACT is this exact chain, mirrored
    * in the oracle SQL — a deterministic heuristic, not an HTML5
    * parser: malformed nesting degrades to extra whitespace, never to
    * an error or a skipped row. Zero shuffles, whole-stage codegen.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, r)) =>
        replace(acc, lit(e), lit(r))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** BPE-ish subword token count: words, numbers, and individual
    * punctuation as separate tokens (the usual pre-tokenizer split).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Characters that are neither alphanumeric nor whitespace / total. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double") /
      greatest(length(text), lit(1))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** Fraction of tokens that are (english) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = split(lower(trim(text)), "\\s+")
    size(filter(w, t => t.isin(EnglishStopwords: _*))).cast("double") /
      greatest(size(w), lit(1))
  }

  def meanWordLength(text: Column): Column = {
    val w = split(trim(text), "\\s+")
    aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(w), lit(1))
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation
    * noise, plausible word lengths. Heuristic — the point is a cheap,
    * deterministic, fully-pushed-down scoring pass.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val wordLenScore = when(
      meanWordLength(text).between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore * 0.4 + punctScore * 0.4 + wordLenScore * 0.2), 6)
  }

  /** Gopher-style heuristic document filter (Rae et al. 2021 §A1.1
    * family): five independent rules, each a pure column expression, and
    * the conjunction as `keep`. Returned as individual booleans so a
    * pipeline can audit WHICH rule rejected a document (the usual
    * filter-funnel report) rather than just the verdict.
    *
    *  - `r_wordcount`: token count within [minWords, maxWords]
    *  - `r_wordlen`: mean word length within [3, 10] chars
    *  - `r_alpha`: ≥ 80% of words contain an alphabetic character
    *  - `r_punct`: symbol-to-char ratio ≤ 0.1
    *  - `r_stopwords`: ≥ 2 distinct English stopwords present
    *
    * All five are scan-local (no shuffle, whole-stage codegen); ratio
    * comparisons reuse the same double arithmetic shapes the DuckDB
    * oracle reproduces bit-for-bit elsewhere (quality/curation gates).
    */
  def gopherRules(
      text: Column, minWords: Int = 10, maxWords: Int = 1000): Column = {
    val words = split(trim(text), "\\s+")
    val nw = size(words)
    val alphaFrac =
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") /
        greatest(nw, lit(1))
    val distinctStops = size(array_intersect(
      array_distinct(split(lower(trim(text)), "\\s+")),
      array(EnglishStopwords.map(lit): _*)))
    struct(
      nw.between(minWords, maxWords).as("r_wordcount"),
      meanWordLength(text).between(3.0, 10.0).as("r_wordlen"),
      (alphaFrac >= 0.8).as("r_alpha"),
      (punctRatio(text) <= 0.1).as("r_punct"),
      (distinctStops >= 2).as("r_stopwords"))
  }

  /** Conjunction of [[gopherRules]] — the verdict column. */
  def gopherKeep(rules: Column): Column =
    rules.getField("r_wordcount") && rules.getField("r_wordlen") &&
      rules.getField("r_alpha") && rules.getField("r_punct") &&
      rules.getField("r_stopwords")

  /** Marker-stopword language ID (n-gram-heuristic family): count
    * hits per language marker set, argmax with 'und' fallback.
    * CASE-expressible so the DuckDB oracle can state the same logic.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "la", "de", "y", "es"))

  def markerHits(text: Column, markers: Seq[String]): Column = {
    val w = split(lower(trim(text)), "\\s+")
    size(filter(w, t => t.isin(markers: _*)))
  }

  def langId(text: Column): Column = {
    val en = markerHits(text, LangMarkers("en"))
    val de = markerHits(text, LangMarkers("de"))
    val fr = markerHits(text, LangMarkers("fr"))
    val es = markerHits(text, LangMarkers("es"))
    val m = greatest(en, de, fr, es)
    when(m === 0, "und")
      .when(en === m, "en") // ties break in fixed order en>de>fr>es
      .when(de === m, "de")
      .when(fr === m, "fr")
      .otherwise("es")
  }

  /** Document fingerprint: left fold of a 31-ary polynomial rolling hash
    * over per-word codes, mod 1e9+7. Defined purely arithmetically
    * (word length, first/last char codes) so any engine — including the
    * DuckDB oracle — computes the identical value; no engine-specific
    * hash function in the definition.
    */
  val FingerprintMod: Long = 1000000007L

  def fingerprint(text: Column): Column = {
    val w = split(trim(text), "\\s+")
    val codes = transform(w,
      t => pmod(length(t) * 17L + ascii(substring(t, 1, 1)) * 31L +
        ascii(substring(t, -1, 1)), lit(FingerprintMod)))
    aggregate(codes, lit(0L),
      (acc, c) => pmod(acc * 31L + c, lit(FingerprintMod)))
  }

  /** Fraction of word occurrences that repeat an earlier word —
    * 1 − |distinct|/|words|. The C4/Gopher-family repetition signal:
    * high values mean boilerplate/keyword-stuffed text a curation
    * pipeline drops.
    */
  def dupWordRatio(text: Column): Column = {
    val w = split(lower(trim(text)), "\\s+")
    lit(1.0) - size(array_distinct(w)).cast("double") /
      greatest(size(w), lit(1))
  }

  /** Occurrence share of the single most frequent word bigram —
    * Gopher's top-2-gram fraction. Per-doc quadratic in DISTINCT
    * bigrams (HOF count per distinct bigram), which is bounded by doc
    * length; stays a pure column expression, no shuffle.
    */
  def topBigramRatio(text: Column): Column = {
    val w = split(lower(trim(text)), "\\s+")
    val bg = when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", get(w, i), get(w, i + 1))))
    val counts = transform(array_distinct(bg),
      b => size(filter(bg, x => x === b)))
    when(size(bg) === 0, lit(0.0))
      .otherwise(array_max(counts).cast("double") / size(bg))
  }

  /** Top rarity-weighted terms per document: score = tf · N/df (term
    * frequency × inverse document-frequency RATIO — deliberately not the
    * log variant: tf·N and df are exact integers, so one IEEE division
    * gives bit-identical doubles on every engine, where `ln` is libm-
    * dependent and breaks oracle hashes). Two hash aggregates (map-side
    * partial) + a per-doc top-k window; the shuffle carries
    * vocabulary-bounded (term, count) pairs, never documents.
    */
  def topRarityTerms(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val tf = tok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        round(col("tf") * lit(1.0) * col("n") / col("df"), 6).as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Zipf-law fit per corpus group: the least-squares slope (and
    * intercept) of ln(frequency) against ln(rank) over each group's
    * `topK` most frequent terms. Natural text tracks slope ≈ −1
    * (Zipf 1949, public literature); a corpus slice that deviates hard
    * — much flatter (template/boilerplate floods) or much steeper
    * (tiny effective vocabulary, e.g. log spam) — is the classic
    * cheap distribution-health diagnostic next to
    * [[jsDivergenceByGroup]].
    *
    * Plan: token explode → per-(group, term) count (map-side
    * combined), then [[Ranks.topKPerGroup]] over the frequency frame —
    * a bare `partitionBy(group)` window would sort each group's ENTIRE
    * vocabulary in one task with parallelism capped at the group
    * count; the salted two-stage top-k keeps groups×salts-way
    * parallelism and final per-group sorts of ≤ salts·topK rows — then
    * a per-group `regr_slope`/`regr_intercept` over ≤ topK rows.
    * Nothing after the first aggregate scales with corpus size. Output
    * rounds to 4 dp — the regression sums are floating-point but span
    * ≤ topK terms, so cross-engine noise sits orders below the
    * rounding step (the [[bigramLogProbScore]] discipline).
    */
  def zipfSlope(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, groupCol: String,
      topK: Int = 500): org.apache.spark.sql.DataFrame = {
    require(topK >= 2, s"topK must be >= 2 to fit a line, got $topK")
    val tok = docs.select(col(groupCol).as("grp"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val tf = tok.groupBy("grp", "term").agg(count(lit(1)).as("cnt"))
    Ranks.topKPerGroup(tf, "rank", topK, Seq("grp"), col("cnt"),
        descending = true, ties = Seq(col("term")))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).cast("long").as("n_terms"),
        Numerics.roundz(regr_slope(log(col("cnt")), log(col("rank"))), 4).as("slope"),
        Numerics.roundz(regr_intercept(log(col("cnt")), log(col("rank"))), 4).as("intercept"))
  }

  /** Unigram language-model quality score (the CCNet-style proxy for
    * "does this look like the corpus"): per doc, the mean log
    * probability of its tokens under the corpus's own unigram
    * distribution. Repetitive/common-word documents score high (close
    * to 0), rare-vocabulary and gibberish documents score low (very
    * negative) — the standard threshold signal for keeping/binning
    * documents into quality tiers.
    *
    * Plan: one token explode feeds a per-(doc, term) count; corpus term
    * frequencies derive from THAT (a second, vocabulary-bounded
    * aggregate — no second corpus scan); the corpus total is a 1-row
    * broadcast. Every shuffle carries counts, never text. Every log
    * input is an exact integer count, so
    * the 6-dp-rounded mean is engine-stable (full-oracle gate, same
    * discipline as [[bigramLogProbScore]]).
    */
  def unigramLogProbScore(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val tf = tok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      // the count aggregate, the 1-row total, and the probe all consume
      // tf and AQE does not reuse the aggregate exchange across them —
      // materialize once (wins from ~3x corpus up; ~0.2 s overhead at
      // gate SF)
      .materialized
    // corpus term frequency via a vocabulary-bounded aggregate joined
    // back, NOT a window over partitionBy(term): a stopword's posting
    // list is corpus-sized, and a window pins the whole hot partition
    // to ONE task with no recourse. The join is unhinted so AQE picks
    // the right physical form per scale: broadcast when the term-count
    // frame is small, else a shuffled join whose hot probe partitions
    // the AQE skew rule splits (replicating the 1-row-per-term build
    // side). Costs one extra pass over tf; at scale that beats the
    // unsplittable single-task window sort by orders.
    val cnt = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val withCnt = tf.join(cnt, Seq("term"))
    val total = tf.agg(sum(col("tf")).as("n_total"))
    withCnt.crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).cast("long").as("n_tokens"),
        Numerics.roundz(
          sum(col("tf") * (log(col("cnt")) - log(col("n_total"))))
            / sum(col("tf")), 6).as("avg_logprob"))
  }

  /** Bigram-LM quality score: mean log P(wᵢ | wᵢ₋₁) per document under
    * an add-1-smoothed corpus bigram model — the KenLM-style perplexity
    * filter one rung above [[unigramLogProbScore]] (word-order-aware:
    * shuffled text scores far lower than fluent text with the same
    * unigram profile). P(w|c) = (count(c w) + 1) / (count(c) + V).
    *
    * Plan: positional bigrams via array zip (no self-join on position);
    * per-doc tf aggregate; corpus bigram counts via a bigram-vocab-
    * bounded aggregate joined back (same skew-splittable shape as the
    * unigram scorer — a window over partitionBy(l, r) would pin a hot
    * bigram's whole posting list to one task); context counts and V
    * are vocabulary-bounded frames. Every corpus-scale structure
    * here is bounded by vocabulary (or bigram vocabulary), never by
    * corpus positions. Output rounds to 4 dp — float log sums carry
    * ~1e-14 ordering noise, orders below the rounding step.
    *
    * Docs with fewer than two tokens have no bigrams and are absent
    * from the output (they have no conditional-likelihood evidence).
    */
  /** (id, l, r) positional bigrams as 64-BIT TOKEN HASHES, emitted by
    * a per-partition JVM kernel — the shared front end of the bigram
    * LM scorers. The declarative form (`explode(zip_with(slice, slice,
    * struct))`) evaluates its lambda INTERPRETED per window (measured:
    * a 0.6 s single-task stage at sf0.1 — the whole gate was 1.4 s),
    * and every downstream aggregate/join keys on the bigram only for
    * EQUALITY, never its content — so the kernel hashes tokens
    * ([[Dedup.hash64]], the family-wide 2⁻⁶⁴-collision contract) and
    * the shuffles carry 24-byte rows instead of string pairs. Each
    * token hashes once (sliding reuse), docs under two tokens emit
    * nothing (no conditional-likelihood evidence — the documented
    * contract).
    */
  private[operators] def hashedBigrams(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    Dedup.requireLongCastableId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val w = text.toLowerCase.trim.split("\\s+")
          if (w.length < 2) Iterator.empty
          else new Iterator[(Long, Long, Long)] {
            private var i = 0
            private var prev = Dedup.hash64(w(0))
            def hasNext: Boolean = i < w.length - 1
            def next(): (Long, Long, Long) = {
              val nx = Dedup.hash64(w(i + 1))
              val t = (id, prev, nx)
              prev = nx; i += 1; t
            }
          }
        }
      }
      .toDF(idCol, "l", "r")
  }

  /** Corpus term-frequency over 64-bit token hashes (JVM kernel — the
    * unigram face of [[hashedBigrams]], same hash, so `term` joins
    * against bigram `l`/`r` columns value-for-value).
    */
  private[operators] def hashedTermCounts(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol)).as[String]
      .mapPartitions { it =>
        it.flatMap(text =>
          text.toLowerCase.trim.split("\\s+").iterator.map(Dedup.hash64))
      }
      .toDF("term")
      .groupBy(col("term")).agg(count(lit(1)).as("cl"))
  }

  def bigramLogProbScore(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val pairs = hashedBigrams(docs, textCol, idCol)
    val tf = pairs.groupBy(col(idCol), col("l"), col("r"))
      .agg(count(lit(1)).as("tf"))
      .materialized // bigram-count aggregate + probe share one explode
    val bg = tf.groupBy(col("l"), col("r")).agg(sum(col("tf")).as("cbg"))
    val withBg = tf.join(bg, Seq("l", "r"))
    val ctx = hashedTermCounts(docs, textCol)
    // |V| is just ctx's row count — deriving it from ctx (vocabulary-
    // bounded) instead of a second countDistinct over the corpus-scale
    // token explode saves one full scan+shuffle of the corpus.
    val vocab = ctx.agg(count(lit(1)).as("v"))
    withBg
      .join(ctx, col("l") === col("term"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).cast("long").as("n_bigrams"),
        Numerics.roundz(
          sum(col("tf") * (log(col("cbg") + lit(1)) - log(col("cl") + col("v"))))
            / sum(col("tf")), 4).as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram log-likelihood per document — the
    * stronger smoothing rung above [[bigramLogProbScore]]'s add-1
    * (Kneser & Ney 1995; Chen & Goodman 1998 evaluation): unseen-pair
    * mass is distributed by CONTINUATION probability (how many distinct
    * contexts a word follows) rather than uniformly, the property that
    * makes KN the standard n-gram smoother for perplexity filtering.
    *
    *   P(r|l) = (max(c(l,r) − D, 0) + D·N₁₊(l,·)·N₁₊(·,r)/B) / c(l,·)
    *
    * with D = 0.75 (exact in binary), N₁₊ the distinct-neighbor counts,
    * B the total distinct bigram types. Every input is an exact integer
    * and the float expression is written in one fixed association, so
    * the 4-dp-rounded per-doc mean is engine-stable (the
    * [[bigramLogProbScore]] discipline).
    *
    * Plan shape: one corpus bigram aggregate, then everything downstream
    * is bounded by bigram vocabulary — the left/right N₁₊ frames are
    * group-bys OF the type frame, B is a broadcast 1-row frame, and the
    * per-doc score joins the doc-tf frame against vocabulary-bounded
    * stats. Docs with fewer than two tokens are absent (no evidence).
    */
  def kneserNeyLogProbScore(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String,
      discount: Double = 0.75): org.apache.spark.sql.DataFrame = {
    // hashed-bigram kernel front end (see [[hashedBigrams]]): every
    // aggregate below keys on the bigram for equality only
    val pairs = hashedBigrams(docs, textCol, idCol)
    val dtf = pairs.groupBy(col(idCol), col("l"), col("r"))
      .agg(count(lit(1)).as("tf"))
    val bt = pairs.groupBy(col("l"), col("r")).agg(count(lit(1)).as("c"))
    val ls = bt.groupBy(col("l"))
      .agg(sum(col("c")).as("cl"), count(lit(1)).as("n1pl"))
    val rs = bt.groupBy(col("r")).agg(count(lit(1)).as("n1pr"))
    val bb = bt.agg(count(lit(1)).as("b"))
    val prob = (greatest(col("c") - lit(discount), lit(0.0)) +
      lit(discount) * (col("n1pl") * col("n1pr")) / col("b")) / col("cl")
    dtf
      .join(bt, Seq("l", "r"))
      .join(ls, Seq("l"))
      .join(rs, Seq("r"))
      .crossJoin(broadcast(bb))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).cast("long").as("n_bigrams"),
        Numerics.roundz(sum(col("tf") * log(prob)) / sum(col("tf")), 4)
          .as("avg_logprob"))
  }

  /** Deflate compression ratio per document — the model-free redundancy
    * signal quality filters pair with LM scores (Gopher-family
    * pipelines): boilerplate/repetitive text compresses far below
    * prose, near-random noise barely compresses at all. ratio =
    * deflated_bytes / utf8_bytes, 4-dp.
    *
    * JVM kernel (java.util.zip.Deflater, default level, one Deflater
    * reused per partition) — scan-local, zero shuffles, deterministic
    * for a given JVM zlib. No SQL engine ships deflate, so the gate is
    * rows-only BY DESIGN; the spec locks the orderings the signal
    * exists for (repetitive < prose < high-entropy) and
    * partition-independence.
    */
  def compressionRatio(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    Dedup.requireLongCastableId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val buf = new Array[Byte](64 * 1024)
        val d = new java.util.zip.Deflater()
        // release the native zlib buffer when the task ends — without
        // end() it is held until finalization, accumulating across
        // tasks in a long-lived executor
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.end()))
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          d.reset()
          d.setInput(raw)
          d.finish()
          var compressed = 0L
          while (!d.finished()) compressed += d.deflate(buf)
          val ratio =
            if (raw.length == 0) 0.0
            else math.rint(compressed.toDouble / raw.length * 1e4) / 1e4
          (id, raw.length.toLong, ratio)
        }
      }
      .toDF(idCol, "n_bytes", "ratio")
  }

  /** Character-8-gram redundancy per document — the SQL-statable twin
    * of [[compressionRatio]] (deflate output is codec-defined, so that
    * gate is rows-only; this one carries the full oracle for the same
    * quality-signal family): redundancy = 1 − distinct_8grams /
    * total_8grams. Repetitive/boilerplate text re-uses its substrings
    * (high redundancy), prose barely repeats (near 0) — the two
    * signals rank-correlate, which is exactly what a quality filter
    * consumes.
    *
    * Scan-local JVM kernel (the [[compressionRatio]] shape), zero
    * shuffles: one pass over the text with a per-row distinct set —
    * bounded by the document, never the corpus. The former
    * `transform(sequence(1, len−7), i -> substring(…))` enumeration
    * ran its lambda INTERPRETED per gram (the ~8×-scan-cost HOF tax
    * the ngramNovelty probe measured), a constant factor paid on
    * every byte of a 100 TB corpus. The ratio itself stays the SAME
    * Catalyst round expression over the kernel's exact integer
    * counts, so the result is bit-identical to the declarative form.
    */
  def redundancyRatio(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    Dedup.requireLongCastableId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          if (text == null || text.length < 8) (id, 0L, 0L)
          else {
            // Catalyst length/substring count CODE POINTS: a
            // supplementary character (emoji, rare CJK) is ONE gram
            // slot, not two. Fast path when no surrogates exist —
            // then code units ARE code points and the original
            // per-unit loop is exact.
            var hasSurrogate = false
            var k = 0
            while (k < text.length && !hasSurrogate) {
              if (Character.isHighSurrogate(text.charAt(k)))
                hasSurrogate = true
              k += 1
            }
            if (!hasSurrogate) {
              val n = text.length - 7
              val seen = new java.util.HashSet[String](
                math.min(n, 1 << 16))
              var i = 0
              while (i < n) { seen.add(text.substring(i, i + 8)); i += 1 }
              (id, n.toLong, seen.size.toLong)
            } else {
              val cps = text.codePoints().toArray
              val n = cps.length - 7
              if (n <= 0) (id, 0L, 0L)
              else {
                val seen = new java.util.HashSet[String](
                  math.min(n, 1 << 16))
                var i = 0
                while (i < n) { seen.add(new String(cps, i, 8)); i += 1 }
                (id, n.toLong, seen.size.toLong)
              }
            }
          }
        }
      }
      .toDF(idCol, "n_grams", "n_distinct")
      .withColumn("redundancy",
        when(col("n_grams") > 0, Numerics.roundz(
          lit(1.0) - col("n_distinct").cast("double") /
            col("n_grams").cast("double"), 6))
          .otherwise(lit(0.0)))
  }

  /** Corpus collocations by pointwise mutual information over adjacent
    * word pairs: PMI(l,r) = ln(c(l,r)·N / (c(l,·)·c(·,r))) with all
    * marginals taken over BIGRAM POSITIONS (so the distribution sums to
    * one and the identity is exact in integer counts). The "new-york /
    * machine-learning detector" of a phrase-mining pass.
    *
    * One corpus-scale aggregate (pair counts, map-side combined); the
    * marginals are word-vocabulary-bounded aggregates OF that frame,
    * joined back only onto pairs surviving the minCount filter — the
    * filter runs BEFORE the join-back, so the probe side is the (tiny)
    * collocation candidate set, not the full bigram-type frame. N is a
    * broadcast 1-row frame. The former shape (marginals as windows
    * over partitionBy(l) / partitionBy(r) plus an EMPTY-partition
    * window for N) pinned a stopword context's whole neighbor list —
    * and for N the entire bigram-type frame — to single tasks; nothing
    * here exceeds one map-side-combined pass plus vocab-bounded joins.
    * All inputs to the log are exact integers, so the 4-dp-rounded PMI
    * is engine-stable.
    */
  def pmiBigrams(
      docs: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long): org.apache.spark.sql.DataFrame = {
    val w = split(lower(trim(col(textCol))), "\\s+")
    val cnt = docs.select(
      explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .groupBy("l", "r").agg(count(lit(1)).as("cnt"))
      // four consumers (both marginals, N, the probe) and AQE does NOT
      // reuse the aggregate exchange across them (audited reused=0) —
      // materialize the vocab-bounded type frame once
      .materialized
    val cl = cnt.groupBy("l").agg(sum(col("cnt")).as("cl"))
    val cr = cnt.groupBy("r").agg(sum(col("cnt")).as("cr"))
    val n = cnt.agg(sum(col("cnt")).as("n"))
    cnt
      .filter(col("cnt") >= minCount)
      .join(cl, Seq("l"))
      .join(cr, Seq("r"))
      .crossJoin(broadcast(n))
      .select(col("l"), col("r"), col("cnt"),
        // ln(cnt·N / (cl·cr)) as a SUM of logs: the long products
        // cl·cr / cnt·N pass 2⁶³ at web scale (a stopword marginal is
        // ~1e10; 1e20 wraps or throws under ANSI) — every individual
        // count fits a double exactly below 2⁵³ and the 4-dp round
        // absorbs the ≤4-ulp chain noise (oracle computes the same
        // four-term sum)
        Numerics.roundz(
          log(col("cnt")) + log(col("n")) - log(col("cl")) - log(col("cr")),
          4).as("pmi"))
  }

  /** Engine-portable polynomial hash (h·31 + codepoint, mod 2³¹−1) —
    * chosen so a SQL oracle can reproduce the VALUE (`list_reduce` over
    * code points), unlike xxhash64. Collision rate 2⁻³¹ per pair is
    * fine for fingerprint sets; the security-grade content hashes stay
    * sha2/xxhash64 elsewhere.
    */
  private[graft] def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % 2147483647L; i += 1 }
    h
  }

  /** Per-group Jensen–Shannon divergence of the unigram distribution
    * against the whole corpus — the domain-shift / source-drift monitor
    * (a source whose language suddenly diverges from the corpus jumps
    * out as a rising JSD long before a human reads samples).
    * JSD(P‖Q) = (KL(P‖M) + KL(Q‖M)) / 2, M = (P+Q)/2, normalized to
    * [0,1] by ln 2.
    *
    * Plan: one corpus-scale token aggregate; everything after runs on
    * vocabulary-bounded frames (per-group counts, corpus counts). The
    * Q-side sum over terms ABSENT from the group has a closed form —
    * p = 0 collapses the summand q·log(2q/(p+q)) to q·log 2, so
    * klq = Σ_present q·log(2q/(p+q)) + (1 − Σ_present q)·log 2 — which
    * means ONE join over each group's present terms computes both KL
    * sides; no #groups × |vocabulary| grid is ever materialized (at
    * web scale that grid is ~10¹⁰ rows for values known in closed
    * form). All inputs to the logs are exact count ratios, so the
    * 6-dp round is engine-stable.
    */
  def jsDivergenceByGroup(
      docs: org.apache.spark.sql.DataFrame, textCol: String,
      groupCol: String): org.apache.spark.sql.DataFrame = {
    val tok = docs.select(col(groupCol).as("grp"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
    val sc = tok.groupBy("grp", "w").agg(count(lit(1)).as("c"))
    val sn = sc.groupBy("grp").agg(sum(col("c")).as("n"))
    val cc = sc.groupBy("w").agg(sum(col("c")).as("cc"))
    val cn = cc.agg(sum(col("cc")).as("cn"))
    // Both KL sides from the group's PRESENT terms in one aggregate;
    // the only cross join is the broadcast of the 1-row corpus total.
    val j = sc.join(sn, "grp").join(cc, "w").crossJoin(broadcast(cn))
      .select(col("grp"),
        (col("c") / col("n")).as("p"), (col("cc") / col("cn")).as("q"))
    j.groupBy("grp")
      .agg(
        sum(col("p") * log(lit(2) * col("p") / (col("p") + col("q"))))
          .as("klp"),
        sum(col("q") * log(lit(2) * col("q") / (col("p") + col("q"))))
          .as("klqPresent"),
        sum(col("q")).as("qsum"))
      .select(col("grp").as(groupCol),
        Numerics.roundz((col("klp") + col("klqPresent") +
            (lit(1.0) - col("qsum")) * lit(math.log(2.0))) /
          lit(2 * math.log(2)), 6).as("jsd"))
  }

  /** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
    * SIGMOD'03 — the MOSS algorithm): hash every POSITIONAL n-token
    * shingle, slide a window of `window` consecutive hashes, keep each
    * window's minimum — the selected set is guaranteed to share a
    * fingerprint with any other document it shares a sufficiently long
    * substring with, at ~2/(window+1) of the full shingle density.
    * Output: distinct (id, fp) rows — the per-doc fingerprint SET
    * (values, not positions, so ties need no rightmost rule).
    *
    * Scan-local kernel, no shuffle at all except the caller's use;
    * docs shorter than the shingle width fall back to one whole-text
    * shingle, and hash streams shorter than the window yield their
    * global minimum (one window).
    */
  def winnowFingerprints(
      docs: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, window: Int = 4): org.apache.spark.sql.DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val w = text.toLowerCase.trim.split("\\s+")
          val sh =
            if (w.length < shingleN) Array(w.mkString(" "))
            else Array.tabulate(w.length - shingleN + 1)(i =>
              w.slice(i, i + shingleN).mkString(" "))
          val hs = sh.map(polyHash)
          val out = scala.collection.mutable.SortedSet.empty[Long]
          if (hs.length <= window) out += hs.min
          else {
            var p = 0
            while (p <= hs.length - window) {
              var m = hs(p)
              var j = p + 1
              while (j < p + window) { if (hs(j) < m) m = hs(j); j += 1 }
              out += m
              p += 1
            }
          }
          out.iterator.map(fp => (id, fp))
        }
      }
      .toDF(idCol, "fp")
  }

  /** Trending terms: top-k tokens per time bucket (count desc, term
    * asc tiebreak) — the corpus-drift dashboard behind "what changed
    * in this month's crawl". One (bucket, term) aggregate (vocabulary-
    * bounded, map-side combined) + a rank window over the bucket
    * domain; the corpus text never shuffles.
    */
  def trendingTerms(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      bucketCol: Column, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(bucketCol.as("bucket"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("bucket", "w")
      .agg(count(lit(1)).as("cnt"))
    val rk = Window.partitionBy(col("bucket"))
      .orderBy(col("cnt").desc, col("w"))
    counts.withColumn("rk", row_number().over(rk).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-group vocabulary diversity: token/type counts, type-token
    * ratio, and Shannon entropy of the term distribution (nats,
    * rounded — the float log sum is vocabulary-bounded, same contract
    * as the JS-divergence gate). The corpus-health panel per source.
    */
  def vocabDiversity(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      groupCol: String): org.apache.spark.sql.DataFrame = {
    val counts = df
      .select(col(groupCol).as("grp"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("grp", "w")
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("grp")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"))
    val p = col("c").cast("double") / col("n_tokens")
    counts.join(totals, "grp")
      .groupBy("grp")
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("n_types")).as("n_types"),
        Numerics.roundz(-sum(p * log(p)), 4).as("entropy"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
  }

  /** Per-document keyword extraction: the top-k terms of each doc by
    * integer TF-IDF weight (tf · (10⁶ div df) — the
    * [[Features.tfidfRareTermPairs]] weight contract, exact on any
    * engine) — the document-tagging primitive behind faceted corpus
    * browsers and topic drill-downs. Ubiquitous terms (df over
    * `dfMaxShare` of docs) are excluded: a word in every doc
    * distinguishes nothing and would dominate raw tf.
    *
    * One tokenize + per-doc tf aggregate (the corpus-scale shuffle),
    * one vocabulary-bounded df aggregate hash-joined back, and a
    * per-doc top-k window bounded by each doc's distinct-term count.
    */
  /** Chao1 species-richness estimate of the vocabulary per group —
    * "how many distinct words does this corpus slice REALLY have,
    * given we only sampled it": observed types plus the
    * bias-corrected singleton/doubleton term
    *
    *   chao1 = V + f1·(f1−1) / (2·(f2+1))
    *
    * (Chao 1984, bias-corrected form — defined even when no word
    * occurs exactly twice). The curation use: compare chao1/V across
    * sources to spot slices whose vocabulary is far from saturated
    * (more data would still add words) vs exhausted ones.
    *
    * Same single corpus-scale shuffle as [[vocabDiversity]] (tokenize
    * + per-(group, word) count, map-side combined); the frequency-of-
    * frequency sums are vocabulary-bounded, and the estimator is one
    * integer ratio — exact until the final rounded division.
    */
  def chao1Richness(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      groupCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(groupCol).as("grp"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("grp", "w")
      .agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("grp"), col("n_types"), col("f1"), col("f2"),
        Numerics.roundz(col("n_types").cast("double") +
          (col("f1") * (col("f1") - 1)).cast("double") /
            (lit(2) * (col("f2") + 1)).cast("double"), 4).as("chao1"))

  /** N-gram novelty of a held-out slice against the rest of the
    * corpus: the share of the slice's distinct word n-grams never
    * seen in the training side — the "is this source actually adding
    * new content" acquisition signal (high novelty → new material;
    * near zero → the slice is re-crawled/boilerplate text the model
    * already has). The complement of decontamination overlap: there
    * the MATCHED grams are the signal, here the unmatched ones.
    *
    * Same GRAM CONTRACT as the dedup family ([[Dedup.shingles]]: word
    * n-grams, whole-text-joined for docs shorter than n), but the
    * enumeration stays codegen: grams come from
    * `arrays_zip(slice(w,1,..), …, slice(w,n,..))` + explode + a
    * top-level concat — [[Dedup.shingles]]' `transform(sequence, i ->
    * concat_ws(slice(…)))` runs its lambda INTERPRETED per gram, which
    * the probe measured at ~8× this plan's scan cost. Per-doc
    * `array_distinct` is dropped too: novelty counts GLOBAL distinct
    * grams, so within-doc duplicates change nothing. Grams hash to 64
    * bits before the shuffle (counts survive collisions at this
    * precision; 8-byte keys instead of gram strings), then ONE
    * per-gram aggregate computes side membership (in-held/in-train
    * max flags) and one scalar fold yields the counts — never
    * doc×doc, never a sort, one corpus scan per branch.
    *
    * Count contract: `n_heldout_grams`/`n_unseen` are distinct-HASH
    * counts — exact until the first 64-bit collision (~5·10⁹ distinct
    * grams by birthday bound), after which they undercount by the
    * collision count; the 6-dp `novelty` ratio is insensitive to that
    * at any realistic corpus. A consumer needing exact counts at that
    * scale should aggregate the gram strings (and pay their shuffle).
    */
  def ngramNovelty(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      heldout: Column, n: Int = 3): org.apache.spark.sql.DataFrame = {
    val w = Dedup.words(textCol)
    val gramCount = greatest(size(w) - (n - 1), lit(0))
    val parts = (0 until n).map(i => slice(w, lit(i + 1), gramCount))
    // explode drops the empty zip of a short doc, so the union branch
    // contributes exactly the whole-text gram the contract assigns it
    val longDocs = df
      .select(heldout.as("_h"), explode(arrays_zip(parts: _*)).as("_t"))
      .select(col("_h"), xxhash64(concat_ws(" ",
        (0 until n).map(i => col("_t").getField(i.toString)): _*)).as("_g"))
    val shortDocs = df
      .filter(size(w) < n)
      .select(heldout.as("_h"), xxhash64(concat_ws(" ", w)).as("_g"))
    longDocs.unionByName(shortDocs)
      .groupBy(col("_g"))
      .agg(
        max(when(col("_h"), 1).otherwise(0)).as("_ih"),
        max(when(!col("_h"), 1).otherwise(0)).as("_it"))
      .agg(
        sum(col("_ih")).cast("long").as("n_heldout_grams"),
        coalesce(sum(when(col("_ih") === 1 && col("_it") === 0, 1L)
          .otherwise(0L)), lit(0L)).as("n_unseen"))
      .select(col("n_heldout_grams"), col("n_unseen"),
        Numerics.roundz(col("n_unseen").cast("double") /
          col("n_heldout_grams").cast("double"), 6).as("novelty"))
  }

  def docKeywords(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int, dfMaxShare: Double = 0.5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.agg(count(lit(1)).as("_n_docs"))
    val tf = df
      .select(col(idCol).as("doc_id"), explode(Dedup.words(textCol)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w"))
      .agg(count(lit(1)).as("dfreq"))
      .crossJoin(broadcast(nDocs))
      .filter(col("dfreq") <= col("_n_docs") * dfMaxShare)
      .select(col("w"), col("dfreq"))
    tf.join(dfreq, Seq("w"))
      .select(col("doc_id"), col("w").as("term"), col("tf"), col("dfreq"),
        expr("tf * (1000000 div dfreq)").as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-token character offsets — the span-alignment primitive NER /
    * PII annotation pipelines need to map token-level predictions back
    * to character positions. Offsets are defined over the NORMALIZED
    * form (trimmed text with single-space joins — the same
    * canonicalization every tokenize in this repo applies), where they
    * are a pure prefix sum: start_i = Σ_{j<i} len_j + i, end_i =
    * start_i + len_i. One posexplode + a per-doc cumulative window
    * bounded by doc length.
    */
  def tokenOffsets(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("idx", "token")))
      .filter(col("token") =!= "")
      .withColumn("start",
        (coalesce(sum(length(col("token"))).over(w), lit(0)) +
          col("idx")).cast("long"))
      .withColumn("end", col("start") + length(col("token")))
      .select(col(idCol), col("idx").cast("long").as("idx"), col("token"),
        col("start"), col("end"))
  }

  /** Pairwise vocabulary Jaccard between corpus slices (sources): for
    * every slice pair, |V_a ∩ V_b| / |V_a ∪ V_b| over the distinct
    * word sets — the source-overlap map that tells a curation run
    * which feeds are near-clones of each other BEFORE any doc-level
    * dedup. Output (src_a, src_b, common, n_a, n_b, jaccard) with
    * src_a < src_b.
    *
    * Scale shape: the corpus reduces to the DISTINCT (slice, word)
    * frame first (word-bounded, map-side combined), intersections
    * come from a word-keyed self-join of that frame (fan-out per word
    * ≤ slices², with `slices` a config-scale constant), and sizes are
    * one aggregate — never doc×doc, never text shuffled twice.
    */
  def sourceVocabJaccard(
      df: org.apache.spark.sql.DataFrame, sliceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val vocab = df
      .select(col(sliceCol).cast("string").as("_s"),
        explode(array_distinct(split(lower(trim(col(textCol))), "\\s+")))
          .as("_w"))
      .distinct()
      .materialized
    val sizes = vocab.groupBy(col("_s")).agg(count(lit(1)).as("_n"))
    val common = vocab.as("a").join(vocab.as("b"),
        col("a._w") === col("b._w") && col("a._s") < col("b._s"))
      .groupBy(col("a._s").as("src_a"), col("b._s").as("src_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(broadcast(sizes.select(col("_s").as("src_a"),
        col("_n").as("n_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("_s").as("src_b"),
        col("_n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("common"),
        col("n_a"), col("n_b"),
        Numerics.roundz(col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Heaps'-law fit V = K·N^β over corpus slices: each slice
    * contributes one (token count N_s, vocabulary size V_s) point,
    * and β/K come from OLS on (ln N, ln V) — the vocabulary-growth
    * exponent (β ≈ 0.4–0.6 for natural text; β near 1 flags
    * ID-like/junk token streams, β near 0 a closed template
    * vocabulary). The corpus-scale work is two token aggregates;
    * the regression runs over the |slices|-point frame with every
    * float sum folded in slice order.
    */
  def heapsLaw(
      df: org.apache.spark.sql.DataFrame, sliceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tok = df.select(col(sliceCol).cast("string").as("_s"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("_w"))
    val pts = tok.groupBy(col("_s"))
      .agg(count(lit(1)).as("_n"), countDistinct(col("_w")).as("_v"))
      .select(col("_s"), log(col("_n").cast("double")).as("_x"),
        log(col("_v").cast("double")).as("_y"))
    def fold(term: org.apache.spark.sql.Column, name: String) =
      aggregate(array_sort(collect_list(struct(col("_s"), term.as(name)))),
        lit(0.0), (acc, s) => acc + s.getField(name))
    pts
      .agg(count(lit(1)).as("n_slices"),
        fold(col("_x"), "_tx").as("_sx"), fold(col("_y"), "_ty").as("_sy"),
        fold(col("_x") * col("_y"), "_txy").as("_sxy"),
        fold(col("_x") * col("_x"), "_txx").as("_sxx"))
      .select(col("n_slices"),
        Numerics.roundz({
          val n = col("n_slices").cast("double")
          (n * col("_sxy") - col("_sx") * col("_sy")) /
            (n * col("_sxx") - col("_sx") * col("_sx"))
        }, 6).as("beta"),
        Numerics.roundz({
          val n = col("n_slices").cast("double")
          val b = (n * col("_sxy") - col("_sx") * col("_sy")) /
            (n * col("_sxx") - col("_sx") * col("_sx"))
          exp((col("_sy") - b * col("_sx")) / n)
        }, 4).as("k"))
  }

  /** Per-source template prefix detection — shared boilerplate heads
    * ("Subject: …", licence banners, scraper chrome) show up as a long
    * common prefix across a source's documents. The longest common
    * prefix of a GROUP is LCP(min, max) under binary string order (any
    * byte disagreeing in some member disagrees in one of the order
    * extremes), so the corpus collapses to two strings per source in
    * ONE aggregate; the LCP itself exploits monotonicity — prefix_i(a)
    * = prefix_i(b) holds exactly for i ≤ LCP, so a bounded
    * filter-count over 1..cap positions IS the length. Scan + one
    * hash aggregate; cap bounds per-source work at cap² char
    * comparisons.
    */
  def sourceCommonPrefix(
      df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String, cap: Int = 40): org.apache.spark.sql.DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), min(col(textCol)).as("_a"),
        max(col(textCol)).as("_b"))
    val lim = least(length(col("_a")), length(col("_b")), lit(cap))
    val lcp = when(lim > 0,
      size(filter(sequence(lit(1), lim),
        i => col("_a").substr(lit(1), i) === col("_b").substr(lit(1), i))))
      .otherwise(0).cast("long")
    g.select(col(groupCol), col("n_docs"), lcp.as("lcp_len"),
      col("_a").substr(lit(1), lcp.cast("int")).as("prefix"))
  }

  /** Code-document detection — the C4/Gopher-style "this isn't prose"
    * filter a natural-language corpus runs before training: counts of
    * code-indicative characters (braces, semicolons, parens) from
    * exact length-difference arithmetic (no regex backtracking), a
    * per-kilochar symbol score, and the flag contract
    * `is_code ⇔ braces ≥ minBraces ∧ score ≥ threshold‰`. One
    * codegen'd scan-local projection, no shuffle; the threshold is
    * applied in exact integer cross-multiplication so the DECISION is
    * engine-stable.
    */
  def codeDetect(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, minBraces: Int = 2,
      permilleThreshold: Int = 8): org.apache.spark.sql.DataFrame = {
    def cnt(ch: String) =
      length(col(textCol)) - length(regexp_replace(col(textCol),
        java.util.regex.Pattern.quote(ch), ""))
    val braces = (cnt("{") + cnt("}")).cast("long")
    val semis = cnt(";").cast("long")
    val parens = (cnt("(") + cnt(")")).cast("long")
    val nChars = greatest(length(col(textCol)).cast("long"), lit(1L))
    val sym = braces + semis + parens
    df.select(col(idCol), braces.as("n_braces"), semis.as("n_semis"),
      parens.as("n_parens"),
      Numerics.roundz(sym.cast("double") * 1000.0 /
        nChars.cast("double"), 6).as("symbols_per_kchar"),
      (braces >= minBraces &&
        sym * 1000L >= lit(permilleThreshold.toLong) * nChars)
        .as("is_code"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    * PageRank over the corpus word-adjacency graph — the unsupervised
    * "which terms matter" complement to the frequency-weighted
    * [[docKeywords]] (a term ranks high by sitting in well-connected
    * contexts, not by raw count).
    *
    * Graph contract: nodes = corpus vocabulary; for each adjacent
    * token pair (a ≠ b), the undirected co-occurrence count feeds both
    * directed edges, so w(u→v) = c(u,v) + c(v,u). The rank recurrence
    * is [[PageRank.pagerankWeighted]]'s all-integer fixed-point form —
    * the whole trajectory replayable in SQL. Output: the `topK` terms
    * by rank (ties by term), with the fixed-point rank.
    *
    * Scale shape: one corpus-scale pair aggregate; every PageRank
    * round shuffles the vocabulary-bounded edge/rank frames only. The
    * final top-k is a TakeOrdered over the vocabulary frame.
    */
  def textRankTerms(
      docs: org.apache.spark.sql.DataFrame, textCol: String,
      iterations: Int, topK: Int): org.apache.spark.sql.DataFrame = {
    val w = split(lower(trim(col(textCol))), "\\s+")
    val pairs = docs.select(
      explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .filter(col("l") =!= col("r"))
      .groupBy("l", "r").agg(count(lit(1)).as("c"))
    val edges = pairs
      .select(col("l").as("src"), col("r").as("dst"), col("c"))
      .unionByName(
        pairs.select(col("r").as("src"), col("l").as("dst"), col("c")))
      .groupBy("src", "dst").agg(sum(col("c")).as("cw"))
    val vocab = docs.select(
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .distinct()
    PageRank.pagerankWeighted(vocab, "term", edges, "src", "dst", "cw",
        iterations)
      .orderBy(col("rank_fp").desc, col("term"))
      .limit(topK)
  }
}
