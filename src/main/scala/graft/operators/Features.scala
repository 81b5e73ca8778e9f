package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Feature engineering for training-data pipelines: the operators that
  * turn a curated corpus into model inputs — smoothed target encoding
  * for categorical columns, the hashing trick for unbounded vocabularies,
  * per-dimension embedding scaling stats, and rare-term TF-IDF pair
  * candidates. All contracts are engine-portable: integer/decimal
  * arithmetic end-to-end with ONE double division at the surface, md5
  * for every pseudo-random hash, so a DuckDB oracle replays each result
  * hash-for-hash.
  *
  * Scale shapes: every operator is one hash aggregate (plus at most a
  * 1-row or dim-width broadcast back); nothing shuffles the corpus
  * twice, nothing collects.
  */
object Features {

  /** Smoothed target encoding (m-estimate / empirical-Bayes shrinkage,
    * Micci-Barreca 2001): enc(c) = (Σ_c y + m·prior) / (n_c + m) with
    * prior = the global mean. Restated multiplicatively in integer
    * fixed-point (y in ten-thousandths) so the ONLY float step is the
    * final division:
    *
    *   enc(c) = (N·Σ_c y' + m·Σy') / (N·(n_c + m) · 10⁴)
    *
    * with the N·Σ products combined in DECIMAL(38,0) — long×long would
    * silently wrap once N·n_c passes 2⁶³ (≈3·10⁹ rows on both sides,
    * i.e. exactly the 100 TB regime). One groupBy on the category; the
    * global (Σy', N) rides a 1-row broadcast. High-cardinality
    * categories are just more groups — the aggregate stays
    * map-side-combining at any cardinality.
    */
  def targetEncode(
      df: DataFrame, catCol: String, targetCol: String,
      m: Int): DataFrame = {
    val y = (col(targetCol).cast(DecimalType(18, 4)) * 10000).cast("long")
    val d = DecimalType(38, 0)
    def dd(c: Column) = c.cast(d)
    val global = df.agg(sum(y).as("gsum"), count(lit(1)).as("gn"))
    df.groupBy(col(catCol).as("category"))
      .agg(sum(y).as("csum"), count(lit(1)).as("n"))
      .crossJoin(broadcast(global))
      .select(col("category"), col("n"),
        Numerics.roundz((dd(col("gn")) * dd(col("csum")) +
          dd(lit(m)) * dd(col("gsum"))).cast("double") /
          ((dd(col("gn")) * dd(col("n") + lit(m))).cast("double") * 10000d),
          6).as("enc"))
  }

  /** Hashing-trick feature histogram (Weinberger et al. 2009): every
    * whitespace token lands in bucket h28(md5(token)) mod `nBuckets`.
    * The md5 contract makes assignments identical in any engine; the
    * histogram is one vocabulary-bounded aggregate after a scan-local
    * tokenize (the corpus text never shuffles — only (bucket, count)
    * partials).
    */
  def hashedFeatureHistogram(
      df: DataFrame, textCol: String, nBuckets: Int): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(pmod(conv(substring(md5(col("w")), 1, 7), 16, 10)
        .cast("long"), lit(nBuckets.toLong)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Per-dimension min-max scaling statistics over an `Array[Float]`
    * embedding column: for each dimension, (min, max) and the mean of
    * the min-max-scaled values — closed-form from the exact aggregates
    *
    *   scaled_mean = (Σv − n·min) / (n·(max − min))
    *
    * so no per-element float division ever happens (summation-order
    * noise cannot reach the result: Σv is an exact DECIMAL(28,10) sum
    * of the floats' exact double values). One posexplode + one groupBy
    * on the 64-value dim domain; zero-variance dims yield null (no
    * scale exists), not NaN.
    */
  def minMaxScaleStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("pos"),
        col("v").cast("double").as("v"))
      .groupBy("pos")
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        sum(col("v").cast(DecimalType(28, 10))).as("s"),
        count(lit(1)).as("n"))
      .select(col("pos"), col("vmin"), col("vmax"),
        when(col("vmax") > col("vmin"),
          round((col("s") - col("n") * col("vmin").cast(DecimalType(28, 10)))
            .cast("double") /
            (col("n").cast("double") * (col("vmax") - col("vmin"))), 6))
          .as("scaled_mean"))

  /** Rare-term TF-IDF pair candidates: documents scored against each
    * other through SHARED RARE TERMS only (df ∈ [dfMin, dfMax]) with
    * integer weights w(d,t) = tf(d,t) · (1000000 div df(t)) — integer
    * division on both engines, so the dot products are exact longs.
    * Terms are word BIGRAMS: unigram vocabularies saturate (every word
    * frequent ⇒ no discriminative terms), while bigram df distributions
    * keep a discriminative tail even over small vocabularies — the
    * same reason shingle-based near-dup contracts outperform word sets.
    *
    * The df cap IS the scale story (same reason PPJoin prefixes work):
    * candidate pairs are Σ_t df(t)² ≤ dfMax·Σ_t df(t), linear in the
    * posting list volume — an uncapped term join would go quadratic on
    * every stopword. Returns the top-k pairs by dot product
    * (deterministic tiebreak), via TakeOrdered — no global sort.
    */
  def tfidfRareTermPairs(
      df: DataFrame, idCol: String, textCol: String,
      dfMin: Int, dfMax: Int, k: Int): DataFrame = {
    val tf = df
      .select(col(idCol).as("id"),
        expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')")
          .as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))"))
        .as("w"))
      .groupBy("id", "w")
      .agg(count(lit(1)).as("tf"))
      // tf feeds BOTH the df aggregate and the weighted join —
      // materialize the tokenize+count chain once
      .materialized
    val dfreq = tf.groupBy("w")
      .agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq").between(dfMin, dfMax))
    // dfreq is band-bounded (rare terms only) → broadcast; weighted is
    // its posting volume → materialize ONCE for the self-join instead
    // of re-running the tokenize+count chain per side
    val weighted = tf
      .join(broadcast(dfreq), "w")
      .select(col("id"), col("w"),
        (col("tf") * expr("1000000 div dfreq")).as("wt"))
      .materialized
    val a = weighted.select(col("id").as("id_a"), col("w"),
      col("wt").as("wa"))
    val b = weighted.select(col("id").as("id_b"), col("w"),
      col("wt").as("wb"))
    a.join(b, Seq("w"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .orderBy(col("dot").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** χ² feature screening for hashed token features against a binary
    * class (the 2×2 contingency closed form — Manning & Schütze §5.3.3):
    * per bucket, presence/absence vs positive/negative class,
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * a single fixed-order expression over exact counts (no per-cell
    * float summation whose order could drift), products in
    * DECIMAL(38,0) — N⁴ passes 2⁶³ at ~56k docs — one double division,
    * round 4. Degenerate margins (a bucket in every/no doc, or a
    * single-class corpus) yield null, not NaN.
    *
    * Scale shape: one scan-local tokenize → distinct (doc, bucket,
    * class) frame → one bucket-bounded aggregate + a 1-row global
    * broadcast.
    */
  def chi2BinaryFeatures(
      df: DataFrame, idCol: String, textCol: String, nBuckets: Int,
      positive: Column): DataFrame = {
    val d = DecimalType(38, 0)
    def dd(c: Column) = c.cast(d)
    val docs = df.select(col(idCol).as("id"), positive.as("pos"),
      col(textCol).as("_t"))
    val global = docs.agg(count(lit(1)).as("nn"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"))
    val present = docs
      .select(col("id"), col("pos"),
        explode(split(lower(col("_t")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(col("id"), col("pos"),
        pmod(conv(substring(md5(col("w")), 1, 7), 16, 10)
          .cast("long"), lit(nBuckets.toLong)).as("bucket"))
      .distinct()
    val cells = present.groupBy("bucket")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("ab"))
      .crossJoin(broadcast(global))
      .select(col("bucket"), col("a"), (col("ab") - col("a")).as("b"),
        (col("np") - col("a")).as("c"),
        (col("nn") - col("np") - col("ab") + col("a")).as("d"),
        col("nn"))
    val den = dd(col("a") + col("b")) * dd(col("c") + col("d")) *
      dd(col("a") + col("c")) * dd(col("b") + col("d"))
    val adbc = dd(col("a")) * dd(col("d")) - dd(col("b")) * dd(col("c"))
    cells.select(col("bucket"), col("a"), col("b"), col("c"), col("d"),
      when(den =!= 0,
        round((dd(col("nn")) * adbc * adbc).cast("double") /
          den.cast("double"), 4)).as("chi2"))
  }

  /** Per-dimension quantile binning (equal-frequency discretization):
    * standard SQL ntile semantics under a deterministic (value, id)
    * order — rank-based, so the bin ASSIGNMENT is exact and
    * engine-portable (no float boundary arithmetic); emits per
    * (dim, bin) the count and value bounds.
    *
    * Scale: ranks come from [[Ranks.withGroupNtile]] with per-dim
    * range sub-buckets — a `Window.partitionBy(pos)` would cap
    * parallelism at the dim count with every task sorting ALL n rows
    * of its dimension; here each task sorts ~n/buckets of one dim.
    */
  def quantileBins(
      df: DataFrame, idCol: String, vecCol: String,
      nBins: Int): DataFrame = {
    val x = df.select(col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("v").cast("double").as("v"))
    Ranks.withGroupNtile(x, "bin", nBins, Seq("pos"), col("v"),
        ties = Seq(col("id")))
      .groupBy("pos", "bin")
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("vmin"),
        max(col("v")).as("vmax"))
  }

  /** Per-dimension Spearman rank correlation between an embedding
    * dimension and an integer label — the feature-relevance screen
    * before training (monotone association, robust to feature scale).
    * Ordinal ranks with a deterministic id tiebreak (NOT midranks —
    * a contract choice that keeps everything integer: midranks halve,
    * and the oracle replays the identical row_number ordering), then
    * the classic closed form
    *
    *   ρ = 1 − 6·Σd² / (n·(n²−1))
    *
    * combined in DECIMAL(38,0) (n³ passes 2⁶³ at ~2M rows per
    * dimension) with ONE double division at the surface. Cost shape:
    * both exact per-dimension rank passes batch through ONE
    * [[Ranks.withRanks]] call (range sub-buckets inside each dim, so
    * a task sorts ~n/buckets rows — a bare `Window.partitionBy(pos)`
    * would cap parallelism at the dim count and sort ALL n rows of a
    * dimension in one task) sharing one boundary job and one count
    * job; the two window exchanges chain in the final plan.
    */
  def rankCorrelation(
      df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val x = df.select(col(idCol).as("id"), col(labelCol).as("lbl"),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("id"), col("lbl"), col("pos").cast("long").as("pos"),
        col("v").cast("double").as("v"))
    val d = DecimalType(38, 0)
    def dd(c: Column) = c.cast(d)
    val ranked = Ranks.withRanks(x, Seq(
        Ranks.RankSpec("rx", col("v")),
        Ranks.RankSpec("ry", col("lbl"))),
      groupCols = Seq("pos"), ties = Seq(col("id")))
    ranked
      .withColumn("_d", (col("rx") - col("ry")).cast("long"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum(col("_d") * col("_d")).as("sd2"))
      .select(col("pos"), col("n"),
        when(col("n") > 1,
          Numerics.roundz(lit(1.0) -
            (dd(lit(6)) * dd(col("sd2"))).cast("double") /
            (dd(col("n")) * (dd(col("n")) * dd(col("n")) - lit(1)))
              .cast("double"), 6)).as("rho"))
  }

  /** Rank normalization (the quantile transform): every row's score
    * mapped to its normalized global rank (rank−1)/(n−1) ∈ [0, 1] —
    * the scale-free score calibration feature pipelines apply before
    * mixing heterogeneous quality signals (SQL `percent_rank` under a
    * (score, id) total order, so the value is engine-portable and the
    * division is one exact-integer ratio per row). The rank comes from
    * [[Ranks.withGlobalRank]] — range-bucketed, never a
    * single-partition sort; n rides a 1-row broadcast. A single-row
    * input gets 0.0 by the SQL percent_rank convention.
    *
    * Ranks on the RAW score column (any orderable numeric — model
    * scores in [0,1] included; the double cast inside Ranks' bucketing
    * is monotone), so fractional scores are never truncated. The
    * `score` column echoes the input value unchanged.
    */
  def rankNormalize(
      df: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      col(scoreCol).as("score"))
    val total = base.agg(count(lit(1)).as("_n"))
    Ranks.withGlobalRank(base, "_r", col("score"), ties = Seq(col("id")))
      .crossJoin(broadcast(total))
      .select(col("id"), col("score"),
        when(col("_n") > 1,
          Numerics.roundz((col("_r") - 1L).cast("double") /
            (col("_n") - 1L).cast("double"), 6))
          .otherwise(lit(0.0)).as("pct_rank"))
  }
}
