package graft.operators

import graft.SparkSpec

class EditDistanceSpec extends SparkSpec {

  /** Plain DP reference — the definition the operator must reproduce. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0)
      d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private def naivePairs(ss: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- ss; (ib, sb) <- ss if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet

  private def opPairs(ss: Seq[(Long, String)], k: Int, q: Int): Set[(Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    EditDistance.pairs(ss.toDF("id", "s"), "s", "id", k, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  // strings spanning the short class, the long class, and the boundary,
  // with planted near-dup clusters and decoys
  private val corpus: Seq[(Long, String)] = {
    val bases = Seq("small ring", "the quick brown fox jumps over the dog",
      "abcdefghijklmnop", "xy", "a", "", "edit distance near duplicates",
      "zzzz")
    val mutations = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq(
        b,                                          // exact dup source
        if (b.nonEmpty) b.drop(1) else b + "q",     // 1 deletion / insertion
        b + "x",                                    // 1 insertion
        if (b.length > 2) b.updated(1, 'Q') else b, // 1 substitution
        b.reverse,                                  // far (usually)
        b + " totally different tail here")         // far
    }
    mutations.zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  test("pairs equals brute force across k and q (both candidate classes)") {
    for (k <- Seq(1, 2, 3); q <- Seq(2, 3)) {
      assert(opPairs(corpus, k, q) == naivePairs(corpus, k),
        s"mismatch at k=$k q=$q")
    }
    assert(naivePairs(corpus, 2).nonEmpty) // the test isn't vacuous
  }

  test("short-class strings (below the gram bound) still pair exactly") {
    val shorts = Seq(0L -> "ab", 1L -> "ac", 2L -> "b", 3L -> "abc",
      4L -> "", 5L -> "a", 6L -> "xyz", 7L -> "xy")
    for (k <- Seq(1, 2)) {
      assert(opPairs(shorts, k, 3) == naivePairs(shorts, k), s"k=$k")
    }
  }

  private def opPairsPrefix(
      ss: Seq[(Long, String)], k: Int, q: Int): Set[(Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    EditDistance.pairsPrefix(ss.toDF("id", "s"), "s", "id", k, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("pairsPrefix equals brute force and pairs across k and q — " +
    "including a shared-format dictionary (the frequent-gram case the " +
    "prefix filter exists for)") {
    for (k <- Seq(0, 1, 2); q <- Seq(2, 3)) {
      val expected = naivePairs(corpus, k)
      assert(opPairsPrefix(corpus, k, q) == expected, s"k=$k q=$q")
    }
    // every string shares the "entry nr " prefix: under the count
    // filter all of them co-bucket on those grams; the prefix filter
    // must keep the SAME result while joining only on rare grams
    val formatted = (0L to 40L).map(i => i -> s"entry nr ${i * 7}") ++
      Seq(100L -> "entry nr 70x", 101L -> "entry nr 7")
    for (k <- Seq(1, 2)) {
      assert(opPairsPrefix(formatted, k, 3) == naivePairs(formatted, k),
        s"formatted k=$k")
    }
    // repeated grams inside one string: occurrence indexing (gram, j)
    // must keep multiset semantics
    val reps = Seq(0L -> "abababab", 1L -> "ababab", 2L -> "abababac",
      3L -> "babababa", 4L -> "cdcdcdcd")
    for (k <- Seq(1, 2)) {
      assert(opPairsPrefix(reps, k, 3) == naivePairs(reps, k), s"reps k=$k")
    }
  }

  test("degenerate guard: a too-narrow variable region falls back to " +
    "the count filter, result set unchanged") {
    val s = spark
    import s.implicits._
    // 500 ids over a 30-char shared format with a 2-char variable
    // region — narrower than maxDist·q = 3 chars, so every kept prefix
    // contains a shared format gram with df ≈ n: the round-16-measured
    // collapse (539 s vs 4.8 s at 20k rows). The guard must detect it
    // (maxDf ≈ n ≫ 4·√rows) and route through [[EditDistance.pairs]].
    val degen = (0L until 500L).map(i =>
      i -> f"shared-format-prefix-constant-${i % 100}%02d")
    val viaPrefix = EditDistance
      .pairsPrefix(degen.toDF("id", "s"), "s", "id", 1, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaCount = EditDistance
      .pairs(degen.toDF("id", "s"), "s", "id", 1, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaPrefix == viaCount)
    assert(viaPrefix.nonEmpty)
    // threshold unit cases: collapse signature fires, healthy does not
    assert(EditDistance.prefixDegenerate(maxDf = 500, rows = 2000))
    assert(!EditDistance.prefixDegenerate(maxDf = 20, rows = 2000))
    assert(!EditDistance.prefixDegenerate(maxDf = 0, rows = 0))
  }

  test("the real corpus does not trip the degenerate guard (the gate " +
    "keeps exercising the prefix path)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("id"))
      .select(col("id").cast("long").as("id"), col("p_name").as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
    val q = 3; val pfx = 2 * q + 1 // the gate's maxDist = 2
    val occ = docs.filter(col("len") >= q)
      .select(col("id"), posexplode(
        expr(s"transform(sequence(1, len - ${q - 1}), " +
          s"i -> substring(s, i, $q))")).as(Seq("pos", "gram")))
      .withColumn("j", row_number().over(
        Window.partitionBy(col("id"), col("gram")).orderBy(col("pos"))))
    val prefix = occ
      .withColumn("_f", count(lit(1)).over(
        Window.partitionBy(col("gram"), col("j"))))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("_f"), col("gram"), col("j"))))
      .filter(col("_rn") <= pfx)
    val st = prefix.groupBy(col("gram"), col("j"))
      .agg(count(lit(1)).as("_df"))
      .agg(coalesce(max(col("_df")), lit(0L)).as("maxDf"),
        coalesce(sum(col("_df")), lit(0L)).as("rows")).head()
    assert(!EditDistance.prefixDegenerate(st.getLong(0), st.getLong(1)),
      s"maxDf=${st.getLong(0)} rows=${st.getLong(1)}")
  }

  test("null strings are dropped, not paired") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "alpha"), (1L, null), (2L, "alphb")).toDF("id", "s")
    val got = EditDistance.pairs(df, "s", "id", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((0L, 2L, 1)))
  }

  test("rejects invalid parameters") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](EditDistance.pairs(df, "s", "id", -1))
    intercept[IllegalArgumentException](EditDistance.pairs(df, "s", "id", 1, q = 1))
  }
}
