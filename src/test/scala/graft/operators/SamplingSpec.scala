package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified take keeps ceil(frac*n) smallest-ordered rows per group") {
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = Sampling.stratifiedTake(docs, "lang", "doc_id", 0.2)
    val got = sample.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) == math.ceil(0.2 * n).toLong, s"lang=$lang")
    }
    // determinism: the sample is exactly the lowest doc_ids per group
    val minIds = sample.groupBy("lang").agg(max("doc_id").as("mx"))
      .join(docs, "lang")
      .filter(col("doc_id") < col("mx"))
    // every doc below the per-group max sampled id must itself be sampled
    val below = minIds.count()
    val sampledBelow = minIds.join(sample.select("doc_id"), "doc_id").count()
    assert(below == sampledBelow)
  }

  test("shuffle shards: a bijective permutation, contiguous positions") {
    val sharded = Sampling.shuffleShards(docs, "doc_id", 8)
    val rows = sharded.select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == docs.count())
    // every shard's positions are exactly 0..n-1 (dense, no gaps)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard=$shard")
    }
    // the permutation actually shuffles: within some shard, ascending
    // position must NOT be ascending doc_id
    val monotone = rows.groupBy(_._2).values.forall { rs =>
      val byPos = rs.sortBy(_._3).map(_._1)
      byPos.sorted.toSeq == byPos.toSeq
    }
    assert(!monotone)
    // deterministic across runs
    val again = Sampling.shuffleShards(docs, "doc_id", 8)
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet)
  }

  test("weighted take applies per-group rates with a default") {
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 1.0, "de" -> 0.5)
    val got = Sampling.weightedTake(docs, "lang", "doc_id", weights, 0.1)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      val rate = weights.getOrElse(lang, 0.1)
      assert(got(lang) == math.ceil(rate * n).toLong, s"lang=$lang")
    }
  }

  test("weighted take at rate 1.0 keeps every row of that group") {
    val en = docs.filter(col("lang") === "en")
    val kept = Sampling.weightedTake(docs, "lang", "doc_id",
        Map("en" -> 1.0), 0.0)
    assert(kept.count() == en.count())
    assert(kept.exceptAll(en).isEmpty)
  }

  test("hash split is stable and covers all buckets disjointly") {
    val split = Sampling.hashSplit(docs, "doc_id", 10)
    val counts = split.groupBy("split_bucket").count().collect()
    assert(counts.map(_.getLong(1)).sum == docs.count())
    assert(counts.length == 10) // 500 docs land in all 10 buckets
    val again = Sampling.hashSplit(docs, "doc_id", 10)
      .select("doc_id", "split_bucket").collect().toSet
    assert(again == split.select("doc_id", "split_bucket").collect().toSet)
  }

  test("score buckets: tercile labels match direct quantile comparison") {
    val s = spark
    import s.implicits._
    // 9 known scores: terciles at quantile_cont(1/3)=3.666…, (2/3)=6.333…
    val scored = (1L to 9L).map(i => (i, i.toDouble)).toDF("id", "score")
    val out = Sampling.bucketByScore(scored, "score")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 3L).forall(out(_) == "tail"))
    assert((4L to 6L).forall(out(_) == "middle"))
    assert((7L to 9L).forall(out(_) == "head"))
    // tier sizes on real data are balanced to within rounding/ties
    val q = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
    val sizes = Sampling.bucketByScore(q, "q")
      .groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("tail", "middle", "head"))
    assert(sizes.values.sum == docs.count())
    val n = docs.count().toDouble
    assert(sizes.values.forall(c => c > n / 6 && c < n / 2)) // ties allowed
    // invalid configs fail fast
    intercept[IllegalArgumentException] {
      Sampling.bucketByScore(scored, "score", cuts = Seq(0.8, 0.2),
        labels = Seq("a", "b", "c"))
    }
    intercept[IllegalArgumentException] {
      Sampling.bucketByScore(scored, "score", labels = Seq("a", "b"))
    }
  }

  test("temperature take: tau=1 is the natural rate, tau=0 flattens") {
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum.toDouble
    // tau=1: every group keeps ceil(round(baseRate,6) * n) rows
    val nat = Sampling.temperatureTake(docs, "lang", "doc_id", 1.0, 0.3)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (g, n) =>
      assert(nat(g) == math.ceil(0.3 * n).toLong, s"tau=1 lang=$g")
    }
    // tau=0: equal EXPECTED picks per group — rate_g = baseRate*N/(G*n_g)
    val g = sizes.size.toDouble
    val flat = Sampling.temperatureTake(docs, "lang", "doc_id", 0.0, 0.3)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (k, n) =>
      val rate = math.min(1.0, 0.3 * total / (g * n))
      val expect = math.ceil(
        BigDecimal(rate).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble * n).toLong
      assert(flat(k) == expect, s"tau=0 lang=$k")
    }
    // 0 < tau < 1 boosts the tail: smallest group keeps a larger
    // FRACTION of itself than the largest group
    val mid = Sampling.temperatureTake(docs, "lang", "doc_id", 0.5, 0.3)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (big, nBig) = sizes.maxBy(_._2)
    val (small, nSmall) = sizes.minBy(_._2)
    assert(mid(small).toDouble / nSmall > mid(big).toDouble / nBig)
    intercept[IllegalArgumentException] {
      Sampling.temperatureTake(docs, "lang", "doc_id", -0.1, 0.3)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureTake(docs, "lang", "doc_id", 0.5, 0.0)
    }
  }

  test("token-budget take keeps the maximal best-first prefix per group") {
    val s = spark
    import s.implicits._
    val scored = docs.select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("quality"))
    val budget = 800L
    val kept = Sampling.tokenBudgetTake(
        scored, "source", "quality", "n_tokens", "doc_id", budget)
      .select("source", "doc_id", "n_tokens", "grp_rank", "cum_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
    // reference: full best-first order computed independently
    val all = scored.as[(Long, String, Long, Double)].collect()
      .groupBy(_._2)
    all.foreach { case (src, rows) =>
      val order = rows.sortBy(r => (-r._4, r._1)) // quality desc, id asc
      var cum = 0L
      val expect = order.takeWhile { r => cum += r._3; cum <= budget }
        .map(_._1).toSeq
      val got = kept.filter(_._1 == src).sortBy(_._4)
      assert(got.map(_._2).toSeq == expect, s"source=$src")
      // running totals are within budget and correct
      assert(got.forall(_._5 <= budget))
      assert(got.map(_._3).sum == got.lastOption.map(_._5).getOrElse(0L))
    }
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetTake(scored, "source", "quality", "n_tokens",
        "doc_id", 0L)
    }
  }

  test("weightedReservoirTake is deterministic and partitioning-independent") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, if (i % 2 == 0) 1000L else 1L))
    val df1 = rows.toDF("doc_id", "w").repartition(1)
    val df13 = rows.toDF("doc_id", "w").repartition(13)
    val a = Sampling.weightedReservoirTake(df1, "doc_id", "w", 60)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedReservoirTake(df13, "doc_id", "w", 60)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size == 60)
    // E-S property: heavy-weight rows dominate the sample
    val heavy = a.count(_ % 2 == 0)
    assert(heavy >= 54, s"only $heavy/60 sampled rows have the 1000x weight")
  }

  test("weightedReservoirTakePerGroup keeps k per group, heavy rows dominate") {
    import spark.implicits._
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 1L to 100L
    } yield (g, g.hashCode.toLong * 1000 + i, if (i % 2 == 0) 500L else 1L)
    val df = rows.toDF("grp", "doc_id", "w").repartition(7)
    val got = Sampling.weightedReservoirTakePerGroup(df, "grp", "doc_id", "w", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byGroup = got.groupBy(_._1)
    assert(byGroup.keySet == Set("a", "b", "c"))
    byGroup.values.foreach(v => assert(v.length == 10))
    // within every group the 500x-weight rows dominate the draw
    byGroup.foreach { case (g, v) =>
      val heavy = v.count(_._2 % 2 == 0)
      assert(heavy >= 8, s"group $g drew only $heavy/10 heavy rows")
    }
  }

  test("weightedReservoirTake seed decorrelates draws") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, 10L)).toDF("doc_id", "w")
    val s0 = Sampling.weightedReservoirTake(df, "doc_id", "w", 50, seed = 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = Sampling.weightedReservoirTake(df, "doc_id", "w", 50, seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s0 != s1)
    // uniform weights: both draws are plain uniform samples; overlap of
    // two independent 10% samples should be far from total
    assert((s0 intersect s1).size < 25)
    intercept[IllegalArgumentException] {
      Sampling.weightedReservoirTake(df, "doc_id", "w", 0)
    }
  }

  test("deterministicSplit is total, stable, and near the stated fractions") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("doc_id")
    val splits = Seq("train" -> 204, "val" -> 26, "test" -> 26)
    val got = Sampling.deterministicSplit(df, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000, "every row must be assigned")
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    // 204/256 = 79.7%, 26/256 = 10.2% — allow binomial noise
    assert(math.abs(counts("train") - 1594) < 80, s"$counts")
    assert(math.abs(counts("val") - 203) < 60, s"$counts")
    assert(math.abs(counts("test") - 203) < 60, s"$counts")
    // stability: a second run and a disjoint corpus agree on shared ids
    val again = Sampling.deterministicSplit(df.filter(col("doc_id") <= 100), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    again.foreach { case (id, s) => assert(got(id) == s, s"id $id flipped") }
  }

  test("deterministicSplit matches the md5-threshold contract per row") {
    import spark.implicits._
    val df = (1L to 50L).toDF("doc_id")
    val got = Sampling.deterministicSplit(df, "doc_id",
        Seq("train" -> 204, "val" -> 26, "test" -> 26))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    (1L to 50L).foreach { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      val expect = if (hex < "cc") "train" else if (hex < "e6") "val" else "test"
      assert(got(id) == expect, s"id $id: ${got(id)} != $expect (hex $hex)")
    }
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(df, "doc_id", Seq("a" -> 100, "b" -> 100))
    }
  }

  test("negative samples: never anchor/neighbor, <= k, partition-stable") {
    val s = spark
    import s.implicits._
    val ids = (1L to 20L).toDF("id")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val out = Sampling.negativeSamples(ids, "id", pairs, "id_a", "id_b",
        k = 3, margin = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.values.forall(_.length <= 3))
    val nbr = Map(1L -> Set(2L, 5L), 2L -> Set(1L), 3L -> Set(4L),
      4L -> Set(3L), 5L -> Set(1L)).withDefaultValue(Set.empty[Long])
    out.foreach { case (a, n, _) =>
      assert(n != a, s"anchor $a sampled itself")
      assert(!nbr(a).contains(n), s"anchor $a sampled neighbor $n")
    }
    // enough margin that every anchor gets its full k here
    assert(byAnchor.size == 20 && byAnchor.values.forall(_.length == 3))
    val again = Sampling.negativeSamples(ids.repartition(7), "id",
        pairs.repartition(3), "id_a", "id_b", k = 3, margin = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.sortBy(r => (r._1, r._3)).toSeq ==
      again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("negative samples follow the md5 slot contract on a hand case") {
    val sp = spark
    import sp.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = 6
    def slot(a: Long, j: Int): Long =
      PortableSketches.hash28(md, s"$a:$j") % n + 1 // ids 1..6 → rn == id
    val ids = (1L to 6L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val expected = (1L to 6L).flatMap { a =>
      (1 to 6).map(j => (j, slot(a, j)))
        .filter(_._2 != a)
        .groupBy(_._2).map { case (neg, js) => (js.map(_._1).min, neg) }
        .toSeq.sorted.take(2).map { case (j, neg) => (a, neg, j) }
    }
    val got = Sampling.negativeSamples(ids, "id", noPairs, "id_a", "id_b",
        k = 2, margin = 6)
      .orderBy("id", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("curriculum interleave: proportional progress, deterministic ties") {
    val sp = spark
    import sp.implicits._
    // source A: 4 docs, source B: 2 docs, total 6.
    // A ranks (by score asc, id): a1<a2<a3<a4 -> pos_key 0,1,3,4 ((r-1)*6 div 4)
    // B ranks: b1<b2 -> pos_key 0,3 ((r-1)*6 div 2)
    val df = Seq(
      (1L, 10L, "A"), (2L, 20L, "A"), (3L, 30L, "A"), (4L, 40L, "A"),
      (5L, 15L, "B"), (6L, 25L, "B"))
      .toDF("id", "difficulty", "src")
    val out = Sampling.curriculumInterleave(df, "id", "difficulty", "src")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((1L, 0L)) && out(2L) == ((2L, 1L)) &&
      out(3L) == ((3L, 3L)) && out(4L) == ((4L, 4L)))
    assert(out(5L) == ((1L, 0L)) && out(6L) == ((2L, 3L)))
    // ordering by (pos_key, src, rank) interleaves: a1,b1,a2,a3,b2,a4
    val order = Sampling.curriculumInterleave(df, "id", "difficulty", "src")
      .orderBy("pos_key", "src", "rank_in_source")
      .collect().map(_.getLong(0)).toSeq
    assert(order == Seq(1L, 5L, 2L, 3L, 6L, 4L))
  }

  test("distribution match: over-represented group thins, others keep all") {
    val sp = spark
    import sp.implicits._
    // group a: 40 rows (over target 15), b: 5, c: 1 -> target = 46 div 3 = 15
    val rows = (1L to 40L).map(i => (i, "a")) ++
      (41L to 45L).map(i => (i, "b")) :+ ((46L, "c"))
    val df = rows.toDF("id", "g")
    val sum = Sampling.distributionMatchSummary(df, "id", "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sum(0)._1 == "a" && sum(0)._3 == 15L &&
      sum(0)._4 == 15L * 10000 / 40)
    assert(sum(1) == (("b", 5L, 15L, 10000L, 5L)))
    assert(sum(2) == (("c", 1L, 15L, 10000L, 1L)))
    // kept rows agree with the summary counts
    val kept = Sampling.distributionMatchKeep(df, "id", "g")
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sum.foreach { case (g, _, _, _, nk) => assert(kept.getOrElse(g, 0L) == nk) }
    // determinism across partitionings
    val again = Sampling.distributionMatchKeep(df.repartition(7), "id", "g")
      .select("id").collect().map(_.getLong(0)).toSet
    val first = Sampling.distributionMatchKeep(df, "id", "g")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(first == again)
  }

  test("stratified k-fold: balanced cells, deterministic assignment") {
    val sp = spark
    import sp.implicits._
    val df = ((1L to 23L).map(i => (i, "a")) ++ (100L to 106L).map(i => (i, "b")))
      .toDF("id", "g")
    val folds = Sampling.stratifiedKFold(df, "id", "g", k = 5)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    // group a: 23 rows over 5 folds -> sizes {5,5,5,4,4}; b: 7 -> {2,2,1,1,1}
    val sizes = folds.groupBy(identity).view.mapValues(_.size).toMap
    (0L to 4L).foreach { f =>
      assert(math.abs(sizes(("a", f)) - 23.0 / 5) < 1.0)
      assert(math.abs(sizes(("b", f)) - 7.0 / 5) < 1.0)
    }
    val again = Sampling.stratifiedKFold(df.repartition(9), "id", "g", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val first = Sampling.stratifiedKFold(df, "id", "g", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(first == again)
  }

  test("epochMix: integer weights repeat exactly, fractional part is a coin") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i =>
      (i, if (i <= 100) "a" else "b")).toDF("id", "src")
    val out = Sampling.epochMix(df, "id", "src",
      weights = Map("a" -> 2.0, "b" -> 0.5))
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") == 200L) // exactly 2 epochs each
    // b: 100 rows × coin(0.5) — deterministic, strictly between 0 and 100
    assert(bySrc("b") > 20L && bySrc("b") < 80L)
    // replayable: same input → identical multiset
    val again = Sampling.epochMix(df.repartition(7), "id", "src",
      weights = Map("a" -> 2.0, "b" -> 0.5))
    assert(out.collect().map(_.toSeq).toSet ==
      again.collect().map(_.toSeq).toSet)
    // epoch indexes are 1..copies per row
    val epochsOfA = out.filter(col("src") === "a" && col("id") === 1L)
      .select("epoch").collect().map(_.getLong(0)).sorted
    assert(epochsOfA.toSeq == Seq(1L, 2L))
  }

  test("neymanAllocation: budget splits by N_h·sigma_h and sums exactly") {
    val s = spark
    import s.implicits._
    // stratum a: 100 rows, sd 0 (constant) → zero weight;
    // stratum b: 100 rows alternating ±10 around 50 → sigma 10;
    // stratum c: 50 rows alternating ±30 around 50 → sigma 30.
    // weights: a=0, b=1000, c=1500 → quotas 0 / 40 / 60 of budget 100
    val rows =
      (1 to 100).map(i => ("a", 50.0)) ++
      (1 to 100).map(i => ("b", if (i % 2 == 0) 60.0 else 40.0)) ++
      (1 to 50).map(i => ("c", if (i % 2 == 0) 80.0 else 20.0))
    val out = Sampling.neymanAllocation(rows.toDF("g", "v"), "g", "v",
        budget = 100L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(4)))
    assert(out(0) == (("a", 0.0, 0L)))
    assert(out(1) == (("b", 10.0, 40L)))
    assert(out(2) == (("c", 30.0, 60L)))
    assert(out.map(_._3).sum == 100L) // largest remainder preserves B
  }
}
