package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine of a vector with itself is 1") {
    val one = emb.limit(1)
      .select(round(Similarity.cosine(col("embedding"), col("embedding")), 9))
      .collect().head.getDouble(0)
    assert(one == 1.0)
  }

  test("brute-force top-k is ordered and excludes the query") {
    val top = Similarity.topKCosine(emb, "vec_id", "embedding", 0L, 5).collect()
    assert(top.length == 5)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("ANN results are a subset of the bucket with exact scores") {
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 5,
      dim = 64, numPlanes = 2)
    val rows = ann.collect()
    assert(rows.nonEmpty)
    // scores must equal brute-force cosine for the same ids
    val brute = Similarity.topKCosine(emb, "vec_id", "embedding", 0L, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      brute.get(r.getLong(0)).foreach(b => assert(b == r.getDouble(1)))
    }
  }

  test("IVF ANN: multi-probe recall overlaps exact top-k with exact scores") {
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      numCentroids = 8, nProbes = 8) // probing ALL cells = exact
    val exact = Similarity.topKCosine(emb, "vec_id", "embedding", 0L, 10)
    val a = ivf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = exact.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b) // all-cells probe must equal brute force
  }

  test("lsh bucket is deterministic and within range") {
    val b = emb.select(Similarity.lshBucket(col("embedding"), 64, 4).as("b"))
    val vals = b.collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v < 16))
    val again = b.collect().map(_.getLong(0))
    assert(vals.toSeq == again.toSeq)
  }

  test("batch top-k for one query equals single-query brute force") {
    val batch = Similarity.topKCosineBatch(emb, "vec_id", "embedding", Seq(0L), 10)
      .orderBy(col("sim").desc, col("vec_id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val single = Similarity.topKCosine(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(batch == single)
  }

  test("kernel bucket assignment equals the expression variant") {
    val expr = emb.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 64, 8).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = Similarity.lshBucketed(emb, "vec_id", "embedding", 64, 8)
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == expr)
    assert(kernel.values.toSet.size > 1)
  }

  test("block self-join cosine pairs are bit-identical to the broadcast kernel") {
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = norm(
      Similarity.cosinePairsBlocked(emb, "vec_id", "embedding", 0.4))
    assert(blocked.nonEmpty)
    // every pair must appear in exactly one cell for ANY block count
    for (blocks <- Seq(1, 3, 8)) {
      val blockJoin = norm(Similarity.cosinePairsBlockJoin(
        emb, "vec_id", "embedding", 0.4, numBlocks = blocks))
      assert(blockJoin == blocked, s"numBlocks=$blocks")
    }
  }

  test("cosinePairs symmetric threshold filtering") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(tiny, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("normalizeUnit produces unit norms; zero vector stays zero") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(-1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.normalizeUnit(tiny, "embedding", roundTo = None)
      .select(col("vec_id"), col("unit"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(math.abs(out(1L).map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(2L).forall(_ == 0.0))
    assert(math.abs(out(3L).map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(1L) == Seq(0.6, 0.8))
    // real data: every non-zero vector lands at unit length
    val norms = Similarity.normalizeUnit(emb, "embedding", roundTo = None)
      .select(Similarity.norm(col("unit")).as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
  }

  test("meanPool averages element-wise per group") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f)),
      (2L, Array(10.0f, 20.0f)))
      .toDF("g", "embedding")
    val out = Similarity.meanPool(tiny, col("g"), "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(2.0, 3.0))
    assert(out(2L) == Seq(10.0, 20.0))
    // real data: grouping ALL rows yields the corpus centroid, dim 64
    val c = Similarity.meanPool(emb, lit(0L), "embedding", roundTo = None)
      .collect().map(r => r.getSeq[Double](1))
    assert(c.length == 1 && c.head.size == 64)
  }

  test("centroidAssign: nearest per-label mean, ties to lower label") {
    val s = spark
    import s.implicits._
    // label 0 centroid = (0,0); label 1 centroid = (4,0); label 2's
    // single member sits exactly between them but its own centroid wins
    val df = Seq(
      (1L, Seq(-1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(3.0f, 0.0f), 1), (4L, Seq(5.0f, 0.0f), 1),
      (5L, Seq(2.0f, 3.0f), 2),
      (6L, Seq(3.9f, 0.1f), 0)) // near label-1's centroid → reassigned
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidAssign(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(6L) == 1, "point nearest a foreign centroid moves")
    assert(got(5L) == 2, "own singleton centroid is distance 0")
    assert(got(1L) == 0 && got(3L) == 1)
    // exact tie: both labels' centroids land on (1,0) — every point is
    // equidistant to both, so everything resolves to the LOWER label
    val tie = Seq(
      (1L, Seq(0.0f, 0.0f), 9), (2L, Seq(2.0f, 0.0f), 9),
      (3L, Seq(4.0f, 0.0f), 7), (4L, Seq(-2.0f, 0.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val t = Similarity.centroidAssign(tie, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(t.values.toSet == Set(7))
  }

  test("randomProject is deterministic and preserves cosine within JL bound") {
    val a = Similarity.randomProject(emb, "vec_id", "embedding", 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Similarity.randomProject(emb, "vec_id", "embedding", 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b) // stateless seeded matrix — identical across runs
    assert(a.values.forall(_.size == 32))
    def cos(x: scala.collection.Seq[Double], y: scala.collection.Seq[Double]): Double = {
      val d = x.iterator.zip(y.iterator).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    val orig = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val ids = orig.keySet.toSeq.sorted.take(20)
    val devs = for {
      i <- ids; j <- ids if i < j
    } yield math.abs(cos(a(i), a(j)) - cos(orig(i), orig(j)))
    // JL at 32 dims is still loose; the fixed seed makes this
    // deterministic, the bound just documents the preservation claim
    assert(devs.max < 0.5, s"max cosine deviation ${devs.max}")
    assert(devs.sum / devs.size < 0.15, s"mean deviation ${devs.sum / devs.size}")
  }

  test("randomProjectPortable matches the md5 contract and ignores partitioning") {
    import spark.implicits._
    val df = Seq((7L, Seq(0.5f, -0.25f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.randomProjectPortable(df, "vec_id", "embedding", 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val x = Array(0.5, -0.25, 1.0).map(v => math.floor(v * 1e9).toLong)
    val expect = (0 until 4).map { j =>
      val acc = x.indices.map { i =>
        val s = if ((PortableSketches.hash60(md, s"r$j:$i") & 1L) == 1L) 1L else -1L
        s * x(i)
      }.sum
      (j.toLong, acc / 1e9 * 0.5) // 1/sqrt(4)
    }
    assert(got.toSeq == expect, s"$got != $expect")
    // identical output regardless of input partitioning (stateless matrix)
    val a = Similarity.randomProjectPortable(emb, "vec_id", "embedding", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.randomProjectPortable(emb.repartition(7), "vec_id", "embedding", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("clusterAgreement: NMI hits 1 on relabelings, 0 on independence") {
    import spark.implicits._
    def frame(rows: (Long, Int)*) = rows.toDF("id", "v")
    val truth = frame(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1)
    // a pure relabeling (0<->7, 1<->9) is a perfect clustering: NMI = 1
    val relabeled = frame(1L -> 7, 2L -> 7, 3L -> 9, 4L -> 9)
    val perfect = Similarity.clusterAgreement(
        relabeled, "id", "v", truth, "v").head()
    assert(perfect.getDouble(4) == 1.0 && perfect.getDouble(5) == 1.0,
      s"$perfect")
    // one cluster containing everything carries zero information
    val collapsed = frame(1L -> 5, 2L -> 5, 3L -> 5, 4L -> 5)
    val zero = Similarity.clusterAgreement(
        collapsed, "id", "v", truth, "v").head()
    assert(zero.getDouble(1) == 0.0 && zero.getDouble(4) == 0.0, s"$zero")
    assert(zero.getDouble(5) == 0.0, s"collapsed ARI: $zero")
    // balanced but independent: each cluster splits every label evenly
    val indep = frame(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1)
    val ind = Similarity.clusterAgreement(
        indep, "id", "v", truth, "v").head()
    assert(ind.getDouble(4) == 0.0, s"$ind")
    // worse than chance: ARI goes negative where NMI cannot
    assert(ind.getDouble(5) == -0.5, s"independent ARI: $ind")
    assert(ind.getLong(0) == 4)
  }

  test("lloydIterate: one round re-assigns to the true nearest mean") {
    import spark.implicits._
    // two tight groups, one point mislabeled: a Lloyd round must move
    // it to the cluster whose mean it is nearest
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(0.2f, 0.0f), 0), (3L, Seq(0.1f, 0.1f), 0),
      (4L, Seq(5.0f, 5.0f), 1), (5L, Seq(5.2f, 5.0f), 1),
      (6L, Seq(5.1f, 5.1f), 0)) // mislabeled
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.lloydIterate(pts, "vec_id", "embedding", "label", 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(6L) == 1)
    assert(Seq(1L, 2L, 3L).forall(out(_) == 0))
    assert(Seq(4L, 5L).forall(out(_) == 1))
  }

  test("lloydIterate converges: a fixed point stays fixed") {
    // once assignments equal label of the nearest mean, more rounds
    // change nothing
    val two = Similarity.lloydIterate(emb, "vec_id", "embedding", "label", 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val three = Similarity.lloydIterate(emb, "vec_id", "embedding", "label", 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // not asserting equality (3 rounds may still move) — but a 4th
    // round from round-3's output must equal round 3 if it was a fixed
    // point; instead assert determinism and coverage here
    assert(two.keySet == three.keySet)
    assert(two.values.toSet.subsetOf(
      emb.select("label").distinct().collect().map(_.getInt(0)).toSet))
  }

  test("semanticDedup drops within-cluster near-identicals, keeps across clusters") {
    import spark.implicits._
    // cluster 0: ids 1,2 colinear (dup), id 3 orthogonal (keep);
    // cluster 1: id 4 colinear with 1 but in another cell — kept
    val tiny = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 0), (4L, Seq(3.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedup(tiny, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == (true, None))
    assert(out(2L) == (false, Some(1L)))
    assert(out(3L) == (true, None))
    assert(out(4L) == (true, None))
  }

  test("semanticDedup drop rule matches a brute-force recomputation") {
    val t = 0.3
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", "label", t)
      .collect().map(r => (r.getLong(0),
        r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toList
    assert(out.map(_._1).toSet ==
      emb.select("vec_id").collect().map(_.getLong(0)).toSet)
    val vecs = emb.collect().map(r => r.getLong(0) ->
      (r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))).toMap
    def sim(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { case (id, keep, dupOf) =>
      val (v, c) = vecs(id)
      val earlier = vecs.filter { case (oid, (_, oc)) => oc == c && oid < id }
      val hits = earlier.filter { case (_, (ov, _)) => sim(v, ov) >= t }
      if (keep) assert(hits.isEmpty, s"id $id kept but has qualifying earlier dup")
      else assert(dupOf.contains(hits.keys.min), s"id $id dup_of $dupOf")
    }
  }

  test("mutualNearest keeps only reciprocal top-1 pairs") {
    val s = spark
    import s.implicits._
    // a1's best is b1 and vice versa (mutual); a2's best is also b1,
    // but b1 prefers a1 — so a2 pairs with nobody
    val a = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val b = Seq(
      (10L, Array(1.0f, 0.05f)), (11L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.mutualNearest(
        a, b, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("mutualNearest on identical sets pairs everyone with their twin") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f)))
    val a = vecs.toDF("vec_id", "embedding")
    val b = vecs.map { case (i, v) => (i + 100, v) }
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.mutualNearest(
        a, b, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 101L), (2L, 102L), (3L, 103L)))
  }

  test("mutualNearestBlocked tiles without broadcast and matches mutualNearest") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def side(n: Int, off: Long) = (0 until n).map(i =>
      (off + i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val a = side(40, 0L)
    val b = side(37, 1000L)
    val broad = graft.operators.Similarity.mutualNearest(
        a, b, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the scoring join shape: shuffle_replicate_nl pins a tiled
    // CartesianProduct, never a broadcast of either side (the argmax
    // checkpoint hides this stage from the operator's final plan, so
    // probe the hinted join directly)
    val probe = a.repartition(3).hint("shuffle_replicate_nl")
      .join(b.repartition(3))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct"),
      s"expected tiled CartesianProduct in:\n$plan")
    assert(!plan.contains("BroadcastExchange"))
    val got = graft.operators.Similarity.mutualNearestBlocked(
        a, b, "vec_id", "embedding", tilesPerSide = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == broad)
    assert(broad.nonEmpty)
  }

  test("hard negatives exclude same-label vectors and match filtered top-k") {
    val s = spark
    import s.implicits._
    // query 0 (label 1): 1 is nearly identical but SAME label → must
    // not appear; the top negatives are the other-label vectors by sim
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0), 1L),
      (1L, Array(0.99, 0.01, 0.0), 1L),  // same label — excluded
      (2L, Array(0.9, 0.1, 0.0), 2L),
      (3L, Array(0.5, 0.5, 0.0), 2L),
      (4L, Array(0.0, 1.0, 0.0), 3L))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.hardNegativesBatch(
        vecs, "vec_id", "embedding", "label", Seq(0L), k = 2)
      .orderBy(org.apache.spark.sql.functions.col("sim").desc).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 2L), (3L, 2L)))
  }

  test("classSeparation: tight cluster scores 1.0, orthogonal pair 0.707107") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Array(1.0, 0.0), 1L), (2L, Array(2.0, 0.0), 1L), // colinear
      (3L, Array(1.0, 0.0), 2L), (4L, Array(0.0, 1.0), 2L)) // orthogonal
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.classSeparation(df, "embedding", "label")
      .orderBy("label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == ((1L, 2L, 1.0, 1.0)))
    // cos(v, v1+v2) for orthogonal unit vectors = 1/sqrt(2)
    assert(out(1)._2 == 2L && out(1)._3 == 0.707107 && out(1)._4 == 0.707107)
  }

  test("kmeansLloyd: separable blobs recover exactly, SSE non-increasing") {
    val s = spark
    import s.implicits._
    // two tight 2-d blobs far apart; k=2 seeds are ids 1,2 (one per blob)
    val rows = Seq(
      (1L, Seq(0.0f, 0.1f)), (3L, Seq(0.1f, 0.0f)), (5L, Seq(0.0f, 0.0f)),
      (2L, Seq(9.0f, 9.1f)), (4L, Seq(9.1f, 9.0f)), (6L, Seq(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansLloyd(rows, "vec_id", "embedding",
        k = 2, iters = 2)
      .orderBy("cluster").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 3L)) // 3 points each
    assert(out(0).getLong(3) == 1L && out(1).getLong(3) == 2L)
    // one Lloyd update must not increase total SSE vs zero updates
    def sse(iters: Int) = Similarity.kmeansLloyd(rows, "vec_id",
      "embedding", k = 2, iters = iters).collect().map(_.getDouble(2)).sum
    assert(sse(2) <= sse(0) + 1e-9)
    // deterministic under repartitioning
    val again = Similarity.kmeansLloyd(rows.repartition(5), "vec_id",
      "embedding", k = 2, iters = 2).orderBy("cluster").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("kmeansLloyd: an emptied cluster surfaces with n=0, never vanishes") {
    val s = spark
    import s.implicits._
    // all vectors identical: both seeds coincide, ties go to cluster 1,
    // cluster 2 is empty every round — it must keep its carried
    // centroid and appear in the output as n=0 (NULL sse/min_id)
    // rather than silently shrinking k
    val rows = (1L to 4L).map(i => (i, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansLloyd(rows, "vec_id", "embedding",
        k = 2, iters = 2)
      .orderBy("cluster").collect()
    assert(out.length == 2, s"cluster vanished: ${out.mkString(",")}")
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 4L &&
      out(0).getLong(3) == 1L)
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 0L &&
      out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("mmrRerank: low lambda promotes the diverse hit over the near-dup") {
    val s = spark
    import s.implicits._
    // ids 1 and 2 are near-duplicates hugging the query; id 3 is
    // farther but diverse. Pure relevance (high λ) keeps 1,2,3;
    // diversity-weighted (λ=0.3) must jump the near-dup: 1,3,2.
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(1.0f, 0.05f)),
      (2L, Seq(1.0f, 0.06f)),
      (3L, Seq(0.9f, 0.35f))
    ).toDF("vec_id", "embedding")
    def picks(lambda: Double): Seq[Long] =
      Similarity.mmrRerank(rows, "vec_id", "embedding",
          queryIds = Seq(0L), nCandidates = 3, k = 3, lambda = lambda)
        .orderBy("sel_rank").collect().map(_.getLong(2)).toSeq
    assert(picks(0.9) == Seq(1L, 2L, 3L), "relevance-dominant order")
    assert(picks(0.3) == Seq(1L, 3L, 2L), "diversity-dominant order")
  }

  test("kCenterSelect: greedy farthest-point on hand-placed unit vectors") {
    val s = spark
    import s.implicits._
    // angles 0°, 45°, 90°, 180° from the seed: round 2 must take the
    // antipode (d=2), round 3 the orthogonal one (min-dist 1.0, since
    // its distance to BOTH selected centers is exactly 1)
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.7071f, 0.7071f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kCenterSelect(rows, "vec_id", "embedding",
      k = 3, seedId = 0L).orderBy("sel_rank").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (2L, 3L), (3L, 2L)))
    assert(out(0).isNullAt(2))
    assert(out(1).getDouble(2) == 2.0)
    assert(out(2).getDouble(2) == 1.0)
  }

  test("kCenterSelect: zero-norm vectors are never selected, pool can exhaust") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f)), // zero norm: not a candidate
      (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // k exceeds the valid pool: output stops after the pool is empty
    val out = Similarity.kCenterSelect(rows, "vec_id", "embedding",
      k = 5, seedId = 0L).orderBy("sel_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 2L))
  }
}
