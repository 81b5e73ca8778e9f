package graft.ingest

import graft.operators.{LruCache, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: product-quantized inverted-file ANN index (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
  * the layout a 100 TB vector corpus actually ships: the coarse
  * quantizer routes probes to cells ([[AnnIndex.writeIvf]]'s partition
  * pruning), and INSIDE each cell every vector is stored as `m` small
  * codes (one per subspace of the residual v − centroid) instead of
  * the full float array — 64-dim float32 (256 B) compresses to m = 8
  * bytes-ish codes, a 30×+ shrink, which is what lets a shortlist scan
  * stay in memory at corpus scale.
  *
  * Query = classic ADC (asymmetric distance computation): per probed
  * cell, build the m × ksub lookup table of squared distances between
  * the query's residual sub-vectors and that subspace's codebook; a
  * candidate's approximate distance is then m table lookups + adds —
  * no float vector is ever read. An optional exact rerank joins the
  * ADC shortlist back to the source embeddings (the standard
  * two-stage probe).
  *
  * All training is deterministic (seeded driver-side Lloyd's on a
  * bounded residual sample — sub-quantizers are k × subDim problems,
  * thousands of points; a cluster-wide fit per subspace would be 100%
  * overhead, the sample IS the algorithm at any corpus size).
  */
object PqIndex {

  /** Seeded Lloyd's k-means over `points` (driver-side: the input is a
    * bounded SAMPLE by construction). Deterministic: seeded distinct
    * init, fixed iterations, empty clusters keep their centroid, ties
    * go to the lowest centroid index.
    */
  private[ingest] def lloyd(
      points: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot fit a codebook on zero points")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    // init: sample k distinct-ish rows (duplicates allowed only when
    // fewer distinct points than k — harmless, they become empty cells)
    val init = rnd.shuffle(points.indices.toVector).take(k)
    val centroids = Array.tabulate(math.min(k, points.length))(i =>
      points(init(i)).clone())
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < points.length) {
        val v = points(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val ct = centroids(c)
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - ct(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      p = 0
      while (p < points.length) {
        val v = points(p); val a = assign(p)
        var j = 0
        while (j < dim) { sums(a)(j) += v(j); j += 1 }
        counts(a) += 1
        p += 1
      }
      var c = 0
      while (c < centroids.length) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } // empty cluster: keep previous centroid (deterministic)
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** Nearest codebook entry for one sub-vector (lowest index wins ties). */
  private def nearest(cb: Array[Array[Double]], v: Array[Double],
      off: Int, subDim: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val ct = cb(c)
      var d = 0.0; var j = 0
      while (j < subDim) { val t = v(off + j) - ct(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train the coarse quantizer + per-subspace residual codebooks and
    * persist the corpus as (id, codes) partitioned by cell, with
    * `_centroids` / `_codebooks` / `_meta` sidecars. The full vector is
    * NOT stored in the index — that is the point of PQ; rerank reads
    * the source corpus instead.
    */
  def writeIvfPq(
      embeddings: DataFrame, idCol: String, vecCol: String, path: String,
      numCentroids: Int = 16, m: Int = 8, ksub: Int = 16,
      sampleRows: Int = 20000, seed: Long = 42L): String = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    import spark.implicits._
    val featured = embeddings.withColumn("features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = Similarity.coarseQuantizer(featured, numCentroids)
    val cents = model.clusterCenters.map(_.toArray)
    val dim = cents.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val bcCents = spark.sparkContext.broadcast(cents)
    val assigned = model.transform(featured)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"),
        col("prediction").cast("int"))
      .as[(Long, Array[Double], Int)]
    val residuals = assigned.mapPartitions { it =>
      val cs = bcCents.value
      it.map { case (id, v, cell) =>
        val c = cs(cell)
        val r = new Array[Double](v.length)
        var j = 0
        while (j < v.length) { r(j) = v(j) - c(j); j += 1 }
        (id, cell, r)
      }
    }
    // bounded deterministic sample for codebook training: order by a
    // hash of the id so the sample is partitioning-independent
    val n = residuals.count()
    val sample = residuals.toDF("id", "cell", "r")
      .orderBy(pmod(xxhash64(col("id")), lit(1000003L)), col("id"))
      .limit(sampleRows)
      .select("r").as[Array[Double]].collect()
    val codebooks = Array.tabulate(m) { s =>
      val pts = sample.map(r => java.util.Arrays.copyOfRange(r, s * subDim, (s + 1) * subDim))
      lloyd(pts, ksub, iters = 10, seed = seed + s)
    }
    val bcCb = spark.sparkContext.broadcast(codebooks)
    residuals.mapPartitions { it =>
      val cb = bcCb.value
      it.map { case (id, cell, r) =>
        val codes = new Array[Int](cb.length)
        var s = 0
        while (s < cb.length) {
          codes(s) = nearest(cb(s), r, s * (r.length / cb.length), r.length / cb.length)
          s += 1
        }
        (id, cell, codes)
      }
    }.toDF(idCol, "cell", "codes")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, code) => (s, code, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_codebooks")
    Seq((dim, m, ksub, n)).toDF("dim", "m", "ksub", "n_rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
    path
  }

  /** ADC probe: route to `nProbes` cells, scan only their partitions,
    * score candidates by table lookups over their codes, return the
    * `k` smallest approximate squared distances. With `rerank` set to
    * the source embeddings frame, the ADC shortlist (`shortlist` ≥ k
    * candidates) is joined back to the true vectors and re-scored
    * exactly — output is then exact distances over a PQ-selected
    * candidate set.
    */
  def ivfPqTopK(
      spark: SparkSession, indexPath: String, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, nProbes: Int = 2,
      excludeId: Option[Long] = None,
      rerank: Option[DataFrame] = None, shortlist: Int = 100): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$indexPath/_meta").collect().head
    val (dim, m, ksub) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val subDim = dim / m
    val centroids = spark.read.parquet(s"$indexPath/_centroids")
      .collect()
      .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Double]](1).toArray))
      .sortBy(_._1)
    val codebooks: Array[Array[Array[Double]]] = {
      val rows = spark.read.parquet(s"$indexPath/_codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1),
          r.getAs[scala.collection.Seq[Double]](2).toArray))
      val out = Array.ofDim[Array[Double]](m, ksub)
      rows.foreach { case (s, c, v) => out(s)(c) = v }
      out.map(_.map(v => if (v == null) Array.fill(subDim)(Double.MaxValue / (2 * m)) else v))
    }
    val probes = centroids.map { case (cell, c) =>
      var d = 0.0; var i = 0
      while (i < c.length) { val t = c(i) - queryVec(i); d += t * t; i += 1 }
      (cell, d)
    }.sortBy(_._2).take(nProbes).map(_._1)
    // per-cell ADC tables: LUT(cell)(s * ksub + code) = ||qres_s - cb_s(code)||²
    val luts: Map[Int, Array[Double]] = probes.map { cell =>
      val c = centroids(cell)._2
      val qres = new Array[Double](dim)
      var j = 0
      while (j < dim) { qres(j) = queryVec(j) - c(j); j += 1 }
      val lut = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var code = 0
        while (code < ksub) {
          val cb = codebooks(s)(code)
          var d = 0.0; var t = 0
          while (t < subDim) {
            val x = qres(s * subDim + t) - cb(t); d += x * x; t += 1
          }
          lut(s * ksub + code) = d
          code += 1
        }
        s += 1
      }
      cell -> lut
    }.toMap
    val bcLut = spark.sparkContext.broadcast(luts)
    val idx = spark.read.parquet(indexPath)
      .filter(col("cell").isin(probes.toSeq: _*))
    val base = excludeId match {
      case Some(id) => idx.filter(col(idCol) =!= id)
      case None     => idx
    }
    val scored = base
      .select(col(idCol).cast("long"), col("cell").cast("int"), col("codes"))
      .as[(Long, Int, Array[Int])]
      .mapPartitions { it =>
        val tables = bcLut.value
        it.map { case (id, cell, codes) =>
          val lut = tables(cell)
          var d = 0.0; var s = 0
          while (s < codes.length) { d += lut(s * ksub + codes(s)); s += 1 }
          (id, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        }
      }
      .toDF(idCol, "approx_dist")
    rerank match {
      case None =>
        scored.orderBy(col("approx_dist"), col(idCol)).limit(k)
      case Some(src) =>
        val short = scored.orderBy(col("approx_dist"), col(idCol))
          .limit(math.max(k, shortlist))
        val qLit = array(queryVec.toSeq.map(v => lit(v)): _*)
        // shortlist is ≤ `shortlist` rows — broadcast it into the source
        // join so the corpus side stays a pruned semi-join scan
        src.join(broadcast(short), idCol)
          .select(col(idCol),
            round(Similarity.cosineFast(spark, col(vecCol), qLit), 6)
              .as("sim"))
          .orderBy(col("sim").desc, col(idCol))
          .limit(k)
    }
  }

  private val built = new LruCache[String, String](64)

  /** Build-once-then-probe IVF-PQ index for a named corpus. */
  def pqIndexFor(
      embeddings: DataFrame, idCol: String, vecCol: String, tag: String,
      numCentroids: Int = 16, m: Int = 8, ksub: Int = 16): String =
    built.getOrElseUpdate(s"pq/$tag/$numCentroids/$m/$ksub") {
      writeIvfPq(embeddings, idCol, vecCol,
        s"${System.getProperty("java.io.tmpdir")}/graft-ann/$tag/pq$numCentroids-$m-$ksub",
        numCentroids, m, ksub)
    }
}
