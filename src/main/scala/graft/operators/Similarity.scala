package graft.operators

import graft.operators.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale design (100 TB):
  *  - dot products / norms are pure array expressions (zip_with +
  *    aggregate) in double precision — codegen'd, deterministic
  *    (sequential fold = reproducible bit-for-bit, unlike a shuffle-order
  *    dependent sum).
  *  - brute-force top-k broadcasts the QUERY vector (one row), never the
  *    corpus: one narrow scan + TakeOrdered. That is the exact baseline.
  *  - the scale path buckets vectors with random-hyperplane LSH so a
  *    query probes only its bucket — candidates shrink by ~2^bits; the
  *    same verify (exact cosine) runs on the survivors.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd cosine via the native [[graft.expressions.CosineSimilarity]]
    * expression — identical values to [[cosine]], one fused loop instead
    * of interpreted HOF lambdas. Registers the function on first use.
    */
  def cosineFast(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    graft.expressions.GraftFunctions.register(spark)
    call_function("cosine_sim", a, b)
  }

  /** Per-label embedding cohesion report — the "are my class clusters
    * tight" diagnostic run after training or labeling: per label, the
    * member count plus the mean and minimum cosine of members to their
    * label centroid. A label whose min_cos is far below its avg_cos
    * contains outliers (mislabeled or polysemous examples).
    *
    * Exactness discipline: the "centroid" is the per-dimension EXACT
    * DECIMAL SUM vector, not the mean — cosine is scale-invariant, so
    * cos(v, Σ) ≡ cos(v, Σ/n) and no order-sensitive float mean ever
    * forms. Per-member cosines round to 6 dp; the label mean then
    * sums those as DECIMAL(18,6) (order-independent) before its one
    * double division. One posexplode aggregate (|labels|·dim rows),
    * centroids broadcast, one label-scale aggregate.
    */
  def classSeparation(
      embeddings: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val cents = embeddings
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_pos", "_v")))
      .groupBy(col("label"), col("_pos"))
      .agg(sum(col("_v").cast(dec)).as("_c"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_c")))),
        s => s.getField("_c").cast("double")).as("_cvec"))
    val j = embeddings
      .select(col(labelCol).cast("long").as("label"),
        col(vecCol).cast("array<double>").as("_v"))
      .join(broadcast(cents), Seq("label"))
      .select(col("label"), Numerics.roundz(cosine(col("_v"), col("_cvec")), 6).as("_cos"))
    j.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        Numerics.roundz(sum(col("_cos").cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double") /
          count(lit(1)), 6).as("avg_cos"),
        min(col("_cos")).as("min_cos"))
  }

  /** Deterministic Lloyd k-means over the embedding corpus — the
    * clustering primitive under SemDeDup-style semantic curation and
    * IVF coarse quantizers, made ORACLE-REPLAYABLE: seeds are the k
    * lowest-id vectors (no RNG), assignment is argmin of the
    * index-order-folded squared distance with ties to the lower
    * cluster id (a `min(struct(dist, cluster))` — total), and new
    * centroids are per-dimension DECIMAL(28,10)-exact sums divided
    * once in double. Every iteration is one broadcast of k vectors
    * against the corpus plus one dim-keyed aggregate — no corpus
    * self-join, no driver loop over rows (the `iters` loop is plan
    * construction, k·dims rows collected nowhere).
    *
    * Output after `iters` Lloyd updates + final assignment: per
    * cluster (n, SSE via per-row DECIMAL(18,6) exact sum, min id).
    */
  def kmeansLloyd(
      embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 2): DataFrame = {
    require(k > 0 && iters >= 0, s"bad k=$k iters=$iters")
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val e = embeddings.select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
    def dist2(v: Column, c: Column): Column =
      aggregate(zip_with(v, c, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
    def assign(cents: DataFrame): DataFrame =
      e.crossJoin(broadcast(cents))
        .select(col("_id"), col("_v"),
          struct(dist2(col("_v"), col("_cv")).as("_d"), col("_c"))
            .as("_dc"))
        .groupBy(col("_id"))
        .agg(min(col("_dc")).as("_m"), first(col("_v")).as("_v"))
        .select(col("_id"), col("_v"),
          col("_m").getField("_c").as("_c"),
          col("_m").getField("_d").as("_d"))
    var cents = e.orderBy(col("_id")).limit(k)
      .select(row_number().over(Window.orderBy(col("_id"))).cast("long")
        .as("_c"), col("_v").as("_cv"))
    for (_ <- 1 to iters) {
      val a = assign(cents)
      val updated = a
        .select(col("_c"), posexplode(col("_v")).as(Seq("_pos", "_x")))
        .groupBy(col("_c"), col("_pos"))
        .agg(sum(col("_x").cast(dec)).as("_s"), count(lit(1)).as("_n"))
        .groupBy(col("_c"))
        .agg(transform(
          array_sort(collect_list(struct(col("_pos"), col("_s"),
            col("_n")))),
          s => s.getField("_s").cast("double") /
            s.getField("_n").cast("double")).as("_cv"))
      // a cluster whose membership empties this round keeps its
      // previous centroid (k-row left join — the M-step groupBy only
      // covers ASSIGNED clusters, so without this the output would
      // silently shrink below k with no indication to the caller)
      cents = cents.select(col("_c"), col("_cv").as("_cv_prev"))
        .join(updated.withColumnRenamed("_cv", "_cv_new"), Seq("_c"), "left")
        .select(col("_c"),
          coalesce(col("_cv_new"), col("_cv_prev")).as("_cv"))
    }
    // left join from the k-row centroid frame so a cluster that ends
    // empty still SURFACES (n=0, NULL sse/min_id) instead of silently
    // shrinking the output below k
    val summary = assign(cents)
      .groupBy(col("_c").as("cluster"))
      .agg(count(lit(1)).as("n"),
        Numerics.roundz(
          sum(col("_d").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .cast("double"), 4).as("sse"),
        min(col("_id")).as("min_id"))
    cents.select(col("_c").as("cluster"))
      .join(broadcast(summary), Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("n"), lit(0L)).as("n"),
        col("sse"), col("min_id"))
  }

  /** Exact top-k nearest neighbours of one stored vector, brute force.
    * The query vector is collected (one row) and inlined as a literal —
    * the corpus side never shuffles; the plan is scan → project →
    * TakeOrderedAndProject.
    */
  def topKCosine(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol)).collect().head
      .getAs[scala.collection.Seq[Float]](0)
    val qLit = array(q.toSeq.map(v => lit(v)): _*)
    embeddings
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        Numerics.roundz(cosineFast(embeddings.sparkSession, col(vecCol), qLit), 6).as("sim"))
      // zero-norm vectors have no defined cosine — skip them, matching
      // the batch kernel; without this Spark ranks NaN FIRST (NaN is
      // greatest in its sort order) and a zero-norm row would sit atop
      // every top-k (surfaced by truncated prefixes, where zero-norm
      // slices of nonzero vectors are possible)
      .filter(!isnan(col("sim")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k for a BATCH of stored query vectors in ONE pass over
    * the corpus — the training-pipeline shape (dedupe a candidate set
    * against the corpus, kNN-label a batch, ...). The query matrix
    * broadcasts; each partition keeps a k-bounded insertion list per
    * query; the final merge ranks partitions×queries×k rows — corpus
    * never shuffles, result exact. Scoring matches [[topKCosine]]:
    * cosine in double precision, 6-dp HALF_UP rounding, ties broken by
    * ascending id.
    */
  def topKCosineBatch(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val queries = rows.filter(r => queryIds.contains(r._1)).collect().sortBy(_._1)
    val qNorms = queries.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((queries, qNorms))
    val partial = rows.mapPartitions { it =>
      val (qs, qn) = bc.value
      // per-query top-k as sorted insertion lists (k is small)
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.ArrayBuffer.empty[(Double, Long)])
      it.foreach { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val vn = math.sqrt(s)
        var qi = 0
        while (qi < qs.length) {
          val (qid, qv) = qs(qi)
          if (qid != id) {
            var d = 0.0; var j = 0
            while (j < v.length) { d += v(j) * qv(j); j += 1 }
            val denom = vn * qn(qi)
            // zero-norm vectors have no defined cosine: skip, matching
            // the expression/oracle behaviour (NaN fails every filter)
            val sim = if (denom == 0.0) Double.NaN
              else BigDecimal(d / denom)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            val h = heaps(qi)
            // keep if better than the current k-th (sim desc, id asc)
            if (!sim.isNaN && (h.size < k || sim > h.last._1 ||
                (sim == h.last._1 && id < h.last._2))) {
              val at = h.indexWhere { case (hs, hid) =>
                sim > hs || (sim == hs && id < hid) }
              if (at < 0) h.append((sim, id)) else h.insert(at, (sim, id))
              if (h.size > k) h.remove(k)
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (sim, id) => (qs(qi)._1, id, sim) }
      }
    }.toDF("query_id", idCol, "sim")
    // final merge: partitions×queries×k rows — a trivial ranking
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    partial.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Hard-negative mining for contrastive training (the in-batch-
    * negatives upgrade): for each query, the k MOST similar vectors
    * whose label DIFFERS from the query's — near the anchor in
    * embedding space but semantically wrong, exactly the examples a
    * retrieval/rerank model learns most from. Same broadcast-queries /
    * per-partition-top-k kernel as [[topKCosineBatch]] (zero wide
    * shuffles; the merge ranks partitions×queries×k rows), with the
    * label-mismatch test INSIDE the scan so same-label vectors never
    * occupy heap slots. Scoring, rounding, and (sim desc, id asc)
    * tie-break match [[topKCosine]], so the gate replays in SQL.
    */
  def hardNegativesBatch(
      embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryIds: Seq[Long], k: Int): DataFrame = {
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"),
        col(labelCol).cast("long"))
      .as[(Long, Array[Double], Long)]
    val queries = rows.filter(r => queryIds.contains(r._1))
      .collect().sortBy(_._1)
    val qNorms = queries.map { case (_, v, _) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((queries, qNorms))
    val partial = rows.mapPartitions { it =>
      val (qs, qn) = bc.value
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long)])
      it.foreach { case (id, v, lbl) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val vn = math.sqrt(s)
        var qi = 0
        while (qi < qs.length) {
          val (qid, qv, qlbl) = qs(qi)
          if (qid != id && lbl != qlbl) {
            var d = 0.0; var j = 0
            while (j < v.length) { d += v(j) * qv(j); j += 1 }
            val denom = vn * qn(qi)
            val sim = if (denom == 0.0) Double.NaN
              else BigDecimal(d / denom)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            val h = heaps(qi)
            if (!sim.isNaN && (h.size < k || sim > h.last._1 ||
                (sim == h.last._1 && id < h.last._2))) {
              val at = h.indexWhere { case (hs, hid, _) =>
                sim > hs || (sim == hs && id < hid) }
              if (at < 0) h.append((sim, id, lbl))
              else h.insert(at, (sim, id, lbl))
              if (h.size > k) h.remove(k)
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (sim, id, lbl) => (qs(qi)._1, id, lbl, sim) }
      }
    }.toDF("query_id", idCol, "neg_label", "sim")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    partial.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Matryoshka retrieval (Kusupati 2022 MRL): rank by cosine over the
    * FIRST `dims` coordinates only. MRL-trained embeddings concentrate
    * information in prefixes, so a d/4 prefix preserves most of the
    * ranking at a quarter of the scan bandwidth and distance FLOPs —
    * the standard cheap first pass in front of a full-dimension rerank
    * (the IVF-PQ ADC shape, but with zero index build).
    *
    * Cosine is scale-invariant, so no renormalization of the truncated
    * vectors is needed; scoring/rounding/tie-break match [[topKCosine]]
    * exactly, and the `sim_matryoshka_topk` gate replays the slice +
    * cosine in DuckDB (`v[1:dims]`) under the hash. At 100 TB the win
    * is column bytes: store the prefix as its own parquet column (or
    * rely on nested-column pruning of a fixed-size list) and the
    * first-pass scan reads dims/d of the embedding bytes.
    */
  def topKCosineTruncated(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, dims: Int): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    val sliced = embeddings.select(col(idCol),
      slice(col(vecCol), 1, dims).as(vecCol))
    topKCosine(sliced, idCol, vecCol, queryId, k)
  }

  /** Unit-length (L2) normalization of the embedding column — the
    * standard pre-step that turns cosine into a plain dot product
    * downstream (and makes the ANN layouts' inner products comparable).
    * Pure column expressions (HOFs are fine at per-vector arity — the
    * interpreted-lambda cost bites at minhash-permutation volume, not
    * dim-64 element maps); zero vectors map to the zero vector rather
    * than NaN. `roundTo` rounds each element for cross-engine
    * comparisons (the oracle convention); pass None for full precision.
    */
  def normalizeUnit(
      df: DataFrame, vecCol: String, outCol: String = "unit",
      roundTo: Option[Int] = Some(6)): DataFrame = {
    // hoist the norm to its own column: referencing the aggregate
    // expression inside the per-element lambda re-evaluates the whole
    // Σx² fold PER ELEMENT (dim× the work, interpreted HOFs on top)
    val n = col("_nrm")
    val elem: Column => Column = x => roundTo match {
      case Some(p) => round(x.cast("double") / n, p)
      case None => x.cast("double") / n
    }
    df.withColumn("_nrm", norm(col(vecCol)))
      .withColumn(outCol,
        when(n === 0.0, transform(col(vecCol), _ => lit(0.0)))
          .otherwise(transform(col(vecCol), elem)))
      .drop("_nrm")
  }

  /** Symmetric per-vector int8 scalar quantization — the storage/IO
    * compression step for embedding columns at corpus scale: 4× smaller
    * than float32 on disk and over the wire (the PQ index compresses
    * further but is lossy per-subspace; int8 keeps per-element error
    * ≤ scale/254). code_i = round(x_i · 127 / max|x|) ∈ [−127, 127]
    * with one float scale per vector; the all-zero vector quantizes to
    * zero codes with scale 0. Scan-local projection — no shuffle; both
    * the scale (a max, not an accumulation) and the codes (rounded
    * element-wise double arithmetic) are order-independent, so the gate
    * runs under the full oracle.
    */
  def quantizeInt8(
      df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = col("_scale")
    val absMax: Column => Column = v =>
      aggregate(transform(v, x => abs(x.cast("double"))), lit(0.0d),
        (acc, x) => greatest(acc, x))
    df.withColumn("_scale", absMax(col(vecCol)))
      .select(col(idCol), s.as("scale"),
        when(s === 0.0,
          transform(col(vecCol), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") * 127.0 / s, 0).cast("tinyint")))
          .as("codes"))
  }

  /** Inverse of [[quantizeInt8]]: x̂_i = code_i · scale / 127. */
  def dequantizeInt8(
      df: DataFrame, codesCol: String, scaleCol: String,
      outCol: String = "approx"): DataFrame =
    df.withColumn(outCol,
      transform(col(codesCol),
        c => c.cast("double") * col(scaleCol) / 127.0))

  /** Random projection (Johnson–Lindenstrauss) to `outDim` dimensions:
    * y = Rᵀx with R a dense ±1/√outDim sign matrix derived STATELESSLY
    * from (seed, i, j) — every task regenerates the same matrix from
    * the closure, nothing is shuffled or stored, and the operator is
    * deterministic across runs/partitionings. The per-partition kernel
    * caches the materialized matrix and runs the fused multiply loop in
    * JVM code ([[Dedup.minhashSignatures]] lesson). Distances/cosines
    * are preserved within the JL distortion bound (spec-asserted);
    * use as the cheap dim-reduction stage before brute-force or ANN
    * search at 100 TB scale.
    *
    * See [[randomProjectPortable]] for the md5-contract variant whose
    * result an SQL oracle can recompute exactly.
    */
  def randomProject(
      df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, seed: Long = 42L): DataFrame = {
    require(outDim > 0, "outDim must be positive")
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, scala.collection.Seq[Float])]
      .mapPartitions { it =>
        val scale = 1.0 / math.sqrt(outDim.toDouble)
        var mat: Array[Array[Double]] = Array.empty
        it.map { case (id, v) =>
          if (mat.length < v.length) {
            mat = Array.tabulate(v.length, outDim) { (i, j) =>
              if ((Dedup.hash64(s"rp:$seed:$i:$j") & 1L) == 0L) scale else -scale
            }
          }
          val out = new Array[Double](outDim)
          var i = 0
          while (i < v.length) {
            val x = v(i).toDouble
            val row = mat(i)
            var j = 0
            while (j < outDim) { out(j) += x * row(j); j += 1 }
            i += 1
          }
          (id, out)
        }
      }
      .toDF(idCol, "projected")
  }

  /** [[randomProject]] under the PORTABLE md5 contract, exact enough
    * for a hash-equality oracle:
    *  - sign(i, j) = +1 iff bit 0 of hash60(md5("r{j}:{i}")) is set
    *    (SQL: `('0x'||substr(md5('r'||j||':'||i),1,15))::BIGINT & 1`);
    *  - inputs are fixed-pointed FIRST: x_i = floor(v_i · 1e9) — floor,
    *    not round, so no half-way tie can split engines — and the
    *    accumulation Σ sign·x_i is exact 64-bit integer arithmetic,
    *    order-independent by construction;
    *  - the only float steps (÷1e9, ×1/√outDim) happen once per OUTPUT
    *    cell on identical doubles; callers apply the house 6-dp round.
    * Output: (id, pos 0-based, value) scalar rows, ready for the
    * driver comparator.
    */
  def randomProjectPortable(
      df: DataFrame, idCol: String, vecCol: String,
      outDim: Int): DataFrame = {
    require(outDim > 0, "outDim must be positive")
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, scala.collection.Seq[Float])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val scale = 1.0 / math.sqrt(outDim.toDouble)
        var mat: Array[Array[Long]] = Array.empty // mat(j)(i) ∈ {-1, +1}
        it.flatMap { case (id, v) =>
          if (mat.length < outDim || (mat.nonEmpty && mat(0).length < v.length)) {
            mat = Array.tabulate(outDim, v.length) { (j, i) =>
              if ((PortableSketches.hash60(md, s"r$j:$i") & 1L) == 1L) 1L else -1L
            }
          }
          val x = new Array[Long](v.length)
          var i = 0
          while (i < v.length) {
            x(i) = math.floor(v(i).toDouble * 1e9).toLong
            i += 1
          }
          (0 until outDim).map { j =>
            val row = mat(j)
            var acc = 0L
            var k = 0
            while (k < x.length) { acc += row(k) * x(k); k += 1 }
            (id, j.toLong, acc / 1e9 * scale)
          }
        }
      }
      .toDF(idCol, "pos", "value")
  }

  /** Element-wise mean of the vectors in each group — the pooling
    * primitive (chunk embeddings → document embedding, cluster members
    * → centroid, the IVF training step's reduce). Plan: positional
    * explode to (group, pos, val) scalars, one partial-aggregating
    * avg per (group, pos) — map-side sums collapse each partition's
    * contribution before the shuffle, so the exchange carries
    * O(groups × dim) rows regardless of corpus size — then a per-group
    * reassembly into the ordered array. No vector ever crosses the
    * wire whole; both aggregates are codegen hash aggregates.
    * The mean is a DECIMAL sum divided by the count — double addition
    * is partition-order dependent, so a plain `avg` would drift
    * between runs/engines (the repo-wide money-sum rule); the decimal
    * sum is exact and associative. `roundTo` rounds elements for
    * cross-engine comparison (oracle convention); None for full
    * precision.
    */
  def meanPool(
      df: DataFrame, groupCol: Column, vecCol: String,
      roundTo: Option[Int] = Some(6)): DataFrame = {
    val elem: Column => Column = m => roundTo match {
      case Some(p) => round(m, p)
      case None => m
    }
    df.select(groupCol.as("group"),
        posexplode(col(vecCol)).as(Seq("pos", "val")))
      .groupBy(col("group"), col("pos"))
      .agg((sum(col("val").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast("double") / count(lit(1))).as("m"))
      .groupBy(col("group"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => elem(s.getField("m"))).as("centroid"))
  }

  /** All pairs with cosine ≥ threshold — the embedding-cosine near-dup
    * check. Expression variant: exact but allocates arrays per pair; use
    * [[cosinePairsBlocked]] for the fast path (identical results).
    */
  def cosinePairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val withNorm = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("n"))
    withNorm.as("a").join(withNorm.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Block-broadcast all-pairs cosine: one side becomes a broadcast array
    * of primitive vectors; each partition streams its rows against it in
    * a tight JIT-friendly loop — no per-pair array allocation, no
    * shuffle. Dot products fold left-to-right exactly like the
    * expression variant, so results (incl. the 6-dp rounding) are
    * bit-identical. At 100 TB the broadcast side becomes a tile loop
    * (process the corpus in broadcastable chunks); the per-partition
    * kernel is unchanged.
    */
  def cosinePairsBlocked(
      embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val all = rows.collect().sortBy(_._1)
    val norms = all.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((all, norms))
    rows.mapPartitions { it =>
      val (corpus, ns) = bc.value
      it.flatMap { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val vn = math.sqrt(s)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = 0
        while (j < corpus.length) {
          val (oid, ov) = corpus(j)
          if (oid > id) {
            var d = 0.0; var k = 0
            while (k < v.length) { d += v(k) * ov(k); k += 1 }
            val denom = vn * ns(j)
            if (denom > 0.0) { // zero-norm pair: no defined cosine
              val sim = BigDecimal(d / denom)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (sim >= threshold) out += ((id, oid, sim))
            }
          }
          j += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "sim")
  }

  /** Distributed exact all-pairs cosine via block self-join — the 100 TB
    * path. Rows hash into `numBlocks` blocks; every unordered block pair
    * (i ≤ j) is a cell; each row replicates to the `numBlocks` cells it
    * belongs to; each cell computes its cross-block (or within-block when
    * i = j) pairs in one tight loop. Every (a, b) pair lives in exactly
    * one cell, so no distinct is needed. Shuffle = numBlocks× row
    * replication; peak executor memory = 2·n/numBlocks vectors; the
    * driver never holds a single vector. Dot products fold left-to-right
    * with the same 6-dp rounding as [[cosinePairs]]/[[cosinePairsBlocked]],
    * so all three variants are bit-identical.
    */
  def cosinePairsBlockJoin(
      embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBlocks: Int = 8): DataFrame = {
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"),
      pmod(xxhash64(col(idCol).cast("long")), lit(numBlocks)).cast("int").as("blk"))
    val cells = rows
      .select(col("id"), col("v"), col("blk"),
        explode(array((0 until numBlocks).map(o => lit(o)): _*)).as("o"))
      .select(col("id"), col("v"), col("blk"),
        least(col("blk"), col("o")).as("ci"),
        greatest(col("blk"), col("o")).as("cj"))
      .as[(Long, Array[Double], Int, Int, Int)]
    cells
      .groupByKey { case (_, _, _, ci, cj) => (ci, cj) }
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Long, Array[Double], Int, Int, Int)]) =>
        val (ci, cj) = key
        val buf = it.toArray.sortBy(_._1)
        val n = buf.length
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          val v = buf(i)._2
          var s = 0.0; var k = 0
          while (k < v.length) { s += v(k) * v(k); k += 1 }
          norms(i) = math.sqrt(s)
          i += 1
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        i = 0
        while (i < n) {
          val (idA, va, blkA, _, _) = buf(i)
          var j = i + 1
          while (j < n) {
            val (idB, vb, blkB, _, _) = buf(j)
            // a within-block pair in a cross cell belongs to its own
            // (b, b) cell — skip it here so each pair is emitted once
            if (ci == cj || blkA != blkB) {
              var d = 0.0; var k = 0
              while (k < va.length) { d += va(k) * vb(k); k += 1 }
              val denom = norms(i) * norms(j)
              if (denom > 0.0) { // zero-norm pair: no defined cosine
                val sim = BigDecimal(d / denom)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (sim >= threshold) out += ((idA, idB, sim))
              }
            }
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("id_a", "id_b", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 of the coordinates mapped to ±1. No stored model, fully
    * reproducible across the cluster.
    */
  private def planeSign(plane: Int, d: Int): Column =
    when(pmod(xxhash64(lit(plane), lit(d)), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** Random-hyperplane LSH bucket id (numPlanes-bit signature): bit j is
    * the sign of ⟨v, h_j⟩. Cosine-similar vectors collide with
    * probability 1 − θ/π per bit.
    *
    * Expression form — the tree is dim×numPlanes leaves, fine to a few
    * hundred dims; beyond that use [[lshBucketed]] which evaluates the
    * SAME signs in a JVM kernel.
    */
  def lshBucket(vecCol: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { j =>
      val proj = (0 until dim).map(d =>
        get(vecCol, lit(d)).cast("double") * planeSign(j, d)).reduce(_ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** The ±1 hyperplane sign matrix, evaluated ONCE through the same
    * [[planeSign]] expressions (a 1-row local projection) so kernel and
    * expression variants agree bit-for-bit.
    */
  private[graft] def planeSigns(
      spark: org.apache.spark.sql.SparkSession,
      dim: Int, numPlanes: Int): Array[Array[Double]] = {
    val row = spark.range(1)
      .select((for (j <- 0 until numPlanes; d <- 0 until dim)
        yield planeSign(j, d)): _*)
      .collect().head
    Array.tabulate(numPlanes, dim)((j, d) => row.getDouble(j * dim + d))
  }

  /** (id, vec, bucket) with the bucket computed in a per-partition JVM
    * loop — the high-dimension path ([[lshBucket]]'s expression tree is
    * dim×planes nodes; at dim 1024+ analysis and codegen choke, while
    * this kernel is a dim×planes multiply per row regardless). Identical
    * buckets to the expression variant: same sign matrix, same
    * left-to-right projection fold.
    */
  def lshBucketed(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, numPlanes: Int): DataFrame = {
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val signs = spark.sparkContext.broadcast(planeSigns(spark, dim, numPlanes))
    embeddings
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val s = signs.value
        it.map { case (id, v) =>
          var bucket = 0L
          // a vector shorter than dim null-propagates every plane's
          // projection in the expression variant → all bits 0; mirror
          // that here instead of indexing out of bounds
          if (v.length >= dim) {
            var j = 0
            while (j < s.length) {
              val row = s(j)
              var proj = 0.0
              var d = 0
              while (d < row.length) { proj += v(d) * row(d); d += 1 }
              if (proj > 0) bucket |= (1L << j)
              j += 1
            }
          }
          (id, v, bucket)
        }
      }
      .toDF(idCol, vecCol, "bucket")
  }

  /** One-time quantizer models, keyed by (dataset semantic hash, k).
    * An IVF quantizer is trained ONCE per corpus and reused across every
    * probe — refitting k-means inside each query would dominate the probe
    * cost at any scale.
    *
    * Caveats, by design: the key is the logical PLAN, not the data — a
    * corpus rewritten in place (streaming upsert + compaction) keeps
    * serving the old centroids until [[invalidateQuantizers]] is called
    * after compaction (ANN cell routing degrades gracefully with corpus
    * drift; it never affects exactness of the verify scores). The cache
    * is size-capped so a long-lived server can't pin unbounded models.
    */
  private[operators] val QuantizerCacheMax = 32
  private[operators] val quantizerCache =
    new LruCache[(Int, Int, Int), org.apache.spark.ml.clustering.KMeansModel](
      QuantizerCacheMax)

  /** Drop every cached quantizer — call after rewriting a corpus whose
    * plan (path, schema) is unchanged.
    */
  def invalidateQuantizers(): Unit = quantizerCache.clear()

  /** Nearest-centroid assignment (the E-step of distributed k-means,
    * with centroids DEFINED by a label column — per-label means):
    * each vector is assigned to the closest centroid by squared L2,
    * ties to the lower label.
    *
    * Plan: centroids are one narrow (label, pos) aggregate — the
    * shuffle carries #labels × dim partial sums after map-side
    * combine, never vectors — collected driver-side (bounded by the
    * label count, like the quantizer above) and BROADCAST back; the
    * assignment pass is a scan-local JVM kernel, so the corpus itself
    * never shuffles. The same shape serves any fixed-centroid
    * assignment (routing to a trained IVF/k-means codebook).
    */
  def centroidAssign(
      embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = embeddings
      .select(col(labelCol).cast("int").as("_lbl"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_pos", "_v")))
      .groupBy(col("_lbl"), col("_pos"))
      .agg(avg(col("_v")).as("_c"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (lbl, rows) =>
        val arr = new Array[Double](rows.length)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        (lbl, arr)
      }
      .toArray.sortBy(_._1)
    require(cents.nonEmpty, "no centroids — empty input or null labels")
    val bc = spark.sparkContext.broadcast(cents)
    embeddings
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var bestLbl = cs(0)._1
          var bestD = Double.MaxValue
          var ci = 0
          while (ci < cs.length) {
            val c = cs(ci)._2
            var d = 0.0
            var j = 0
            val n = math.min(v.length, c.length)
            while (j < n) { val t = v(j) - c(j); d += t * t; j += 1 }
            // ties to the lower label: cs is label-sorted and `<` keeps
            // the first winner
            if (d < bestD) { bestD = d; bestLbl = cs(ci)._1 }
            ci += 1
          }
          (id, bestLbl)
        }
      }
      .toDF(idCol, "assigned")
  }

  /** `iters` full Lloyd rounds of distributed k-means, starting from
    * the clustering in `labelCol` — the E+M training loop itself as
    * declarative plans (the ml.KMeans path stays for production fits;
    * this variant is ORACLE-CHECKABLE end to end and shows the loop's
    * at-scale shape explicitly):
    *
    *  - M-step: per-(cluster, pos) mean via one partial-aggregated
    *    groupBy over the posexploded corpus — decimal-exact sums cast
    *    to double only for the final divide, so centroids are
    *    bit-identical across engines and partitionings;
    *  - E-step: centroids (k × dim — kilobytes) BROADCAST back, the
    *    assignment pass is scan-local; the corpus never shuffles in
    *    either step. Driver coordinates rounds only.
    *
    * Assignment ties break to the lower cluster id. On the gate data
    * the best-vs-second-best distance gap stays ≥ 6e-6 through both
    * gated rounds — ten orders above float-sum noise, so the oracle's
    * unordered sums cannot flip an assignment.
    */
  def lloydIterate(
      embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings
      .select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .materialized
    var assigned = embeddings
      .select(col(idCol).cast("long").as("_id"),
        col(labelCol).cast("int").as("assigned"))
    var round = 0
    while (round < iters) {
      val cents = base.join(assigned, "_id")
        .select(col("assigned"), posexplode(col("_v")).as(Seq("_pos", "_val")))
        .groupBy(col("assigned"), col("_pos"))
        .agg((sum(col("_val").cast(org.apache.spark.sql.types.DecimalType(30, 12)))
          .cast("double") / count(lit(1))).as("_c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cl, rows) =>
          val arr = new Array[Double](rows.length)
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          (cl, arr)
        }
        .toArray.sortBy(_._1)
      require(cents.nonEmpty, "no centroids — empty input or null labels")
      val bc = spark.sparkContext.broadcast(cents)
      assigned = base
        .as[(Long, Array[Double])]
        .mapPartitions { it =>
          val cs = bc.value
          it.map { case (id, v) =>
            var bestLbl = cs(0)._1
            var bestD = Double.MaxValue
            var ci = 0
            while (ci < cs.length) {
              val c = cs(ci)._2
              var d = 0.0
              var j = 0
              val n = math.min(v.length, c.length)
              while (j < n) { val t = v(j) - c(j); d += t * t; j += 1 }
              if (d < bestD) { bestD = d; bestLbl = cs(ci)._1 }
              ci += 1
            }
            (id, bestLbl)
          }
        }
        .toDF("_id", "assigned")
        .materialized
      round += 1
    }
    assigned.select(col("_id").as(idCol), col("assigned"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): partition the corpus into clusters (a k-means
    * cell id — here any precomputed cluster column, e.g.
    * [[centroidAssign]]'s `assigned` or an IVF cell), then prune
    * near-identical embeddings WITHIN each cluster by pairwise cosine.
    *
    * Duplicate policy (the parallel variant of the paper's greedy
    * scan): a row is dropped iff some LOWER-id row in the same cluster
    * has cosine ≥ threshold with it; `dup_of` is the lowest such id.
    * Unlike transitive clustering this needs no iteration, and unlike
    * the paper's keep-farthest-from-centroid rule it is insensitive to
    * centroid float noise — the survivor choice depends only on ids.
    * Thresholds compare on 6-dp-rounded cosines (the repo-wide
    * convention that keeps the decision reproducible across engines).
    *
    * Scale (100 TB): ONE shuffle, keyed by the cluster id — exactly the
    * partitioning SemDeDup prescribes (the paper's k is chosen so cells
    * are small: ~|corpus|/k rows each). The per-cell kernel sorts by id
    * and early-exits each row's scan at its FIRST qualifying earlier
    * neighbour, so heavily-duplicated cells cost O(n) comparisons after
    * the first survivors, not O(n²). A cell that outgrows executor
    * memory means the quantizer's k is too small for the corpus — refit
    * with a larger k (or route the offending cell through
    * [[cosinePairsBlockJoin]]); the kernel fails loudly rather than
    * spilling quadratically.
    */
  def semanticDedup(
      embeddings: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, threshold: Double): DataFrame = {
    Dedup.requireLongCastableId(embeddings, idCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings
      .select(col(idCol).cast("long"), col(clusterCol).cast("int"),
        col(vecCol).cast("array<double>"))
      .as[(Long, Int, Array[Double])]
      .groupByKey(_._2)
      .flatMapGroups { (cluster: Int, it: Iterator[(Long, Int, Array[Double])]) =>
        val buf = it.map { case (id, _, v) => (id, v) }.toArray
        java.util.Arrays.sort(buf, Ordering.by((x: (Long, Array[Double])) => x._1))
        val n = buf.length
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          val v = buf(i)._2
          var s = 0.0; var k = 0
          while (k < v.length) { s += v(k) * v(k); k += 1 }
          norms(i) = math.sqrt(s)
          i += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[
          (Long, Int, Boolean, Option[Long], Option[Double])](n)
        i = 0
        while (i < n) {
          val (id, v) = buf(i)
          var dupOf = -1L
          var dupSim = 0.0
          var j = 0
          // ascending scan: the first hit IS the lowest qualifying id
          while (j < i && dupOf < 0) {
            val ov = buf(j)._2
            var d = 0.0
            var k = 0
            val m = math.min(v.length, ov.length)
            while (k < m) { d += v(k) * ov(k); k += 1 }
            val den = norms(i) * norms(j)
            val sim =
              if (den == 0) 0.0
              else BigDecimal(d / den)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (sim >= threshold) { dupOf = buf(j)._1; dupSim = sim }
            j += 1
          }
          out += ((id, cluster, dupOf < 0,
            if (dupOf < 0) None else Some(dupOf),
            if (dupOf < 0) None else Some(dupSim)))
          i += 1
        }
        out.iterator
      }
      .toDF(idCol, "cluster", "keep", "dup_of", "sim")
  }

  /** Fit (or fetch) the coarse quantizer for `featured`. Trains on a
    * bounded SAMPLE (≤ maxTrainRows, fixed seed): centroid quality needs
    * thousands of points per cell, not the corpus — at 100 TB a
    * full-corpus fit is a scale-killer, a 100k-row sampled fit is
    * seconds, and the model broadcasts to every probe.
    */
  private[graft] def coarseQuantizer(
      featured: DataFrame, numCentroids: Int,
      maxTrainRows: Long = 100000L): org.apache.spark.ml.clustering.KMeansModel = {
    // key = logical plan + the concrete FILES behind it + k: a corpus
    // compacted/rewritten into new files invalidates naturally (new file
    // names -> new key); only a byte-level in-place overwrite still
    // needs [[invalidateQuantizers]]
    val key = (featured.queryExecution.analyzed.semanticHash(),
      java.util.Arrays.hashCode(
        featured.inputFiles.sorted.asInstanceOf[Array[AnyRef]]),
      numCentroids)
    quantizerCache.getOrElseUpdate(key) {
      val n = featured.count()
      val train =
        if (n <= maxTrainRows) featured
        else featured.sample(withReplacement = false,
          fraction = maxTrainRows.toDouble / n, seed = 42L)
      // a coarse quantizer only routes probes — half the default
      // iterations is ample for cell assignment quality
      new org.apache.spark.ml.clustering.KMeans()
        .setK(numCentroids).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("features").fit(train)
    }
  }

  /** IVF (inverted-file) ANN, IN-MEMORY variant: k-means coarse
    * quantizer partitions the corpus into `numCentroids` cells; a query
    * probes only its `nProbes` nearest cells and ranks those candidates
    * by exact cosine. Cell assignment is recomputed per query here — the
    * ad-hoc / exploratory path. The serving path is
    * [[graft.ingest.AnnIndex]]: assignment persisted at ingest,
    * partitioned by cell, so a probe PRUNES to nProbes/numCentroids of
    * the data instead of re-scanning the corpus (probe results exactly
    * equal, AnnIndexSpec).
    */
  def ivfTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int,
      numCentroids: Int = 16, nProbes: Int = 2): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val featured = embeddings.withColumn("features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = coarseQuantizer(featured, numCentroids)
    val assigned = model.transform(featured) // adds 'prediction' cell id
    val qRow = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol)).collect().head
    val qVec = qRow.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray
    // nearest nProbes cells to the query, by euclidean distance to centroid
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nProbes).map(_._1).toSeq
    val qLit = array(qVec.toSeq.map(v => lit(v)): _*)
    assigned
      .filter(col("prediction").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol),
        Numerics.roundz(cosineFast(embeddings.sparkSession, col(vecCol), qLit), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Bucketed ANN, IN-MEMORY variant: assign every vector a bucket, then
    * answer the query from its own bucket only (single-probe). Returns
    * the approximate top-k with exact cosine scores among candidates.
    * The serving path is [[graft.ingest.AnnIndex.lshTopK]] over a
    * bucket-partitioned persisted layout (identical results).
    */
  def annTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, dim: Int, numPlanes: Int = 8): DataFrame = {
    val bucketed = embeddings.withColumn("bucket",
      lshBucket(col(vecCol), dim, numPlanes))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol), col("bucket")).collect().head
    val qVec = q.getAs[scala.collection.Seq[Float]](0)
    val qBucket = q.getLong(1)
    val qLit = array(qVec.toSeq.map(v => lit(v)): _*)
    bucketed
      .filter(col("bucket") === qBucket && col(idCol) =!= queryId)
      .select(col(idCol),
        Numerics.roundz(cosineFast(embeddings.sparkSession, col(vecCol), qLit), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Clustering-vs-ground-truth agreement: mutual information, the two
    * entropies, normalized mutual information
    * NMI = MI / √(H(labels)·H(clusters)) (Strehl & Ghosh 2002), and the
    * adjusted Rand index ARI (Hubert & Arabie 1985) — the two standard
    * external clustering evaluations. One row out.
    *
    * Every probability is a ratio of exact integer counts — the ARI's
    * pair counts Σ C(·,2) stay INTEGER until the final two divisions;
    * the log terms use one fixed association mirrored by the SQL
    * oracle, and the ≤ |labels|·|clusters| summations are 4-dp-rounded
    * (the LM-gate discipline — summation-order noise sits at 1e-15).
    * Plan: one corpus-scale groupBy to the contingency cells;
    * marginals, entropies, and the fusion are all vocabulary-bounded
    * frames glued by broadcast 1-row crossJoins.
    */
  def clusterAgreement(
      assign: DataFrame, idCol: String, clusterCol: String,
      truth: DataFrame, labelCol: String): DataFrame = {
    val joined = assign
      .select(col(idCol), col(clusterCol).cast("string").as("c"))
      .join(truth.select(col(idCol), col(labelCol).cast("string").as("l")),
        idCol)
    // the contingency table is the ONLY corpus-scale computation —
    // materialize it once (≤ |labels|·|clusters| rows) so the seven
    // downstream aggregates don't re-run the assignment pipeline
    val cells = joined.groupBy(col("c"), col("l"))
      .agg(count(lit(1)).as("nlc"))
      .materialized
    val nTot = cells.agg(sum(col("nlc")).as("n"))
    val cm = cells.groupBy(col("c")).agg(sum(col("nlc")).as("nc"))
    val lm = cells.groupBy(col("l")).agg(sum(col("nlc")).as("nl"))
    val mi = cells.join(cm, "c").join(lm, "l").crossJoin(broadcast(nTot))
      .agg(sum((col("nlc") * lit(1.0) / col("n")) *
        log(col("n") * col("nlc") * lit(1.0) / (col("nc") * col("nl"))))
        .as("mi"))
    val pairCells = cells
      .agg(sum(expr("nlc * (nlc - 1) div 2")).as("sc"))
    val pairC = cm.agg(sum(expr("nc * (nc - 1) div 2")).as("sa"))
    val pairL = lm.agg(sum(expr("nl * (nl - 1) div 2")).as("sb"))
    val hc = cm.crossJoin(broadcast(nTot))
      .agg((-sum((col("nc") * lit(1.0) / col("n")) *
        log(col("nc") * lit(1.0) / col("n")))).as("h_cluster"))
    val hl = lm.crossJoin(broadcast(nTot))
      .agg((-sum((col("nl") * lit(1.0) / col("n")) *
        log(col("nl") * lit(1.0) / col("n")))).as("h_label"))
    // ARI = (sc − sa·sb/C(n,2)) / ((sa+sb)/2 − sa·sb/C(n,2));
    // sc/sa/sb are exact integers, but sa·sb (and n·(n−1)) must be
    // computed in double: once any cluster exceeds ~80k rows the long
    // product silently wraps in non-ANSI Spark while the oracle
    // promotes to HUGEINT — cast BEFORE multiplying, same order as the
    // oracle SQL
    val expected = col("sa").cast("double") * col("sb") /
      (col("n").cast("double") * (col("n") - 1) / 2)
    val maxIdx = (col("sa").cast("double") + col("sb")) / 2
    nTot.crossJoin(broadcast(mi)).crossJoin(broadcast(hl))
      .crossJoin(broadcast(hc)).crossJoin(broadcast(pairCells))
      .crossJoin(broadcast(pairC)).crossJoin(broadcast(pairL))
      .select(col("n").cast("long").as("n_points"),
        Numerics.roundz(col("mi"), 4).as("mi"),
        Numerics.roundz(col("h_label"), 4).as("h_label"),
        Numerics.roundz(col("h_cluster"), 4).as("h_cluster"),
        Numerics.roundz(when(col("h_label") > 0 && col("h_cluster") > 0,
            col("mi") / sqrt(col("h_label") * col("h_cluster")))
          .otherwise(lit(0.0)), 4).as("nmi"),
        Numerics.roundz(when(maxIdx - expected =!= 0.0,
            (col("sc") - expected) / (maxIdx - expected))
          .otherwise(lit(0.0)), 4).as("ari"))
  }

  /** Mutual-nearest-neighbor pairs between two embedding sets — the
    * bitext/translation-pair mining shape (Artetxe & Schwenk 2019 use
    * margin scoring; plain mutual-top-1 is its exact backbone): a pair
    * survives iff each side is the other's single best match.
    * Similarities round to 6 dp with id tiebreaks, so an oracle replays
    * the double cosine bit-for-bit.
    *
    * Scale shape: B broadcasts (the query/low-resource side of bitext
    * mining is the small one by construction), and each side's top-1
    * is a map-side-combining ARGMAX aggregate (max of a (sim, −id)
    * struct — same order as a sim-desc/id-asc window, without one):
    * the A×B scored stream is never materialized or window-sorted;
    * only |A|+|B| argmax rows ever shuffle. At corpus-scale B, swap
    * the cross scoring for the persisted-ANN candidate join and keep
    * the aggregates unchanged.
    */
  def mutualNearest(
      a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val spark = a.sparkSession
    val av = a.select(col(idCol).cast("long").as("id_a"),
      col(vecCol).as("_va"))
    val bv = b.select(col(idCol).cast("long").as("id_b"),
      col(vecCol).as("_vb"))
    // ALL the scoring flops ride the A side (B broadcasts), so A's
    // partitioning IS the parallelism: a small/single-file A would pin
    // the whole A×B cosine sweep plus the argmax aggregate to ONE task
    // (the round-15 probe measured exactly that — ~2 s of a 3 s gate
    // in one core). Spread an under-partitioned A to the session's
    // parallelism (a |A|-row shuffle, trivial next to the flops); a
    // corpus-scale A already exceeds it and is left untouched.
    val par = spark.sparkContext.defaultParallelism
    val spread =
      if (av.rdd.getNumPartitions < par) av.repartition(par) else av
    mutualFromCross(spark, spread.join(broadcast(bv)))
  }

  /** [[mutualNearest]] for a B side too large to broadcast: the A×B
    * scoring is TILED instead — `shuffle_replicate_nl` pins Spark's
    * cartesian-product join, so the flops land in |Apart|·|Bpart|
    * independent tasks each holding one (A tile × B tile) block, with
    * no executor ever needing a whole side in memory. Same flop count
    * as the broadcast path (mutual-TOP-1 needs every true score; an
    * ANN prefilter that can miss the argmax would change the answer),
    * identical output bit-for-bit: the per-pair rounded cosine and the
    * (sim, −id) argmax structs are order-independent, so tiling cannot
    * reorder its way to a different result. `tilesPerSide` bounds tile
    * height ≈ |side|/tiles; size it so a tile of vectors fits an
    * executor's working memory.
    */
  def mutualNearestBlocked(
      a: DataFrame, b: DataFrame, idCol: String, vecCol: String,
      tilesPerSide: Int = 8): DataFrame = {
    require(tilesPerSide >= 1, s"tilesPerSide must be >= 1, got $tilesPerSide")
    val av = a.select(col(idCol).cast("long").as("id_a"),
      col(vecCol).as("_va")).repartition(tilesPerSide)
    val bv = b.select(col(idCol).cast("long").as("id_b"),
      col(vecCol).as("_vb")).repartition(tilesPerSide)
    mutualFromCross(a.sparkSession, av.hint("shuffle_replicate_nl").join(bv))
  }

  /** Shared mutual-top-1 tail: ONE pass over the scored stream. Each
    * (a,b) score fans into two tagged argmax candidates (side 0 keyed
    * by id_a, side 1 by id_b) BEFORE the hash aggregate, so the
    * map-side combine reduces every tile to its distinct keys and the
    * cross stream is scored exactly once — never materialized (caching
    * A×B would cost |A|·|B| rows of storage to save map-local flops;
    * the wrong trade at any scale). Only the ≤ |A|+|B|-row argmax
    * frame persists, for the two-sided filter-join.
    */
  private def mutualFromCross(
      spark: org.apache.spark.sql.SparkSession,
      cross: DataFrame): DataFrame = {
    val scored = cross.select(col("id_a"), col("id_b"),
      Numerics.roundz(cosineFast(spark, col("_va"), col("_vb")), 6)
        .as("sim"))
    val best = scored.select(explode(array(
        struct(lit(0).as("side"), col("id_a").as("k"),
          struct(col("sim"), (-col("id_b")).as("_o")).as("cand")),
        struct(lit(1).as("side"), col("id_b").as("k"),
          struct(col("sim"), (-col("id_a")).as("_o")).as("cand"))))
        .as("t"))
      .select(col("t.side").as("side"), col("t.k").as("k"),
        col("t.cand").as("cand"))
      .groupBy(col("side"), col("k"))
      .agg(max(col("cand")).as("m"))
      .materialized
    val bestA = best.filter(col("side") === 0)
      .select(col("k").as("id_a"), (-col("m._o")).as("id_b"),
        col("m.sim").as("sim"))
    val bestB = best.filter(col("side") === 1)
      .select((-col("m._o")).as("id_a"), col("k").as("id_b"),
        col("m.sim").as("sim"))
    bestA.join(bestB, Seq("id_a", "id_b", "sim"))
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998):
    * per query, greedily pick k results from its `nCandidates`-deep
    * relevance pool maximizing
    *
    *   λ·sim(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)
    *
    * — the standard diversity re-ranker between ANN retrieval and the
    * consumer (dedup the near-identical top hits without losing
    * relevance). Complements [[kCenterSelect]] (corpus-global
    * diversity) with the per-query form.
    *
    * Determinism contract: every cosine is 6-dp HALF_UP; the max-to-
    * selected term is the max of those rounded sims (0 for the first
    * pick); the combined score re-rounds to 6 dp; ties break by
    * ascending id. Output: (query_id, sel_rank, vec_id, score).
    *
    * Missing-query contract: a query id that yields NO candidates
    * (absent from the corpus, or a zero-norm vector) emits ZERO rows —
    * a re-ranker has nothing to rank. This differs deliberately from
    * [[Evaluation.retrievalMetrics]]/[[Evaluation.rankBiasedOverlap]],
    * which left-join from the query frame so every requested id
    * surfaces; callers needing to distinguish "no candidates" from
    * "id not in corpus" should anti-join their queryIds against the
    * output's query_id column.
    *
    * Scale shape: the relevance pool comes from [[topKCosineBatch]]
    * (broadcast queries, zero corpus shuffle); the greedy loop then
    * runs on the DRIVER over queries×nCandidates rows with their
    * vectors — a bounded collect (the centroid/codebook class), k·n²
    * driver flops per query, corpus touched exactly once.
    */
  def mmrRerank(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], nCandidates: Int, k: Int,
      lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && nCandidates >= k,
      s"need nCandidates >= k >= 1, got k=$k nCandidates=$nCandidates")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = embeddings.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e = embeddings.select(col(idCol).cast("long").as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    val cands = topKCosineBatch(embeddings, idCol, vecCol, queryIds,
        nCandidates)
      .select(col("query_id"), col(idCol).cast("long").as("_id"),
        col("sim"))
      .join(e, Seq("_id"))
      .select(col("query_id"), col("_id"), col("sim"), col("_v"))
      .as[(Long, Long, Double, Array[Double])]
      .collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) Double.NaN else r6(d / den)
    }
    val out = cands.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (qid, rows) =>
        // pool sorted by id for deterministic scans
        val pool = scala.collection.mutable.ArrayBuffer(
          rows.sortBy(_._2).map { case (_, id, sim, v) => (id, sim, v) }: _*)
        val selected = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Array[Double])]
        (1 to math.min(k, pool.size)).map { rank =>
          var bestIdx = -1
          var bestScore = Double.NegativeInfinity
          var bestId = Long.MaxValue
          var i = 0
          while (i < pool.size) {
            val (id, sim, v) = pool(i)
            val maxSel = if (selected.isEmpty) 0.0
              else selected.iterator.map(s => cos(v, s._2)).max
            val score = r6(lambda * sim - (1.0 - lambda) * maxSel)
            if (score > bestScore || (score == bestScore && id < bestId)) {
              bestIdx = i; bestScore = score; bestId = id
            }
            i += 1
          }
          val (id, _, v) = pool.remove(bestIdx)
          selected += ((id, v))
          (qid, rank.toLong, id, bestScore)
        }
    }
    out.toDF("query_id", "sel_rank", "vec_id", "score")
  }

  /** Late-interaction (MaxSim) retrieval over MULTI-VECTOR documents
    * (Khattab & Zaharia, "ColBERT", SIGIR 2020): each document carries
    * an ARRAY of token vectors; the relevance of doc d to query q is
    *
    *   score(q, d) = Σ_{t ∈ q} max_{u ∈ d} cos(t, u)
    *
    * — per query token, the best-matching doc token, summed. The
    * multi-vector shape between dense single-vector top-k
    * ([[topKCosineBatch]]) and BM25 term matching ([[HybridSearch]])
    * that modern retrieval evals expect.
    *
    * Determinism contract: each token cosine rounds to 6 dp HALF_UP;
    * the per-query-token max is over those rounded values; the sum
    * runs in DECIMAL(18,6) (exact, order-independent) and re-rounds
    * to 6 dp; ties break by ascending doc id. Zero-norm DOC tokens
    * are skipped inside the max (undefined cosine); zero-norm QUERY
    * tokens are rejected up front; a doc with no valid tokens (empty
    * array or all zero-norm) emits no rows; a doc whose id equals the
    * query id is excluded (the [[topKCosineBatch]] convention).
    *
    * Scale shape: query tokens ride the plan as LITERAL vectors onto
    * ONE corpus scan — per doc row, every (query token × doc token)
    * cosine evaluates scan-local through the codegen'd `cosine_sim`
    * and folds into per-query scores with array `aggregate` (no
    * explode of the corpus, no join, nothing shuffles but the final
    * top-k); the per-query exact top-k is the salted two-stage
    * [[Ranks.topKPerGroup]], so one hot query never serializes into a
    * single task. Output: (query_id, rank, doc_id, score), rank ≤ k.
    */
  def maxSimTopK(
      docs: DataFrame, idCol: String, tokenVecsCol: String,
      queries: Seq[(Long, Seq[Seq[Double]])], k: Int): DataFrame =
    maxSimCore(docs, idCol, tokenVecsCol, queries, k, prune = None)

  /** Pruned-scan scale path for [[maxSimTopK]] (the PLAID idea
    * restated in the repo's LSH idiom): each document's POOLED token
    * vector (element-wise sum — sign-equivalent to the mean) gets a
    * random-hyperplane bucket ([[planeSigns]] — deterministic, no
    * stored model); a query scores ONLY documents whose pooled bucket
    * is within `maxHamming` bits of its own pooled bucket. The
    * expensive per-token MaxSim fold sits behind the bucket CASE
    * guard, so pruned docs cost one pooled projection, not
    * |q tokens|×|doc tokens| cosines — and a persisted layout
    * partitioned by bucket ([[graft.ingest.AnnIndex]] discipline)
    * would prune the SCAN too. `maxHamming >= numPlanes` admits every
    * bucket and reproduces [[maxSimTopK]] exactly — the probe-all
    * twin the gate pins under the full oracle.
    *
    * Approximate by design otherwise: recall follows the LSH bit
    * collision bound (per bit, P[agree] = 1 − θ/π for pooled-vector
    * angle θ).
    */
  def maxSimTopKPruned(
      docs: DataFrame, idCol: String, tokenVecsCol: String,
      queries: Seq[(Long, Seq[Seq[Double]])], k: Int,
      numPlanes: Int = 4, maxHamming: Int = 1): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 16,
      s"numPlanes in [1,16], got $numPlanes")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val spark = docs.sparkSession
    val dims = queries.flatMap(_._2.map(_.size)).distinct
    require(dims.size == 1, s"query token dims disagree: $dims")
    val dim = dims.head
    val signs = planeSigns(spark, dim, numPlanes)
    val allowed: Map[Long, Seq[Long]] = queries.map { case (qid, toks) =>
      val qb = pooledBucketOf(toks, dim, numPlanes, signs)
      qid -> (0L until (1L << numPlanes))
        .filter(b => java.lang.Long.bitCount(b ^ qb) <= maxHamming)
    }.toMap
    maxSimCore(docs, idCol, tokenVecsCol, queries, k,
      prune = Some((withPooledBucket(_, dim, numPlanes, signs), allowed)))
  }

  /** Adds `_bkt` = the pooled-token-vector LSH bucket to a MaxSim base
    * frame (expects `_tv`) — shared by the in-plan pruned path and the
    * index WRITER so persisted buckets match probe-time buckets bit
    * for bit.
    */
  private[graft] def withPooledBucket(
      df: DataFrame, dim: Int, numPlanes: Int,
      signs: Array[Array[Double]]): DataFrame = {
    val pooled = aggregate(col("_tv"),
      array(Seq.fill(dim)(lit(0.0)): _*),
      (acc, t) => zip_with(acc, t, (a, b) => a + b))
    val bucket = (0 until numPlanes).map { j =>
      val plane = array(signs(j).map(lit).toSeq: _*)
      when(dot(col("_pool"), plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("_pool", pooled).withColumn("_bkt", bucket)
      .drop("_pool")
  }

  /** Pooled-vector bucket of one query's token vectors, driver-side —
    * the same sign rule as [[withPooledBucket]].
    */
  private[graft] def pooledBucketOf(
      toks: Seq[Seq[Double]], dim: Int, numPlanes: Int,
      signs: Array[Array[Double]]): Long = {
    val pooled = Array.ofDim[Double](dim)
    toks.foreach(t => (0 until dim).foreach(d => pooled(d) += t(d)))
    (0 until numPlanes).map { j =>
      var s = 0.0; var d = 0
      while (d < dim) { s += pooled(d) * signs(j)(d); d += 1 }
      if (s > 0) 1L << j else 0L
    }.foldLeft(0L)(_ | _)
  }

  /** Shared MaxSim kernel: one corpus scan, per-query literal token
    * vectors, optional bucket-prune guard AROUND the scoring fold
    * (the prune function installs a `_bkt` column; the allowed map
    * gives each query its admissible buckets).
    */
  private[graft] def maxSimCore(
      docs: DataFrame, idCol: String, tokenVecsCol: String,
      queries: Seq[(Long, Seq[Seq[Double]])], k: Int,
      prune: Option[(DataFrame => DataFrame, Map[Long, Seq[Long]])]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query ids")
    val spark = docs.sparkSession
    graft.expressions.GraftFunctions.register(spark)
    // a persisted index carries its partition column through the
    // narrowing so the prune function can alias it to _bkt
    val keep = Seq(col(idCol).cast("long").as("doc_id"),
      col(tokenVecsCol).cast("array<array<double>>").as("_tv")) ++
      (if (docs.columns.contains("bucket")) Seq(col("bucket")) else Nil)
    val base0 = docs.select(keep: _*)
      .filter(col("_tv").isNotNull && size(col("_tv")) > 0)
    val base = prune match {
      case Some((addBucket, _)) => addBucket(base0)
      case None => base0
    }
    // max over doc tokens of the 6-dp cosine to one literal query
    // token — the fused codegen'd [[graft.expressions.MaxSimTokenMax]]
    // loop (NaN/zero-norm tokens skipped inside; a doc with no valid
    // token stays at -inf), evaluated |q tokens| times per doc row
    def tokenMax(qv: Seq[Double]): Column =
      call_function("maxsim_token_max", col("_tv"),
        array(qv.map(lit): _*))
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val perQuery = queries.sortBy(_._1).map { case (qid, toks) =>
      val valid = toks.filter(t => t.exists(_ != 0.0))
      require(valid.nonEmpty, s"query $qid has no non-zero token vectors")
      val maxes = valid.map(tokenMax)
      val score = Numerics.roundz(
        maxes.map(_.cast(dec)).reduce(_ + _).cast("double"), 6)
      // the -inf check never reaches the decimal cast (CASE branches
      // evaluate lazily), so ANSI casting stays safe; the prune guard
      // sits OUTERMOST, so a pruned doc never pays the scoring fold
      val scored = when(maxes.head === lit(Double.NegativeInfinity),
        lit(null).cast("double")).otherwise(score)
      val guarded = prune match {
        case Some((_, allowed)) =>
          when(col("_bkt").isin(allowed(qid): _*), scored)
            .otherwise(lit(null).cast("double"))
        case None => scored
      }
      struct(lit(qid).as("query_id"), guarded.as("score"))
    }
    val stacked = base
      .select(col("doc_id"), explode(array(perQuery: _*)).as("_q"))
      .select(col("_q.query_id").as("query_id"), col("doc_id"),
        col("_q.score").as("score"))
      .filter(col("score").isNotNull && col("doc_id") =!= col("query_id"))
    Ranks.topKPerGroup(stacked, "rank", k, Seq("query_id"), col("score"),
        descending = true, ties = Seq(col("doc_id")))
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Greedy k-center (farthest-point) diversity selection — the
    * classic 2-approximation coreset picker (Gonzalez 1985): start
    * from `seedId`, then repeatedly add the candidate FARTHEST (max
    * min-cosine-distance) from everything selected so far. The
    * standard "cover the embedding space with k exemplars" pass for
    * eval-set curation and prompt selection — the diversity
    * complement to [[semDeDup]]'s redundancy removal.
    *
    * Determinism contract: distance = 1 − cosine rounded to 6 dp
    * HALF_UP at every step; ties broken by ascending id; zero-norm
    * vectors (undefined cosine) are not candidates. Output: one row
    * per selection, (sel_rank, vec_id, dist) where `dist` is the
    * candidate's min-distance at the moment it was chosen (NULL for
    * the seed) — the monotone non-increasing radius sequence a
    * coverage plot reads directly.
    *
    * Scale shape: the materialized per-round state is (vec_id, dmin)
    * ONLY — 16 bytes/row, never the vectors — so the k−1 round
    * materializations ([[Materialize]] strategy knob, the kmeansLloyd
    * discipline) write id+distance, not embedding-width rows. Each
    * round: the arg-max is a 1-row TakeOrdered collect over the slim
    * state; the winner's VECTOR is fetched by one bounded id-lookup
    * on the corpus (pushed-down point predicate); distances to the
    * new center compute SCAN-LOCAL over the original corpus read (the
    * center rides the plan as a literal vector — the embedding column
    * is scanned but never shuffled) and fold into the state via one
    * (vec_id ⋈ vec_id) join of two 16-byte/row frames. The corpus
    * never self-joins; the only per-round shuffle is that narrow join.
    */
  def kCenterSelect(
      embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, seedId: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = embeddings.sparkSession
    val e = embeddings.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    def vecOf(id: Long): Array[Double] = {
      val rows = e.filter(col("vec_id") === id).select(col("v")).collect()
      require(rows.nonEmpty, s"vector id $id not found")
      rows.head.getSeq[Double](0).toArray
    }
    def distTo(c: Array[Double]): Column = {
      val cl = array(c.map(lit): _*)
      val den = norm(col("v")) * math.sqrt(c.map(x => x * x).sum)
      Numerics.roundz(
        when(den === 0.0, lit(Double.NaN))
          .otherwise(lit(1.0) - dot(col("v"), cl) / den), 6)
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Option[Double])]
    selected += ((1L, seedId, None))
    // k = 1 is just the seed: skip the corpus distance pass entirely
    var state = if (k == 1) null
      else e.filter(col("vec_id") =!= seedId)
        .withColumn("dmin", distTo(vecOf(seedId)))
        .filter(!isnan(col("dmin")))
        .select(col("vec_id"), col("dmin")) // 16 B/row — vectors stay out
        .materialized
    var round = 2
    while (round <= k) {
      val top = state
        .orderBy(col("dmin").desc, col("vec_id")).limit(1).collect()
      if (top.nonEmpty) {
        val cid = top.head.getLong(0)
        selected += ((round.toLong, cid, Some(top.head.getDouble(1))))
        if (round < k) {
          // winner's vector by bounded id-lookup (pushed point
          // predicate); new distances scan-local over the corpus,
          // folded into the slim state by a narrow id join
          val cv = vecOf(cid)
          val dNew = e.select(col("vec_id"), distTo(cv).as("_dnew"))
          state = state.filter(col("vec_id") =!= cid)
            .join(dNew, Seq("vec_id"))
            .select(col("vec_id"),
              least(col("dmin"), col("_dnew")).as("dmin"))
            .materialized
        }
      } else round = k // candidate pool exhausted
      round += 1
    }
    import spark.implicits._
    selected.toSeq.toDF("sel_rank", "vec_id", "dist")
  }
}
