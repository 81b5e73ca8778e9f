package graft.ingest

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

class AnnIndexSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-ann-spec/$name"

  private def results(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect() // materialize so AQE finalizes the plan
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1)
    scans.head
  }

  test("persisted IVF probe equals the in-memory probe exactly") {
    val path = AnnIndex.writeIvf(emb, "vec_id", "embedding",
      tmp("ivf"), numCentroids = 8)
    val qv = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    val fromIndex = results(AnnIndex.ivfTopK(spark, path, "vec_id", "embedding",
      qv, k = 10, nProbes = 3, excludeId = Some(0L)))
    val inMemory = results(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, numCentroids = 8, nProbes = 3))
    assert(fromIndex == inMemory)
    assert(fromIndex.nonEmpty)
  }

  test("IVF probe scans only its probed cells (partition pruning)") {
    val path = AnnIndex.writeIvf(emb, "vec_id", "embedding",
      tmp("ivf-prune"), numCentroids = 8)
    val qv = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    val probe = AnnIndex.ivfTopK(spark, path, "vec_id", "embedding",
      qv, k = 10, nProbes = 2, excludeId = Some(0L))
    val scan = scanOf(probe)
    // the cell IN (...) predicate must reach the scan as a PARTITION
    // filter (directory pruning), not a post-scan data filter
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters in:\n${scan.metadata.mkString("\n")}")
    assert(scan.metadata("PartitionFilters").contains("cell"))
    // and the scan must actually select fewer partitions than exist
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).size
    val total = scan.relation.location.listFiles(Nil, Nil).size
    assert(selected == 2 && total == 8, s"selected $selected of $total")
  }

  test("persisted LSH probe equals the in-memory probe exactly") {
    val path = AnnIndex.writeLsh(emb, "vec_id", "embedding",
      tmp("lsh"), dim = 64, numPlanes = 4)
    val qv = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    val fromIndex = results(AnnIndex.lshTopK(spark, path, "vec_id", "embedding",
      qv, k = 10, excludeId = Some(0L)))
    val inMemory = results(Similarity.annTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, dim = 64, numPlanes = 4))
    assert(fromIndex == inMemory)
    assert(fromIndex.nonEmpty)
  }

  test("LSH probe prunes to the query's single bucket") {
    val path = AnnIndex.writeLsh(emb, "vec_id", "embedding",
      tmp("lsh-prune"), dim = 64, numPlanes = 4)
    val qv = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    val probe = AnnIndex.lshTopK(spark, path, "vec_id", "embedding",
      qv, k = 10, excludeId = Some(0L))
    val scan = scanOf(probe)
    assert(scan.partitionFilters.nonEmpty)
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).size
    val total = scan.relation.location.listFiles(Nil, Nil).size
    assert(selected == 1 && total > 1, s"selected $selected of $total")
  }

  test("multi-probe LSH: recall grows with maxHamming up to exact") {
    val path = AnnIndex.writeLsh(emb, "vec_id", "embedding",
      tmp("lsh-mp"), dim = 64, numPlanes = 4)
    val qv = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    def ids(h: Int) = results(AnnIndex.lshTopK(spark, path, "vec_id",
      "embedding", qv, k = 10, excludeId = Some(0L), maxHamming = h))
      .map(_._1).toSet
    val exact = results(Similarity.topKCosine(emb, "vec_id", "embedding", 0L, 10))
      .map(_._1).toSet
    val r0 = (ids(0) & exact).size
    val r1 = (ids(1) & exact).size
    assert(r1 >= r0, s"hamming-1 recall $r1 < single-probe $r0")
    // probing every bucket = brute force, exactly
    assert(ids(4) == exact)
  }

  test("pruned-probe recall@10 beats stated floors at sf0.1") {
    // The *_exact gates prove probe-everything ≡ brute force; this pins
    // the quality side of the pruned configurations the rows-only gates
    // leave unstated. Floors are from measurement on the driver-
    // generated sf0.1 embeddings (PERF.md records the measured values);
    // the data and seeds are deterministic, so the measured recall is
    // reproducible, and the floors sit a safety margin below it.
    val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val qids = (0L until 10L).toSeq
    val exactTop = Similarity.topKCosineBatch(
        emb01, "vec_id", "embedding", qids, k = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val ivfPath = AnnIndex.writeIvf(emb01, "vec_id", "embedding",
      tmp("ivf-recall"), numCentroids = 16)
    val lshPath = AnnIndex.writeLsh(emb01, "vec_id", "embedding",
      tmp("lsh-recall"), dim = 64, numPlanes = 4)
    val vecs = qids.map(q =>
      q -> AnnIndex.lookupVector(emb01, "vec_id", "embedding", q)).toMap
    def recall(ids: Long => Set[Long]): Double =
      qids.map(q => (ids(q) & exactTop(q)).size / 10.0).sum / qids.size
    val ivf4 = recall(q => results(AnnIndex.ivfTopK(spark, ivfPath,
      "vec_id", "embedding", vecs(q), k = 10, nProbes = 4,
      excludeId = Some(q))).map(_._1).toSet)
    def lshRecall(h: Int) = recall(q => results(AnnIndex.lshTopK(spark,
      lshPath, "vec_id", "embedding", vecs(q), k = 10,
      excludeId = Some(q), maxHamming = h)).map(_._1).toSet)
    val lsh0 = lshRecall(0)
    val lsh1 = lshRecall(1)
    info(f"recall@10 over ${qids.size} queries: IVF nProbes=4/16 " +
      f"$ivf4%.2f, LSH single-probe $lsh0%.2f, LSH maxHamming=1 $lsh1%.2f")
    assert(ivf4 >= 0.50, f"IVF nProbes=4 recall@10 $ivf4%.2f below floor 0.50")
    // single-probe sees ~1/16 of a near-random corpus — recall is
    // STRUCTURALLY low there (measured 0.12); the shipped multi-probe
    // configuration (maxHamming=1, 5/16 buckets) is the one with a
    // meaningful floor
    assert(lsh0 >= 0.05, f"LSH single-probe recall@10 $lsh0%.2f below floor 0.05")
    assert(lsh1 >= lsh0, f"maxHamming=1 recall $lsh1%.2f < single-probe $lsh0%.2f")
    assert(lsh1 >= 0.20, f"LSH maxHamming=1 recall@10 $lsh1%.2f below floor 0.20")
    // more probes must not lose recall
    val ivf8 = recall(q => results(AnnIndex.ivfTopK(spark, ivfPath,
      "vec_id", "embedding", vecs(q), k = 10, nProbes = 8,
      excludeId = Some(q))).map(_._1).toSet)
    assert(ivf8 >= ivf4, f"nProbes=8 recall $ivf8%.2f < nProbes=4 $ivf4%.2f")
  }

  test("probeBuckets enumerates the hamming ball exactly once each") {
    val b = AnnIndex.probeBuckets(5L, 4, 1)
    assert(b == Seq(5L, 4L, 7L, 1L, 13L)) // self + 4 single-bit flips
    assert(AnnIndex.probeBuckets(5L, 4, 0) == Seq(5L))
    assert(AnnIndex.probeBuckets(0L, 4, 4).size == 16) // whole space
  }

  test("batch IVF probe equals per-query probes exactly") {
    val path = AnnIndex.writeIvf(emb, "vec_id", "embedding",
      tmp("ivf-batch"), numCentroids = 8)
    val qids = Seq(0L, 1L, 2L)
    val queries = qids.map(q =>
      q -> AnnIndex.lookupVector(emb, "vec_id", "embedding", q))
    val batch = AnnIndex.ivfTopKBatch(spark, path, "vec_id", "embedding",
        queries, k = 5, nProbes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq.sorted).toMap
    val single = queries.map { case (qid, qv) =>
      qid -> results(AnnIndex.ivfTopK(spark, path, "vec_id", "embedding",
        qv, k = 5, nProbes = 3, excludeId = Some(qid))).sorted
    }.toMap
    assert(batch == single)
    assert(batch.values.forall(_.nonEmpty))
  }

  test("index stats report per-cell balance without touching vectors") {
    val path = AnnIndex.ivfIndexFor(emb, "vec_id", "embedding",
      "spec-stats", 8)
    val stats = AnnIndex.indexStats(spark, path, "cell")
    val rows = stats.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // every corpus row is in exactly one cell
    assert(rows.map(_._2).sum == emb.count())
    assert(rows.length <= 8 && rows.nonEmpty)
    // skew ratio = max/mean, identical in every row, and >= 1
    val mean = rows.map(_._2).sum.toDouble / rows.length
    val expected = BigDecimal(rows.map(_._2).max / mean)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.forall(_._3 == expected) && expected >= 1.0)
    // the stats scan reads only the partition column (vectors pruned);
    // recurse through AQE stage wrappers — the aggregate puts the scan
    // inside a query stage, which hides it from plain collect
    val df = AnnIndex.indexStats(spark, path, "cell")
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => Seq.empty
      }
      (p match {
        case f: FileSourceScanExec => Seq(f)
        case _ => Seq.empty
      }) ++ (p.children ++ nested).flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.nonEmpty)
    found.foreach(s =>
      assert(!s.schema.fieldNames.contains("embedding"),
        s"stats scan reads ${s.schema.fieldNames.mkString(",")}"))
  }

  test("index registry builds once per tag and reuses the path") {
    val p1 = AnnIndex.ivfIndexFor(emb, "vec_id", "embedding", "spec-tag", 8)
    val p2 = AnnIndex.ivfIndexFor(emb, "vec_id", "embedding", "spec-tag", 8)
    assert(p1 == p2)
  }

  test("appendIvf routes new rows to existing cells; probes see them immediately") {
    import org.apache.spark.sql.functions._
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString
    val path = AnnIndex.writeIvf(half, "vec_id", "embedding", s"$dir/idx", 4)
    val before = spark.read.parquet(path).count()
    val appended = AnnIndex.appendIvf(spark, path, rest, "vec_id", "embedding")
    assert(appended == rest.count())
    val after = spark.read.parquet(path)
    assert(after.count() == before + appended)
    // appended rows must sit in their NEAREST stored cell
    val cents = spark.read.parquet(s"$path/_centroids").collect()
      .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Double]](1).toArray))
    val vecs = rest.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    after.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "cell").collect().foreach { r =>
        val v = vecs(r.getLong(0))
        val want = cents.minBy { case (_, c) =>
          c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
        }._1
        assert(r.getInt(1) == want, s"vec ${r.getLong(0)}")
      }
    // a probe for an appended vector's neighbourhood returns appended ids
    val q = AnnIndex.lookupVector(emb, "vec_id", "embedding", 1L)
    val top = AnnIndex.ivfTopK(spark, path, "vec_id", "embedding", q,
      k = 20, nProbes = 4, excludeId = Some(1L))
      .collect().map(_.getLong(0))
    assert(top.exists(_ % 2 == 1), "no appended row surfaced in the probe")
  }

  test("compaction collapses per-append files to one per cell, data intact") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivf-compact").toString
    val path = AnnIndex.writeIvf(
      emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding", s"$dir/idx", 4)
    // three append batches -> up to 3 extra files per touched cell
    (1 to 3).foreach { r =>
      AnnIndex.appendIvf(spark, path,
        emb.filter(col("vec_id") % 4 === r), "vec_id", "embedding")
    }
    val (nBefore, nAfter, rows) =
      AnnIndex.compactIvf(spark, path, s"$dir/idx-compact")
    assert(rows == emb.count())
    assert(nAfter < nBefore, s"$nBefore -> $nAfter files")
    assert(nAfter <= 4, s"expected ≤ 1 file per cell, got $nAfter")
    // identical content and identical probe results
    val a = spark.read.parquet(path).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = spark.read.parquet(s"$dir/idx-compact").select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
    val q = AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L)
    val p1 = AnnIndex.ivfTopK(spark, path, "vec_id", "embedding", q, 10, 2,
      Some(0L)).collect().map(_.getLong(0)).toSeq
    val p2 = AnnIndex.ivfTopK(spark, s"$dir/idx-compact", "vec_id",
      "embedding", q, 10, 2, Some(0L)).collect().map(_.getLong(0)).toSeq
    assert(p1 == p2)
  }

  test("a streaming embedding feed maintains the persisted index via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-stream").toString
    val path = AnnIndex.writeIvf(emb, "vec_id", "embedding", s"$dir/idx", 4)
    val before = spark.read.parquet(path).count()
    val in = MemoryStream[(Long, Seq[Float])](s)
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // assign-on-insert against the stored centroids — each micro-
        // batch costs one scan of the batch, the layout absorbs it
        AnnIndex.appendIvf(s, path, batch, "vec_id", "embedding"); ()
      }
      .start()
    try {
      val v = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
        .select("embedding").collect().head.getSeq[Float](0)
      in.addData((900001L, v), (900002L, v.map(x => x * 1.01f)))
      q.processAllAvailable()
      in.addData((900003L, v.map(x => -x)))
      q.processAllAvailable()
      assert(spark.read.parquet(path).count() == before + 3)
      // the near-duplicate of vector 0 lands in vector 0's cell and
      // surfaces in its probe
      val probe = AnnIndex.ivfTopK(spark, path, "vec_id", "embedding",
        v.map(_.toDouble).toArray, k = 3, nProbes = 1, excludeId = Some(0L))
        .collect().map(_.getLong(0))
      assert(probe.contains(900001L), s"streamed row missing from probe: ${probe.toSeq}")
    } finally q.stop()
  }

  test("persisted MaxSim probe equals the in-plan pruned probe and " +
    "prunes partitions") {
    import org.apache.spark.sql.functions._
    val tokens = emb.select(col("vec_id"),
      expr("transform(array(0,1,2,3), i -> transform(" +
        "slice(embedding, i*16+1, 16), x -> CAST(x AS DOUBLE)))")
        .as("tok_vecs"))
    val queries = emb.filter(col("vec_id").isin(0L, 1L))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)
        .grouped(16).map(_.toSeq).toSeq)).toSeq
    val path = AnnIndex.writeMaxSim(tokens, "vec_id", "tok_vecs",
      tmp("maxsim"), dim = 16, numPlanes = 4)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val fromIndex = AnnIndex.maxSimTopKIndexed(spark, path, queries,
      k = 10, maxHamming = 1)
    val inPlan = Similarity.maxSimTopKPruned(tokens, "vec_id", "tok_vecs",
      queries, k = 10, numPlanes = 4, maxHamming = 1)
    assert(rows(fromIndex) == rows(inPlan))
    assert(rows(fromIndex).nonEmpty)
    // the bucket IN (...) predicate must reach the scan as a PARTITION
    // filter and actually shrink the directory list
    fromIndex.collect()
    // recurse through AQE wrappers/stages — the scan sits inside a
    // finalized QueryStageExec after the top-k exchanges
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ nested ++ p.subqueries).flatMap(nodes)
    }
    val scans = nodes(fromIndex.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("maxsim")) => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters: ${scan.metadata.mkString("\n")}")
    assert(scan.metadata("PartitionFilters").contains("bucket"))
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).size
    val total = scan.relation.location.listFiles(Nil, Nil).size
    assert(selected < total, s"selected $selected of $total")
  }

  test("appendMaxSim routes new docs to their buckets; probes see them " +
    "immediately") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val tokens = emb.select(col("vec_id"),
      expr("transform(array(0,1,2,3), i -> transform(" +
        "slice(embedding, i*16+1, 16), x -> CAST(x AS DOUBLE)))")
        .as("tok_vecs"))
    val path = AnnIndex.writeMaxSim(tokens, "vec_id", "tok_vecs",
      tmp("maxsim-append"), dim = 16, numPlanes = 4)
    val before = spark.read.parquet(path).count()
    // a near-clone of doc 0's token vectors lands in doc 0's bucket
    val q0 = tokens.filter(col("vec_id") === 0L)
      .select("tok_vecs").collect().head
      .getSeq[scala.collection.Seq[Double]](0).map(_.toSeq).toSeq
    val clone = Seq((777777L, q0.map(_.map(_ * 1.01))))
      .toDF("vec_id", "tok_vecs")
    assert(AnnIndex.appendMaxSim(spark, path, clone, "vec_id",
      "tok_vecs") == 1L)
    assert(spark.read.parquet(path).count() == before + 1)
    val probe = AnnIndex.maxSimTopKIndexed(spark, path,
        Seq((0L, q0)), k = 3, maxHamming = 0)
      .collect().map(_.getLong(2))
    assert(probe.contains(777777L),
      s"appended doc missing from probe: ${probe.toSeq}")
  }
}
