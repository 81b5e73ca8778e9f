package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Atomic corpus+index publish: one manifest rename covers the corpus
  * files AND the pinned ANN index files, so a reader of any version
  * sees both-or-neither — the staleness window between a corpus commit
  * and an index rebuild (round-12 verdict's top operational gap) is
  * closed by construction. Asserted here single-JVM per operation;
  * TxRaceSpec adds the two-process merge race over an indexed table.
  */
class TxIndexSpec extends SparkSpec {

  private def vecs(ids: Seq[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    // deterministic 4-d vectors, distinct directions per id class
    ids.map { i =>
      val base = (i % 4L).toInt
      val v = Array.tabulate(4)(d =>
        (if (d == base) 10f else 0f) + (i % 7L).toFloat / 10f)
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  private def idSet(df: DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  test("build pins index to corpus: ids equal, probe-all == brute force") {
    val root = Files.createTempDirectory("graft-txidx-build-").toString
    val d = vecs(0L until 40L)
    TxTable.create(d, root)
    val v = TxTable.buildIvfIndex(spark, root, "emb", "vec_id", "embedding",
      numCentroids = 4, buckets = 4)
    assert(v == 1L)
    assert(TxTable.indexNames(spark, root) == Seq("emb"))
    assert(idSet(TxTable.readIndex(spark, root, "emb")) ==
      idSet(TxTable.read(spark, root)))

    // probing every cell must equal brute-force cosine top-k exactly
    val q = Array(10.0, 0.0, 0.0, 0.0)
    val got = TxTable.ivfProbeIndexed(spark, root, "emb", q, k = 5,
      nProbes = 4).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = TxTable.read(spark, root)
      .select(col("vec_id"),
        round(graft.operators.Similarity.cosineFast(spark, col("embedding"),
          array(q.toSeq.map(lit): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == brute.toSeq)
  }

  test("append publishes corpus delta + routed index delta atomically; " +
    "old versions keep the old pair (both-or-neither)") {
    val root = Files.createTempDirectory("graft-txidx-append-").toString
    TxTable.create(vecs(0L until 20L), root)
    TxTable.buildIvfIndex(spark, root, "emb", "vec_id", "embedding",
      numCentroids = 4, buckets = 2)
    val v2 = TxTable.append(vecs(20L until 32L), root, buckets = 2)
    assert(v2 == 2L)
    // at EVERY version the pinned index row set equals the corpus row set
    assert(idSet(TxTable.readIndexVersion(spark, root, "emb", 1L)) ==
      idSet(TxTable.readVersion(spark, root, 1L)))
    assert(idSet(TxTable.readIndexVersion(spark, root, "emb", 2L)) ==
      idSet(TxTable.readVersion(spark, root, 2L)))
    assert(idSet(TxTable.readIndexVersion(spark, root, "emb", 1L)) ==
      (0L until 20L).toSet)
    assert(idSet(TxTable.readIndexVersion(spark, root, "emb", 2L)) ==
      (0L until 32L).toSet)
    // appended rows routed by the SAME rule as the initial build: cells
    // for identical vectors agree across the build and append paths
    val cellsOf = TxTable.readIndex(spark, root, "emb")
      .select(col("vec_id") % 28L, col("cell")).distinct()
    // ids 0 and 28 share (id % 4, id % 7) => identical vectors => same cell
    val byKey = cellsOf.collect().groupBy(_.get(0))
    byKey.values.foreach(rows =>
      assert(rows.map(_.getInt(1)).distinct.length == 1,
        s"identical vectors routed to different cells: ${rows.mkString(",")}"))
  }

  test("mergeInto rebuilds the pinned index in the same commit") {
    val root = Files.createTempDirectory("graft-txidx-merge-").toString
    TxTable.create(vecs(0L until 30L), root)
    TxTable.buildIvfIndex(spark, root, "emb", "vec_id", "embedding",
      numCentroids = 4, buckets = 2)
    // upsert ids %3==0 (new vectors), tombstone ids %5==0
    val src = vecs(0L until 30L).filter(col("vec_id") % 3 === 0)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(1.0f)))
      .withColumn("_del", col("vec_id") % 5 === 0)
    val v = TxTable.mergeInto(root, src, "vec_id", Seq("embedding"), "_del")
    assert(v == 2L)
    val corpusIds = idSet(TxTable.read(spark, root))
    val indexIds = idSet(TxTable.readIndex(spark, root, "emb"))
    assert(corpusIds == indexIds, "index diverged from merged corpus")
    val expected = (0L until 30L).filterNot(i => i % 3 == 0 && i % 5 == 0).toSet
    assert(corpusIds == expected)
    // pre-merge version still serves its own consistent pair
    assert(idSet(TxTable.readIndexVersion(spark, root, "emb", 1L)) ==
      (0L until 30L).toSet)
  }

  test("compact carries index lines verbatim; probe prunes files") {
    val root = Files.createTempDirectory("graft-txidx-compact-").toString
    TxTable.create(vecs(0L until 24L), root)
    TxTable.buildIvfIndex(spark, root, "emb", "vec_id", "embedding",
      numCentroids = 4, buckets = 4)
    val before = TxTable.latestSnapshot(spark, root)
    TxTable.compact(spark, root, buckets = 2)
    val after = TxTable.latestSnapshot(spark, root)
    assert(after.indexFiles("emb").toSet == before.indexFiles("emb").toSet,
      "compaction must not touch pinned index files")
    assert(after.files.toSet != before.files.toSet)

    // file-level pruning: one probed cell touches a strict subset
    val allFiles = after.indexFiles("emb")
    val oneCell = TxTable.prunedIndexFiles(after, "emb", Seq(0))
    assert(oneCell.nonEmpty && oneCell.size < allFiles.size,
      s"probe did not shrink the scan: ${oneCell.size} of ${allFiles.size}")
  }

  test("dropIndex unpins; vacuum reclaims unreferenced index dirs but " +
    "keeps pinned sidecars") {
    val root = Files.createTempDirectory("graft-txidx-vacuum-").toString
    TxTable.create(vecs(0L until 16L), root)
    TxTable.buildIvfIndex(spark, root, "emb", "vec_id", "embedding",
      numCentroids = 2, buckets = 2)
    TxTable.append(vecs(16L until 20L), root, buckets = 2) // v2
    TxTable.append(vecs(20L until 24L), root, buckets = 2) // v3
    // keep only v2+v3: v1's exclusive files become unreferenced
    TxTable.vacuum(spark, root, keepVersions = 2, retentionMs = 0L)
    // kept versions still read consistently, sidecar survived
    assert(idSet(TxTable.readIndexVersion(spark, root, "emb", 3L)) ==
      (0L until 24L).toSet)
    assert(TxTable.ivfProbeIndexed(spark, root, "emb",
      Array(10.0, 0, 0, 0), k = 3, nProbes = 2).count() == 3L)

    val v4 = TxTable.dropIndex(spark, root, "emb")
    assert(TxTable.indexNames(spark, root).isEmpty)
    assert(TxTable.latestSnapshot(spark, root).indexFiles.isEmpty)
    // corpus unaffected by the unpin
    assert(idSet(TxTable.readVersion(spark, root, v4)) == (0L until 24L).toSet)
    // once no kept manifest pins the index, vacuum clears its namespace
    TxTable.vacuum(spark, root, keepVersions = 1, retentionMs = 0L)
    val f = new java.io.File(s"$root/index/emb")
    assert(!f.exists() || f.listFiles().isEmpty,
      s"index namespace not reclaimed: ${Option(f.listFiles()).map(_.toSeq)}")
  }

  test("interleaved commit fails a stale buildIvfIndex instead of " +
    "publishing a corpus/index mismatch") {
    val root = Files.createTempDirectory("graft-txidx-stale-").toString
    TxTable.create(vecs(0L until 8L), root)
    // simulate the interleave: another writer commits v1 first
    TxTable.append(vecs(8L until 10L), root)
    // a builder that resolved v0 must lose the v1 CAS — emulate by
    // asking for the version the interleaver took
    intercept[TxTable.CommitConflict] {
      // overwrite targets expectedVersion=0 => publish v1, already taken
      TxTable.overwrite(vecs(0L until 4L), root, expectedVersion = 0L)
    }
  }

  private def docsDf(ids: Seq[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map { i =>
      val words = Seq.fill((i % 3L).toInt + 1)(s"w${i % 5L}") ++
        (if (i % 2L == 0L) Seq("spark") else Seq("flink", "beam"))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def bruteBm25(version: Long, root: String, terms: Seq[String]) =
    graft.operators.Bm25.score(
        TxTable.readVersion(spark, root, version), "text", "doc_id", terms)
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
      .orderBy("doc_id").collect().toSeq

  private def probeBm25(version: Long, root: String, terms: Seq[String]) =
    TxTable.bm25ProbeIndexed(spark, root, "txt", terms, version = version)
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
      .orderBy("doc_id").collect().toSeq

  test("BM25 pin: probe == in-plan Bm25.score at every version across " +
    "build, append (moment fold), and DV delete (idxdv + moment " +
    "decrement) — both-or-neither by one manifest rename") {
    val root = Files.createTempDirectory("graft-txidx-bm25-").toString
    val terms = Seq("spark", "w1")
    TxTable.create(docsDf(0L until 30L), root) // v0
    val v1 = TxTable.buildBm25Index(spark, root, "txt", "doc_id", "text",
      termBuckets = 8, buckets = 2)
    assert(v1 === 1L)
    assert(TxTable.indexNames(spark, root) === Seq("txt"))
    assert(probeBm25(1L, root, terms) === bruteBm25(1L, root, terms))
    // append routes ONLY the batch; the header moments fold exactly
    TxTable.append(docsDf(30L until 45L), root, buckets = 2) // v2
    assert(probeBm25(2L, root, terms) === bruteBm25(2L, root, terms))
    // old version still serves its own pinned pair
    assert(probeBm25(1L, root, terms) === bruteBm25(1L, root, terms))
    // a DV delete drops docs from BM25 results in the SAME commit:
    // masked postings AND decremented moments
    TxTable.deleteWhere(spark, root, col("doc_id") % 4L === 2L) // v3
    val afterDel = probeBm25(3L, root, terms)
    assert(afterDel === bruteBm25(3L, root, terms))
    assert(!afterDel.exists(_.getLong(0) % 4L == 2L))
    // pre-delete version unaffected (time travel pins both sides)
    assert(probeBm25(2L, root, terms) === bruteBm25(2L, root, terms))
    // mergeInto rebuilds postings + moments from the merged result
    val s = spark
    import s.implicits._
    val src = Seq((1L, "spark spark spark", false), (3L, "", true))
      .toDF("doc_id", "text", "deleted")
    TxTable.mergeInto(root, src, "doc_id", Seq("text"), "deleted",
      buckets = 2) // v4
    assert(probeBm25(4L, root, terms) === bruteBm25(4L, root, terms))
    assert(probeBm25(4L, root, Seq("spark")).exists(r =>
      r.getLong(0) == 1L))
  }

  test("phrase pin: pinned probe == standalone phraseDocs on the live " +
    "corpus across build, append, and DV delete; conjunctive probe " +
    "shares the pinned BM25 layout") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-txidx-pos-").toString
    val docs = (0L until 24L).map { i =>
      val filler = Seq.fill((i % 3L).toInt)(s"x$i")
      val phrase = if (i % 4L == 0L) Seq("big", "data") else Seq("data", "big")
      (i, (filler ++ phrase ++ Seq("end")).mkString(" "))
    }.toDF("doc_id", "text")
    TxTable.create(docs, root) // v0
    TxTable.buildPhraseIndex(spark, root, "pos", "doc_id", "text",
      termBuckets = 4, buckets = 2) // v1
    TxTable.buildBm25Index(spark, root, "lex", "doc_id", "text",
      termBuckets = 4, buckets = 2) // v2
    def pinned(v: Long) =
      TxTable.phraseProbeIndexed(spark, root, "pos", Seq("big", "data"),
        version = v).orderBy("doc_id").collect().toSeq
    def standalone(v: Long) = {
      val p = Files.createTempDirectory("graft-posref-").toString
      graft.ingest.TextIndex.writePositions(
        TxTable.readVersion(spark, root, v), "doc_id", "text", p,
        termBuckets = 4)
      graft.ingest.TextIndex.phraseDocs(spark, p, Seq("big", "data"),
        termBuckets = 4).orderBy("doc_id").collect().toSeq
    }
    assert(pinned(2L) === standalone(2L))
    assert(pinned(2L).nonEmpty)
    TxTable.append(docs.select($"doc_id" + 100L as "doc_id", $"text"),
      root, buckets = 2) // v3: routed through BOTH text indexes
    assert(pinned(3L) === standalone(3L))
    TxTable.deleteWhere(spark, root, $"doc_id" % 8 === 0) // v4
    val after = pinned(4L)
    assert(after === standalone(4L))
    assert(!after.exists(_.getLong(0) % 8 == 0))
    // old version still serves its own pinned pair
    assert(pinned(3L) === standalone(3L))
    // conjunctive probe over the pinned BM25 postings, DV-masked
    val conj = TxTable.conjunctiveProbeIndexed(spark, root, "lex",
      Seq("big", "data"), version = 4L)
    assert(!conj.collect().exists(_.getLong(0) % 8 == 0))
    assert(conj.count() === TxTable.readVersion(spark, root, 4L).count())
  }

  test("a NULL (or non-long-castable) index id is rejected at ingest: " +
    "its DV entry could never mask the index row after a delete") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-txidx-nullid-").toString
    val good = vecs(0L until 8L)
    TxTable.create(good, root)
    TxTable.buildIvfIndex(spark, root, "emb", "vec_id", "embedding",
      numCentroids = 2, buckets = 2)
    // an appended batch with a NULL id must fail the routing, not
    // silently publish an unmaskable index entry
    val withNull = good.limit(0).unionByName(
      Seq((Option.empty[Long], Array(1f, 0f, 0f, 0f)))
        .toDF("vec_id", "embedding"))
    val ex = intercept[Exception] { TxTable.append(withNull, root) }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(ex).getMessage.contains("NULL"),
      s"unexpected: ${rootCause(ex).getMessage}")
    // nothing committed; the table still serves v1 exactly
    assert(TxTable.versions(spark, root) === Seq(0L, 1L))
    assert(idSet(TxTable.readIndex(spark, root, "emb")) ===
      (0L until 8L).toSet)
  }

  test("createIndexed: one v0 commit equals the create+build chain — " +
    "same probes, same headers algebra, delete still masks both") {
    val s = spark
    import s.implicits._
    val words = Seq("spark", "vector", "customer", "corpus", "index")
    val corpus = vecs(0L until 40L).select(col("vec_id"), col("embedding"),
      concat_ws(" ",
        lit("doc"),
        element_at(array(words.map(lit): _*),
          (pmod(col("vec_id"), lit(5)) + 1).cast("int")),
        element_at(array(words.map(lit): _*),
          (pmod(col("vec_id") * 3, lit(5)) + 1).cast("int"))).as("text"))
    val chainRoot = Files.createTempDirectory("graft-txidx-chain-").toString
    val oneRoot = Files.createTempDirectory("graft-txidx-one-").toString
    TxTable.create(corpus, chainRoot)
    TxTable.buildBm25Index(spark, chainRoot, "lex", "vec_id", "text")
    TxTable.buildIvfIndex(spark, chainRoot, "emb", "vec_id", "embedding",
      numCentroids = 4, buckets = 4)
    assert(TxTable.versions(spark, chainRoot) === Seq(0L, 1L, 2L))
    TxTable.createIndexed(corpus, oneRoot, Seq(
      TxTable.Bm25IndexBuild("lex", "vec_id", "text"),
      TxTable.IvfIndexBuild("emb", "vec_id", "embedding",
        numCentroids = 4)), buckets = 4)
    assert(TxTable.versions(spark, oneRoot) === Seq(0L))
    assert(TxTable.indexNames(spark, oneRoot).sorted == Seq("emb", "lex"))
    def probes(root: String): (Seq[(Long, Double)], Seq[(Long, Double)]) = {
      val q = Array(10.0, 0.0, 0.0, 0.0)
      val ann = TxTable.ivfProbeIndexed(spark, root, "emb", q, k = 5,
        nProbes = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val lex = TxTable.bm25ProbeIndexed(spark, root, "lex",
        Seq("spark", "vector"))
        .orderBy(col("bm25").desc, col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      (ann, lex)
    }
    assert(probes(oneRoot) == probes(chainRoot))
    // the gate's lifecycle: a delete AFTER the batched build must mask
    // both pools identically on both tables
    TxTable.deleteWhere(spark, chainRoot, col("vec_id") % 9 === 4)
    TxTable.deleteWhere(spark, oneRoot, col("vec_id") % 9 === 4)
    assert(probes(oneRoot) == probes(chainRoot))
    assert(!idSet(TxTable.readIndex(spark, oneRoot, "emb")).contains(4L))
  }
}
