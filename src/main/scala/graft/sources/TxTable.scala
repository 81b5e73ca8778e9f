package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal transactional parquet table: snapshot isolation +
  * optimistic concurrency over any Hadoop filesystem, with no engine
  * dependencies — the ACID ingest substrate the harvest-while-serving
  * operating mode needs (cf. reference `serve.py` querying a live
  * DocStore while the sync CLI ingests), built on the two public
  * primitives every such layer reduces to (the Delta/Iceberg design,
  * re-derived): immutable data files + an atomically published
  * manifest.
  *
  * Layout:
  * {{{
  *   root/data/<uuid>/part-*.parquet   -- immutable, write-once
  *   root/_txlog/<%020d>.txn           -- one manifest per version
  * }}}
  *
  * A manifest lists the COMPLETE active file set of its version (no
  * log replay needed to resolve a snapshot — one file read). Line
  * format: `version=N` first; then `key=value` table headers carried
  * forward commit-to-commit (`cluster=<col>` declares the range-
  * clustering column, `stream:<id>=<batchId>` records the last
  * committed batch per streaming source); then one line per data file
  * — `data/<uuid>/<name>` optionally followed by TAB-separated
  * min/max of the cluster column, the file-skipping statistics.
  *
  * Commit protocol: write new data files under a fresh uuid dir
  * (invisible to every reader — readers only open files named by a
  * manifest), write the manifest to a temp name, then RENAME it to
  * `<version+1>.txn`. Rename-no-overwrite is atomic on HDFS and
  * object-store committers; a lost race means the destination exists,
  * the rename fails, and the commit aborts cleanly with nothing
  * visible. Readers that resolved version N keep a consistent view
  * forever: its files are immutable and never deleted except by
  * [[vacuum]].
  *
  * Concurrency semantics, per operation:
  *   - [[append]] / [[addStreamingBatch]]: conflict-free by
  *     construction (they add files to whatever the latest manifest
  *     says) — on a lost race they re-read the new latest and retry,
  *     bounded.
  *   - [[overwrite]] / [[mergeInto]] / [[compact]]: read-modify-write
  *     — a lost race means the snapshot the result was derived from
  *     is stale, so they FAIL with a conflict (caller re-runs on the
  *     new snapshot); retrying silently would lose the interleaved
  *     commit's rows.
  *
  * At 100 TB: manifests are file LISTS (KB-scale text), data files
  * parquet with full predicate/column pushdown through the normal
  * reader. [[readRange]] prunes at the FILE level from manifest stats
  * before parquet row-group stats ever engage — the scan for a
  * key-range query touches |matching files|, not the table.
  * [[compact]] bounds the small-file count that per-batch streaming
  * commits would otherwise accrete. Nothing here touches the driver
  * beyond the manifest.
  */
object TxTable {

  /** One resolved version: `files` are root-relative paths, `stats`
    * maps a file to (min, max) of the cluster column where recorded,
    * `headers` carries the table metadata (`cluster`, `stream:<id>`).
    */
  final case class Snapshot(
      version: Long, files: Seq[String],
      stats: Map[String, (Long, Long)],
      headers: Map[String, String]) {
    def clusterCol: Option[String] = headers.get("cluster")
  }

  final class CommitConflict(msg: String)
    extends RuntimeException(msg)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: String) = new Path(root, "_txlog")

  private def manifestPath(root: String, v: Long) =
    new Path(logDir(root), f"$v%020d.txn")

  /** All committed versions, ascending; empty for a non-table path. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = logDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".txn"))
      .map(_.stripSuffix(".txn").toLong)
      .sorted
  }

  def snapshot(spark: SparkSession, root: String, version: Long): Snapshot = {
    val p = manifestPath(root, version)
    val f = fs(spark, p)
    val in = f.open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    require(lines.headOption.contains(s"version=$version"),
      s"manifest $p does not declare version=$version")
    // file entries start with the immutable data prefix; anything else
    // after the version line is a key=value header
    val (fileLines, headerLines) =
      lines.drop(1).partition(_.startsWith("data/"))
    val headers = headerLines.map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"malformed manifest header '$l' in $p")
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    val entries = fileLines.map(_.split("\t").toSeq)
    val files = entries.map(_.head)
    val stats = entries.collect {
      case Seq(path, mn, mx) => path -> (mn.toLong, mx.toLong)
    }.toMap
    Snapshot(version, files, stats, headers)
  }

  def latestSnapshot(spark: SparkSession, root: String): Snapshot = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"$root is not a TxTable (no _txlog manifests)")
    snapshot(spark, root, vs.last)
  }

  /** The latest committed snapshot as a DataFrame. The file list is
    * resolved NOW — the returned frame is a stable view of this
    * version no matter what commits later.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, latestSnapshot(spark, root).version)

  /** Time travel: the table exactly as of `version`. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val s = snapshot(spark, root, version)
    readFiles(spark, root, s.files)
  }

  private def readFiles(
      spark: SparkSession, root: String, files: Seq[String]): DataFrame = {
    if (files.isEmpty)
      // an empty committed table still has a schema obligation only
      // its writer knew; surface the emptiness explicitly
      throw new IllegalStateException(s"TxTable $root: no data files")
    spark.read.parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Key-range read with FILE-LEVEL skipping: only files whose
    * manifest [min,max] overlaps [lo,hi] are opened (a file with no
    * recorded stats is conservatively read). The row filter is still
    * applied, so the result is exact whether or not stats exist —
    * stats only shrink the scan, never the answer.
    */
  def readRange(
      spark: SparkSession, root: String, lo: Long, hi: Long): DataFrame = {
    val s = latestSnapshot(spark, root)
    val c = s.clusterCol.getOrElse(throw new IllegalArgumentException(
      s"TxTable $root has no cluster column; readRange needs one"))
    readFiles(spark, root, prunedFiles(s, lo, hi))
      .filter(col(c).between(lo, hi))
  }

  /** The post-skipping file list for [lo,hi] — exposed so callers and
    * specs can assert how much of the table a range touches.
    */
  def prunedFiles(s: Snapshot, lo: Long, hi: Long): Seq[String] =
    s.files.filter { f =>
      s.stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi }
    }

  /** Write `df`'s rows as new immutable data files; returns manifest
    * entries (path, optional cluster-column stats). With a cluster
    * column the frame is range-repartitioned first so each file holds
    * a contiguous key span — that is what makes the min/max entries
    * selective instead of all-overlapping — and per-file stats come
    * from ONE aggregate over the just-written files.
    */
  private def writeDataFiles(
      df: DataFrame, root: String, cluster: Option[String],
      buckets: Int): Seq[String] = {
    val sub = s"data/${UUID.randomUUID()}"
    val dest = new Path(root, sub)
    val toWrite = cluster match {
      case Some(c) => df.repartitionByRange(buckets, col(c))
      case None    => df
    }
    toWrite.write.parquet(dest.toString)
    val f = fs(df.sparkSession, dest)
    val names = f.listStatus(dest).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted
    cluster match {
      case None => names.map(n => s"$sub/$n")
      case Some(c) =>
        val spark = df.sparkSession
        val stats = spark.read.parquet(dest.toString)
          .select(input_file_name().as("_f"), col(c).cast("long").as("_k"))
          .groupBy(col("_f"))
          .agg(min(col("_k")).as("_mn"), max(col("_k")).as("_mx"))
          .collect()
          .map(r => (new Path(r.getString(0)).getName,
            (r.getLong(1), r.getLong(2))))
          .toMap
        names.map { n =>
          stats.get(n) match {
            case Some((mn, mx)) => s"$sub/$n\t$mn\t$mx"
            case None           => s"$sub/$n" // empty file: no stats
          }
        }
    }
  }

  /** Atomically publish `version`; false = lost the race. */
  private def tryCommit(
      spark: SparkSession, root: String, version: Long,
      headers: Map[String, String], fileEntries: Seq[String]): Boolean = {
    val dir = logDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) f.mkdirs(dir)
    val dest = manifestPath(root, version)
    if (f.exists(dest)) return false
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}.txn")
    val headerLines = headers.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }
    val out = f.create(tmp, false)
    try out.write(
      ((s"version=$version" +: headerLines) ++ fileEntries)
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename-no-overwrite: atomic publish; a concurrent winner makes
    // the destination exist and the rename report failure
    val won = !f.exists(dest) && f.rename(tmp, dest)
    if (!won) f.delete(tmp, false)
    won
  }

  // existing stats lines must survive a commit that re-lists old files
  private def entryLines(s: Snapshot): Seq[String] =
    s.files.map { f =>
      s.stats.get(f) match {
        case Some((mn, mx)) => s"$f\t$mn\t$mx"
        case None           => f
      }
    }

  /** Create a new table at `root` (version 0). `clusterCol` (integral)
    * enables range-clustered files + manifest min/max stats on every
    * subsequent write; `buckets` bounds files per commit. Fails if a
    * table exists.
    */
  def create(
      df: DataFrame, root: String, clusterCol: Option[String] = None,
      buckets: Int = 8): Long = {
    require(versions(df.sparkSession, root).isEmpty,
      s"TxTable already exists at $root")
    val entries = writeDataFiles(df, root, clusterCol, buckets)
    val headers = clusterCol.map(c => "cluster" -> c).toMap
    if (!tryCommit(df.sparkSession, root, 0L, headers, entries))
      throw new CommitConflict(s"concurrent create at $root")
    0L
  }

  /** Blind append: retries past lost races (bounded), since adding
    * files commutes with any interleaved commit's file additions.
    */
  def append(df: DataFrame, root: String, maxRetries: Int = 10,
      buckets: Int = 8): Long = {
    val spark = df.sparkSession
    val pre = latestSnapshot(spark, root)
    val entries = writeDataFiles(df, root, pre.clusterCol, buckets)
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = latestSnapshot(spark, root)
      if (tryCommit(spark, root, cur.version + 1, cur.headers,
          entryLines(cur) ++ entries))
        return cur.version + 1
      attempt += 1
    }
    throw new CommitConflict(
      s"append at $root lost $maxRetries commit races")
  }

  /** Exactly-once streaming ingest face, for
    * `writeStream.foreachBatch((b, id) => TxTable.addStreamingBatch(
    * b, root, "harvest", id))`: Structured Streaming re-delivers a
    * batch after restart, so the commit is keyed by the per-stream
    * HIGH-WATER batch id in the manifest — a batch at or below it is
    * a duplicate delivery and skips without writing (returns None).
    * Batch ids from one stream arrive monotonically (the foreachBatch
    * contract), which is what makes one high-water header per stream
    * a complete dedup record. Returns the committed version.
    */
  def addStreamingBatch(
      df: DataFrame, root: String, streamId: String, batchId: Long,
      maxRetries: Int = 10, buckets: Int = 8): Option[Long] = {
    require(!streamId.contains("=") && !streamId.contains("\n"),
      s"streamId must not contain '=' or newlines: $streamId")
    val spark = df.sparkSession
    val key = s"stream:$streamId"
    def committed(s: Snapshot) =
      s.headers.get(key).exists(_.toLong >= batchId)
    val pre = latestSnapshot(spark, root)
    if (committed(pre)) return None
    val entries = writeDataFiles(df, root, pre.clusterCol, buckets)
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = latestSnapshot(spark, root)
      if (committed(cur)) return None // raced with our own redelivery
      if (tryCommit(spark, root, cur.version + 1,
          cur.headers + (key -> batchId.toString),
          entryLines(cur) ++ entries))
        return Some(cur.version + 1)
      attempt += 1
    }
    throw new CommitConflict(
      s"addStreamingBatch at $root lost $maxRetries commit races")
  }

  /** Replace the table contents with `df` — read-modify-write: fails
    * on any interleaved commit since `expectedVersion` resolved.
    */
  def overwrite(df: DataFrame, root: String, expectedVersion: Long,
      buckets: Int = 8): Long = {
    val spark = df.sparkSession
    val cur = snapshot(spark, root, expectedVersion)
    val entries = writeDataFiles(df, root, cur.clusterCol, buckets)
    if (!tryCommit(spark, root, expectedVersion + 1, cur.headers, entries))
      throw new CommitConflict(
        s"overwrite at $root: version ${expectedVersion + 1} already " +
          "committed by a concurrent writer; re-derive from the new snapshot")
    expectedVersion + 1
  }

  /** Transactional MERGE INTO: resolve the latest snapshot, apply
    * [[graft.operators.MergeUpsert]] CDC semantics, publish the result
    * as one atomic new version. The `action` column is merge-run
    * metadata, not table state — it is not persisted. Returns the new
    * version; throws [[CommitConflict]] if any commit interleaved
    * between snapshot resolution and publish (optimistic concurrency —
    * the caller re-runs against the new snapshot).
    */
  def mergeInto(
      root: String, source: DataFrame, keyCol: String,
      valueCols: Seq[String], tombstoneCol: String,
      buckets: Int = 8): Long = {
    val spark = source.sparkSession
    val cur = latestSnapshot(spark, root)
    val target = readVersion(spark, root, cur.version)
    val merged = graft.operators.MergeUpsert.merge(
        target, source, keyCol, valueCols, tombstoneCol)
      .drop("action")
    val entries = writeDataFiles(merged, root, cur.clusterCol, buckets)
    if (!tryCommit(spark, root, cur.version + 1, cur.headers, entries))
      throw new CommitConflict(
        s"mergeInto at $root: snapshot v${cur.version} went stale " +
          "during the merge; re-run against the new snapshot")
    cur.version + 1
  }

  /** Rewrite the table into `buckets` files — the small-file
    * compaction per-batch streaming commits need (every micro-batch
    * adds files; the read amortizes only if something folds them back
    * down). Contents are bit-identical (same rows, re-clustered);
    * read-modify-write conflict semantics. Returns the new version.
    */
  def compact(spark: SparkSession, root: String, buckets: Int = 8): Long = {
    val cur = latestSnapshot(spark, root)
    val all = readVersion(spark, root, cur.version)
    val entries = cur.clusterCol match {
      case Some(_) => writeDataFiles(all, root, cur.clusterCol, buckets)
      case None    => writeDataFiles(all.coalesce(buckets), root, None, buckets)
    }
    if (!tryCommit(spark, root, cur.version + 1, cur.headers, entries))
      throw new CommitConflict(
        s"compact at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** Drop data files referenced by NO kept version (the newest
    * `keepVersions` manifests survive; older manifests are removed).
    * Readers of vacuumed versions break — run only past any reader
    * horizon, the standard retention contract.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val vs = versions(spark, root)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val live = keep.flatMap(v => snapshot(spark, root, v).files).toSet
    val f = fs(spark, new Path(root))
    val dataDir = new Path(root, "data")
    if (f.exists(dataDir)) {
      f.listStatus(dataDir).foreach { sub =>
        val subRel = s"data/${sub.getPath.getName}"
        val all = f.listStatus(sub.getPath).toSeq.map(_.getPath.getName)
        if (all.forall(n => !live.contains(s"$subRel/$n")))
          f.delete(sub.getPath, true)
      }
    }
    drop.foreach(v => f.delete(manifestPath(root, v), false))
  }
}
