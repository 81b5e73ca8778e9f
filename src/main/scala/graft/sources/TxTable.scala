package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * log replay needed to resolve a snapshot — one file read). Commit
  * protocol: write new data files under a fresh uuid dir (invisible to
  * every reader — readers only open files named by a manifest), write
  * the manifest to a temp name, then RENAME it to `<version+1>.txn`.
  * Rename-no-overwrite is atomic on HDFS and object-store committers;
  * a lost race means the destination exists, the rename fails, and the
  * commit aborts cleanly with nothing visible. Readers that resolved
  * version N keep a consistent view forever: its files are immutable
  * and never deleted except by [[vacuum]].
  *
  * Concurrency semantics, per operation:
  *   - [[append]]: conflict-free by construction (it adds files to
  *     whatever the latest manifest says) — on a lost race it re-reads
  *     the new latest and retries the rename, bounded.
  *   - [[overwrite]] / [[mergeInto]]: read-modify-write — a lost race
  *     means the snapshot the result was derived from is stale, so
  *     they FAIL with a conflict (caller re-runs on the new snapshot);
  *     retrying silently would lose the interleaved commit's rows.
  *
  * At 100 TB: manifests are file LISTS (KB-scale text), data files
  * parquet with full predicate/column pushdown through the normal
  * reader; nothing here touches the driver beyond the manifest.
  */
object TxTable {

  final case class Snapshot(version: Long, files: Seq[String])

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
    Snapshot(version, lines.drop(1))
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
    if (s.files.isEmpty) {
      // an empty committed table still has a schema obligation only
      // its writer knew; surface the emptiness explicitly
      throw new IllegalStateException(
        s"TxTable $root version $version has no data files")
    }
    spark.read.parquet(s.files.map(f => s"$root/$f"): _*)
  }

  /** Write `df`'s rows as new immutable data files; returns paths
    * RELATIVE to root (manifest entries).
    */
  private def writeDataFiles(df: DataFrame, root: String): Seq[String] = {
    val sub = s"data/${UUID.randomUUID()}"
    val dest = new Path(root, sub)
    df.write.parquet(dest.toString)
    val f = fs(df.sparkSession, dest)
    f.listStatus(dest).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted
      .map(n => s"$sub/$n")
  }

  /** Atomically publish `files` as `version`; false = lost the race. */
  private def tryCommit(
      spark: SparkSession, root: String, version: Long,
      files: Seq[String]): Boolean = {
    val dir = logDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) f.mkdirs(dir)
    val dest = manifestPath(root, version)
    if (f.exists(dest)) return false
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}.txn")
    val out = f.create(tmp, false)
    try out.write(
      (s"version=$version\n" + files.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename-no-overwrite: atomic publish; a concurrent winner makes
    // the destination exist and the rename report failure
    val won = !f.exists(dest) && f.rename(tmp, dest)
    if (!won) f.delete(tmp, false)
    won
  }

  /** Create a new table at `root` (version 0). Fails if one exists. */
  def create(df: DataFrame, root: String): Long = {
    require(versions(df.sparkSession, root).isEmpty,
      s"TxTable already exists at $root")
    val files = writeDataFiles(df, root)
    if (!tryCommit(df.sparkSession, root, 0L, files))
      throw new CommitConflict(s"concurrent create at $root")
    0L
  }

  /** Blind append: retries past lost races (bounded), since adding
    * files commutes with any interleaved commit's file additions.
    */
  def append(df: DataFrame, root: String, maxRetries: Int = 10): Long = {
    val spark = df.sparkSession
    val files = writeDataFiles(df, root)
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = latestSnapshot(spark, root)
      if (tryCommit(spark, root, cur.version + 1, cur.files ++ files))
        return cur.version + 1
      attempt += 1
    }
    throw new CommitConflict(
      s"append at $root lost $maxRetries commit races")
  }

  /** Replace the table contents with `df` — read-modify-write: fails
    * on any interleaved commit since `expectedVersion` resolved.
    */
  def overwrite(df: DataFrame, root: String, expectedVersion: Long): Long = {
    val spark = df.sparkSession
    val files = writeDataFiles(df, root)
    if (!tryCommit(spark, root, expectedVersion + 1, files))
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
      valueCols: Seq[String], tombstoneCol: String): Long = {
    val spark = source.sparkSession
    val cur = latestSnapshot(spark, root)
    val target = readVersion(spark, root, cur.version)
    val merged = graft.operators.MergeUpsert.merge(
        target, source, keyCol, valueCols, tombstoneCol)
      .drop("action")
    val files = writeDataFiles(merged, root)
    if (!tryCommit(spark, root, cur.version + 1, files))
      throw new CommitConflict(
        s"mergeInto at $root: snapshot v${cur.version} went stale " +
          "during the merge; re-run against the new snapshot")
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
