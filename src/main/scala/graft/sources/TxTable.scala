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
  * forward commit-to-commit (`cluster=<col>[,<col2>]` declares the
  * clustering column(s) — one column = range clustering, two =
  * z-order layout via [[graft.ingest.ZOrder]]; `schema=<json>` the
  * declared table schema every writer validates against and every
  * reader scans by (see the schema-evolution section);
  * `stream:<id>=<batchId>`
  * records the last committed batch per streaming source); then one
  * line per data file — `data/<uuid>/<name>` optionally followed by
  * TAB-separated min/max per cluster column (in declaration order),
  * the file-skipping statistics that let [[readRange]] and [[readBox]]
  * prune whole files before any parquet footer is opened.
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
  *   - [[overwrite]] / [[compact]]: read-modify-write — a lost race
  *     means the snapshot the result was derived from is stale, so
  *     they FAIL with a conflict (caller re-runs on the new snapshot);
  *     retrying silently would lose the interleaved commit's rows.
  *   - [[mergeInto]]: read-modify-write with OPTIONAL optimistic
  *     retry (`maxRetries > 0`): a lost race RE-READS the latest
  *     snapshot and RE-RUNS the whole merge against it before
  *     re-publishing — never re-publishing a result derived from a
  *     stale snapshot, so every committed version v+1 equals
  *     merge(snapshot v, source) exactly and the table history is the
  *     serial order of the commit wins (no lost updates). Default
  *     `maxRetries = 0` keeps the fail-on-conflict contract.
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
    * maps a file to (min, max) per cluster column where recorded (one
    * pair per declared cluster column, in declaration order),
    * `headers` carries the table metadata (`cluster`, `stream:<id>`,
    * `index:<name>`), `indexFiles` the root-relative data files of
    * each DERIVED INDEX pinned to this version (see [[buildIvfIndex]]
    * — corpus and index are published by ONE manifest rename, so a
    * reader of any version sees them both-or-neither).
    */
  final case class Snapshot(
      version: Long, files: Seq[String],
      stats: Map[String, Seq[(Long, Long)]],
      headers: Map[String, String],
      indexFiles: Map[String, Seq[String]] = Map.empty,
      dvFiles: Seq[String] = Seq.empty,
      indexDvFiles: Map[String, Seq[String]] = Map.empty,
      cdcFiles: Seq[String] = Seq.empty) {
    /** Declared cluster columns: empty (unclustered), one (range
      * clustering), or two (z-order clustering — both columns carry
      * file stats, so range predicates on EITHER prune files).
      */
    def clusterCols: Seq[String] =
      headers.get("cluster").toSeq.flatMap(_.split(",").toSeq)
        .map(_.trim).filter(_.nonEmpty)
    def clusterCol: Option[String] = clusterCols.headOption
    /** The version's declared table schema (header `schema=<json>`,
      * written by [[create]] since round 14) — what makes reads
      * deterministic across files written by different-width commits:
      * with it, every scan passes the DECLARED schema and parquet
      * resolves columns BY NAME (a column added after a file was
      * written reads as null); without it (legacy tables), the reader
      * falls back to single-footer inference.
      */
    def tableSchema: Option[org.apache.spark.sql.types.StructType] =
      headers.get("schema").map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  final class CommitConflict(msg: String)
    extends RuntimeException(msg)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: String) = new Path(root, "_txlog")

  private def manifestPath(root: String, v: Long) =
    new Path(logDir(root), f"$v%020d.txn")

  // committed manifests ONLY — in-flight temp manifests live in the
  // same dir as `.tmp-<uuid>.txn` and must never parse as versions
  private val ManifestName = """^(\d{20})\.txn$""".r

  /** All committed versions, ascending; empty for a non-table path.
    * Strict name match: a temp manifest left by an in-flight (or
    * crashed) writer is invisible here, so reads and appends stay
    * correct concurrently with any commit attempt.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = logDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case ManifestName(v) => v.toLong }
      .sorted
  }

  /** A read anchored on a version whose manifest [[vacuum]] swept —
    * the crisp edge of the retention horizon (Delta's CDF behavior):
    * a change consumer whose `fromVersion` predates the sweep gets
    * THIS, never a silently partial feed, and the message names the
    * oldest surviving version to re-anchor from.
    */
  final class VacuumedVersionException(msg: String)
    extends IllegalStateException(msg)

  def snapshot(spark: SparkSession, root: String, version: Long): Snapshot = {
    val p = manifestPath(root, version)
    val f = fs(spark, p)
    val in = try f.open(p) catch {
      case e: java.io.FileNotFoundException =>
        val vs = versions(spark, root)
        if (vs.nonEmpty && version < vs.min)
          throw new VacuumedVersionException(
            s"TxTable $root: version $version predates the vacuum " +
              s"retention boundary — oldest available version is " +
              s"${vs.min}; re-anchor the read there (change consumers: " +
              s"restart with fromVersion >= ${vs.min}, or reconcile via " +
              "the Merkle snapshot diff)")
        else throw new IllegalArgumentException(
          s"TxTable $root: no committed version $version" +
            (if (vs.isEmpty) " (not a TxTable?)"
             else s" (latest is ${vs.max})"), e)
    }
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    require(lines.headOption.contains(s"version=$version"),
      s"manifest $p does not declare version=$version")
    // file entries start with an immutable namespace prefix (`data/`
    // for corpus files, `index/<name>/` for pinned derived-index
    // files); anything else after the version line is a key=value
    // header — routed by PREFIX, never by '=' (index paths may carry
    // `cell=K`-style segments from partitioned layouts)
    val (fileLines, rest) =
      lines.drop(1).partition(_.startsWith("data/"))
    val (indexLines, rest2) = rest.partition(_.startsWith("index/"))
    // deletion-vector namespace: position files of MERGE-ON-READ
    // deletes (see [[deleteWhere]]) — no stats, carried verbatim
    val (dvEntryLines, rest3) = rest2.partition(_.startsWith("dv/"))
    // per-index deletion-vector namespace: deleted-ID files that keep
    // a pinned index consistent with a DV-deleted corpus (probes
    // anti-join ids the way corpus reads anti-join positions)
    val (idxDvLines, rest4) = rest3.partition(_.startsWith("idxdv/"))
    // change-data namespace: explicit row-level change files a
    // change-feed-enabled mergeInto writes beside its rewrite — listed
    // ONLY by the commit that produced them (per-version events, never
    // carried), read only by the change stream
    val (cdcLines, headerLines) = rest4.partition(_.startsWith("cdc/"))
    val headers = headerLines.map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"malformed manifest header '$l' in $p")
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    val entries = (fileLines ++ indexLines).map(_.split("\t").toSeq)
    val files = fileLines.map(_.split("\t").head)
    val indexFiles = indexLines.map(_.split("\t").head)
      .groupBy(_.split("/")(1))
      .map { case (n, fs) => n -> fs.toSeq }
    // path alone = no stats; path + 2k fields = k (min,max) pairs,
    // one per cluster column in declaration order
    val stats = entries.collect {
      case e if e.size >= 3 && e.size % 2 == 1 =>
        e.head -> e.tail.grouped(2).map {
          case Seq(mn, mx) => (mn.toLong, mx.toLong)
        }.toSeq
    }.toMap
    Snapshot(version, files, stats, headers, indexFiles,
      dvEntryLines.map(_.split("\t").head),
      idxDvLines.map(_.split("\t").head)
        .groupBy(_.split("/")(1))
        .map { case (n, fs) => n -> fs.toSeq },
      cdcLines.map(_.split("\t").head))
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
    readFiles(spark, root, s.files, s.dvFiles, s.tableSchema)
  }

  /** The newest version committed AT OR BEFORE `tsMillis` (manifest
    * modification times are the commit clock — the rename that
    * publishes a version stamps its mtime). Fails for a timestamp
    * before the table existed; [[vacuum]]-dropped versions are
    * naturally unreachable (their manifests are gone).
    */
  def versionAsOf(spark: SparkSession, root: String, tsMillis: Long): Long = {
    val f = fs(spark, logDir(root))
    val eligible = versions(spark, root).filter { v =>
      f.getFileStatus(manifestPath(root, v)).getModificationTime <= tsMillis
    }
    require(eligible.nonEmpty,
      s"$root has no version committed at or before $tsMillis")
    eligible.max
  }

  /** Timestamp time travel (the `TIMESTAMP AS OF` face): the table as
    * of the newest commit ≤ `tsMillis`.
    */
  def readAsOf(spark: SparkSession, root: String, tsMillis: Long): DataFrame =
    readVersion(spark, root, versionAsOf(spark, root, tsMillis))

  /** Change-data feed for APPEND-STYLE commits: the rows added by
    * versions (fromVersion, toVersion] — exactly the files present in
    * the destination snapshot but absent from the source one, so an
    * incremental consumer reads ONLY the delta files (no diffing of
    * row contents, no full-table scan). Contract: valid for commits
    * that never rewrite surviving rows into new files (create/append/
    * streaming batches); a compaction or merge inside the range
    * rewrites files and would replay surviving rows — use the
    * Merkle-bucket snapshot diff for row-level semantics there.
    */
  def readChanges(
      spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    val from = snapshot(spark, root, fromVersion).files.toSet
    val toSnap = snapshot(spark, root, toVersion)
    val to = toSnap.files
    val delta = to.filterNot(from)
    // empty range ⇒ empty frame with the table's schema, not a throw
    if (delta.isEmpty)
      readFiles(spark, root, to, schema = toSnap.tableSchema).limit(0)
    else readFiles(spark, root, delta, schema = toSnap.tableSchema)
  }

  /** TYPED batch change feed — the batch twin of [[readChangeStream]]
    * (same channels, same guard): every row-level change of versions
    * (fromVersion, toVersion], stamped `_change_type` + `_commit_
    * version`. Per version: new data files are `insert` rows (read
    * raw — a later version's DV delete arrives as its own `delete`
    * event); a [[deleteWhere]] commit's positions resolve back to full
    * rows by a (file, row_index) semi-join against `_metadata` over
    * ONLY the touched files (the position list is KB–MB, never the
    * table); a change-feed [[mergeInto]]'s explicit `cdc/` files serve
    * their own typed rows (insert/update_preimage/update_postimage/
    * delete) and the rewrite representation is ignored. A rewrite
    * version WITHOUT a cdc channel (compact/restore/feed-less merge)
    * fails with the same guidance as the stream. All generations are
    * served under the DESTINATION version's declared schema,
    * physical-name-resolved (column mapping): a column ADDED inside
    * the range reads null from files that predate it; a column
    * RENAMED inside the range serves both generations under the new
    * logical name; a column DROPPED inside the range is EXCLUDED from
    * every event — its bytes stay in the old files but leave the feed
    * (gated by `io_tx_changes_across_{rename,drop}`).
    */
  def readChangesTyped(
      spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    import org.apache.spark.sql.types.{StructType, StructField, StringType}
    val toSnap = snapshot(spark, root, toVersion)
    val schema = toSnap.tableSchema
    def logicalOf(df: DataFrame, extra: Seq[org.apache.spark.sql.Column]) =
      schema match {
        case Some(st) => df.select(st.fields.map(f =>
          col(physicalName(f)).as(f.name)) ++ extra: _*)
        case None => df
      }
    val posExtract = expr("regexp_extract(_metadata.file_path, " +
      "'(data/[^/]+/[^/]+)$', 1)")
    val parts = ((fromVersion + 1) to toVersion).flatMap { v =>
      val (data, dv, cdc, removed) =
        graft.streaming.TxChangeStream.deltaFiles(spark, root, v)
      if (cdc.nonEmpty) {
        val phys = schema.map(st => StructType(
          physicalSchema(st).fields :+
            StructField("_change_type", StringType)))
        val raw = phys.fold(spark.read)(spark.read.schema)
          .parquet(cdc.map(f => s"$root/$f"): _*)
        Seq(logicalOf(raw, Seq(col("_change_type")))
          .withColumn("_commit_version", lit(v)))
      } else {
        if (removed.nonEmpty)
          throw new IllegalStateException(
            s"readChangesTyped at $root: version $v removed " +
              s"${removed.size} data/dv file(s) — not representable " +
              "row-accurately (compact/restore/feed-less merge); " +
              "enable the change feed for merges, or diff snapshots")
        val ins = if (data.isEmpty) Nil else Seq(
          readFiles(spark, root, data, schema = schema)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(v)))
        val del = if (dv.isEmpty) Nil else {
          val pos = spark.read.parquet(dv.map(f => s"$root/$f"): _*)
            .select(col("file").as("_dv_f"), col("row_index").as("_dv_ri"))
          // plan the scan over the TOUCHED files only — the distinct
          // file list is bounded by the delete, not the table
          val touched = pos.select("_dv_f").distinct()
            .collect().map(_.getString(0)).toSeq.sorted
          val joined = schema.map(physicalSchema)
            .fold(spark.read)(spark.read.schema)
            .parquet(touched.map(f => s"$root/$f"): _*)
            .select(col("*"), posExtract.as("_dv_f"),
              col("_metadata.row_index").as("_dv_ri"))
            .join(pos, Seq("_dv_f", "_dv_ri"), "left_semi")
          val logical = schema match {
            case Some(_) => logicalOf(joined, Seq.empty)
            case None => joined.drop("_dv_f", "_dv_ri")
          }
          Seq(logical
            .withColumn("_change_type", lit("delete"))
            .withColumn("_commit_version", lit(v)))
        }
        ins ++ del
      }
    }
    if (parts.nonEmpty) parts.reduce(_ unionByName _)
    else readFiles(spark, root, toSnap.files, schema = schema).limit(0)
      .withColumn("_change_type", lit(""))
      .withColumn("_commit_version", lit(-1L))
  }

  /** Streaming face of [[readChanges]]: a Structured Streaming source
    * that tails the manifest log — offset = committed version, each
    * micro-batch = that version range's file-set delta stamped with
    * `_change_type` (`insert` for new data files, `delete` for rows a
    * [[deleteWhere]] DV commit removed — positions resolved back to
    * full rows executor-side) and `_commit_version`. Append-style +
    * DV contract; full design notes on
    * [[graft.streaming.TxChangeStream]].
    */
  def readChangeStream(
      spark: SparkSession, root: String,
      startingVersion: Long = 0L,
      maxVersionsPerTrigger: Int = 0,
      allowRewrites: Boolean = false): DataFrame =
    graft.streaming.TxChangeStream.readStream(
      spark, root, startingVersion, maxVersionsPerTrigger, allowRewrites)

  private def readFiles(
      spark: SparkSession, root: String, files: Seq[String],
      dvFiles: Seq[String] = Seq.empty,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    if (files.isEmpty)
      // an empty committed table still has a schema obligation only
      // its writer knew; surface the emptiness explicitly
      throw new IllegalStateException(s"TxTable $root: no data files")
    // column mapping: the scan resolves files by PHYSICAL name, the
    // final projection restores logical names — a rename never touches
    // a data byte
    val mapped = schema.exists(hasMapping)
    val reader = schema.map(physicalSchema)
      .fold(spark.read)(spark.read.schema)
    val base0 = reader.parquet(files.map(f => s"$root/$f"): _*)
    def toLogical(df: DataFrame): DataFrame =
      if (!mapped) df
      else df.select(schema.get.fields.map(f =>
        col(physicalName(f)).as(f.name)): _*)
    val base = base0
    if (dvFiles.isEmpty) toLogical(base)
    else {
      // merge-on-read: anti-join the per-row (file, row_index)
      // position against the snapshot's deletion vectors. The data
      // file layout guarantees root-relative paths of exactly
      // data/<commit-uuid>/<part>, so the suffix extraction is exact.
      // DV rows for files no longer in the manifest simply never
      // match — stale positions are dead weight vacuum collects, not
      // a correctness hazard.
      val cols = base.columns
      val withPos = base.select(col("*"),
        expr("regexp_extract(_metadata.file_path, " +
          "'(data/[^/]+/[^/]+)$', 1)").as("_dv_f"),
        col("_metadata.row_index").as("_dv_ri"))
      val dv = spark.read.parquet(dvFiles.map(f => s"$root/$f"): _*)
        .select(col("file").as("_dv_f"), col("row_index").as("_dv_ri"))
      toLogical(withPos.join(dv, Seq("_dv_f", "_dv_ri"), "left_anti")
        .select(cols.map(col): _*))
    }
  }

  /** Key-range read with FILE-LEVEL skipping on the FIRST cluster
    * column: only files whose manifest [min,max] overlaps [lo,hi] are
    * opened (a file with no recorded stats is conservatively read).
    * The row filter is still applied, so the result is exact whether
    * or not stats exist — stats only shrink the scan, never the
    * answer.
    */
  /** The cluster header records the column's PHYSICAL name (the name
    * the file stats were computed under); resolve it back to the
    * logical name a caller-facing frame serves — identity without a
    * mapping.
    */
  private def logicalClusterCol(s: Snapshot, c: String): String =
    s.tableSchema.flatMap(_.fields.find(f =>
      physicalName(f).equalsIgnoreCase(c)).map(_.name)).getOrElse(c)

  def readRange(
      spark: SparkSession, root: String, lo: Long, hi: Long): DataFrame = {
    val s = latestSnapshot(spark, root)
    val c = s.clusterCol.getOrElse(throw new IllegalArgumentException(
      s"TxTable $root has no cluster column; readRange needs one"))
    readFiles(spark, root, prunedFiles(s, 0, lo, hi), s.dvFiles,
        s.tableSchema)
      .filter(col(logicalClusterCol(s, c)).between(lo, hi))
  }

  /** 2-D box read over a z-order-clustered table: files are pruned by
    * BOTH columns' manifest stats (a z-clustered file covers a compact
    * Morton segment, i.e. a tight bounding box in each dimension, so a
    * box predicate skips ~√-fraction of files per dimension instead of
    * pruning on one and scanning all of the other). Exact regardless
    * of stats — the row filter still applies.
    */
  def readBox(
      spark: SparkSession, root: String, loA: Long, hiA: Long,
      loB: Long, hiB: Long): DataFrame = {
    val s = latestSnapshot(spark, root)
    val cs = s.clusterCols
    require(cs.size == 2,
      s"TxTable $root has cluster columns $cs; readBox needs exactly 2")
    val pruned = prunedFiles(s, 0, loA, hiA)
      .intersect(prunedFiles(s, 1, loB, hiB))
    readFiles(spark, root, pruned, s.dvFiles, s.tableSchema)
      .filter(col(logicalClusterCol(s, cs.head)).between(loA, hiA) &&
        col(logicalClusterCol(s, cs(1))).between(loB, hiB))
  }

  /** The post-skipping file list for [lo,hi] on cluster column `idx` —
    * exposed so callers and specs can assert how much of the table a
    * range touches.
    */
  def prunedFiles(s: Snapshot, idx: Int, lo: Long, hi: Long): Seq[String] =
    s.files.filter { f =>
      s.stats.get(f).flatMap(_.lift(idx)).forall {
        case (mn, mx) => mx >= lo && mn <= hi
      }
    }

  /** [[prunedFiles]] on the first cluster column. */
  def prunedFiles(s: Snapshot, lo: Long, hi: Long): Seq[String] =
    prunedFiles(s, 0, lo, hi)

  /** Write `df`'s rows as new immutable data files; returns manifest
    * entries (path, optional per-cluster-column stats). One cluster
    * column range-repartitions the frame so each file holds a
    * contiguous key span — that is what makes the min/max entries
    * selective instead of all-overlapping. Two cluster columns lay the
    * frame out along the Morton curve ([[graft.ingest.ZOrder]]) so
    * each file is a tight bounding box in BOTH dimensions and either
    * column's stats prune. Per-file stats come from ONE aggregate over
    * the just-written files.
    */
  private def writeDataFiles(
      df: DataFrame, root: String, cluster: Seq[String],
      buckets: Int): Seq[String] =
    writeFilesUnder(df, root, s"data/${UUID.randomUUID()}", cluster, buckets)

  /** [[writeDataFiles]] with the destination namespace explicit — the
    * same write-invisible-then-publish machinery serves both corpus
    * files (`data/<uuid>`) and pinned index files
    * (`index/<name>/<uuid>`).
    */
  private def writeFilesUnder(
      df: DataFrame, root: String, sub: String, cluster: Seq[String],
      buckets: Int): Seq[String] = {
    val dest = new Path(root, sub)
    val toWrite = cluster match {
      case Seq()  => df
      case Seq(c) => df.repartitionByRange(buckets, col(c))
      case Seq(a, b) =>
        graft.ingest.ZOrder.zValue(df, a, b)
          .repartitionByRange(buckets, col("z"))
          .sortWithinPartitions(col("z"))
          .drop("z")
      case cs => throw new IllegalArgumentException(
        s"TxTable supports at most 2 cluster columns, got $cs")
    }
    toWrite.write.parquet(dest.toString)
    val f = fs(df.sparkSession, dest)
    val names = f.listStatus(dest).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted
    if (cluster.isEmpty) names.map(n => s"$sub/$n")
    else {
      val spark = df.sparkSession
      val keyed = spark.read.parquet(dest.toString)
        .select(input_file_name().as("_f") +:
          cluster.zipWithIndex.map { case (c, i) =>
            col(c).cast("long").as(s"_k$i") }: _*)
      val aggExprs = cluster.indices.flatMap(i => Seq(
        min(col(s"_k$i")).as(s"_mn$i"),
        max(col(s"_k$i")).as(s"_mx$i")))
      val stats = keyed
        .groupBy(col("_f"))
        .agg(aggExprs.head, aggExprs.tail: _*)
        .collect()
        .flatMap { r =>
          // an all-null (or non-castable) cluster column leaves
          // min/max null: emit the file WITHOUT stats — the
          // conservative always-read path — instead of an NPE
          // mid-write with data files already on disk
          if ((1 until 1 + 2 * cluster.size).exists(r.isNullAt)) None
          else Some((new Path(r.getString(0)).getName,
            cluster.indices.map(i =>
              (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))))
        }
        .toMap
      names.map { n =>
        stats.get(n) match {
          case Some(pairs) =>
            (s"$sub/$n" +: pairs.flatMap { case (mn, mx) =>
              Seq(mn.toString, mx.toString) }).mkString("\t")
          case None => s"$sub/$n" // empty file: no stats
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
    // publish via FileContext rename with Rename.NONE — fail-if-exists
    // is enforced by the filesystem layer (atomically on HDFS and
    // no-overwrite-rename stores), not by a check-then-act exists()
    // probe; two racing writers cannot both observe success for the
    // same version, so the loser's manifest is never clobbered
    val won =
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          f.getUri, spark.sparkContext.hadoopConfiguration)
        fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.FileNotFoundException => false
        case _: java.io.IOException => false
      }
    if (!won) f.delete(tmp, false)
    won
  }

  private def lineFor(s: Snapshot, f: String): String =
    s.stats.get(f) match {
      case Some(pairs) =>
        (f +: pairs.flatMap { case (mn, mx) =>
          Seq(mn.toString, mx.toString) }).mkString("\t")
      case None => f
    }

  // existing stats lines must survive a commit that re-lists old
  // files; CORPUS lines only — index lines are carried / rebuilt
  // explicitly per operation (append carries + extends, merge and
  // overwrite rebuild, compaction carries verbatim)
  private def entryLines(s: Snapshot): Seq[String] =
    s.files.map(lineFor(s, _))

  /** Deletion-vector lines carried verbatim (no stats). */
  private def dvLines(s: Snapshot): Seq[String] = s.dvFiles

  /** Per-index deletion-vector lines (optionally excluding one index
    * being dropped/rebuilt), carried verbatim — they travel with the
    * index lines they guard: carried where index lines carry
    * (append/compact/restore), dropped where indexes rebuild
    * (mergeInto/overwrite/buildIvfIndex's own name).
    */
  private def idxDvLines(
      s: Snapshot, except: Set[String] = Set.empty): Seq[String] =
    s.indexDvFiles.toSeq.sortBy(_._1).collect {
      case (n, fs) if !except.contains(n) => fs
    }.flatten

  /** Enforce the table's CHECK constraint (header `check=<sql expr>`)
    * on a batch of incoming rows BEFORE any file is written — SQL
    * standard semantics: a row violates only when the predicate is
    * FALSE (NULL passes). One batch-scale pass; the table itself is
    * never rescanned (rows already in the table passed at their own
    * write). Violations fail the WHOLE commit with a count — partial
    * writes would break the manifest's all-or-nothing story.
    */
  private def enforceCheck(
      df: DataFrame, headers: Map[String, String], op: String): Unit =
    headers.get("check").foreach { sql =>
      val bad = df.filter(!coalesce(expr(sql), lit(true))).count()
      if (bad > 0)
        throw new IllegalArgumentException(
          s"$op: $bad row(s) violate CHECK ($sql); commit aborted")
    }

  // ------------------------------------------------- schema evolution
  //
  // The manifest carries the table schema (`schema=<StructType json>`,
  // one line): every writer batch is validated against it BEFORE any
  // file lands, and every reader passes it to the scan so columns
  // resolve BY NAME across files written by different-width commits —
  // without it, spark.read.parquet picks ONE footer and a wider
  // append's columns silently vanish from reads. Evolution is explicit
  // (Delta's discipline): `append(..., mergeSchema = true)` may ADD
  // columns (the union schema publishes in the same commit; old files
  // read the new column as null), never change or drop a type.
  // Legacy tables without the header keep the old single-footer reads.

  import org.apache.spark.sql.types._

  // -------------------------------------------------- column mapping
  //
  // RENAME/DROP without rewriting a byte (Delta's column mapping,
  // re-derived): the declared schema's field METADATA carries each
  // column's PHYSICAL name — the name its bytes sit under in every
  // parquet file ever written. A rename is a pure header commit (the
  // logical name changes, physName pins the old one); reads scan BY
  // PHYSICAL name and alias back to logical; writes rename
  // logical→physical before any file lands, so mixed-generation
  // tables stay by-name consistent. A dropped column's physical name
  // is retired in the `dropped` header, and schema evolution refuses
  // to ADD a column whose name matches any live or retired physical
  // name — re-using it would resurrect old files' bytes under the new
  // column.

  /** Top-level-field metadata key holding the column's physical
    * (on-file) name; absent = physical equals logical.
    */
  private val PhysNameKey = "physName"

  /** The parquet-file field name a declared column's bytes live
    * under — its logical name until a rename pins the original.
    */
  private[graft] def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey)
    else f.name

  private def hasMapping(st: StructType): Boolean =
    st.fields.exists(f => physicalName(f) != f.name)

  /** The declared schema with every field under its PHYSICAL name —
    * what the parquet scan resolves against (metadata stripped; a
    * read schema carries none).
    */
  private def physicalSchema(st: StructType): StructType =
    StructType(st.fields.map(f =>
      StructField(physicalName(f), f.dataType, f.nullable)))

  private def declaredSchema(
      headers: Map[String, String]): Option[StructType] =
    headers.get("schema").map(j =>
      DataType.fromJson(j).asInstanceOf[StructType])

  /** Rename a batch's columns logical→physical before a corpus write
    * (no-op without a mapping). Columns outside the declared schema
    * (`_change_type` on a cdc frame) pass through untouched.
    */
  private def toPhysical(
      df: DataFrame, headers: Map[String, String]): DataFrame =
    declaredSchema(headers) match {
      case Some(st) if hasMapping(st) =>
        val byLower = st.fields.map(f =>
          f.name.toLowerCase(java.util.Locale.ROOT) -> physicalName(f)).toMap
        df.select(df.columns.map(c => col(c).as(
          byLower.getOrElse(c.toLowerCase(java.util.Locale.ROOT), c))): _*)
      case _ => df
    }

  /** Keep ONLY the column-mapping key through normalization — other
    * source-supplied field metadata is noise a schema header must not
    * memorialize, but losing physName would sever every renamed
    * column from its bytes.
    */
  private def keepPhys(m: Metadata): Metadata =
    if (m.contains(PhysNameKey))
      new MetadataBuilder()
        .putString(PhysNameKey, m.getString(PhysNameKey)).build()
    else Metadata.empty

  /** Canonical comparable/storable form: all nullable, metadata
    * reduced to the column-mapping key — nullability is a hint
    * parquet files disagree on harmlessly, not a schema identity.
    */
  private def nullNorm(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, nullNorm(f.dataType), nullable = true,
        keepPhys(f.metadata))))
    case ArrayType(et, _) => ArrayType(nullNorm(et), containsNull = true)
    case MapType(k, v, _) =>
      MapType(nullNorm(k), nullNorm(v), valueContainsNull = true)
    case other => other
  }

  private def normSchema(st: StructType): StructType =
    nullNorm(st).asInstanceOf[StructType]

  /** Reject case-duplicate column names ("v" beside "V") anywhere a
    * schema is about to be DECLARED: reads resolve case-insensitively
    * (Spark's default), so a case-duplicate schema header fails every
    * subsequent read — a table bricked at birth instead of rejected
    * before the first file lands. Applied by [[checkSchema]] for
    * append batches and directly by [[createClustered]]/[[overwrite]]
    * (whose frames BECOME the declared schema without passing through
    * checkSchema).
    */
  private def requireNoCaseDuplicates(st: StructType, op: String): Unit = {
    val dupes = st.fields
      .groupBy(f => f.name.toLowerCase(java.util.Locale.ROOT))
      .collect { case (_, fs) if fs.length > 1 => fs.map(_.name).toSeq }
    require(dupes.isEmpty,
      s"$op: case-duplicate columns ${dupes.mkString(",")} — reads " +
        "resolve case-insensitively, so the schema cannot be declared")
  }

  /** Validate an incoming batch against the table schema; returns the
    * headers the commit should publish. Strict mode: the batch's
    * column set and types must equal the declared schema exactly.
    * `mergeSchema`: columns present on both sides must type-match;
    * batch-only columns APPEND to the declared schema (old files
    * serve them as null); declared-only columns may be absent from
    * the batch (its files serve them as null). Legacy tables (no
    * header) pass through unvalidated.
    */
  private def checkSchema(
      df: DataFrame, headers: Map[String, String], op: String,
      mergeSchema: Boolean = false): Map[String, String] = {
    val declaredJson = headers.get("schema")
    if (declaredJson.isEmpty) return headers
    val declared = normSchema(
      DataType.fromJson(declaredJson.get).asInstanceOf[StructType])
    val incoming = normSchema(df.schema)
    // name matching is CASE-INSENSITIVE, like Spark's own parquet
    // column resolution (default spark.sql.caseSensitive=false):
    // treating "V" as a new column beside declared "v" would publish
    // a case-duplicate schema that fails every subsequent read
    def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    requireNoCaseDuplicates(incoming, op)
    val dm = declared.fields.map(f => key(f.name) -> f.dataType).toMap
    val im = incoming.fields.map(f => key(f.name) -> f.dataType).toMap
    val conflicts = im.keySet.intersect(dm.keySet)
      .filter(n => im(n) != dm(n))
    require(conflicts.isEmpty,
      s"$op: column type conflict for ${conflicts.toSeq.sorted.mkString(",")} " +
        s"(declared vs batch) — evolution may only ADD columns")
    val extra = incoming.fields.filterNot(f => dm.contains(key(f.name)))
    val missing = declared.fields.filterNot(f => im.contains(key(f.name)))
    if (!mergeSchema) {
      require(extra.isEmpty && missing.isEmpty,
        s"$op: batch schema ${incoming.simpleString} does not match the " +
          s"declared ${declared.simpleString}; pass mergeSchema = true " +
          "to add columns")
      headers
    } else if (extra.isEmpty) headers
    else {
      // resurrection guard (column mapping): an added column whose
      // name matches a RENAMED column's physical name — or a DROPPED
      // column's retired one — would serve old files' bytes as the
      // new column's values through the by-physical-name scan
      val physTaken = declared.fields.map(f => key(physicalName(f))).toSet
      val retired = headers.get("dropped").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet
      val clash = extra.filter(f =>
        physTaken.contains(key(f.name)) || retired.contains(key(f.name)))
      require(clash.isEmpty,
        s"$op: cannot add column(s) ${clash.map(_.name).mkString(",")} — " +
          "the name matches a renamed or dropped column's PHYSICAL " +
          "name; old files' bytes would resurrect under it (pick a " +
          "different name)")
      // an ADDED reserved name gets its physical mapping here, like
      // create/overwrite give one at schema establishment
      headers + ("schema" ->
        reserveMapped(StructType(declared.fields ++ extra)).json)
    }
  }

  /** Spark's parquet source reserves `_metadata` for the hidden
    * per-file metadata struct (file_path / row_index) that deletion-
    * vector application and the change feed join on; a DATA column
    * with that name shadows the hidden one, so every DV read fails
    * analysis — and the reference's record schema carries exactly
    * such a column (`RecordMeta` as `_metadata`). Schema-establishing
    * writes therefore pin a PHYSICAL on-file name for any reserved
    * top-level name through the existing column-mapping machinery:
    * bytes land under `_gm_metadata`, reads alias back to the logical
    * name like any renamed column, and the hidden metadata column
    * stays reachable. Mapped-already fields (a rename) are left
    * alone; the candidate name steps until free.
    */
  private val ReservedNames = Set("_metadata")

  private def reserveMapped(st: StructType): StructType = {
    def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val taken = st.fields.map(f => key(physicalName(f))).toSet
    StructType(st.fields.map { f =>
      if (!ReservedNames.contains(key(f.name)) || physicalName(f) != f.name) f
      else {
        var cand = "_gm" + f.name
        while (taken.contains(key(cand))) cand = "_gm" + cand
        f.copy(metadata = new MetadataBuilder()
          .putString(PhysNameKey, cand).build())
      }
    })
  }

  private def schemaHeaderFor(df: DataFrame): (String, String) =
    "schema" -> reserveMapped(normSchema(df.schema)).json

  /** Resolve the table's CHECK constraint (if any) against a
    * PROSPECTIVE schema — ANALYSIS ONLY, no job: a rename/drop that
    * would leave the CHECK referencing a gone column is rejected IN
    * THE SAME CALL instead of bricking every later append with an
    * unresolved-attribute error until [[setCheckConstraint]] (the
    * same commit-time interlock pinned indexes get).
    */
  private def validateCheckAgainst(
      spark: SparkSession, st: StructType,
      headers: Map[String, String], op: String): Unit =
    headers.get("check").foreach { sql =>
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), st)
      try empty.filter(expr(sql)).queryExecution.analyzed
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"$op: CHECK ($sql) no longer resolves against the new " +
              s"schema ${st.simpleString} — update it with " +
              "setCheckConstraint (or dropCheckConstraint) first", e)
      }
    }

  /** Columns a pinned index routes by — a rename/drop of one would
    * sever the index's routing from the corpus; the caller drops or
    * rebuilds the index first (the explicit-maintenance discipline).
    */
  private def indexReferencedCols(s: Snapshot): Map[String, String] =
    indexSpecs(s).flatMap {
      case iv: IvfSpec    => Seq(iv.idCol -> iv.name, iv.vecCol -> iv.name)
      case bm: Bm25Spec   => Seq(bm.idCol -> bm.name, bm.textCol -> bm.name)
      case ph: PhraseSpec => Seq(ph.idCol -> ph.name, ph.textCol -> ph.name)
    }.toMap

  /** RENAME a column as a PURE METADATA COMMIT — zero data rewrites
    * (Delta's column mapping, re-derived): the declared field takes
    * the new logical name and its metadata pins the PHYSICAL name its
    * bytes have always lived under, so files written before and after
    * the rename keep resolving by one physical name while every read
    * serves the new logical one. The old name is gone from the
    * declared schema: reads of it fail, strict appends carrying it
    * are rejected, and `mergeSchema` refuses to re-add any name that
    * matches a live physical name (the resurrection guard). At 100 TB
    * this turns a rename from a table-scale rewrite into one KB-scale
    * manifest write.
    *
    * Caller contract: a CHECK constraint or pinned index referencing
    * the column must be dropped/updated first — BOTH are interlocked
    * here: index references are rejected by name, and the CHECK SQL
    * is analysis-resolved against the post-rename schema
    * ([[validateCheckAgainst]]), so a breaking rename fails in THIS
    * call instead of bricking later appends. Read-modify-write
    * conflict semantics. Returns the new version.
    */
  def renameColumn(
      spark: SparkSession, root: String, oldName: String,
      newName: String): Long = {
    require(newName.nonEmpty && !newName.contains("\n") &&
      !newName.contains("\t"),
      s"renameColumn at $root: bad new column name '$newName'")
    val cur = latestSnapshot(spark, root)
    val st = cur.tableSchema.getOrElse(throw new IllegalArgumentException(
      s"renameColumn at $root: legacy table without a declared schema " +
        "header (recreate or overwrite to declare one)"))
    def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val idx = st.fields.indexWhere(f => key(f.name) == key(oldName))
    require(idx >= 0, s"renameColumn at $root: no column '$oldName'")
    require(!st.fields.zipWithIndex.exists { case (f, i) =>
      i != idx && key(f.name) == key(newName) },
      s"renameColumn at $root: column '$newName' already exists")
    indexReferencedCols(cur).collectFirst {
      case (c, n) if key(c) == key(oldName) => n
    }.foreach { n =>
      throw new IllegalArgumentException(
        s"renameColumn at $root: column '$oldName' routes pinned index " +
          s"'$n' — dropIndex (and rebuild under the new name) first")
    }
    val f = st.fields(idx)
    val nf = StructField(newName, f.dataType, f.nullable,
      new MetadataBuilder()
        .putString(PhysNameKey, physicalName(f)).build())
    val ns = StructType(st.fields.updated(idx, nf))
    validateCheckAgainst(spark, ns, cur.headers,
      s"renameColumn at $root ('$oldName' -> '$newName')")
    if (!tryCommit(spark, root, cur.version + 1,
        cur.headers + ("schema" -> normSchema(ns).json),
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur)))
      throw new CommitConflict(
        s"renameColumn at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** DROP a column as a pure metadata commit (zero rewrites): the
    * field leaves the declared schema — every read stops projecting
    * it — and its PHYSICAL name is retired in the `dropped` header so
    * schema evolution can never re-admit a column that would serve
    * the old bytes ([[checkSchema]]'s resurrection guard). The bytes
    * themselves stay in the files (merge-on-read economics; a
    * [[compact]]/[[recluster]] rewrite physically sheds them, since
    * the rewrite projects the declared schema). Same caller contract
    * as [[renameColumn]] for indexes and CHECK constraints; cluster
    * columns are additionally rejected (file stats and range reads
    * key on them — [[recluster]] away first). Returns the new version.
    */
  def dropColumn(
      spark: SparkSession, root: String, name: String): Long = {
    val cur = latestSnapshot(spark, root)
    val st = cur.tableSchema.getOrElse(throw new IllegalArgumentException(
      s"dropColumn at $root: legacy table without a declared schema header"))
    def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val idx = st.fields.indexWhere(f => key(f.name) == key(name))
    require(idx >= 0, s"dropColumn at $root: no column '$name'")
    require(st.fields.length > 1,
      s"dropColumn at $root: cannot drop the last column")
    indexReferencedCols(cur).collectFirst {
      case (c, n) if key(c) == key(name) => n
    }.foreach { n =>
      throw new IllegalArgumentException(
        s"dropColumn at $root: column '$name' routes pinned index " +
          s"'$n' — dropIndex first")
    }
    val phys = physicalName(st.fields(idx))
    require(!cur.clusterCols.exists(c => key(c) == key(phys)),
      s"dropColumn at $root: '$name' is a cluster column — recluster " +
        "to a different layout first")
    val ns = StructType(st.fields.patch(idx, Nil, 1))
    validateCheckAgainst(spark, ns, cur.headers,
      s"dropColumn at $root ('$name')")
    val retired = (cur.headers.get("dropped").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty) :+ key(phys))
      .distinct.mkString(",")
    if (!tryCommit(spark, root, cur.version + 1,
        cur.headers + ("schema" -> normSchema(ns).json)
          + ("dropped" -> retired),
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur)))
      throw new CommitConflict(
        s"dropColumn at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** Reject a batch that re-introduces an id a pinned index has
    * deletion-vector-masked: index DVs are BY VALUE (deleted ids,
    * [[deleteWhere]]), so admitting a re-inserted id would either keep
    * the new row masked in the index or — if the mask were lifted —
    * resurrect the OLD index entry beside the new one (two index rows,
    * one corpus row; corpus DVs are positional and unaffected).
    * Re-ingest of deleted ids goes through [[mergeInto]]/[[overwrite]],
    * which materialize the DVs and rebuild the index. One broadcast
    * semi-join per index WITH accumulated DVs (KB–MB side), skipped
    * entirely otherwise.
    */
  private def checkIndexDvReinsert(
      spark: SparkSession, root: String, s: Snapshot, df: DataFrame,
      op: String): Unit =
    indexSpecs(s).foreach { sp =>
      s.indexDvFiles.get(sp.name).filter(_.nonEmpty).foreach { dvf =>
        val ids = spark.read.parquet(dvf.map(f => s"$root/$f"): _*)
          .select(col("id").as("_dv_id"))
        val clash = df.select(col(sp.idCol).cast("long").as("_bid"))
          .join(broadcast(ids), col("_bid") === col("_dv_id"), "left_semi")
          .limit(1).count()
        require(clash == 0L,
          s"$op: batch re-inserts id(s) masked by index '${sp.name}' " +
            "deletion vectors — the old index entry would resurrect " +
            "beside the new row; re-ingest deleted ids via mergeInto/" +
            "overwrite (they materialize the DVs), or dropIndex first")
      }
    }

  /** The manifest lines of every pinned index (optionally excluding
    * one being rebuilt), stats carried forward verbatim.
    */
  private def indexLines(
      s: Snapshot, except: Set[String] = Set.empty): Seq[String] =
    s.indexFiles.toSeq.sortBy(_._1).collect {
      case (n, fs) if !except.contains(n) => fs.map(lineFor(s, _))
    }.flatten

  /** Create a new table at `root` (version 0). `clusterCol` (integral)
    * enables range-clustered files + manifest min/max stats on every
    * subsequent write; `buckets` bounds files per commit. Fails if a
    * table exists.
    */
  def create(
      df: DataFrame, root: String, clusterCol: Option[String] = None,
      buckets: Int = 8, check: Option[String] = None): Long =
    createClustered(df, root, clusterCol.toSeq, buckets, check)

  /** Create with explicit cluster columns: 0 (unclustered), 1 (range
    * clustering), or 2 (z-order — every write lays files along the
    * Morton curve and records BOTH columns' min/max, so [[readRange]]
    * on either and [[readBox]] on both prune at the file level).
    */
  def createClustered(
      df: DataFrame, root: String, clusterCols: Seq[String],
      buckets: Int = 8, check: Option[String] = None): Long = {
    require(versions(df.sparkSession, root).isEmpty,
      s"TxTable already exists at $root")
    require(clusterCols.size <= 2,
      s"TxTable supports at most 2 cluster columns, got $clusterCols")
    val headers0 = check.map(c => Map("check" -> c))
      .getOrElse(Map.empty[String, String])
    requireNoCaseDuplicates(df.schema, s"create at $root")
    enforceCheck(df, headers0, s"create at $root")
    val headers = headers0 + schemaHeaderFor(df) ++ (
      if (clusterCols.isEmpty) Map.empty[String, String]
      else Map("cluster" -> clusterCols.mkString(",")))
    // reserved-name mapping (`_metadata`) may already apply at v0
    val entries =
      writeDataFiles(toPhysical(df, headers), root, clusterCols, buckets)
    if (!tryCommit(df.sparkSession, root, 0L, headers, entries))
      throw new CommitConflict(s"concurrent create at $root")
    0L
  }

  /** One pinned index to build inside [[createIndexed]]'s single
    * commit — the public face of the internal IVF/BM25 specs.
    */
  sealed trait IndexBuild { def name: String }
  final case class IvfIndexBuild(
      name: String, idCol: String, vecCol: String,
      numCentroids: Int = 16) extends IndexBuild
  final case class Bm25IndexBuild(
      name: String, idCol: String, textCol: String,
      termBuckets: Int = 64) extends IndexBuild
  final case class PhraseIndexBuild(
      name: String, idCol: String, textCol: String,
      termBuckets: Int = 64) extends IndexBuild

  /** Create a table AND build its pinned indexes in ONE commit: data
    * files, every index's files and sidecars, and the index headers
    * publish under a single v0 manifest rename. Equivalent by
    * construction to `create` + `buildIvfIndex`/`buildBm25Index`
    * chains (same routing, same header algebra — each build there
    * reads back exactly the corpus this is handed), minus one
    * manifest round-trip, one corpus re-read and one commit PER
    * index: a create-then-index lifecycle of 1 + k commits collapses
    * to 1. `df` is read several times (data write, per-index routing,
    * BM25 moments, IVF k-means) — materialize nondeterministic frames
    * first, the usual multi-pass contract.
    */
  def createIndexed(
      df: DataFrame, root: String, indexes: Seq[IndexBuild],
      clusterCol: Option[String] = None, buckets: Int = 8,
      check: Option[String] = None): Long = {
    val spark = df.sparkSession
    require(versions(spark, root).isEmpty,
      s"TxTable already exists at $root")
    require(indexes.map(_.name).distinct.size == indexes.size,
      s"duplicate index names in ${indexes.map(_.name)}")
    indexes.foreach(ib => require(ib.name.matches("[A-Za-z0-9_-]+"),
      s"bad index name '${ib.name}'"))
    val clusterCols = clusterCol.toSeq
    val headers0 = check.map(c => Map("check" -> c))
      .getOrElse(Map.empty[String, String])
    requireNoCaseDuplicates(df.schema, s"createIndexed at $root")
    enforceCheck(df, headers0, s"createIndexed at $root")
    val baseHeaders = headers0 + schemaHeaderFor(df) ++ (
      if (clusterCols.isEmpty) Map.empty[String, String]
      else Map("cluster" -> clusterCols.mkString(",")))
    val entries =
      writeDataFiles(toPhysical(df, baseHeaders), root, clusterCols, buckets)
    // stage every index exactly as its standalone build would: files
    // land under root now, the manifest rename below publishes them
    val built: Seq[(String, String, Seq[String])] = indexes.map {
      case iv: IvfIndexBuild =>
        import org.apache.spark.ml.functions.array_to_vector
        val featured = df.withColumn("features",
          array_to_vector(col(iv.vecCol).cast("array<double>")))
        val model =
          graft.operators.Similarity.coarseQuantizer(featured, iv.numCentroids)
        import spark.implicits._
        val sidecarRel = s"index/${iv.name}/_centroids-${UUID.randomUUID()}"
        model.clusterCenters.zipWithIndex.toSeq
          .map { case (c, i) => (i, c.toArray.toSeq) }
          .toDF("cell", "centroid")
          .coalesce(1).write.parquet(new Path(root, sidecarRel).toString)
        val spec = IvfSpec(iv.name, sidecarRel, iv.idCol, iv.vecCol)
        val (idxEntries, _) = idxEntriesFor(spark, root, Seq(spec), df, buckets)
        (s"index:${iv.name}", s"$sidecarRel|${iv.idCol}|${iv.vecCol}",
          idxEntries)
      case bm: Bm25IndexBuild =>
        val spec0 = Bm25Spec(bm.name, bm.idCol, bm.textCol,
          bm.termBuckets, 0L, 0L)
        val (idxEntries, moments) =
          idxEntriesFor(spark, root, Seq(spec0), df, buckets)
        val (n, sd) = moments(bm.name)
        (s"index:${bm.name}",
          spec0.copy(nDocs = n, sumDl = sd).headerValue, idxEntries)
      case ph: PhraseIndexBuild =>
        val spec = PhraseSpec(ph.name, ph.idCol, ph.textCol,
          ph.termBuckets)
        val (idxEntries, _) =
          idxEntriesFor(spark, root, Seq(spec), df, buckets)
        (s"index:${ph.name}", spec.headerValue, idxEntries)
    }
    val headers = baseHeaders ++ built.map(b => b._1 -> b._2)
    if (!tryCommit(spark, root, 0L, headers,
        entries ++ built.flatMap(_._3)))
      throw new CommitConflict(s"concurrent create at $root")
    0L
  }

  /** Blind append: retries past lost races (bounded), since adding
    * files commutes with any interleaved commit's file additions.
    */
  def append(df: DataFrame, root: String, maxRetries: Int = 10,
      buckets: Int = 8, mergeSchema: Boolean = false): Long = {
    val spark = df.sparkSession
    val pre = latestSnapshot(spark, root)
    enforceCheck(df, pre.headers, s"append at $root")
    // the checked headers carry any schema the batch ADDS (mergeSchema)
    // including a reserved-name physical mapping — the batch's files
    // must land under those physical names, not pre's
    val preChecked = checkSchema(df, pre.headers, s"append at $root",
      mergeSchema)
    val entries =
      writeDataFiles(toPhysical(df, preChecked), root,
        pre.clusterCols, buckets)
    // pinned indexes: route ONLY the new rows through each sidecar —
    // the corpus-side delta and the index-side delta publish together
    val (idxEntries, idxMoments) =
      idxEntriesFor(spark, root, indexSpecs(pre), df, buckets)
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = latestSnapshot(spark, root)
      if (!sameIndexes(pre, cur))
        throw new CommitConflict(
          s"append at $root: index set changed since v${pre.version}")
      // a CHECK constraint installed since `pre` must gate THIS commit
      // too (validate-then-commit is not atomic across retries)
      if (cur.headers.get("check") != pre.headers.get("check"))
        enforceCheck(df, cur.headers, s"append at $root")
      // per attempt: a concurrent deleteWhere may have masked ids this
      // batch re-inserts
      checkIndexDvReinsert(spark, root, cur, df, s"append at $root")
      // schema validation + union-widening against THIS attempt's tip;
      // BM25 index moments fold into the tip's (a lost race re-folds)
      val headers = indexHeadersWith(cur,
        checkSchema(df, cur.headers, s"append at $root", mergeSchema),
        idxMoments, add = true)
      if (tryCommit(spark, root, cur.version + 1, headers,
          entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
            idxDvLines(cur) ++ entries ++ idxEntries))
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
    enforceCheck(df, pre.headers, s"addStreamingBatch at $root")
    checkSchema(df, pre.headers, s"addStreamingBatch at $root")
    val entries =
      writeDataFiles(toPhysical(df, pre.headers), root,
        pre.clusterCols, buckets)
    val (idxEntries, idxMoments) =
      idxEntriesFor(spark, root, indexSpecs(pre), df, buckets)
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = latestSnapshot(spark, root)
      if (committed(cur)) return None // raced with our own redelivery
      if (!sameIndexes(pre, cur))
        throw new CommitConflict(
          s"addStreamingBatch at $root: index set changed since v${pre.version}")
      if (cur.headers.get("check") != pre.headers.get("check"))
        enforceCheck(df, cur.headers, s"addStreamingBatch at $root")
      checkIndexDvReinsert(spark, root, cur, df,
        s"addStreamingBatch at $root")
      if (tryCommit(spark, root, cur.version + 1,
          indexHeadersWith(cur,
            cur.headers + (key -> batchId.toString), idxMoments,
            add = true),
          entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
            idxDvLines(cur) ++ entries ++ idxEntries))
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
    requireNoCaseDuplicates(df.schema, s"overwrite at $root")
    enforceCheck(df, cur.headers, s"overwrite at $root")
    // contents replace wholesale: the declared schema follows the new
    // frame (legacy tables stay headerless), and with every old data
    // file dereferenced the column-mapping era ends here — the
    // replacing files land under LOGICAL names, so the cluster header
    // is rewritten from the old physical names to the logical ones the
    // new files carry, and the `dropped` retirement list (which only
    // guards against resurrecting OLD files' bytes) is cleared
    val logicalCluster = cur.clusterCols.map(c => logicalClusterCol(cur, c))
    val headers0 = {
      val base =
        if (cur.headers.contains("schema"))
          cur.headers - "dropped" + schemaHeaderFor(df)
        else cur.headers
      if (logicalCluster.isEmpty) base
      else base + ("cluster" -> logicalCluster.mkString(","))
    }
    val (idxEntries, idxMoments) =
      idxEntriesFor(spark, root, indexSpecs(cur), df, buckets)
    // indexes rebuild from the replacing frame: its moments ARE the
    // corpus moments now
    val headers = indexHeadersWith(cur, headers0, idxMoments, add = false)
    // the rename-era mapping ends here, but reserved-name mapping
    // (`_metadata`) may re-apply through the fresh schema header
    val entries =
      writeDataFiles(toPhysical(df, headers), root, logicalCluster,
        buckets) ++ idxEntries
    if (!tryCommit(spark, root, expectedVersion + 1, headers, entries))
      throw new CommitConflict(
        s"overwrite at $root: version ${expectedVersion + 1} already " +
          "committed by a concurrent writer; re-derive from the new snapshot")
    expectedVersion + 1
  }

  /** Transactional MERGE INTO: resolve the latest snapshot, apply
    * [[graft.operators.MergeUpsert]] CDC semantics, publish the result
    * as one atomic new version. The `action` column is merge-run
    * metadata, not table state — it is not persisted. Returns the new
    * version.
    *
    * Conflict handling (the harvest-while-serving hazard — cf. the
    * reference's soft-delete upserts, `tests/test_serve.py:274-306`):
    * a merge is read-modify-write over the WHOLE table, so a commit
    * that interleaves between snapshot resolution and publish makes
    * the derived result stale — publishing it anyway would silently
    * drop the interleaved commit's rows (the lost-update anomaly).
    * The `Rename.NONE` CAS refuses the stale publish; then:
    *   - `maxRetries = 0` (default): throw [[CommitConflict]] — the
    *     caller re-runs against the new snapshot;
    *   - `maxRetries > 0`: RE-READ the latest snapshot, RE-RUN the
    *     entire merge against it (the source is re-evaluated — it
    *     must be deterministic, the standard multi-pass contract),
    *     and try the next version. Every committed version v+1 thus
    *     equals merge(snapshot v, source) EXACTLY, so concurrent
    *     merges serialize in commit order — the final table equals
    *     the serial replay of the merges in version order (asserted
    *     cross-process by TxRaceSpec's two-JVM merge race). Data
    *     files written for a lost attempt are unreferenced and
    *     reclaimed by [[vacuum]].
    */
  def mergeInto(
      root: String, source: DataFrame, keyCol: String,
      valueCols: Seq[String], tombstoneCol: String,
      buckets: Int = 8, maxRetries: Int = 0): Long = {
    val spark = source.sparkSession
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      val cur = latestSnapshot(spark, root)
      // CHECK applies to the rows this merge introduces (upserts);
      // surviving rows passed at their own write, tombstones remove
      enforceCheck(source.filter(!coalesce(col(tombstoneCol), lit(false))),
        cur.headers, s"mergeInto at $root")
      val target = readVersion(spark, root, cur.version)
      val merged = graft.operators.MergeUpsert.merge(
          target, source, keyCol, valueCols, tombstoneCol)
        .drop("action")
      // pinned indexes are REBUILT from the merged result inside the
      // same commit (the merge already rewrites every corpus file, so
      // re-routing the result is proportional cost) — version v+1's
      // index rows are exactly its corpus rows, never a stale mix;
      // BM25 moments follow the merged frame absolutely
      val (idxEntries, idxMoments) =
        idxEntriesFor(spark, root, indexSpecs(cur), merged, buckets)
      // change feed enabled: the SAME commit also publishes explicit
      // row-level change files ([[mergeChanges]] — source-bounded,
      // never table-bounded), so the change stream tracks this merge
      // instead of failing on its rewrite
      val cdcEntries =
        if (!cur.headers.get("cdc").contains("true")) Seq.empty[String]
        else {
          val rel = s"cdc/${UUID.randomUUID()}"
          // physical field names like every corpus file — the stream's
          // record reader resolves by the declared physical name
          toPhysical(
              mergeChanges(target, source, keyCol, valueCols, tombstoneCol),
              cur.headers)
            .coalesce(math.max(1, buckets))
            .write.parquet(new Path(root, rel).toString)
          val f = fs(spark, new Path(root, rel))
          f.listStatus(new Path(root, rel)).toSeq
            .map(_.getPath.getName)
            .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
            .sorted
            .map(n => s"$rel/$n")
        }
      val entries = writeDataFiles(toPhysical(merged, cur.headers), root,
        cur.clusterCols, buckets) ++ idxEntries ++ cdcEntries
      if (tryCommit(spark, root, cur.version + 1,
          indexHeadersWith(cur, cur.headers, idxMoments, add = false),
          entries))
        committed = cur.version + 1
      else if (attempt >= maxRetries)
        throw new CommitConflict(
          s"mergeInto at $root: snapshot v${cur.version} went stale " +
            "during the merge; re-run against the new snapshot")
      else attempt += 1
    }
    committed
  }

  /** Add (or replace) the table's CHECK constraint — header
    * `check=<spark sql boolean expr>`, enforced on every subsequent
    * writer batch ([[append]], [[addStreamingBatch]], [[mergeInto]]
    * upserts, [[overwrite]], [[create]]) BEFORE any file lands, SQL
    * semantics (NULL passes). Setting it validates the CURRENT table
    * once (one scan) so the constraint is an invariant, not a
    * from-now-on hope. Read-modify-write conflict semantics.
    */
  def setCheckConstraint(
      spark: SparkSession, root: String, checkExpr: String): Long = {
    require(!checkExpr.contains("\n"),
      "check expression must be single-line (manifest header format)")
    val cur = latestSnapshot(spark, root)
    enforceCheck(readVersion(spark, root, cur.version),
      Map("check" -> checkExpr), s"setCheckConstraint at $root")
    if (!tryCommit(spark, root, cur.version + 1,
        cur.headers + ("check" -> checkExpr),
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur)))
      throw new CommitConflict(
        s"setCheckConstraint at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** Enable/disable the table's CHANGE FEED (header `cdc=true` — the
    * Delta `enableChangeDataFeed` shape): while enabled, every
    * [[mergeInto]] commit writes its row-level changes (`insert`,
    * `update_preimage`/`update_postimage` for matched upserts,
    * `delete` for matched tombstones) as explicit parquet under the
    * manifest's `cdc/` namespace, in the SAME commit as the rewrite —
    * so [[readChangeStream]] can track the table through the
    * reference's upsert-heavy harvest traffic instead of failing on
    * the rewrite guard. Opt-in because the change extraction costs
    * one extra source-keys join against the target per merge.
    * Read-modify-write conflict semantics. Returns the new version.
    */
  def setChangeFeed(
      spark: SparkSession, root: String, enabled: Boolean): Long = {
    val cur = latestSnapshot(spark, root)
    val headers =
      if (enabled) cur.headers + ("cdc" -> "true") else cur.headers - "cdc"
    if (!tryCommit(spark, root, cur.version + 1, headers,
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur)))
      throw new CommitConflict(
        s"setChangeFeed at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** The row-level changes one merge produces, in the Delta-CDF shape:
    * one `target RIGHT JOIN source` on the key (output bounded by the
    * SOURCE — the CDC feed of a harvest batch, never the table;
    * broadcasts when the source does), exploded into tagged rows:
    * matched tombstone → `delete` (pre-image values); matched upsert →
    * `update_preimage` + `update_postimage`; unmatched upsert →
    * `insert`; unmatched tombstone → nothing (MERGE's no-op). The
    * untouched rest of the table appears in NO change row — exactly
    * what lets a consumer fold the feed instead of re-reading the
    * rewrite.
    */
  private def mergeChanges(
      target: DataFrame, source: DataFrame, keyCol: String,
      valueCols: Seq[String], tombstoneCol: String): DataFrame = {
    val t = target.select(col(keyCol),
      struct(valueCols.map(col): _*).as("_tv"))
    val s = source.select(col(keyCol),
      struct(valueCols.map(col): _*).as("_sv"),
      coalesce(col(tombstoneCol), lit(false)).as("_del"))
    t.join(s, Seq(keyCol), "right")
      .filter(col("_tv").isNotNull || !col("_del"))
      .select(col(keyCol), explode(
        when(col("_tv").isNotNull && col("_del"),
          array(struct(col("_tv").as("v"), lit("delete").as("ct"))))
        .when(col("_tv").isNotNull,
          array(
            struct(col("_tv").as("v"), lit("update_preimage").as("ct")),
            struct(col("_sv").as("v"), lit("update_postimage").as("ct"))))
        .otherwise(
          array(struct(col("_sv").as("v"), lit("insert").as("ct")))))
        .as("_c"))
      .select(col(keyCol) +:
        valueCols.map(c => col("_c.v").getField(c).as(c)) :+
        col("_c.ct").as("_change_type"): _*)
  }

  /** Drop the CHECK constraint (header removed; data untouched). */
  def dropCheckConstraint(spark: SparkSession, root: String): Long = {
    val cur = latestSnapshot(spark, root)
    require(cur.headers.contains("check"), s"no CHECK constraint at $root")
    if (!tryCommit(spark, root, cur.version + 1, cur.headers - "check",
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur)))
      throw new CommitConflict(
        s"dropCheckConstraint at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** RESTORE the table to an earlier version AS A NEW COMMIT (the
    * Delta `RESTORE` shape): version v+1 re-lists `toVersion`'s
    * complete state — data files, stats, pinned-index lines, deletion
    * vectors, and headers — so the rollback is itself versioned,
    * auditable, and concurrent-safe (rename-arbitrated like every
    * commit; a lost race means the tip moved and the caller decides
    * against the new history). Nothing is copied: manifests reference
    * immutable files, so restore is a KB-scale manifest write no
    * matter the table size — but the restored files must still exist
    * ([[vacuum]] retention gates how far back a restore can reach;
    * the [[readVersion]] manifest check fails fast past the horizon).
    * Returns the new version.
    */
  def restore(spark: SparkSession, root: String, toVersion: Long): Long = {
    val cur = latestSnapshot(spark, root)
    require(toVersion <= cur.version,
      s"restore at $root: version $toVersion is ahead of v${cur.version}")
    val target = snapshot(spark, root, toVersion)
    if (!tryCommit(spark, root, cur.version + 1, target.headers,
        entryLines(target) ++ indexLines(target) ++ dvLines(target) ++
          idxDvLines(target)))
      throw new CommitConflict(
        s"restore at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** DESCRIBE HISTORY: one row per committed version — (version,
    * n_files, n_index_files, n_dv_files, headers as sorted
    * `k=v` CSV). `n_dv_files` counts corpus position files AND
    * per-index deleted-ID files (both are the version's
    * merge-on-read state). Manifest metadata only; no data file is
    * opened.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(spark, root).map { v =>
      val s = snapshot(spark, root, v)
      (v, s.files.size.toLong,
        s.indexFiles.values.map(_.size).sum.toLong,
        s.dvFiles.size.toLong +
          s.indexDvFiles.values.map(_.size).sum.toLong,
        s.headers.toSeq.sortBy(_._1)
          .map { case (k, x) => s"$k=$x" }.mkString(","))
    }.toDF("version", "n_files", "n_index_files", "n_dv_files", "headers")
  }

  /** MERGE-ON-READ delete: rows matching `predicate` disappear from
    * every subsequent read WITHOUT rewriting a single data byte — the
    * deletion-vector design (Delta DVs / Iceberg position deletes,
    * re-derived on public primitives): the matching rows' POSITIONS
    * (root-relative file, `_metadata.row_index`) persist as parquet
    * under `dv/<uuid>/`, the manifest lists them in the `dv/`
    * namespace, and readers anti-join positions during the scan. At
    * 100 TB this turns a GDPR-style delete from a table-scale rewrite
    * ([[mergeInto]] tombstones — copy-on-write) into one predicate
    * scan plus KB–MB of position rows.
    *
    * Contracts:
    *  - cost: one DV-aware scan of the table (the predicate pushes
    *    down normally) + one position write; read-side cost is one
    *    anti-join against the accumulated positions until a rewrite
    *    materializes them.
    *  - [[mergeInto]]/[[compact]]/[[overwrite]] MATERIALIZE deletes:
    *    they read through the DVs and rewrite survivors, so their
    *    commits drop the `dv/` lines; [[autoCompact]] carries them
    *    (positions of rewritten small files go stale harmlessly —
    *    they reference file names no manifest lists).
    *  - double deletes are no-ops: the matching scan is itself
    *    DV-aware, so already-deleted rows can't re-match. A predicate
    *    matching nothing commits nothing and returns the current
    *    version.
    *  - pinned derived indexes ([[buildIvfIndex]]) get their own DV
    *    channel IN THE SAME COMMIT: the matching scan denormalizes
    *    each index's id column into the position file, a per-index
    *    `idxdv/<name>/` deleted-ID sidecar is projected from it (no
    *    second corpus scan), and every probe/read anti-joins those
    *    ids exactly like corpus reads anti-join positions — so a
    *    GDPR delete on an indexed 100 TB table is still one predicate
    *    scan, and the both-or-neither pin holds (one manifest rename
    *    publishes corpus DV + index DV). Requires the index id column
    *    to identify its row (the AnnIndex contract). [[mergeInto]]/
    *    [[overwrite]] materialize index DVs too (they rebuild the
    *    index from the DV-aware merged corpus); [[compact]]/
    *    [[autoCompact]] carry them with the index lines they guard.
    *  - optimistic retry like [[append]]: a lost race re-reads the
    *    latest snapshot and re-runs the matching scan.
    *
    * Returns the committed version (or the current one for an empty
    * match).
    */
  def deleteWhere(
      spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      maxRetries: Int = 10, dvBuckets: Int = 1): Long =
    deleteImpl(spark, root, _.filter(predicate), _.files, maxRetries,
      dvBuckets)

  /** [[deleteWhere]] for an explicit KEY SET: rows whose `keyCol`
    * equals any key of `keys` (deduplicated here) are DV-masked via a
    * BROADCAST SEMI-JOIN — the at-scale form of `isInCollection` for
    * key sets too large to inline. A retention-window CDC catch-up
    * batch can carry 10⁵+ delete keys; as an `In` literal list those
    * are 10⁵ expression nodes the driver analyzes/codegens BEFORE any
    * data is read (plan-size blowup), and parquet pushdown gives up
    * far below that anyway. The semi-join keeps the plan O(1), ships
    * the keys once per executor, and stays exact. Same DV semantics,
    * retry loop and pinned-index ride-along as [[deleteWhere]].
    */
  def deleteKeys(
      spark: SparkSession, root: String, keyCol: String,
      keys: DataFrame, maxRetries: Int = 10, dvBuckets: Int = 1): Long = {
    val k = keys.select(col(keyCol)).distinct()
    deleteImpl(spark, root,
      _.join(broadcast(k), Seq(keyCol), "left_semi"),
      _.files, maxRetries, dvBuckets)
  }

  /** [[deleteWhere]] restricted to the FIRST cluster column's range
    * [lo, hi], with the matching scan FILE-PRUNED by manifest stats —
    * a key-range delete on a 100 TB clustered table opens only the
    * files whose [min,max] overlaps the range (the [[readRange]]
    * skipping applied to the write side). Exact regardless of stats:
    * the row predicate still gates every position.
    */
  def deleteRange(
      spark: SparkSession, root: String, lo: Long, hi: Long,
      maxRetries: Int = 10, dvBuckets: Int = 1): Long = {
    val snap = latestSnapshot(spark, root)
    val c = snap.clusterCol.getOrElse(
      throw new IllegalArgumentException(
        s"TxTable $root has no cluster column; deleteRange needs one"))
    deleteImpl(spark, root,
      _.filter(col(logicalClusterCol(snap, c)).between(lo, hi)),
      s => prunedFiles(s, 0, lo, hi), maxRetries, dvBuckets)
  }

  private def deleteImpl(
      spark: SparkSession, root: String,
      matcher: DataFrame => DataFrame,
      candidates: Snapshot => Seq[String],
      maxRetries: Int, dvBuckets: Int): Long = {
    var attempt = 0
    while (true) {
      val cur = latestSnapshot(spark, root)
      val specs = indexSpecs(cur)
      val cand = candidates(cur)
      if (cand.isEmpty) return cur.version // no file can match
      // DV-aware scan with positions: already-deleted rows can't match
      // (schema-specified so a predicate on an evolved column works
      // against pre-evolution files). The scan resolves by PHYSICAL
      // name; logical names are restored before the caller's predicate
      // sees a column (column mapping — the position columns ride).
      val base = cur.tableSchema.map(physicalSchema)
        .fold(spark.read)(spark.read.schema)
        .parquet(cand.map(f => s"$root/$f"): _*)
      val withPosPhys = base.select(col("*"),
        expr("regexp_extract(_metadata.file_path, " +
          "'(data/[^/]+/[^/]+)$', 1)").as("_dv_f"),
        col("_metadata.row_index").as("_dv_ri"))
      val withPos = cur.tableSchema match {
        case Some(st) if hasMapping(st) =>
          withPosPhys.select(st.fields.map(f =>
            col(physicalName(f)).as(f.name)) ++
            Seq(col("_dv_f"), col("_dv_ri")): _*)
        case _ => withPosPhys
      }
      val live =
        if (cur.dvFiles.isEmpty) withPos
        else withPos.join(
          spark.read.parquet(cur.dvFiles.map(f => s"$root/$f"): _*)
            .select(col("file").as("_dv_f"), col("row_index").as("_dv_ri")),
          Seq("_dv_f", "_dv_ri"), "left_anti")
      // pinned indexes ride along: the SAME matching scan also yields
      // each index's deleted ids (denormalized into the position file,
      // columnar — corpus readers never decode them), so the delete
      // stays ONE predicate scan regardless of index count. Probes
      // anti-join these ids exactly like corpus reads anti-join
      // positions; requires the index id column to identify its row
      // (the AnnIndex contract — routeRows maps rows 1:1).
      val idCols = specs.map(sp =>
        col(sp.idCol).cast("long").as(s"_id_${sp.name}"))
      // BM25 indexes also need each deleted doc's LENGTH (to decrement
      // the header's exact (n, Σdl) moments — same tokenization as the
      // build, denormalized into the position file so the moment
      // update reads KB, not the corpus)
      val bmSpecs = specs.collect { case bm: Bm25Spec => bm }
      val dlCols = bmSpecs.map(bm =>
        size(split(lower(trim(col(bm.textCol))), "\\s+"))
          .cast("long").as(s"_dl_${bm.name}"))
      val hits = matcher(live)
        .select(col("_dv_f").as("file") +:
          col("_dv_ri").as("row_index") +: (idCols ++ dlCols): _*)
      val rel = s"dv/${UUID.randomUUID()}"
      val dest = new Path(root, rel)
      hits.coalesce(math.max(1, dvBuckets))
        .write.parquet(dest.toString)
      val f = fs(spark, dest)
      val names = f.listStatus(dest).toSeq
        .map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
        .sorted
      // one aggregate over the KB–MB position file: the match count
      // AND, per pinned index, a NULL-id count — a NULL id (legacy row
      // ingested before routeRows enforced the contract) would write a
      // DV entry the equality anti-join never matches, silently
      // keeping the index entry alive after this delete
      val posAgg = spark.read.parquet(dest.toString).agg(
        count(lit(1)).as("_n"),
        specs.map(sp => sum(when(col(s"_id_${sp.name}").isNull, 1L)
          .otherwise(0L)).as(s"_nulls_${sp.name}")) ++
          bmSpecs.map(bm => coalesce(sum(col(s"_dl_${bm.name}")), lit(0L))
            .as(s"_sumdl_${bm.name}")): _*).head()
      val n = posAgg.getLong(0)
      if (n == 0) {
        f.delete(dest, true) // nothing matched: no commit, no garbage
        return cur.version
      }
      specs.zipWithIndex.foreach { case (sp, i) =>
        if (posAgg.getLong(i + 1) > 0) {
          f.delete(dest, true)
          throw new IllegalArgumentException(
            s"deleteWhere at $root: ${posAgg.getLong(i + 1)} matched " +
              s"row(s) have a NULL (or non-long-castable) '${sp.idCol}' " +
              s"id for index '${sp.name}' — their index entries cannot " +
              "be deletion-vector-masked; rebuild the index over " +
              "non-null ids first")
        }
      }
      // per-index deleted-ID sidecars, projected from the (KB–MB)
      // position file just written — no second corpus scan
      val idxDvEntries = specs.map { sp =>
        val idxRel = s"idxdv/${sp.name}/${UUID.randomUUID()}"
        spark.read.parquet(dest.toString)
          .select(col(s"_id_${sp.name}").as("id")).distinct()
          .coalesce(1)
          .write.parquet(new Path(root, idxRel).toString)
        val idxNames = f.listStatus(new Path(root, idxRel)).toSeq
          .map(_.getPath.getName)
          .filter(nm => nm.endsWith(".parquet") && !nm.startsWith("_"))
          .sorted
        (idxRel, idxNames.map(nm => s"$idxRel/$nm"))
      }
      // BM25 header moments decrement by the delete's exact (n, Σdl) —
      // negative deltas through the same integer fold appends use, so
      // a probe at v+1 divides stats consistent with its live postings
      val delMoments = bmSpecs.zipWithIndex.map { case (bm, j) =>
        bm.name -> (-n, -posAgg.getLong(1 + specs.size + j))
      }.toMap
      if (tryCommit(spark, root, cur.version + 1,
          indexHeadersWith(cur, cur.headers, delMoments, add = true),
          entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
            idxDvLines(cur) ++ names.map(nm => s"$rel/$nm") ++
            idxDvEntries.flatMap(_._2)))
        return cur.version + 1
      // lost the race: unstage everything and retry against the new tip
      f.delete(dest, true)
      idxDvEntries.foreach { case (idxRel, _) =>
        f.delete(new Path(root, idxRel), true) }
      attempt += 1
      if (attempt > maxRetries)
        throw new CommitConflict(
          s"deleteWhere at $root lost $maxRetries commit races")
    }
    -1L // unreachable
  }

  /** Rewrite the table into `buckets` files — the small-file
    * compaction per-batch streaming commits need (every micro-batch
    * adds files; the read amortizes only if something folds them back
    * down). Contents are bit-identical (same rows, re-clustered);
    * read-modify-write conflict semantics. Returns the new version.
    */
  def compact(spark: SparkSession, root: String, buckets: Int = 8): Long =
    rewriteClustered(spark, root,
      latestSnapshot(spark, root).clusterCols, buckets, "compact",
      keepHeader = true)

  /** RECLUSTER (the `OPTIMIZE … ZORDER BY` face): rewrite the table's
    * rows into a NEW clustering layout — 0 (unclustered), 1 (range) or
    * 2 (z-order) columns — publishing new files, fresh per-file
    * min/max stats, and the updated `cluster=` header in ONE commit.
    * This is how a table whose query pattern changed (a second hot
    * predicate column appears) migrates to 2-D skipping without a
    * recreate: at 100 TB it is one table-scale rewrite that buys every
    * subsequent [[readRange]]/[[readBox]]/[[deleteRange]] file-level
    * pruning on the new keys. Same contracts as [[compact]]:
    * read-modify-write conflict semantics, DVs MATERIALIZE (survivors
    * rewritten), pinned index lines + index DVs carry verbatim (rows
    * preserved). Returns the new version.
    */
  def recluster(
      spark: SparkSession, root: String, clusterCols: Seq[String],
      buckets: Int = 8): Long = {
    // callers name LOGICAL columns; the layout, stats, and the
    // cluster= header live under PHYSICAL names (column mapping)
    val cur = latestSnapshot(spark, root)
    val phys = clusterCols.map { c =>
      cur.tableSchema
        .flatMap(_.fields.find(_.name.equalsIgnoreCase(c))
          .map(physicalName))
        .getOrElse(c)
    }
    rewriteClustered(spark, root, phys, buckets, "recluster",
      keepHeader = false)
  }

  /** Shared rewrite body of [[compact]] and [[recluster]]: read the
    * latest snapshot through its DVs, rewrite into `clusterCols`
    * layout, commit with index lines + index DVs carried (rows are
    * preserved, so pinned indexes stay valid). `keepHeader` keeps the
    * current `cluster=` header (compact); otherwise it follows
    * `clusterCols` (recluster).
    */
  private def rewriteClustered(
      spark: SparkSession, root: String, clusterCols: Seq[String],
      buckets: Int, op: String, keepHeader: Boolean): Long = {
    require(clusterCols.size <= 2,
      s"TxTable supports at most 2 cluster columns, got $clusterCols")
    val cur = latestSnapshot(spark, root)
    // the rewrite lands under PHYSICAL names (by-name consistency with
    // every older file); cluster cols arrive physical from compact
    // (header values) and were mapped by recluster's entry point
    val all = toPhysical(readVersion(spark, root, cur.version), cur.headers)
    val entries = clusterCols match {
      case Seq() => writeDataFiles(all.coalesce(buckets), root, Nil, buckets)
      case cs    => writeDataFiles(all, root, cs, buckets)
    }
    val headers =
      if (keepHeader) cur.headers
      else if (clusterCols.isEmpty) cur.headers - "cluster"
      else cur.headers + ("cluster" -> clusterCols.mkString(","))
    if (!tryCommit(spark, root, cur.version + 1, headers,
        entries ++ indexLines(cur) ++ idxDvLines(cur)))
      throw new CommitConflict(
        s"$op at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** Incremental compaction — the production OPTIMIZE shape: rewrite
    * ONLY files smaller than `smallBytes`, bin-packed into
    * ~`targetBytes` outputs, and keep every already-large file
    * untouched (its bytes are never read or rewritten). A full
    * [[compact]] rewrites the whole table every time — at 100 TB that
    * is a table-scale write to fold in a few KB-scale streaming
    * commits; this touches |small files| only, so the cost tracks the
    * accretion rate, not the table size. No-op (returns None) when
    * fewer than `minSmallFiles` qualify. Read-modify-write conflict
    * semantics like [[compact]]. Returns the committed version.
    */
  def autoCompact(
      spark: SparkSession, root: String, smallBytes: Long = 32L << 20,
      targetBytes: Long = 128L << 20, minSmallFiles: Int = 4): Option[Long] = {
    val cur = latestSnapshot(spark, root)
    val f = fs(spark, new Path(root))
    val sized = cur.files.map { rel =>
      rel -> f.getFileStatus(new Path(root, rel)).getLen
    }
    val (small, large) = sized.partition(_._2 < smallBytes)
    if (small.size < minSmallFiles) return None
    val smallDf = readFiles(spark, root, small.map(_._1), cur.dvFiles,
      cur.tableSchema)
    val outFiles = math.max(1,
      math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    val entries = writeDataFiles(toPhysical(smallDf, cur.headers), root,
      cur.clusterCols, outFiles)
    val keptLarge = large.map(_._1).toSet
    val keptLines = entryLines(cur).filter { line =>
      keptLarge.contains(line.split("\t").head)
    }
    if (!tryCommit(spark, root, cur.version + 1, cur.headers,
        keptLines ++ entries ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur)))
      throw new CommitConflict(
        s"autoCompact at $root: snapshot v${cur.version} went stale")
    Some(cur.version + 1)
  }

  // ---------------------------------------------------------- indexes
  //
  // Pinned derived indexes: an ANN layout published by the SAME
  // manifest rename as the corpus it indexes, closing the staleness
  // window between a corpus commit and an index rebuild (a reader of
  // version N sees corpus N and index N both-or-neither — there is no
  // instant at which corpus v+1 is visible with an index built on v,
  // the lost-consistency hazard of keeping the AnnIndex layouts as
  // independent parquet dirs; cf. the reference's harvest-while-serving
  // loop, tests/test_serve.py:274-306, which feeds both sides).
  //
  // Layout: index files live under `index/<name>/<uuid>/part-*.parquet`
  // with schema (idCol long, vecCol array<float>, cell int),
  // range-clustered by `cell` with per-file [min,max] cell stats in the
  // manifest — probes prune at the FILE level from the manifest (the
  // readRange discipline) instead of Hive partition dirs, so the probe
  // path and the corpus path share one skipping mechanism. The trained
  // centroids sit in an immutable `index/<name>/_centroids-<uuid>`
  // sidecar named by the `index:<name>` header.
  //
  // Maintenance contract: once declared, EVERY commit keeps the pin
  // valid — append/addStreamingBatch route only the new rows through
  // the sidecar (one scan of the batch, broadcast centroids, no
  // shuffle); mergeInto/overwrite re-route the result they are already
  // rewriting (proportional, not super-linear, cost); compact/
  // autoCompact carry index lines verbatim (the index derives from
  // ROWS, which compaction preserves). The quantizer itself never
  // silently retrains — a drifting corpus shows up as cell skew and
  // [[buildIvfIndex]] on a fresh name (then [[dropIndex]]) is the
  // explicit retrain.

  /** Parsed `index:<name>` header. Two kinds share one maintenance
    * contract (route-on-write, idxdv-on-delete, carry-on-compact):
    *  - [[IvfSpec]] (ANN): `<centroid sidecar>|<idCol>|<vecCol>`;
    *  - [[Bm25Spec]] (inverted text):
    *    `bm25|<idCol>|<textCol>|<termBuckets>|<nDocs>|<sumDl>` — the
    *    two corpus-global BM25 moments live IN the header as exact
    *    integers, so every version's probe divides stats that are
    *    both-or-neither consistent with its postings (the standalone
    *    [[graft.ingest.TextIndex]] `_stats` sidecar can skew against
    *    its postings between non-atomic publishes; here one manifest
    *    rename carries corpus, postings, AND stats).
    */
  private sealed trait IndexSpec {
    def name: String
    def idCol: String
    /** Centroid sidecar to keep live through [[vacuum]], if any. */
    def sidecarOpt: Option[String]
    /** The spec with version-varying state (BM25 moments) zeroed —
      * what "same index SET" means for commit-conflict checks: a
      * concurrent append legitimately advances the moments, and that
      * must read as a retryable race, not a structural conflict.
      */
    def structure: IndexSpec
  }

  private final case class IvfSpec(
      name: String, sidecar: String, idCol: String, vecCol: String)
      extends IndexSpec {
    def sidecarOpt: Option[String] = Some(sidecar)
    def structure: IndexSpec = this
  }

  private final case class Bm25Spec(
      name: String, idCol: String, textCol: String, termBuckets: Int,
      nDocs: Long, sumDl: Long) extends IndexSpec {
    def sidecarOpt: Option[String] = None
    def structure: IndexSpec = copy(nDocs = 0L, sumDl = 0L)
    def headerValue: String =
      s"bm25|$idCol|$textCol|$termBuckets|$nDocs|$sumDl"
  }

  /** Positional (phrase) index kind: one row per token occurrence
    * (id, pos, term, tb) — no corpus-global sidecar at all (phrase
    * adjacency is per-doc), so maintenance is pure routing.
    */
  private final case class PhraseSpec(
      name: String, idCol: String, textCol: String, termBuckets: Int)
      extends IndexSpec {
    def sidecarOpt: Option[String] = None
    def structure: IndexSpec = this
    def headerValue: String = s"pos|$idCol|$textCol|$termBuckets"
  }

  private def indexSpecs(s: Snapshot): Seq[IndexSpec] =
    s.headers.toSeq.collect {
      case (k, v) if k.startsWith("index:") =>
        val name = k.stripPrefix("index:")
        v.split("\\|") match {
          case Array("bm25", id, text, tb, n, sd) =>
            Bm25Spec(name, id, text, tb.toInt, n.toLong, sd.toLong)
          case Array("pos", id, text, tb) =>
            PhraseSpec(name, id, text, tb.toInt)
          case Array(sc, id, vec) => IvfSpec(name, sc, id, vec)
          case other => throw new IllegalStateException(
            s"malformed index header $k=${other.mkString("|")}")
        }
    }.sortBy(_.name)

  /** Declared index names at the latest version. */
  def indexNames(spark: SparkSession, root: String): Seq[String] =
    indexSpecs(latestSnapshot(spark, root)).map(_.name)

  private def loadCentroids(
      spark: SparkSession, root: String,
      spec: IvfSpec): Array[(Int, Array[Double])] = {
    val cents = spark.read.parquet(s"$root/${spec.sidecar}")
      .collect()
      .map(r => (r.getInt(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, s"empty centroid sidecar ${spec.sidecar}")
    cents
  }

  /** Assign each row to its nearest centroid (squared Euclidean, ties
    * to the lowest cell id) — broadcast centroids, scan-local kernel,
    * the batch never shuffles. The SAME rule routes the initial build
    * and every later append/merge, so a row's cell is a pure function
    * of (vector, sidecar) and rebuild-free maintenance is exact.
    */
  private def routeRows(
      spark: SparkSession, root: String, spec: IvfSpec,
      df: DataFrame): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(loadCentroids(spark, root, spec))
    df.select(col(spec.idCol).cast("long"),
        col(spec.vecCol).cast("array<double>"))
      .as[(java.lang.Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (idBoxed, v) =>
          // the AnnIndex contract: the id column IDENTIFIES its row as
          // a long. A NULL (or non-long-castable) id would write a DV
          // sidecar entry that never matches the deletion anti-join —
          // the index entry would keep serving after a corpus delete —
          // so reject it at ingest, the only cheap place
          require(idBoxed != null,
            s"index '${spec.name}': id column '${spec.idCol}' is NULL " +
              "or not long-castable for an ingested row — pinned " +
              "indexes need long-identifying ids (map to a surrogate " +
              "id first)")
          val id = idBoxed.longValue()
          var best = cs(0)._1
          var bestD = Double.MaxValue
          var ci = 0
          while (ci < cs.length) {
            val c = cs(ci)._2
            var d = 0.0; var j = 0
            val n = math.min(v.length, c.length)
            while (j < n) { val t = v(j) - c(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = cs(ci)._1 }
            ci += 1
          }
          (id, v.map(_.toFloat), best)
        }
      }
      .toDF(spec.idCol, spec.vecCol, "cell")
  }

  /** A batch's BM25 postings, tokenized and counted EXACTLY like
    * [[graft.operators.Bm25.score]] / [[graft.ingest.TextIndex]]
    * (lowercase-trim whitespace split; dl counts empty tokens), with
    * the doc length denormalized into every posting and the term
    * bucket `tb = pmod(hash(term), termBuckets)` as the clustering
    * key. NULL ids are rejected scan-side ([[routeRows]]' contract —
    * a NULL id's idxdv entry could never mask its postings).
    */
  private def bm25Postings(df: DataFrame, spec: Bm25Spec): DataFrame = {
    val toks = split(lower(trim(col(spec.textCol))), "\\s+")
    val checkedId = when(col(spec.idCol).cast("long").isNull,
      raise_error(concat(lit(
        s"index '${spec.name}': id column '${spec.idCol}' is NULL or " +
          "not long-castable for an ingested row — pinned indexes " +
          "need long-identifying ids")))) // never returns
      .otherwise(col(spec.idCol).cast("long"))
    df.select(checkedId.as(spec.idCol),
        toks.as("_toks"),
        size(toks).cast("long").as("dl"))
      .select(col(spec.idCol), col("dl"), explode(col("_toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(spec.idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("term")), lit(spec.termBuckets)))
  }

  /** A batch's positional rows, tokenized EXACTLY like
    * [[graft.ingest.TextIndex.writePositions]] (original token index,
    * empties keep their slots so adjacency is literal), term-bucket
    * clustered. Same NULL-id rejection as [[bm25Postings]].
    */
  private def phraseRows(df: DataFrame, spec: PhraseSpec): DataFrame = {
    val toks = split(lower(trim(col(spec.textCol))), "\\s+")
    val checkedId = when(col(spec.idCol).cast("long").isNull,
      raise_error(concat(lit(
        s"index '${spec.name}': id column '${spec.idCol}' is NULL or " +
          "not long-castable for an ingested row — pinned indexes " +
          "need long-identifying ids"))))
      .otherwise(col(spec.idCol).cast("long"))
    df.select(checkedId.as(spec.idCol),
        posexplode(toks).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .withColumn("tb", pmod(hash(col("term")), lit(spec.termBuckets)))
  }

  /** The batch's exact BM25 moments (row count, Σ doc length) — the
    * integer deltas a commit folds into the index header. Termless
    * docs count toward BOTH (they shape N and avgdl, the
    * [[graft.ingest.TextIndex.writeBm25]] contract).
    */
  private def bm25Moments(df: DataFrame, spec: Bm25Spec): (Long, Long) = {
    val toks = split(lower(trim(col(spec.textCol))), "\\s+")
    val r = df.agg(count(lit(1)).as("n"),
      coalesce(sum(size(toks).cast("long")), lit(0L)).as("s")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Route a batch through every pinned index sidecar: manifest
    * entries for the new index files, plus per-BM25-index (n, Σdl)
    * batch moments the commit folds into the header
    * ([[indexHeadersWith]] — added for appends, absolute for
    * rebuilds).
    */
  private def idxEntriesFor(
      spark: SparkSession, root: String, specs: Seq[IndexSpec],
      df: DataFrame, buckets: Int): (Seq[String], Map[String, (Long, Long)]) = {
    val entries = specs.flatMap {
      case iv: IvfSpec =>
        writeFilesUnder(routeRows(spark, root, iv, df), root,
          s"index/${iv.name}/${UUID.randomUUID()}", Seq("cell"), buckets)
      case bm: Bm25Spec =>
        writeFilesUnder(bm25Postings(df, bm), root,
          s"index/${bm.name}/${UUID.randomUUID()}", Seq("tb"), buckets)
      case ph: PhraseSpec =>
        writeFilesUnder(phraseRows(df, ph), root,
          s"index/${ph.name}/${UUID.randomUUID()}", Seq("tb"), buckets)
    }
    val moments = specs.collect {
      case bm: Bm25Spec => bm.name -> bm25Moments(df, bm)
    }.toMap
    (entries, moments)
  }

  /** Fold BM25 batch moments into a snapshot's index headers:
    * `add = true` adds the deltas to the snapshot's moments (append
    * paths — exact integer algebra, no float drift), `add = false`
    * replaces them (rebuild paths: overwrite/merge re-route the whole
    * result, so the batch moments ARE the corpus moments).
    */
  private def indexHeadersWith(
      s: Snapshot, headers: Map[String, String],
      moments: Map[String, (Long, Long)], add: Boolean): Map[String, String] =
    if (moments.isEmpty) headers
    else {
      val byName = indexSpecs(s).collect {
        case bm: Bm25Spec => bm.name -> bm
      }.toMap
      headers ++ moments.map { case (name, (bn, bs)) =>
        val bm = byName(name)
        val v =
          if (add) bm.copy(nDocs = bm.nDocs + bn, sumDl = bm.sumDl + bs)
          else bm.copy(nDocs = bn, sumDl = bs)
        s"index:$name" -> v.headerValue
      }
    }

  // two commits that routed through DIFFERENT sidecars must not both
  // publish — an index set that changed mid-flight makes the staged
  // routing stale, which is a conflict, not a retry. Compared on
  // STRUCTURE: BM25 moments legitimately advance under concurrent
  // appends (a retry re-folds its deltas into the new tip's moments).
  private def sameIndexes(a: Snapshot, b: Snapshot): Boolean =
    indexSpecs(a).map(_.structure) == indexSpecs(b).map(_.structure)

  /** Declare + build an IVF index over the CURRENT corpus and publish
    * it pinned to a new version (corpus files unchanged, index files
    * added, `index:<name>` header set) — one atomic commit.
    * Read-modify-write conflict semantics: a commit that interleaves
    * makes the built index stale, so this fails rather than retries.
    * Returns the committed version.
    */
  def buildIvfIndex(
      spark: SparkSession, root: String, name: String,
      idCol: String, vecCol: String, numCentroids: Int = 16,
      buckets: Int = 8): Long = {
    require(name.matches("[A-Za-z0-9_-]+"), s"bad index name '$name'")
    val cur = latestSnapshot(spark, root)
    require(!cur.headers.contains(s"index:$name"),
      s"index '$name' already exists at $root")
    val corpus = readVersion(spark, root, cur.version)
    import org.apache.spark.ml.functions.array_to_vector
    val featured = corpus.withColumn("features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = graft.operators.Similarity.coarseQuantizer(featured, numCentroids)
    import spark.implicits._
    val sidecarRel = s"index/$name/_centroids-${UUID.randomUUID()}"
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.parquet(new Path(root, sidecarRel).toString)
    // the model only supplies centroids; assignment goes through
    // routeRows so build-time and append-time cells obey ONE rule
    val spec = IvfSpec(name, sidecarRel, idCol, vecCol)
    val (entries, _) = idxEntriesFor(spark, root, Seq(spec), corpus, buckets)
    val headers = cur.headers +
      (s"index:$name" -> s"$sidecarRel|$idCol|$vecCol")
    if (!tryCommit(spark, root, cur.version + 1, headers,
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur) ++ entries))
      throw new CommitConflict(
        s"buildIvfIndex at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** Declare + build a PINNED BM25 inverted index over the CURRENT
    * corpus (the lexical twin of [[buildIvfIndex]], closing the skew
    * the standalone [[graft.ingest.TextIndex]] layout allows: there,
    * corpus and postings publish non-atomically and a corpus
    * `deleteWhere` leaves deleted docs serving from postings). Here
    * ONE manifest rename publishes corpus, postings (term-bucket
    * range-clustered under `index/<name>/`, min/max `tb` stats for
    * file-level probe pruning), and the two corpus-global BM25
    * moments (n_docs, Σdl) as exact header integers — so
    * [[bm25ProbeIndexed]] at any version is row-identical to
    * [[graft.operators.Bm25.score]] over [[readVersion]] at the same
    * version, including after DV deletes (postings anti-join the
    * `idxdv/` channel; moments decrement in the delete's own commit).
    *
    * Maintenance rides the [[buildIvfIndex]] contract: append routes
    * only the batch through tokenization (+moment fold), mergeInto/
    * overwrite rebuild, compact carries verbatim, [[deleteWhere]]
    * masks by id + decrements moments. Same caller contract as
    * [[graft.ingest.TextIndex.appendBm25]]: appended batches must be
    * NEW ids. Read-modify-write conflict semantics. Returns the
    * committed version.
    */
  def buildBm25Index(
      spark: SparkSession, root: String, name: String,
      idCol: String, textCol: String, termBuckets: Int = 64,
      buckets: Int = 8): Long = {
    require(name.matches("[A-Za-z0-9_-]+"), s"bad index name '$name'")
    require(termBuckets > 0, s"termBuckets must be positive: $termBuckets")
    val cur = latestSnapshot(spark, root)
    require(!cur.headers.contains(s"index:$name"),
      s"index '$name' already exists at $root")
    // DV-aware corpus read: postings and moments cover SURVIVORS only
    val corpus = readVersion(spark, root, cur.version)
    val spec0 = Bm25Spec(name, idCol, textCol, termBuckets, 0L, 0L)
    val (entries, moments) =
      idxEntriesFor(spark, root, Seq(spec0), corpus, buckets)
    val (n, sd) = moments(name)
    val headers = cur.headers +
      (s"index:$name" -> spec0.copy(nDocs = n, sumDl = sd).headerValue)
    if (!tryCommit(spark, root, cur.version + 1, headers,
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur) ++ entries))
      throw new CommitConflict(
        s"buildBm25Index at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** BM25 against the PINNED index: prune index files by manifest
    * `tb` stats (file-level skipping before any footer opens), filter
    * to the query terms, anti-join the index deletion vectors, take
    * per-term df from the pruned scan itself and N/avgdl from the
    * version's header moments — row-identical to
    * [[graft.operators.Bm25.score]] on [[readVersion]] of the same
    * version (same tokenization, same float association). The scan
    * touches ~|terms|/termBuckets of the postings; nothing
    * corpus-scale moves. `version < 0` means latest.
    */
  def bm25ProbeIndexed(
      spark: SparkSession, root: String, name: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      version: Long = -1L): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    require(terms.toSet.size == terms.size, s"duplicate query terms: $terms")
    val s =
      if (version < 0L) latestSnapshot(spark, root)
      else snapshot(spark, root, version)
    val spec = indexSpecs(s).collectFirst {
      case bm: Bm25Spec if bm.name == name => bm
    }.getOrElse(throw new IllegalArgumentException(
      s"no BM25 index '$name' at $root"))
    import spark.implicits._
    // term → bucket through Spark's own hash expression (the probe's
    // pruning predicate must use the exact build-time routing)
    val tbs = terms.toDF("term")
      .select(pmod(hash(col("term")), lit(spec.termBuckets)).as("tb"))
      .distinct().as[Int].collect().toSeq
    val files = prunedIndexFiles(s, name, tbs)
    if (files.isEmpty)
      return readIndexVersion(spark, root, name, s.version)
        .select(col(spec.idCol), lit(0.0d).as("bm25")).limit(0)
    val cand = antiJoinIndexDv(spark, root, s, spec,
      spark.read.parquet(files.map(f => s"$root/$f"): _*)
        .filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*)))
    // df per term from the (DV-masked) pruned scan; ≤ |terms| rows
    val dfs = cand.groupBy("term").agg(count(lit(1)).as("_df"))
    // header moments: exact integers, divided here exactly like the
    // standalone layout divides its _stats sidecar
    val nD = lit(spec.nDocs).cast("double")
    val avgdl = lit(spec.sumDl).cast("double") / nD
    val tf = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (nD - col("_df").cast("double") + lit(0.5)) /
        (col("_df").cast("double") + lit(0.5)))
    val contrib = idf * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") / avgdl))
    cand
      .join(broadcast(dfs), "term")
      .select(col(spec.idCol), contrib.as("_c"))
      .groupBy(col(spec.idCol))
      .agg(sum(col("_c")).as("bm25"))
  }

  /** Declare + build a PINNED POSITIONAL (phrase) index — the third
    * index kind under the one-manifest pin: one row per token
    * occurrence, term-bucket range-clustered for file-level probe
    * pruning, no corpus-global sidecar (phrase adjacency is per-doc).
    * Same maintenance/delete contracts as [[buildBm25Index]], minus
    * the moments. Returns the committed version.
    */
  def buildPhraseIndex(
      spark: SparkSession, root: String, name: String,
      idCol: String, textCol: String, termBuckets: Int = 64,
      buckets: Int = 8): Long = {
    require(name.matches("[A-Za-z0-9_-]+"), s"bad index name '$name'")
    require(termBuckets > 0, s"termBuckets must be positive: $termBuckets")
    val cur = latestSnapshot(spark, root)
    require(!cur.headers.contains(s"index:$name"),
      s"index '$name' already exists at $root")
    val corpus = readVersion(spark, root, cur.version)
    val spec = PhraseSpec(name, idCol, textCol, termBuckets)
    val (entries, _) = idxEntriesFor(spark, root, Seq(spec), corpus, buckets)
    if (!tryCommit(spark, root, cur.version + 1,
        cur.headers + (s"index:$name" -> spec.headerValue),
        entryLines(cur) ++ indexLines(cur) ++ dvLines(cur) ++
          idxDvLines(cur) ++ entries))
      throw new CommitConflict(
        s"buildPhraseIndex at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** Exact phrase retrieval against the PINNED positional index
    * (docs containing `phrase` as consecutive tokens, with occurrence
    * counts — row-identical to [[graft.ingest.TextIndex.phraseDocs]]
    * over the live corpus): prune index files by manifest `tb` stats,
    * anti-join the index deletion vectors (a [[deleteWhere]]'d doc's
    * occurrences stop matching in the SAME commit), then slot i
    * anchors at pos − i and an n-term phrase is n−1 (id, anchor)
    * equi-joins — all inputs posting-scale, never corpus-scale.
    * `version < 0` means latest.
    */
  def phraseProbeIndexed(
      spark: SparkSession, root: String, name: String,
      phrase: Seq[String], version: Long = -1L): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val s =
      if (version < 0L) latestSnapshot(spark, root)
      else snapshot(spark, root, version)
    val spec = indexSpecs(s).collectFirst {
      case ph: PhraseSpec if ph.name == name => ph
    }.getOrElse(throw new IllegalArgumentException(
      s"no positional index '$name' at $root"))
    import spark.implicits._
    val tbs = phrase.distinct.toDF("term")
      .select(pmod(hash(col("term")), lit(spec.termBuckets)).as("tb"))
      .distinct().as[Int].collect().toSeq
    val files = prunedIndexFiles(s, name, tbs)
    if (files.isEmpty)
      return readIndexVersion(spark, root, name, s.version)
        .select(col(spec.idCol), lit(0L).as("n_matches")).limit(0)
    val pruned = antiJoinIndexDv(spark, root, s, spec,
      spark.read.parquet(files.map(f => s"$root/$f"): _*)
        .filter(col("tb").isin(tbs: _*) &&
          col("term").isin(phrase.distinct: _*)))
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      pruned.filter(col("term") === t)
        .select(col(spec.idCol), (col("pos") - i).as("anchor"))
    }
    slots.reduce((a, b) => a.join(b, Seq(spec.idCol, "anchor")))
      .groupBy(col(spec.idCol))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Conjunctive (AND) retrieval against the PINNED BM25 postings —
    * documents containing EVERY query term, with the summed term
    * frequency ([[graft.ingest.TextIndex.conjunctiveDocs]]' contract
    * over the pinned layout, DV-masked). One pruned scan, one per-doc
    * aggregate.
    */
  def conjunctiveProbeIndexed(
      spark: SparkSession, root: String, name: String,
      terms: Seq[String], version: Long = -1L): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    require(terms.toSet.size == terms.size, s"duplicate query terms: $terms")
    val s =
      if (version < 0L) latestSnapshot(spark, root)
      else snapshot(spark, root, version)
    val spec = indexSpecs(s).collectFirst {
      case bm: Bm25Spec if bm.name == name => bm
    }.getOrElse(throw new IllegalArgumentException(
      s"no BM25 index '$name' at $root"))
    import spark.implicits._
    val tbs = terms.toDF("term")
      .select(pmod(hash(col("term")), lit(spec.termBuckets)).as("tb"))
      .distinct().as[Int].collect().toSeq
    val files = prunedIndexFiles(s, name, tbs)
    if (files.isEmpty)
      return readIndexVersion(spark, root, name, s.version)
        .select(col(spec.idCol), lit(0L).as("tf_total")).limit(0)
    antiJoinIndexDv(spark, root, s, spec,
      spark.read.parquet(files.map(f => s"$root/$f"): _*)
        .filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*)))
      .groupBy(col(spec.idCol))
      .agg(count(lit(1)).as("_nt"), sum("tf").as("tf_total"))
      .filter(col("_nt") === terms.size)
      .select(col(spec.idCol), col("tf_total"))
  }

  /** Unpin an index: new version with its header and file lines
    * removed (data files reclaimed by [[vacuum]] once no kept version
    * references them). Read-modify-write conflict semantics.
    */
  def dropIndex(spark: SparkSession, root: String, name: String): Long = {
    val cur = latestSnapshot(spark, root)
    require(cur.headers.contains(s"index:$name"),
      s"no index '$name' at $root")
    if (!tryCommit(spark, root, cur.version + 1,
        cur.headers - s"index:$name",
        entryLines(cur) ++ indexLines(cur, except = Set(name)) ++
          dvLines(cur) ++ idxDvLines(cur, except = Set(name))))
      throw new CommitConflict(
        s"dropIndex at $root: snapshot v${cur.version} went stale")
    cur.version + 1
  }

  /** The pinned index exactly as of the latest version. */
  def readIndex(spark: SparkSession, root: String, name: String): DataFrame =
    readIndexVersion(spark, root, name,
      latestSnapshot(spark, root).version)

  /** Time travel for the pinned index: the same manifest that names
    * the corpus files of `version` names these index files, so this
    * frame is consistent with [[readVersion]] at the same version BY
    * CONSTRUCTION — the both-or-neither contract. Merge-on-read like
    * the corpus: the version's per-index deletion vectors (deleted
    * ids from [[deleteWhere]]) anti-join during the read.
    */
  def readIndexVersion(
      spark: SparkSession, root: String, name: String,
      version: Long): DataFrame = {
    val s = snapshot(spark, root, version)
    require(s.headers.contains(s"index:$name"),
      s"no index '$name' at $root version $version")
    val files = s.indexFiles.getOrElse(name, Seq.empty)
    if (files.isEmpty)
      throw new IllegalStateException(
        s"TxTable $root index $name@$version: no data files")
    val spec = indexSpecs(s).find(_.name == name).get
    antiJoinIndexDv(spark, root, s, spec,
      spark.read.parquet(files.map(f => s"$root/$f"): _*))
  }

  /** Apply an index's deletion vectors (deleted-ID files) to a frame
    * of its rows: broadcast anti-join on the id column — the dv side
    * is bounded by the table's accumulated delete count, KB–MB scale,
    * so no index-scale shuffle ever happens.
    */
  private def antiJoinIndexDv(
      spark: SparkSession, root: String, s: Snapshot, spec: IndexSpec,
      rows: DataFrame): DataFrame =
    s.indexDvFiles.get(spec.name).filter(_.nonEmpty) match {
      case None => rows
      case Some(dvf) =>
        val ids = spark.read.parquet(dvf.map(f => s"$root/$f"): _*)
          .select(col("id").as("_dv_id"))
        rows.join(broadcast(ids),
          rows(spec.idCol).cast("long") === col("_dv_id"), "left_anti")
    }

  /** Index files whose manifest [min,max] cell range overlaps any
    * probed cell — exposed so specs can assert a probe's scan really
    * shrank (the [[prunedFiles]] discipline on the index namespace).
    */
  def prunedIndexFiles(
      s: Snapshot, name: String, cells: Seq[Int]): Seq[String] =
    s.indexFiles.getOrElse(name, Seq.empty).filter { f =>
      s.stats.get(f).flatMap(_.headOption).forall { case (mn, mx) =>
        cells.exists(c => c >= mn && c <= mx)
      }
    }

  /** IVF probe against the PINNED index: route via the sidecar, read
    * only the files whose manifest cell range overlaps the probed
    * cells (file-level skipping before any parquet footer opens), rank
    * candidates by exact cosine — scoring identical to
    * [[graft.ingest.AnnIndex.ivfTopK]], so probing all cells equals
    * brute-force top-k bit for bit. `version < 0` means latest.
    */
  def ivfProbeIndexed(
      spark: SparkSession, root: String, name: String,
      queryVec: Array[Double], k: Int, nProbes: Int = 2,
      excludeId: Option[Long] = None, version: Long = -1L): DataFrame = {
    val s =
      if (version < 0L) latestSnapshot(spark, root)
      else snapshot(spark, root, version)
    val spec = indexSpecs(s).collectFirst {
      case iv: IvfSpec if iv.name == name => iv
    }.getOrElse(
      throw new IllegalArgumentException(
        s"no IVF index '$name' at $root"))
    val probes = loadCentroids(spark, root, spec)
      .map { case (cell, c) =>
        var d = 0.0; var i = 0
        val n = math.min(c.length, queryVec.length)
        while (i < n) { val t = c(i) - queryVec(i); d += t * t; i += 1 }
        (cell, d)
      }
      .sortBy { case (cell, d) => (d, cell) }
      .take(nProbes).map(_._1).toSeq
    val files = prunedIndexFiles(s, name, probes)
    if (files.isEmpty)
      return readIndexVersion(spark, root, name, s.version)
        .select(col(spec.idCol), lit(0.0d).as("sim")).limit(0)
    val qLit = array(queryVec.toSeq.map(v => lit(v)): _*)
    val candidates = antiJoinIndexDv(spark, root, s, spec,
      spark.read
        .parquet(files.map(f => s"$root/$f"): _*)
        .filter(col("cell").isin(probes: _*)))
    val withoutQuery = excludeId match {
      case Some(id) => candidates.filter(col(spec.idCol) =!= id)
      case None     => candidates
    }
    withoutQuery
      .select(col(spec.idCol),
        round(graft.operators.Similarity.cosineFast(
          spark, col(spec.vecCol), qLit), 6).as("sim"))
      .orderBy(col("sim").desc, col(spec.idCol))
      .limit(k)
  }

  /** Drop data files referenced by NO kept version (the newest
    * `keepVersions` manifests survive; older manifests are removed),
    * plus orphaned temp manifests from crashed commit attempts.
    *
    * `retentionMs` is the writer-safety window (Delta-style): writers
    * stage data files BEFORE their manifest commits, so an
    * unreferenced dir may belong to an IN-FLIGHT commit, not a dead
    * one. Only dirs whose every file is older than `retentionMs` are
    * deleted — run with the default (24 h) and any writer that
    * started inside the window is safe. `retentionMs = 0` deletes
    * immediately and is correct ONLY with concurrent writers (and
    * readers of vacuumed versions) excluded.
    *
    * READER contract (pinned by TxVacuumRaceSpec, two JVMs): a
    * time-travel frame resolves its FILE LIST at [[readVersion]] time,
    * so a reader holding version N keeps scanning correctly after N's
    * MANIFEST is dropped — as long as N's data files are younger than
    * `retentionMs` (they are, for any read that started inside the
    * window: a file can only become unreferenced by a LATER rewrite).
    * A reader that outlives the window races physical deletion and
    * fails with missing-file errors — the Delta/Iceberg contract:
    * size `retentionMs` to the longest query + time-travel horizon
    * you serve, because vacuum bounds BOTH. New `snapshot`/
    * [[readVersion]]/[[readChanges]]/[[readChangesTyped]] calls for a
    * dropped version fail immediately with
    * [[VacuumedVersionException]] naming the oldest survivor — the
    * visible edge of the horizon. For CDC this is the Delta CDF
    * retention contract: a consumer whose `fromVersion` predates the
    * sweep gets the crisp throw, never a silently partial feed
    * (`cdc/` dirs are swept under the same window, but their manifest
    * dies first, so the throw always precedes any missing-file read).
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
      retentionMs: Long = 24L * 3600 * 1000): Unit = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val vs = versions(spark, root)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val keptSnaps = keep.map(v => snapshot(spark, root, v))
    val live = keptSnaps
      .flatMap(s => s.files ++ s.indexFiles.values.flatten ++ s.dvFiles ++
        s.indexDvFiles.values.flatten ++ s.cdcFiles)
      .toSet
    val liveSidecars =
      keptSnaps.flatMap(s => indexSpecs(s).flatMap(_.sidecarOpt)).toSet
    val f = fs(spark, new Path(root))
    val horizon = System.currentTimeMillis() - retentionMs
    def sweepDir(nsRel: String): Unit = {
      val dir = new Path(root, nsRel)
      if (!f.exists(dir)) return
      f.listStatus(dir).foreach { sub =>
        val subRel = s"$nsRel/${sub.getPath.getName}"
        if (!liveSidecars.contains(subRel)) {
          val all = f.listStatus(sub.getPath).toSeq
          val unreferenced =
            all.forall(st => !live.contains(s"$subRel/${st.getPath.getName}"))
          val pastRetention = sub.getModificationTime <= horizon &&
            all.forall(_.getModificationTime <= horizon)
          if (unreferenced && pastRetention) f.delete(sub.getPath, true)
        }
      }
    }
    sweepDir("data")
    // deletion-vector dirs: same unreferenced+past-retention rule
    sweepDir("dv")
    // change-data dirs: referenced only by the one manifest that wrote
    // them, reclaimed once that version drops out of the kept window
    sweepDir("cdc")
    // per-index deletion-vector namespaces: idxdv/<name>/ holds uuid dirs
    val idxDvRoot = new Path(root, "idxdv")
    if (f.exists(idxDvRoot))
      f.listStatus(idxDvRoot).filter(_.isDirectory).foreach { nameDir =>
        sweepDir(s"idxdv/${nameDir.getPath.getName}")
      }
    // pinned-index namespaces: each index/<name>/ holds data uuid dirs
    // plus centroid sidecars; a sidecar survives while ANY kept
    // manifest's header names it, data dirs by the same live-file rule
    val idxRoot = new Path(root, "index")
    if (f.exists(idxRoot))
      f.listStatus(idxRoot).filter(_.isDirectory).foreach { nameDir =>
        sweepDir(s"index/${nameDir.getPath.getName}")
      }
    // temp manifests past retention are crash leftovers, never
    // in-flight (a commit writes and renames them within one call)
    val ld = logDir(root)
    if (f.exists(ld)) f.listStatus(ld).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".tmp-") && n.endsWith(".txn") &&
          st.getModificationTime <= horizon)
        f.delete(st.getPath, false)
    }
    drop.foreach(v => f.delete(manifestPath(root, v), false))
  }
}
