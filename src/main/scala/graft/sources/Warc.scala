package graft.sources

import java.io.{BufferedInputStream, EOFException, FilterOutputStream,
  InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.operators.LruCache
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 web-archive) source/sink — the entry-point format of
  * a crawl-scale text pipeline: Common Crawl and every in-house crawler
  * deliver `.warc.gz` archives, and everything downstream (language ID,
  * quality, dedup, curation) starts from extracting records out of
  * them. JDK-only: header framing is CRLF text, compression is
  * `java.util.zip`.
  *
  * Layout facts this source is built around (all public spec/practice):
  *
  *  - A WARC file is a SEQUENCE of records, each `WARC/1.x` + CRLF
  *    headers + blank line + `Content-Length` payload bytes + CRLF CRLF.
  *    Framing is by Content-Length, never by scanning for a sentinel —
  *    payloads are arbitrary binary.
  *  - A `.warc.gz` compresses EVERY RECORD AS ITS OWN GZIP MEMBER, so
  *    archives can be indexed/seeked per record. [[write]] produces that
  *    member-per-record layout (one `GZIPOutputStream` finished per
  *    record over the shared part-file stream) and the reader's
  *    `GZIPInputStream` consumes the concatenated members transparently.
  *  - The unit of parallelism is the FILE, not the byte split: gzip
  *    members don't align with Spark's line splits, so tasks take whole
  *    archives (the standard crawl-processing shape — archives arrive
  *    as many ~1 GB parts, so file-count parallelism is ample at scale).
  *    Records stream through a lazy iterator — a 1 GB archive is never
  *    materialized in memory.
  *
  * Same audit contract as [[Jsonl]]/[[Csv]], enforced not documented:
  * [[read]] is FAILFAST (malformed record = job failure naming file and
  * record ordinal); [[readAudited]] quarantines the failure as a row
  * with `_corrupt` set and parsing of that FILE stops (inside a
  * corrupted gzip/length-framed stream there is no reliable resync
  * point — honest truncation beats silently misframed records).
  */
object Warc {

  /** Uniform record schema: one row per WARC record.
    * `payload` is raw bytes (`cast("string")` decodes UTF-8 text
    * payloads); `_corrupt` is null for well-formed rows.
    */
  final case class WarcRow(
      file: String, record_id: String, warc_type: String,
      target_uri: String, warc_date: String, content_type: String,
      content_length: Long, payload: Array[Byte], _corrupt: String)

  // ---------------------------------------------------------------- sink

  /** Write (id, text) rows as `.warc.gz` part files under `path`, one
    * file per partition, one gzip member per record. Deterministic
    * record metadata derived from the id (closed-form, so an oracle can
    * restate it): `WARC-Target-URI: https://example.org/doc/<id>`,
    * `WARC-Record-ID: urn:graft:doc:<id>`.
    */
  def write(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      numPartitions: Int = 0): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base0 = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    val base = if (numPartitions > 0) base0.repartition(numPartitions) else base0
    val root = new org.apache.hadoop.fs.Path(path)
    val fsDriver = root.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fsDriver.exists(root)) fsDriver.delete(root, true)
    fsDriver.mkdirs(root)
    base.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(
          path, f"part-$idx%05d.warc.gz")
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        var n = 0L
        try it.foreach { case (id, text) =>
          writeRecord(out, id, if (text == null) "" else text)
          n += 1
        } finally out.close()
        Iterator.single(n)
      }
    }.count(): Unit
  }

  /** HTTP-response variant of the synthetic corpus — the shape REAL
    * crawl archives carry (`WARC-Type: response`, payload =
    * `application/http; msgtype=response`: status line + headers +
    * blank line + HTML body). The HTML wraps the document text in a
    * deterministic template (title/h1/script/style/entity), so the
    * whole front-end chain — WARC framing → HTTP split → HTML→text —
    * is closed-form replayable from (doc_id, text).
    */
  def writeHttp(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      numPartitions: Int = 0): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base0 = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    val base = if (numPartitions > 0) base0.repartition(numPartitions) else base0
    val root = new org.apache.hadoop.fs.Path(path)
    val fsDriver = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsDriver.exists(root)) fsDriver.delete(root, true)
    fsDriver.mkdirs(root)
    base.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(
          path, f"part-$idx%05d.warc.gz")
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        var n = 0L
        try it.foreach { case (id, text) =>
          val body = htmlFor(id, if (text == null) "" else text)
            .getBytes(StandardCharsets.UTF_8)
          val head =
            s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n"
          writeRecordBytes(out, id,
            head.getBytes(StandardCharsets.ISO_8859_1) ++ body,
            "application/http; msgtype=response")
          n += 1
        } finally out.close()
        Iterator.single(n)
      }
    }.count(): Unit
  }

  /** The deterministic HTML template (closed-form in id + text). */
  def htmlFor(id: Long, text: String): String =
    s"<html><head><title>Doc $id</title>" +
      "<style>p { margin: 0; }</style>" +
      s"<script>var docId = $id;</script></head>" +
      s"<body><h1>Doc $id</h1><p>$text &amp; more</p></body></html>"

  /** Split `application/http` response payloads into status line,
    * content type, and body — pure column expressions (the first
    * CRLF CRLF is the header/body boundary per RFC 9112; malformed
    * payloads yield status null and an empty body, never an error).
    */
  def splitHttp(records: DataFrame): DataFrame = {
    val p = col("payload").cast("string")
    val boundary = locate("\r\n\r\n", p)
    // regexp_extract yields '' on no match, and ''.cast(int) THROWS
    // under ANSI — route through nullif so malformed payloads yield
    // null status, not a task failure
    val statusStr = regexp_extract(p, "^HTTP/1\\.[01] (\\d+)", 1)
    records
      .withColumn("http_status",
        when(statusStr =!= "", statusStr.cast("int")))
      .withColumn("http_content_type",
        regexp_extract(p, "(?i)content-type:\\s*([^\\r\\n]+)", 1))
      .withColumn("body",
        when(boundary > 0, p.substr(boundary + lit(4), length(p)))
          .otherwise(lit("")))
  }

  /** One record = one finished gzip member on the shared stream. */
  private def writeRecord(out: OutputStream, id: Long, text: String): Unit =
    writeRecordBytes(out, id, text.getBytes(StandardCharsets.UTF_8),
      "text/plain; charset=utf-8")

  private def writeRecordBytes(
      out: OutputStream, id: Long, payload: Array[Byte],
      contentType: String): Unit = {
    // shield the part-file stream: GZIPOutputStream.close() must end
    // its Deflater without closing the underlying file
    val shield = new FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = flush()
    }
    val gz = new GZIPOutputStream(shield, 64 * 1024)
    val header =
      s"""WARC/1.0\r
         |WARC-Type: response\r
         |WARC-Record-ID: urn:graft:doc:$id\r
         |WARC-Date: 2024-01-01T00:00:00Z\r
         |WARC-Target-URI: https://example.org/doc/$id\r
         |Content-Type: $contentType\r
         |Content-Length: ${payload.length}\r
         |\r
         |""".stripMargin
    gz.write(header.getBytes(StandardCharsets.ISO_8859_1))
    gz.write(payload)
    gz.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    gz.finish()
    gz.close()
  }

  // -------------------------------------------------------------- source

  /** Strict read: every record parses or the job fails naming the file
    * and record ordinal. Schema = [[WarcRow]] minus `_corrupt`.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    readImpl(spark, path, failFast = true).drop("_corrupt")

  /** Auditing read: a malformed record becomes a row with `_corrupt`
    * set (data columns null) and that file's parse stops; well-formed
    * files are unaffected.
    */
  def readAudited(spark: SparkSession, path: String): DataFrame =
    readImpl(spark, path, failFast = false)

  private def readImpl(
      spark: SparkSession, path: String, failFast: Boolean): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        val in =
          if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16)
          else raw
        recordIterator(file, in, failFast)
      }
      .toDS()
      .toDF()
  }

  /** Streaming read of a WARC drop directory — the continuous-crawl
    * ingest shape (the [[Jsonl.readStream]] contract): new `.warc(.gz)`
    * part files land, each micro-batch admits up to `maxFilesPerTrigger`
    * whole archives (`binaryFile` source — the FILE is the unit, gzip
    * members don't split), and the same record parser as [[read]] runs
    * over each file's bytes. Always audited: a malformed record becomes
    * a `_corrupt` row — FAILFAST inside a stream would poison the
    * trigger and wedge the query on one bad archive.
    */
  def readStream(
      spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 100): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      // binaryFile's schema is FIXED by the source, but a streaming
      // read must still state it explicitly (no inference on streams)
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val raw = new BufferedInputStream(
          new java.io.ByteArrayInputStream(bytes), 1 << 16)
        val in =
          if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16)
          else raw
        recordIterator(file, in, failFast = false)
      }
      .toDF()
  }

  /** Lazy record-at-a-time iterator over one archive stream; closes the
    * stream at EOF or on the quarantined failure row.
    */
  private def recordIterator(
      file: String, in: InputStream,
      failFast: Boolean): Iterator[WarcRow] = new Iterator[WarcRow] {
    private var nextRow: WarcRow = _
    private var done = false
    private var ordinal = 0L

    private def fail(msg: String): WarcRow = {
      done = true
      in.close()
      if (failFast)
        throw new IllegalStateException(
          s"malformed WARC record #$ordinal in $file: $msg")
      WarcRow(file, null, null, null, null, null, -1L, null,
        s"record #$ordinal: $msg")
    }

    private def advance(): Unit = {
      if (done || nextRow != null) return
      try {
        // skip inter-record blank lines; null line = clean EOF
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { done = true; in.close(); return }
        ordinal += 1
        if (!line.startsWith("WARC/")) {
          nextRow = fail(s"expected WARC/1.x version line, got '${line.take(40)}'")
          return
        }
        val headers = scala.collection.mutable.Map.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) { nextRow = fail(s"header line without ':': '${h.take(40)}'"); return }
          headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
          h = readLine(in)
        }
        if (h == null) { nextRow = fail("EOF inside record headers"); return }
        val lenStr = headers.getOrElse("content-length", null)
        if (lenStr == null) { nextRow = fail("missing Content-Length"); return }
        val len =
          try java.lang.Long.parseLong(lenStr)
          catch { case _: NumberFormatException => -1L }
        if (len < 0 || len > Int.MaxValue) {
          nextRow = fail(s"bad Content-Length '$lenStr'")
          return
        }
        val payload = in.readNBytes(len.toInt)
        if (payload.length < len) {
          nextRow = fail(
            s"payload truncated: ${payload.length} of $len bytes")
          return
        }
        nextRow = WarcRow(file,
          headers.getOrElse("warc-record-id", null),
          headers.getOrElse("warc-type", null),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-date", null),
          headers.getOrElse("content-type", null),
          len, payload, null)
      } catch {
        case _: EOFException => nextRow = fail("unexpected gzip EOF")
        case e: java.util.zip.ZipException =>
          nextRow = fail(s"gzip corruption: ${e.getMessage}")
      }
    }

    override def hasNext: Boolean = { advance(); nextRow != null }
    override def next(): WarcRow = {
      advance()
      if (nextRow == null) throw new NoSuchElementException
      val r = nextRow; nextRow = null; r
    }
  }

  /** CRLF/LF line reader over raw bytes (headers are ISO-8859-1 per
    * spec); null at clean EOF, never reads past the newline.
    */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
  }

  // --------------------------------------------------------- gate helper

  private val written = new LruCache[String, String](64)

  /** Round-trip extract for the oracle gate: `docs` written once per
    * tag as member-per-record `.warc.gz` (metadata closed-form in
    * doc_id), read back strict, and projected to the crawl-extract
    * shape — doc_id recovered from the URI, payload decoded as UTF-8.
    * Lossless by construction, so DuckDB restates it straight off the
    * parquet table.
    */
  def roundTripExtract(docs: DataFrame, tag: String): DataFrame = {
    // a leading '_' or '.' would make Hadoop's FileInputFormat treat
    // the corpus DIRECTORY itself as hidden (binaryFiles lists through
    // hiddenFileFilter) and fail with "input path does not exist"
    val safeTag = tag.replaceAll("^[_.]+", "")
    val path = written.getOrElseUpdate(safeTag) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-warc/$safeTag"
      write(docs, "doc_id", "text", p, numPartitions = 8)
      p
    }
    read(docs.sparkSession, path)
      .select(
        regexp_extract(col("target_uri"), "(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri"),
        col("content_length").as("n_bytes"),
        col("payload").cast("string").as("text"))
  }

  /** Full crawl front-end round trip for the oracle gate: documents
    * written as HTTP-response WARC records (deterministic HTML
    * template), read back, HTTP-split, and HTML-extracted — the
    * complete raw-crawl → clean-text chain under one hash. Status and
    * content type surface as columns so the HTTP parse is checked,
    * not just the final text.
    */
  def roundTripHttpExtract(docs: DataFrame, tag: String): DataFrame = {
    val safeTag = tag.replaceAll("^[_.]+", "") + ".http"
    val path = written.getOrElseUpdate(safeTag) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-warc/$safeTag"
      writeHttp(docs, "doc_id", "text", p, numPartitions = 8)
      p
    }
    splitHttp(read(docs.sparkSession, path))
      .select(
        regexp_extract(col("target_uri"), "(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("http_status"),
        col("http_content_type").as("content_type"),
        graft.operators.TextAnalysis.htmlToText(col("body")).as("text"))
  }
}
