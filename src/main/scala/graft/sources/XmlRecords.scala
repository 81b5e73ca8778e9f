package graft.sources

import java.io.{BufferedInputStream, InputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.time.LocalDate

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import graft.operators.LruCache
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OAI-PMH harvest-response XML source/sink — the reference engine's
  * native wire format (`cdcagg_oai` SERVES `ListRecords` envelopes,
  * `/root/reference/cdcagg_oai/serve.py`; an aggregator-side pipeline
  * INGESTS them). This closes the loop the repo already renders on the
  * way out (`graft.render.OaiXml`): XML harvest pages land as files,
  * this source turns them back into rows — identifier, datestamp, set
  * memberships, deleted status, metadata fields — under the same audit
  * contract as [[Jsonl]]/[[Csv]]/[[Warc]].
  *
  * Parsing is JDK StAX (`javax.xml.stream`) — a PULL parser, so a page
  * streams record-at-a-time with O(record) memory, never DOM-loading a
  * multi-MB harvest page. DTDs and external entities are disabled
  * (harvest pages are untrusted input; XXE via a crafted page must be
  * impossible by construction).
  *
  * Parallelism unit is the FILE (one harvest page = one well-formed XML
  * document; byte-splitting XML is not meaningful), matching how OAI
  * harvesters lay pages down: many page files per endpoint, file-count
  * parallelism at scale.
  *
  * Audit contract, enforced not documented: [[read]] is FAILFAST
  * (malformed XML = job failure naming file and record ordinal);
  * [[readAudited]] quarantines the failure as a `_corrupt` row and
  * parsing of that FILE stops (a broken XML stream has no reliable
  * resync point past the error).
  */
object XmlRecords {

  /** One row per `<record>`: `deleted` mirrors the OAI
    * `<header status="deleted">` marker (deleted records carry no
    * metadata, so `language`/`text` are null there —
    * `/root/reference/tests/test_serve.py:274-306` pins that shape);
    * `sets` is the document-order comma-join of `<setSpec>` values.
    */
  final case class XmlRow(
      file: String, identifier: String, datestamp: String,
      deleted: Boolean, sets: String, language: String, text: String,
      _corrupt: String)

  // ---------------------------------------------------------------- sink

  /** Write (doc_id, lang, source, text) rows as OAI-PMH `ListRecords`
    * page files under `path`, one page per partition. Record metadata
    * is closed-form in doc_id so an oracle can restate it:
    * identifier `oai:graft:<id>`, datestamp 2024-01-01 + (id mod 365)
    * days, setSpecs `language:<lang>` + `source:<source>`, and every
    * 13th id a deleted record (header only, no metadata).
    */
  def write(docs: DataFrame, path: String, numPartitions: Int = 0): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base0 = docs
      .select(col("doc_id").cast("long"), col("lang"), col("source"),
        col("text"))
      .as[(Long, String, String, String)]
    val base = if (numPartitions > 0) base0.repartition(numPartitions) else base0
    val root = new org.apache.hadoop.fs.Path(path)
    val fsDriver = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsDriver.exists(root)) fsDriver.delete(root, true)
    fsDriver.mkdirs(root)
    base.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val p = new org.apache.hadoop.fs.Path(path, f"page-$idx%05d.xml")
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        val w = new OutputStreamWriter(out, StandardCharsets.UTF_8)
        var n = 0L
        try {
          w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
          w.write("<OAI-PMH xmlns=\"http://www.openarchives.org/OAI/2.0/\">\n")
          w.write("<responseDate>2024-01-01T00:00:00Z</responseDate>\n")
          w.write("<ListRecords>\n")
          it.foreach { case (id, lang, source, text) =>
            w.write(recordXml(id, lang, source, text))
            n += 1
          }
          w.write("</ListRecords>\n</OAI-PMH>\n")
        } finally w.close()
        Iterator.single(n)
      }
    }.count(): Unit
  }

  /** The deterministic record template (closed-form in the row). */
  def recordXml(id: Long, lang: String, source: String, text: String): String = {
    val deleted = id % 13 == 0
    val status = if (deleted) " status=\"deleted\"" else ""
    val header =
      s"""<record><header$status>
         |<identifier>oai:graft:$id</identifier>
         |<datestamp>${datestampFor(id)}</datestamp>
         |<setSpec>language:${esc(lang)}</setSpec>
         |<setSpec>source:${esc(source)}</setSpec>
         |</header>""".stripMargin
    val body =
      if (deleted) ""
      else
        s"""
           |<metadata><dc>
           |<language>${esc(lang)}</language>
           |<description>${esc(if (text == null) "" else text)}</description>
           |</dc></metadata>""".stripMargin
    header + body + "</record>\n"
  }

  /** Closed-form datestamp: 2024-01-01 + (id mod 365) days, ISO date. */
  def datestampFor(id: Long): String =
    LocalDate.of(2024, 1, 1).plusDays(id % 365).toString

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // -------------------------------------------------------------- source

  /** Strict read: every page parses or the job fails naming the file
    * and record ordinal. Schema = [[XmlRow]] minus `_corrupt`.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    readImpl(spark, path, failFast = true).drop("_corrupt")

  /** Auditing read: a malformed page becomes a row with `_corrupt` set
    * (data columns null) and that file's parse stops.
    */
  def readAudited(spark: SparkSession, path: String): DataFrame =
    readImpl(spark, path, failFast = false)

  private def readImpl(
      spark: SparkSession, path: String, failFast: Boolean): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        recordIterator(file,
          new BufferedInputStream(pds.open(), 1 << 16), failFast)
      }
      .toDS()
      .toDF()
  }

  /** Streaming read of a harvest-page drop directory (the continuous-
    * harvest ingest shape, same contract as [[Warc.readStream]]): new
    * page files land, each micro-batch admits up to `maxFilesPerTrigger`
    * whole pages (`binaryFile` source — the FILE is the unit), and the
    * same StAX parser runs over each page's bytes. Always audited: a
    * malformed page becomes a `_corrupt` row — FAILFAST inside a
    * stream would wedge the query on one bad page.
    */
  def readStream(
      spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 100): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.xml")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        recordIterator(file,
          new BufferedInputStream(
            new java.io.ByteArrayInputStream(bytes), 1 << 16),
          failFast = false)
      }
      .toDF()
  }

  /** Hardened StAX factory: no DTDs, no external entities, coalesced
    * text nodes (one CHARACTERS event per element body).
    */
  private def secureFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f
  }

  /** Lazy record-at-a-time iterator over one page stream. */
  private def recordIterator(
      file: String, in: InputStream,
      failFast: Boolean): Iterator[XmlRow] = new Iterator[XmlRow] {
    private var reader: XMLStreamReader = _
    private var nextRow: XmlRow = _
    private var done = false
    private var ordinal = 0L

    private def fail(msg: String): XmlRow = {
      done = true
      in.close()
      if (failFast)
        throw new IllegalStateException(
          s"malformed OAI-PMH page $file at record #$ordinal: $msg")
      XmlRow(file, null, null, deleted = false, null, null, null,
        s"record #$ordinal: $msg")
    }

    private def advance(): Unit = {
      if (done || nextRow != null) return
      try {
        if (reader == null) reader = secureFactory().createXMLStreamReader(in)
        // scan to the next <record>
        var inRecord = false
        while (!inRecord && reader.hasNext) {
          if (reader.next() == XMLStreamConstants.START_ELEMENT &&
            reader.getLocalName == "record") inRecord = true
        }
        if (!inRecord) { done = true; in.close(); return }
        ordinal += 1
        var identifier: String = null
        var datestamp: String = null
        var deleted = false
        val sets = scala.collection.mutable.ArrayBuffer.empty[String]
        var language: String = null
        var text: String = null
        var depthDone = false
        while (!depthDone) {
          if (!reader.hasNext) { nextRow = fail("EOF inside <record>"); return }
          reader.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              reader.getLocalName match {
                case "header" =>
                  deleted = "deleted" == reader
                    .getAttributeValue(null, "status")
                case "identifier" => identifier = reader.getElementText
                case "datestamp" => datestamp = reader.getElementText
                case "setSpec" => sets += reader.getElementText
                case "language" => language = reader.getElementText
                case "description" => text = reader.getElementText
                case _ => ()
              }
            case XMLStreamConstants.END_ELEMENT
                if reader.getLocalName == "record" =>
              depthDone = true
            case _ => ()
          }
        }
        if (identifier == null) { nextRow = fail("record without <identifier>"); return }
        nextRow = XmlRow(file, identifier, datestamp, deleted,
          sets.mkString(","), language, text, null)
      } catch {
        case e: javax.xml.stream.XMLStreamException =>
          nextRow = fail(s"XML parse error: ${e.getMessage}")
      }
    }

    override def hasNext: Boolean = { advance(); nextRow != null }
    override def next(): XmlRow = {
      advance()
      if (nextRow == null) throw new NoSuchElementException
      val r = nextRow; nextRow = null; r
    }
  }

  // --------------------------------------------------------- gate helper

  private val written = new LruCache[String, String](64)

  /** Round-trip extract for the oracle gate: documents written once per
    * tag as `ListRecords` pages, read back strict, doc_id recovered
    * from the identifier. Lossless by construction (escape/unescape is
    * the parser's own entity handling), so DuckDB restates every
    * column straight off the parquet table.
    */
  def roundTripExtract(docs: DataFrame, tag: String): DataFrame = {
    val safeTag = tag.replaceAll("^[_.]+", "")
    val path = written.getOrElseUpdate(safeTag) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-oaixml/$safeTag"
      write(docs, p, numPartitions = 8)
      p
    }
    read(docs.sparkSession, path)
      .select(
        regexp_extract(col("identifier"), "(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("identifier"), col("datestamp"), col("deleted"),
        col("sets"), col("language"), col("text"))
  }
}
