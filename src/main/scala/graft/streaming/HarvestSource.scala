package graft.streaming

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Custom Structured Streaming source simulating incremental OAI-PMH
  * harvesting (the reference's ingest side — SURVEY.md §2.5 IO1;
  * BASELINE.json north star "Structured Streaming + custom source").
  *
  * A real deployment points this at a remote OAI-PMH/DocStore endpoint and
  * pages with resumption tokens per micro-batch; offsets are then the
  * harvest datestamp cursor. Here (zero-egress environment) the fetch is
  * replaced by a deterministic record generator, but the full DataSourceV2
  * machinery — TableProvider → Table → ScanBuilder → MicroBatchStream →
  * PartitionReaderFactory — is the real thing: offset tracking, partition
  * planning (batch range split across readers), InternalRow production.
  *
  * Options: `recordsPerBatch` (default 100), `maxRecords` (default 1000),
  * `partitions` (default 4).
  */
object HarvestSource {

  val schema: StructType = StructType(Seq(
    StructField("study_id", StringType),
    StructField("status", StringType),
    StructField("updated", TimestampType),
    StructField("base_url", StringType),
    StructField("title", StringType)))

  /** Deterministic synthetic record i — stands in for one harvested
    * study update. Every 7th update is a soft delete; ids cycle so later
    * records UPDATE earlier ones (exercising last-writer-wins upserts).
    */
  def record(i: Long): (String, String, Long, String, String) = {
    val id = s"study_${i % 250}"
    val status = if (i % 7 == 0) "deleted" else "updated"
    val updatedMicros = 1700000000000000L + i * 1000000L // +1s per record
    val baseUrl = s"http://archive${i % 3}.example.org/oai"
    (id, status, updatedMicros, baseUrl, s"Title of $id at $i")
  }
}

class HarvestSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "study-harvest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HarvestSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HarvestTable(properties.asScala.toMap)
}

final class HarvestTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "study_harvest"
  override def schema(): StructType = HarvestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = HarvestSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new HarvestMicroBatchStream(
          recordsPerBatch = props.getOrElse("recordsPerBatch", "100").toInt,
          maxRecords = props.getOrElse("maxRecords", "1000").toLong,
          numPartitions = props.getOrElse("partitions", "4").toInt)
    }
}

final case class HarvestOffset(value: Long) extends Offset {
  override def json(): String = value.toString
}

final case class HarvestRange(start: Long, end: Long) extends InputPartition

/** Offsets count records emitted so far. The stream is STATELESS:
  * implementing SupportsAdmissionControl means Spark hands the current
  * start offset to [[latestOffset(Offset, ReadLimit)]], so each trigger
  * pages `recordsPerBatch` past wherever the checkpoint says we are —
  * restart-safe by construction (an instance-local counter would race
  * backwards after recovery and double-emit).
  */
final class HarvestMicroBatchStream(
    recordsPerBatch: Int, maxRecords: Long, numPartitions: Int)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = HarvestOffset(0L)

  /** Paging is expressed THROUGH the admission-control contract: the
    * default limit is maxRows(recordsPerBatch), and latestOffset honors
    * whatever limit the trigger passes — Trigger.AvailableNow pins
    * allAvailable() and must drain to maxRecords in one shot, not one
    * page (a limit-ignoring source silently truncates AvailableNow runs).
    */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(recordsPerBatch)

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[HarvestOffset].value
    val cap = limit match {
      case rl: ReadMaxRows     => s + rl.maxRows()
      case _: ReadAllAvailable => maxRecords
      case _                   => s + recordsPerBatch
    }
    HarvestOffset(math.min(cap, maxRecords))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = HarvestOffset(maxRecords)

  override def deserializeOffset(json: String): Offset =
    HarvestOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HarvestOffset].value
    val e = end.asInstanceOf[HarvestOffset].value
    val total = e - s
    if (total <= 0) Array.empty
    else {
      val per = math.max(1L, (total + numPartitions - 1) / numPartitions)
      (s until e by per).map(b => HarvestRange(b, math.min(b + per, e))).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val range = partition.asInstanceOf[HarvestRange]
      new PartitionReader[InternalRow] {
        private var i = range.start - 1
        override def next(): Boolean = { i += 1; i < range.end }
        override def get(): InternalRow = {
          val (id, status, updatedMicros, url, title) = HarvestSource.record(i)
          InternalRow.fromSeq(Seq(
            UTF8String.fromString(id),
            UTF8String.fromString(status),
            updatedMicros,
            UTF8String.fromString(url),
            UTF8String.fromString(title)))
        }
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = ()
}
