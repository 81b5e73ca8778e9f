package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The Spark-side design is real — binary payload column, metadata struct,
  * partition-preserving batch iteration (`mapPartitions`, the Scala
  * analogue of `mapInPandas` batch shape), narrow plans — but the decoder
  * itself is a clearly-marked DETERMINISTIC STUB: no image/audio codec
  * exists in this environment, so `decodeStub` derives fake dimensions
  * arithmetically from the bytes. Swapping in a real codec changes ONE
  * function and nothing about the distribution strategy.
  */
object Multimodal {

  /** One decoded-media row (the post-decode schema). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      // resize/feature-extract output shape: fixed-length descriptor
      descriptor: Array[Double])

  // not private: Spark's codegen'd deserializer must reach the class
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Build the media table: binary payload + media-type column. Payload is
    * the utf-8 bytes of the document text (the stand-in blob this corpus
    * provides).
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/stub").as("media_type"))

  /** === STUB DECODE === pure-column variant: derives metadata
    * arithmetically from the payload (so it is cross-engine checkable).
    * A real deployment replaces this with a codec call in
    * [[decodeBatches]]; this column version exists to keep the pipeline
    * end-to-end testable without codecs.
    */
  def decodeStubColumns(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("width", (pmod(col("n_bytes") * 7, lit(1024)) + 1).cast("int"))
      .withColumn("height", (pmod(col("n_bytes") * 13, lit(768)) + 1).cast("int"))
      .select(col("doc_id"), col("n_bytes"), col("media_type").as("format"),
        col("width"), col("height"))

  /** Batch-shaped decode: one iterator pass per partition, the exact
    * shape a vectorized decode (mapInPandas / Arrow batch) takes. The
    * decode body is the STUB — everything around it (encoder, partition
    * preservation, no shuffle) is the real plumbing.
    */
  def decodeBatches(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      // real codec init would happen once per partition here
      rows.map { r =>
        val bytes = r.payload
        val n = bytes.length.toLong
        // === STUB: fake decode; deterministic in the bytes ===
        val width = (((n * 7) % 1024) + 1).toInt
        val height = (((n * 13) % 768) + 1).toInt
        val descriptor = Array.tabulate(8) { i =>
          if (bytes.isEmpty) 0.0
          else bytes(i % bytes.length).toDouble / 128.0
        }
        MediaFeatures(r.doc_id, n, "image/stub", width, height, descriptor)
      }
    }
  }

  /** Resize stub: descriptor-space op preserving the batch shape. */
  def resizeStub(features: Dataset[MediaFeatures], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    features.map(f => f.copy(width = w, height = h))
  }

  /** Frame-sample stub: every k-th "frame" index from a fake stream. */
  def frameSampleStub(media: DataFrame, everyK: Int): DataFrame =
    media.select(col("doc_id"),
      explode(sequence(lit(0), pmod(length(col("payload")), lit(16)))).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(everyK)) === 0)
}
