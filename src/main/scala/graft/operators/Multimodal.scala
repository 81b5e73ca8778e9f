package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * All decode paths share one batch shape (`mapPartitions`, the Scala
  * analogue of a `mapInPandas` Arrow-batch pass; codec init once per
  * partition, narrow plan, no shuffle). Three REAL JDK codecs — one per
  * modality, each with a deterministic synthetic corpus (content =
  * closed-form fn of doc_id) so the full encode→decode round trip is
  * oracle-checkable cross-engine:
  *
  *   - [[decodeImages]]/[[resizeImages]] — `javax.imageio` PNG/BMP/JPEG
  *     (format sniffed from magic bytes; width/height/pixel-sum/
  *     descriptor read from the actual raster; deterministic
  *     nearest-neighbour resample). JPEG is the lossy one: metadata
  *     sits under the hard oracle, pixel content under a spec-pinned
  *     error bound.
  *   - [[decodeAudio]] — `javax.sound.sampled` WAV/PCM parse (sample
  *     rate/channels/exact 16-bit PCM sums from the real container).
  *   - [[sampleFrames]] — multi-frame animated GIF parse with
  *     every-k-th-frame rasterization (the video shape: container
  *     seek + selective frame decode).
  *   - [[decodeStubColumns]]/[[decodeBatches]] — the arithmetic STUB
  *     kept as the fallback for payloads with no JDK codec (e.g. real
  *     MP4/JPEG2000), deriving fake dimensions from the bytes.
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

  /** One decoded image row: real raster metadata + content summaries. */
  final case class ImageFeatures(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      // sum of the red-channel bytes over the raster (lossless formats
      // make this an exact content checksum)
      pixel_sum: Long,
      // 8-bin histogram of the red channel, as fractions of the raster
      descriptor: Array[Double])

  /** Deterministic pixel value for the synthetic corpus: a closed-form
    * function of (x, y, doc_id) so an external engine can recompute the
    * decoded content without any codec. Kept in one place because the
    * encoder, the spec, and the DuckDB oracle must agree on it exactly.
    */
  @inline def synthPixel(x: Int, y: Int, docId: Long): Int =
    (((x.toLong * 31 + y.toLong * 17 + docId) % 256 + 256) % 256).toInt

  /** Synthetic width/height: small, varied, derived from doc_id. */
  @inline def synthWidth(docId: Long): Int = ((docId % 13 + 13) % 13).toInt + 4
  @inline def synthHeight(docId: Long): Int = ((docId % 7 + 7) % 7).toInt + 4

  /** Build a deterministic image corpus from the documents table: one
    * real PNG (even doc_id) or BMP (odd doc_id) per document, encoded on
    * the executors (`mapPartitions`, codec shared per partition). Gray
    * pixels (r=g=b=[[synthPixel]]) in lossless formats, so decode is
    * exact and cross-engine checkable from doc_id alone.
    */
  def syntheticImageTable(documents: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val out = new ByteArrayOutputStream()
        ImageIO.write(paintSynthetic(id), fmt, out)
        MediaRow(id, out.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** The shared synthetic raster: gray pixel r=g=b=[[synthPixel]]. */
  private def paintSynthetic(id: Long): BufferedImage = {
    val w = synthWidth(id)
    val h = synthHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = synthPixel(x, y, id)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** JPEG variant of the synthetic corpus — the dominant web image
    * format, and the LOSSY one: the JDK encoder's DCT quantization
    * perturbs pixel values, so unlike PNG/BMP the decoded content is
    * oracle-checkable only through its exact metadata (format sniff,
    * raster dimensions) plus a spec-pinned per-pixel error bound
    * against [[synthPixel]] — the same pattern as the ANN gates'
    * recall floors.
    */
  def syntheticJpegTable(documents: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val out = new ByteArrayOutputStream()
        ImageIO.write(paintSynthetic(id), "jpg", out)
        MediaRow(id, out.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** Sniff the container format from magic bytes (PNG signature / BMP
    * "BM" header); empty string when unrecognised.
    */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes == null) ""
    else if (bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff) "jpeg"
    else ""

  /** Decode via ImageIO, mapping null, unrecognised, and CORRUPT
    * payloads (valid magic, truncated body — ImageIO.read throws, it
    * doesn't return null) to null so callers drop the row instead of
    * failing the task: a 100 TB media corpus WILL contain bad rows.
    */
  private def readImageOrNull(payload: Array[Byte]): BufferedImage =
    if (sniffFormat(payload).isEmpty) null
    else
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }

  /** REAL decode: `javax.imageio` PNG/BMP → raster metadata + content
    * summaries. Same partition-preserving batch shape as the stub path;
    * rows whose payload fails to decode are dropped (format "").
    */
  def decodeImages(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val fmt = sniffFormat(r.payload)
        val img = readImageOrNull(r.payload)
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          val hist = new Array[Long](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val red = (img.getRGB(x, y) >> 16) & 0xff
              sum += red
              hist(red >> 5) += 1
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          Some(ImageFeatures(r.doc_id, fmt, w, h, sum, hist.map(_ / n)))
        }
      }
    }
  }

  /** Perceptual difference hash (dHash, Krawetz 2013): decode →
    * nearest-neighbour 9×8 grayscale downsample (the SAME `x·sw/w`
    * index arithmetic as [[resizeImages]], so the sample grid is
    * bit-deterministic) → per-row left-to-right gradient signs packed
    * as 8 hex bytes (bit x of row y set iff p(x+1,y) > p(x,y)). The
    * image near-dup key: equal hashes ⇒ visually identical layout;
    * hamming distance on the 64 bits ranks near-dups. Emitted as a
    * 16-hex-char string — engine-portable, no sign-bit hazards.
    * Partition-preserving kernel, no shuffle; undecodable rows drop.
    */
  def dhashImages(media: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val img = readImageOrNull(r.payload)
        if (img == null) None
        else {
          val sw = img.getWidth
          val sh = img.getHeight
          def p(x: Int, y: Int): Int =
            (img.getRGB(x * sw / 9, y * sh / 8) >> 16) & 0xff
          val sb = new StringBuilder(16)
          var y = 0
          while (y < 8) {
            var byte = 0
            var x = 0
            while (x < 8) {
              if (p(x + 1, y) > p(x, y)) byte |= 1 << x
              x += 1
            }
            sb.append(f"$byte%02x")
            y += 1
          }
          Some((r.doc_id, sb.toString))
        }
      }
    }.toDF("doc_id", "dhash")
  }

  /** Image near-dup pairs on the [[dhashImages]] key: all pairs at
    * hamming distance ≤ `maxHamming` over the 64-bit hash, found by
    * 4×16-bit pigeonhole banding — EXACT for maxHamming ≤ 3 (3 flipped
    * bits cannot touch all 4 bands, so some band collides; the same
    * argument as the simhash family). Bands are hex SUBSTRINGS (no
    * 64-bit sign hazards); the verify xors band integers and sums
    * `bit_count` — engine-portable. Candidates are Σ|bucket|², never
    * all-pairs.
    */
  def dhashNearDupPairs(
      hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x16 pigeonhole banding is exact only for hamming <= 3")
    // band INTEGERS parse once per input row (4 convs/doc) and ride
    // the join as ints: the candidate stream is Sigma|bucket|^2 rows
    // (1.3M on the gated corpus), and the former per-candidate
    // conv(substring(hash)) x16 string parsing dominated the whole
    // operator (probe: 3.7 s of 3.9; the raw join is 0.3 s). hamming
    // then filters BEFORE the distinct, so only survivors shuffle.
    // materialize the (doc_id, hash, band ints) frame — 5 small
    // columns per image — so the upstream (often a per-row image
    // DECODE kernel) evaluates ONCE, not once per self-join side
    import graft.operators.Materialize.MaterializeOps
    val withInts = hashes.select(
      col("doc_id") +: col("dhash") +: (0 until 4).map(i =>
        conv(substring(col("dhash"), i * 4 + 1, 4), 16, 10)
          .cast("int").as(s"_h$i")): _*)
      .materialized
    val banded = withInts.select(
      col("doc_id") +: (0 until 4).map(i => col(s"_h$i")) :+
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            substring(col("dhash"), b * 4 + 1, 4).as("key"))): _*))
          .as("bk"): _*)
      .select(col("doc_id") +: (0 until 4).map(i => col(s"_h$i")) :+
        col("bk.band").as("band") :+ col("bk.key").as("key"): _*)
    val a = banded.select(
      col("doc_id").as("id_a") +: (0 until 4).map(i =>
        col(s"_h$i").as(s"_a$i")) :+ col("band") :+ col("key"): _*)
    val b = banded.select(
      col("doc_id").as("id_b") +: (0 until 4).map(i =>
        col(s"_h$i").as(s"_b$i")) :+ col("band") :+ col("key"): _*)
    val hamming = (0 until 4).map(i =>
      bit_count(col(s"_a$i").bitwiseXOR(col(s"_b$i")))
        .cast("long")).reduce(_ + _)
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** Skew-hardened [[dhashNearDupPairs]]: identical output whenever no
    * 28-bit sub-bucket exceeds `maxBucket` (the gated corpus and any
    * diverse crawl), with per-bucket work bounded at maxBucket² even
    * when a near-constant-image corpus (blank thumbnails) collapses
    * onto one 16-bit band key.
    *
    * The cap is EXACT where ER's drop-only cap is lossy, because the
    * pigeonhole recurses: a pair at hamming ≤ 3 matches some band `b`
    * exactly; if bucket (b,key) is hot, the ≤ 3 flips are confined to
    * the OTHER 48 bits, so among that bucket's 4×12-bit sub-bands some
    * sub-band also matches — the pair still collides on the extended
    * key. Only a sub-bucket still over the cap (≥ maxBucket images
    * sharing 28 of 64 bits) is dropped, by declared contract — and that
    * regime is the quadratic-OUTPUT case (the bucket members are
    * mutually near-dup), where no pairs-shaped operator can be
    * sub-quadratic; use connected components over a sampled pair set
    * there instead.
    *
    * The first cap decision is ONE tiny aggregate over a ≤ 4·2¹⁶-row
    * count frame (bounded by the band keyspace, not the corpus): when
    * NO bucket is hot — every diverse crawl — the operator
    * short-circuits to the plain banding over the already-materialized
    * frame, so the cap costs one KB-scale aggregate instead of a
    * broadcast join plus a second count pass over `banded`. Only a
    * corpus that actually has a hot bucket pays the split; its hot
    * rows explode ×4 — a corpus-bounded constant, not a blow-up.
    */
  def dhashNearDupPairsCapped(
      hashes: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 2000): DataFrame = {
    require(maxHamming <= 3,
      "4x16 pigeonhole banding is exact only for hamming <= 3")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    // banded feeds the count frame AND both cap branches: materialize
    // it (4 small rows per image) so the upstream decode runs once
    import graft.operators.Materialize.MaterializeOps
    val banded = hashes.select(col("doc_id"), col("dhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            substring(col("dhash"), b * 4 + 1, 4).as("key"))): _*))
          .as("bk"))
      .select(col("doc_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .materialized
    val c1 = banded.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("_cnt"))
    val hottest = c1.agg(max(col("_cnt"))).head()
    if (hottest.isNullAt(0) || hottest.getLong(0) <= maxBucket)
      // no hot bucket: the capped result IS the plain result; pair
      // directly over the materialized banding (band key unchanged)
      return pairOnBuckets(banded.select(
        col("doc_id"), col("dhash"), col("band"),
        col("key").as("bkey")), maxHamming)
    val keyed = banded.join(broadcast(c1), Seq("band", "key"))
    val small = keyed.filter(col("_cnt") <= maxBucket)
      .select(col("doc_id"), col("dhash"), col("band"),
        col("key").as("bkey"))
    // hot buckets: re-band the 12 remaining hex chars (48 bits) into
    // 4×3-hex sub-bands; `rest` drops band b's 4 chars by position
    val rest = concat(
      expr("substring(dhash, 1, band * 4)"),
      expr("substring(dhash, band * 4 + 5, 16)"))
    val hot = keyed.filter(col("_cnt") > maxBucket)
      .select(col("doc_id"), col("dhash"), col("band"), col("key"),
        rest.as("_rest"))
      .select(col("doc_id"), col("dhash"), col("band"),
        explode(array((0 until 4).map(sb =>
          concat(col("key"), lit(s"#$sb:"),
            substring(col("_rest"), sb * 3 + 1, 3))): _*)).as("bkey"))
    val c2 = hot.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("_cnt2"))
    val hotKept = hot.join(c2, Seq("band", "bkey"))
      .filter(col("_cnt2") <= maxBucket)
      .select(col("doc_id"), col("dhash"), col("band"), col("bkey"))
    pairOnBuckets(small.unionByName(hotKept), maxHamming)
  }

  /** Shared bucket-join tail of the dhash pair kernels: parse the 4
    * band integers once per kept (doc, bucket) row — never per
    * candidate — self-join on (band, bkey), hamming-filter BEFORE the
    * distinct so only survivors shuffle.
    */
  private def pairOnBuckets(
      buckets: DataFrame, maxHamming: Int): DataFrame = {
    val all = buckets.select(
      col("doc_id") +: col("band") +: col("bkey") +: (0 until 4).map(i =>
        conv(substring(col("dhash"), i * 4 + 1, 4), 16, 10)
          .cast("int").as(s"_h$i")): _*)
    val a = all.select(
      col("doc_id").as("id_a") +: col("band") +: col("bkey") +:
        (0 until 4).map(i => col(s"_h$i").as(s"_a$i")): _*)
    val b = all.select(
      col("doc_id").as("id_b") +: col("band") +: col("bkey") +:
        (0 until 4).map(i => col(s"_h$i").as(s"_b$i")): _*)
    val hamming = (0 until 4).map(i =>
      bit_count(col(s"_a$i").bitwiseXOR(col(s"_b$i")))
        .cast("long")).reduce(_ + _)
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** REAL resize: decode → nearest-neighbour resample (explicit source
    * index `x*sw/w`, `y*sh/h` — no Graphics2D interpolation, so the
    * result is bit-deterministic across JVMs) → re-encode PNG. Batch
    * shape identical to [[decodeImages]].
    */
  def resizeImages(media: DataFrame, w: Int, h: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val src = readImageOrNull(r.payload)
        if (src == null) None
        else {
          val sw = src.getWidth
          val sh = src.getHeight
          val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              dst.setRGB(x, y, src.getRGB(x * sw / w, y * sh / h))
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", out)
          Some(MediaRow(r.doc_id, out.toByteArray))
        }
      }
    }.toDF("doc_id", "payload")
  }

  /** One decoded audio row: real container metadata + exact content
    * sums (integer PCM arithmetic, so cross-engine checkable).
    */
  final case class AudioFeatures(
      doc_id: Long,
      format: String,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      // sum of the signed 16-bit samples — an exact content checksum
      pcm_sum: Long)

  /** Deterministic 16-bit sample for the synthetic audio corpus: a
    * closed-form function of (i, doc_id) so an external engine can
    * recompute the decoded content without any codec.
    */
  @inline def synthSample(i: Int, docId: Long): Int =
    ((((i.toLong * 37 + docId * 11) % 65536) + 65536) % 65536).toInt - 32768

  /** Synthetic clip length in samples, derived from doc_id. */
  @inline def synthSampleCount(docId: Long): Int =
    (((docId % 50) + 50) % 50).toInt + 20

  /** Build a deterministic audio corpus: one real WAV (RIFF container,
    * 16-bit signed little-endian mono PCM at 8 kHz) per document,
    * encoded with the JDK's `javax.sound.sampled` writer on the
    * executors. Lossless PCM, so decode is exact from doc_id alone.
    */
  def syntheticAudioTable(documents: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, 16, 1, true, false) // signed, little-endian
      ids.map { id =>
        val n = synthSampleCount(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = synthSample(i, id)
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new ByteArrayInputStream(pcm), fmt, n.toLong)
        val out = new ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        MediaRow(id, out.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** REAL audio decode: `javax.sound.sampled` WAV parse → format
    * metadata + exact PCM content sum. Same partition-preserving batch
    * shape as [[decodeImages]]; payloads that are not a RIFF/WAV
    * container (or fail to parse) are dropped.
    */
  def decodeAudio(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.payload
        if (p == null || p.length < 12 ||
          p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F') None
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(p))
          val f = ais.getFormat
          val data = ais.readAllBytes()
          ais.close()
          val bytesPerFrame = (f.getSampleSizeInBits / 8) * f.getChannels
          val n = if (bytesPerFrame > 0) data.length / bytesPerFrame else 0
          var sum = 0L
          if (f.getSampleSizeInBits == 16) {
            val be = f.isBigEndian
            var i = 0
            while (i + 1 < data.length) {
              val lo = if (be) data(i + 1) else data(i)
              val hi = if (be) data(i) else data(i + 1)
              sum += (((hi & 0xff) << 8) | (lo & 0xff)).toShort.toLong
              i += 2
            }
          }
          Some(AudioFeatures(r.doc_id, "wav", f.getSampleRate.toInt,
            f.getChannels, n.toLong, sum))
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** One sampled video frame: real per-frame raster metadata. */
  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      pixel_sum: Long)

  /** Synthetic frame count per clip, derived from doc_id. */
  @inline def synthFrames(docId: Long): Int = (((docId % 9) + 9) % 9).toInt + 2

  /** Build a deterministic "video" corpus: one real multi-frame
    * animated GIF per document (the one multi-frame container the JDK
    * reads AND writes), frame k's pixel = [[synthPixel]](x, y,
    * doc_id + k) on a 256-gray palette — lossless, so per-frame decode
    * is exact from doc_id alone. Encoded on the executors; writer
    * initialized once per partition.
    */
  def syntheticVideoTable(documents: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      // explicit 256-gray palette: unlike TYPE_BYTE_GRAY (whose
      // setRGB/getRGB pass through linear-gamma color conversion),
      // indexed samples round-trip BIT-EXACTLY through the container
      val grays = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      ids.map { id =>
        val w = synthWidth(id)
        val h = synthHeight(id)
        val out = new ByteArrayOutputStream()
        val ios = ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        // interlaced (progressive) GIF rows come back PERMUTED through
        // the JDK reader — disable it; non-interlaced is bit-exact
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        var k = 0
        val nFrames = synthFrames(id)
        while (k < nFrames) {
          val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, synthPixel(x, y, id + k))
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), param)
          k += 1
        }
        writer.endWriteSequence()
        ios.close()
        MediaRow(id, out.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** REAL frame sampling: parse the GIF container, decode ONLY every
    * k-th frame (frame_idx % everyK == 0 — the reader seeks by index,
    * skipped frames are never rasterized), emit per-frame metadata +
    * exact gray-channel sum. Same partition-preserving batch shape as
    * the other decoders; undecodable payloads are dropped.
    */
  def sampleFrames(media: DataFrame, everyK: Int)(
      implicit spark: SparkSession): Dataset[FrameFeatures] = {
    require(everyK > 0, s"everyK must be positive, got $everyK")
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        val p = r.payload
        if (p == null || p.length < 6 ||
          p(0) != 'G' || p(1) != 'I' || p(2) != 'F') Iterator.empty
        else {
          // memory-backed stream (no FileCacheImageInputStream temp file
          // / fd per row), closed eagerly — the sampled frames of one
          // clip are materialized before moving on, so the per-row
          // buffer is bounded by frames/everyK rasters, not leaked for
          // the executor's lifetime
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(p))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val out = List.newBuilder[FrameFeatures]
            (0 until n by everyK).foreach { k =>
              val img = reader.read(k)
              val w = img.getWidth
              val h = img.getHeight
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  sum += (img.getRGB(x, y) >> 16) & 0xff
                  x += 1
                }
                y += 1
              }
              out += FrameFeatures(r.doc_id, k, w, h, sum)
            }
            out.result().iterator
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
          finally iis.close()
        }
      }
    }
  }

  /** Per-channel raster statistics: exact R/G/B sums plus red-channel
    * extremes — the image-corpus quality profile (dead-pixel / blank /
    * over-exposed detection keys off exactly these). Same
    * partition-preserving kernel shape as [[decodeImages]]; every
    * accumulator is integer-exact so the lossless formats sit under
    * the full cross-engine oracle.
    */
  final case class ImageChannelStats(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      min_px: Int,
      max_px: Int)

  def imageChannelStats(media: DataFrame)(
      implicit spark: SparkSession): Dataset[ImageChannelStats] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val fmt = sniffFormat(r.payload)
        val img = readImageOrNull(r.payload)
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var mn = 255; var mx = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val red = (rgb >> 16) & 0xff
              sr += red
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              if (red < mn) mn = red
              if (red > mx) mx = red
              x += 1
            }
            y += 1
          }
          Some(ImageChannelStats(r.doc_id, fmt, w, h, sr, sg, sb, mn, mx))
        }
      }
    }
  }

  /** One fixed-size audio analysis frame: exact integer energy and
    * zero-crossing count.
    */
  final case class AudioFrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      n: Int,
      energy: Long,
      zc: Long)

  /** Frame-level audio features over REAL WAV decode: the PCM stream
    * is split into fixed `frameSize`-sample windows; each frame emits
    * Σv² (the energy the VAD/silence-trim stage thresholds on) and
    * the within-frame zero-crossing count (the cheapest
    * voiced/unvoiced discriminator). Both are integer-exact — 16-bit
    * samples make Σv² ≤ n·2³⁰, far inside a long — so the whole
    * feature pipeline sits under the hard oracle, unlike float
    * RMS/FFT features. Partition-preserving; undecodable rows drop.
    */
  def audioFrameFeatures(media: DataFrame, frameSize: Int)(
      implicit spark: SparkSession): Dataset[AudioFrameFeatures] = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.payload
        if (p == null || p.length < 12 ||
          p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F') {
          Iterator.empty
        } else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(p))
          val f = ais.getFormat
          val data = ais.readAllBytes()
          ais.close()
          if (f.getSampleSizeInBits != 16 || f.getChannels != 1) {
            Iterator.empty
          } else {
            val be = f.isBigEndian
            val n = data.length / 2
            val out = List.newBuilder[AudioFrameFeatures]
            var f0 = 0
            while (f0 * frameSize < n) {
              val lo = f0 * frameSize
              val hi = math.min(lo + frameSize, n)
              var energy = 0L
              var zc = 0L
              var prevNeg = false
              var i = lo
              while (i < hi) {
                val b0 = if (be) data(2 * i + 1) else data(2 * i)
                val b1 = if (be) data(2 * i) else data(2 * i + 1)
                val v = (((b1 & 0xff) << 8) | (b0 & 0xff)).toShort.toInt
                energy += v.toLong * v
                val neg = v < 0
                if (i > lo && neg != prevNeg) zc += 1
                prevNeg = neg
                i += 1
              }
              out += AudioFrameFeatures(r.doc_id, f0, hi - lo, energy, zc)
              f0 += 1
            }
            out.result().iterator
          }
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }
  }

  /** One frame-to-frame change row: exact absolute raster difference
    * and the cut decision.
    */
  final case class SceneCut(
      doc_id: Long,
      frame_idx: Int,
      diff: Long,
      is_cut: Boolean)

  /** Scene-cut detection over REAL multi-frame decode: consecutive
    * frames of each clip are diffed pixel-by-pixel (Σ|gray_k −
    * gray_{k−1}|, integer-exact) and a cut fires where the MEAN
    * absolute change exceeds `meanDiffThreshold` — stated
    * multiplicatively (diff > w·h·T) so no division happens on either
    * engine. This is the keyframe-selection primitive a video
    * training-data pipeline runs before sampling frames for captioning.
    * The kernel holds exactly two rasters at a time regardless of clip
    * length; frames whose dimensions disagree with their predecessor
    * are skipped (stated contract). Partition-preserving, no shuffle.
    */
  def sceneCuts(media: DataFrame, meanDiffThreshold: Long)(
      implicit spark: SparkSession): Dataset[SceneCut] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[MediaRow].mapPartitions { rows =>
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        val p = r.payload
        if (p == null || p.length < 6 ||
          p(0) != 'G' || p(1) != 'I' || p(2) != 'F') Iterator.empty
        else {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(p))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val out = List.newBuilder[SceneCut]
            var prev: Array[Int] = null
            var pw = 0; var ph = 0
            var k = 0
            while (k < n) {
              val img = reader.read(k)
              val w = img.getWidth
              val h = img.getHeight
              val cur = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  cur(y * w + x) = (img.getRGB(x, y) >> 16) & 0xff
                  x += 1
                }
                y += 1
              }
              if (prev != null && w == pw && h == ph) {
                var diff = 0L
                var i = 0
                while (i < cur.length) {
                  diff += math.abs(cur(i) - prev(i))
                  i += 1
                }
                out += SceneCut(r.doc_id, k, diff,
                  diff > w.toLong * h * meanDiffThreshold)
              }
              prev = cur; pw = w; ph = h
              k += 1
            }
            out.result().iterator
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
          finally iis.close()
        }
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
