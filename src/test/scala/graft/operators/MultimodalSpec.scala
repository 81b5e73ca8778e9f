package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media table carries binary payload") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(m.count() == docs.count())
  }

  test("mapPartitions batch decode matches pure-column stub decode") {
    implicit val s = spark
    val media = Multimodal.mediaTable(docs)
    val cols = Multimodal.decodeStubColumns(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getInt(4)))
      .toSet
    val batches = Multimodal.decodeBatches(media)
      .collect().map(f => (f.doc_id, f.n_bytes, f.width, f.height)).toSet
    assert(cols == batches)
  }

  test("decode is partition-preserving (no shuffle in the plan)") {
    implicit val s = spark
    val plan = Multimodal.decodeBatches(Multimodal.mediaTable(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("descriptor has fixed length and deterministic values") {
    implicit val s = spark
    val d1 = Multimodal.decodeBatches(Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f.descriptor.toSeq).toMap
    assert(d1.values.forall(_.size == 8))
    val d2 = Multimodal.decodeBatches(Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f.descriptor.toSeq).toMap
    assert(d1 == d2)
  }

  test("real decode recovers exact dimensions and pixel content from PNG and BMP") {
    implicit val s = spark
    val decoded = Multimodal.decodeImages(Multimodal.syntheticImageTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(decoded.size == docs.count())
    decoded.foreach { case (id, f) =>
      val w = Multimodal.synthWidth(id)
      val h = Multimodal.synthHeight(id)
      assert(f.format == (if (id % 2 == 0) "png" else "bmp"))
      assert(f.width == w && f.height == h)
      val expectedSum = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.synthPixel(x, y, id).toLong).sum
      assert(f.pixel_sum == expectedSum, s"pixel checksum mismatch for doc $id")
      // descriptor is the red-channel histogram as fractions: sums to 1
      assert(math.abs(f.descriptor.sum - 1.0) < 1e-9)
    }
  }

  test("JPEG decode: metadata exact, pixel content inside the lossy bound") {
    implicit val s = spark
    // metadata (sniff, dimensions) is EXACT — the hard-oracle side of
    // the multimodal_jpeg_decode gate
    val decoded = Multimodal.decodeImages(Multimodal.syntheticJpegTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(decoded.size == docs.count())
    decoded.foreach { case (id, f) =>
      assert(f.format == "jpeg", s"doc $id sniffed as ${f.format}")
      assert(f.width == Multimodal.synthWidth(id) &&
        f.height == Multimodal.synthHeight(id))
    }
    // pixel content is codec-defined (DCT quantization) — pin it to an
    // error bound vs the encoded pattern instead of an equality:
    // measured max|err| = 42, mean = 6.8 on this corpus; bounds carry
    // margin for JDK codec drift without ever letting a broken decode
    // (shifted raster, channel swap → errors ~128) pass
    val payloads = Multimodal.syntheticJpegTable(docs)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    var maxErr = 0
    var sumErr = 0L
    var n = 0L
    payloads.foreach { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val e = math.abs(((img.getRGB(x, y) >> 16) & 0xff) -
            Multimodal.synthPixel(x, y, id))
          if (e > maxErr) maxErr = e
          sumErr += e
          n += 1
          x += 1
        }
        y += 1
      }
    }
    assert(maxErr <= 64, s"per-pixel JPEG error out of bound: $maxErr")
    assert(sumErr.toDouble / n <= 12.0,
      s"mean JPEG error out of bound: ${sumErr.toDouble / n}")
  }

  test("real decode drops undecodable payloads instead of failing") {
    implicit val s = spark
    import s.implicits._
    // PNG magic with a truncated body: sniffs as "png" but ImageIO.read
    // THROWS (not null) — must be dropped, not fail the task
    val truncatedPng = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a)
    val mixed = Seq(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3)), // garbage
      Multimodal.MediaRow(2L, truncatedPng),
      Multimodal.MediaRow(0L, null)).toDF("doc_id", "payload")
        .union(Multimodal.syntheticImageTable(docs.limit(5)))
    val out = Multimodal.decodeImages(mixed).collect()
    assert(out.length == 5)
    // resize shares the guarded decode path
    assert(Multimodal.resizeImages(mixed, 4, 4).count() == 5)
  }

  test("real resize resamples with deterministic nearest-neighbour pixels") {
    implicit val s = spark
    val media = Multimodal.syntheticImageTable(docs.limit(20))
    val resized = Multimodal.decodeImages(Multimodal.resizeImages(media, 8, 8))
      .collect().map(f => f.doc_id -> f).toMap
    assert(resized.size == 20)
    resized.foreach { case (id, f) =>
      assert(f.width == 8 && f.height == 8)
      val sw = Multimodal.synthWidth(id)
      val sh = Multimodal.synthHeight(id)
      val expectedSum = (for (y <- 0 until 8; x <- 0 until 8)
        yield Multimodal.synthPixel(x * sw / 8, y * sh / 8, id).toLong).sum
      assert(f.pixel_sum == expectedSum, s"resized checksum mismatch for doc $id")
    }
  }

  test("real WAV decode recovers format, length and exact PCM content") {
    implicit val s = spark
    val decoded = Multimodal.decodeAudio(Multimodal.syntheticAudioTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(decoded.size == docs.count())
    decoded.foreach { case (id, f) =>
      val n = Multimodal.synthSampleCount(id)
      assert(f.format == "wav" && f.sample_rate == 8000 && f.channels == 1)
      assert(f.n_samples == n)
      val expectedSum =
        (0 until n).map(i => Multimodal.synthSample(i, id).toLong).sum
      assert(f.pcm_sum == expectedSum, s"PCM checksum mismatch for doc $id")
    }
  }

  test("audio decode drops non-RIFF payloads instead of failing") {
    implicit val s = spark
    import s.implicits._
    val mixed = Seq(
      Multimodal.MediaRow(900001L, Array[Byte]('R', 'I', 'F', 'F', 0, 0)),
      Multimodal.MediaRow(900002L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
      .union(Multimodal.syntheticAudioTable(docs.limit(5)))
    val out = Multimodal.decodeAudio(mixed).collect()
    assert(out.length == 5)
    assert(out.forall(_.doc_id < 900000L))
  }

  test("real GIF frame sampling decodes exactly the every-k-th frames") {
    implicit val s = spark
    val media = Multimodal.syntheticVideoTable(docs.limit(30))
    val sampled = Multimodal.sampleFrames(media, everyK = 2)
      .collect().groupBy(_.doc_id)
    assert(sampled.size == 30)
    sampled.foreach { case (id, frames) =>
      val n = Multimodal.synthFrames(id)
      val expectIdx = (0 until n by 2).toSeq
      assert(frames.map(_.frame_idx).sorted.toSeq == expectIdx)
      frames.foreach { f =>
        val w = Multimodal.synthWidth(id)
        val h = Multimodal.synthHeight(id)
        assert(f.width == w && f.height == h)
        val expectedSum = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.synthPixel(x, y, id + f.frame_idx).toLong).sum
        assert(f.pixel_sum == expectedSum,
          s"frame checksum mismatch doc $id frame ${f.frame_idx}")
      }
    }
    // everyK = 1 decodes all frames
    val all = Multimodal.sampleFrames(media, everyK = 1).collect()
      .groupBy(_.doc_id)
    all.foreach { case (id, frames) =>
      assert(frames.length == Multimodal.synthFrames(id))
    }
  }

  test("frame sampling drops non-GIF payloads instead of failing") {
    implicit val s = spark
    import s.implicits._
    val mixed = Seq(Multimodal.MediaRow(900001L, Array[Byte]('G', 'I', 'F', 0)))
      .toDF("doc_id", "payload")
      .union(Multimodal.syntheticVideoTable(docs.limit(4)))
    val out = Multimodal.sampleFrames(mixed, everyK = 1).collect()
    assert(out.map(_.doc_id).distinct.length == 4)
  }

  test("real decode is partition-preserving (no shuffle in the plan)") {
    implicit val s = spark
    val plan = Multimodal.decodeImages(Multimodal.syntheticImageTable(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("dhash matches the closed form and keys identical layouts") {
    implicit val s = spark
    val hashes = Multimodal.dhashImages(
        Multimodal.syntheticImageTable(docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes.values.forall(h =>
      h.length == 16 && h.forall("0123456789abcdef".contains(_))))
    // recompute one hash from the synthetic pattern directly
    val id = hashes.keys.min
    val sw = Multimodal.synthWidth(id)
    val sh = Multimodal.synthHeight(id)
    def p(x: Int, y: Int) =
      Multimodal.synthPixel(x * sw / 9, y * sh / 8, id)
    val expect = (0 until 8).map { y =>
      val b = (0 until 8).foldLeft(0) { (acc, x) =>
        if (p(x + 1, y) > p(x, y)) acc | (1 << x) else acc
      }
      f"$b%02x"
    }.mkString
    assert(hashes(id) == expect)
    // same (w, h, pattern phase) ⇒ same hash: ids congruent mod
    // lcm(13,7)·256-ish share layout only when pixels align; at least
    // assert determinism across a recompute
    val again = Multimodal.dhashImages(
        Multimodal.syntheticImageTable(docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == hashes)
  }

  test("dhash near-dup banding equals brute-force hamming <= 3") {
    implicit val s = spark
    val hashes = Multimodal.dhashImages(
      Multimodal.syntheticImageTable(docs))
    val got = Multimodal.dhashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // brute force on the driver over the same hashes
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getString(1))
    def bits(h: String): Long = java.lang.Long.parseUnsignedLong(h, 16)
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(bits(ha) ^ bits(hb)) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the synthetic corpus does contain near-dups
  }

  test("capped dhash banding equals uncapped with the hot path engaged") {
    implicit val s = spark
    import s.implicits._
    val hashes = Multimodal.dhashImages(Multimodal.syntheticImageTable(docs))
    val uncapped = Multimodal.dhashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cap far below the corpus's largest band bucket so hot buckets
    // sub-band; sub-buckets stay under the cap here, so results must
    // be IDENTICAL (the recursive pigeonhole is exact, not approximate)
    val capped = Multimodal.dhashNearDupPairsCapped(
        hashes, maxHamming = 3, maxBucket = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == uncapped)
    assert(uncapped.nonEmpty)
  }

  test("capped dhash bounds a near-constant corpus and keeps true pairs") {
    implicit val s = spark
    import s.implicits._
    // 60% of the corpus shares ONE hash (the blank-thumbnail collapse);
    // the rest are distinct hashes with a few planted hamming-1 pairs
    val constant = (0L until 60L).map(i => (i, "00000000000000ff"))
    val planted = (100L until 120L).map { i =>
      val h = f"${i * 0x9e3779b97f4a7c15L}%016x"
      (i, h)
    } ++ Seq((900L, "123456789abcdef0"), (901L, "123456789abcdef1"))
    val hashes = (constant ++ planted).toDF("doc_id", "dhash")
    val capped = Multimodal.dhashNearDupPairsCapped(
        hashes, maxHamming = 3, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the planted diverse pair survives the cap (its buckets are small)
    assert(capped.contains((900L, 901L, 1L)))
    // the constant block's sub-buckets are ALL identical 28-bit keys →
    // over-cap → dropped by declared contract: no constant-block pair
    // appears, and no bucket ever exceeded maxBucket² work
    assert(!capped.exists { case (a, b, _) => a < 60L && b < 60L })
  }

  test("channel stats separate R/G/B on a non-gray raster") {
    implicit val s = spark
    import s.implicits._
    // 2×1 PNG: (255,0,10) and (1,2,3) → sums (256, 2, 13), red min/max (1, 255)
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (255 << 16) | (0 << 8) | 10)
    img.setRGB(1, 0, (1 << 16) | (2 << 8) | 3)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val media = Seq(Multimodal.MediaRow(1L, out.toByteArray))
      .toDF("doc_id", "payload")
    val st = Multimodal.imageChannelStats(media).collect().head
    assert(st.width == 2 && st.height == 1)
    assert(st.sum_r == 256 && st.sum_g == 2 && st.sum_b == 13)
    assert(st.min_px == 1 && st.max_px == 255)
  }

  test("audio frames: energy and zero-crossings from a hand-built WAV") {
    implicit val s = spark
    import s.implicits._
    // samples: +100, -100, +100, -100, 50 → frameSize 4: frame0 has
    // energy 4·100², zc 3; frame1 has energy 2500, zc 0, n 1
    val samples = Array[Short](100, -100, 100, -100, 50)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val media = Seq(Multimodal.MediaRow(7L, out.toByteArray))
      .toDF("doc_id", "payload")
    val fr = Multimodal.audioFrameFeatures(media, frameSize = 4)
      .collect().sortBy(_.frame_idx)
    assert(fr.length == 2)
    assert(fr(0).n == 4 && fr(0).energy == 40000L && fr(0).zc == 3)
    assert(fr(1).n == 1 && fr(1).energy == 2500L && fr(1).zc == 0)
  }

  test("scene cuts fire on an actual frame change, not on stillness") {
    implicit val s = spark
    import s.implicits._
    // 3-frame GIF: frame1 == frame0 (diff 0, no cut), frame2 inverts
    // every pixel (mean |Δ| large → cut at threshold 2)
    val w = 4; val h = 4
    def frame(invert: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (invert) 255 - (x * 16) else x * 16
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(frame(false), frame(false), frame(true)).foreach { f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val media = Seq(Multimodal.MediaRow(3L, out.toByteArray))
      .toDF("doc_id", "payload")
    val cuts = Multimodal.sceneCuts(media, meanDiffThreshold = 2L)
      .collect().sortBy(_.frame_idx)
    assert(cuts.length == 2)
    assert(cuts(0).frame_idx == 1 && cuts(0).diff == 0L && !cuts(0).is_cut)
    // per-pixel |Δ| = |255 - 2·(x·16)| ≥ 135 ⇒ mean ≫ 2
    assert(cuts(1).frame_idx == 2 && cuts(1).diff > 32L * w * h &&
      cuts(1).is_cut)
  }
}
