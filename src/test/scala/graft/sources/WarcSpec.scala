package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** WARC source/sink: member-per-record round trip on real data,
  * framing edge cases (truncation, missing Content-Length, garbage),
  * FAILFAST vs audited quarantine, and file-level parallelism.
  */
class WarcSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"warc-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Hand-roll one WARC record (optionally mangled) for edge cases. */
  private def record(
      id: Long, text: String, contentLength: Option[Long] = None,
      truncatePayload: Int = 0): Array[Byte] = {
    val payload = text.getBytes(StandardCharsets.UTF_8)
    val len = contentLength.getOrElse(payload.length.toLong)
    val header =
      s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: urn:graft:doc:$id\r\n" +
        s"WARC-Target-URI: https://example.org/doc/$id\r\n" +
        s"Content-Length: $len\r\n\r\n"
    val body = payload.dropRight(truncatePayload)
    header.getBytes(StandardCharsets.ISO_8859_1) ++ body ++
      "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  test("round trip preserves ids, payload bytes, and UTF-8 text") {
    val dir = freshDir("rt")
    Warc.write(docs, "doc_id", "text", s"$dir/out", numPartitions = 4)
    val back = Warc.read(spark, s"$dir/out")
      .select(
        regexp_extract(col("target_uri"), "(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("payload").cast("string").as("text"))
    val orig = docs.select(col("doc_id"), col("text"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("writer emits one gzip member per record, reader spans members") {
    val dir = freshDir("members")
    val five = docs.limit(5)
    Warc.write(five, "doc_id", "text", s"$dir/out", numPartitions = 1)
    val part = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val bytes = Files.readAllBytes(part.toPath)
    // count gzip member headers: magic 1f 8b 08 at member starts
    var members = 0
    var i = 0
    while (i + 2 < bytes.length) {
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
        bytes(i + 2) == 8) members += 1
      i += 1
    }
    assert(members == 5, s"expected 5 gzip members, found $members")
    assert(Warc.read(spark, s"$dir/out").count() == 5)
  }

  test("content length counts UTF-8 bytes, not chars") {
    val dir = freshDir("utf8")
    val s = spark
    import s.implicits._
    val row = Seq((1L, "naïve — ünïcødé ✓")).toDF("doc_id", "text")
    Warc.write(row, "doc_id", "text", s"$dir/out")
    val got = Warc.read(spark, s"$dir/out")
      .select(col("content_length"), col("payload").cast("string"))
      .head()
    assert(got.getLong(0) ==
      "naïve — ünïcødé ✓".getBytes(StandardCharsets.UTF_8).length.toLong)
    assert(got.getString(1) == "naïve — ünïcødé ✓")
  }

  test("strict read fails fast on a truncated payload") {
    val dir = freshDir("trunc")
    Files.write(Paths.get(dir, "bad.warc"),
      record(1, "intact record") ++
        record(2, "this payload gets cut", truncatePayload = 7))
    val e = intercept[SparkException] {
      Warc.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")))
  }

  test("strict read fails fast on a missing Content-Length") {
    val dir = freshDir("nolen")
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" +
      "orphan payload\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1)
    Files.write(Paths.get(dir, "bad.warc"), record(1, "ok") ++ noLen)
    intercept[SparkException] {
      Warc.read(spark, dir).collect()
    }
  }

  test("audited read quarantines the failure, keeps prior records") {
    val dir = freshDir("audit")
    Files.write(Paths.get(dir, "bad.warc"),
      record(1, "good one") ++ record(2, "also good") ++
        "not a warc header at all\r\n".getBytes(StandardCharsets.ISO_8859_1))
    val rows = Warc.readAudited(spark, dir).collect()
    val good = rows.filter(_.getAs[String]("_corrupt") == null)
    val bad = rows.filter(_.getAs[String]("_corrupt") != null)
    assert(good.length == 2)
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("_corrupt").contains("record #3"))
    // a clean file in the same directory is unaffected
    Files.write(Paths.get(dir, "good.warc"), record(9, "clean file"))
    val again = Warc.readAudited(spark, dir)
    assert(again.filter(col("_corrupt").isNull).count() == 3)
  }

  test("audited read flags gzip corruption instead of crashing") {
    val dir = freshDir("gzbad")
    val buf = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(buf)
    gz.write(record(1, "compressed fine"))
    gz.finish()
    val whole = buf.toByteArray
    // keep the gzip header, chop the deflate stream mid-flight
    Files.write(Paths.get(dir, "bad.warc.gz"),
      whole.dropRight(whole.length / 3))
    val rows = Warc.readAudited(spark, dir).collect()
    assert(rows.exists(_.getAs[String]("_corrupt") != null))
  }

  test("http corpus: status, content type, and body split at the CRLF boundary") {
    val dir = freshDir("http")
    Warc.writeHttp(docs.limit(10), "doc_id", "text", s"$dir/out", 2)
    val got = Warc.splitHttp(Warc.read(spark, s"$dir/out"))
      .select(
        regexp_extract(col("target_uri"), "(\\d+)$", 1).cast("long").as("doc_id"),
        col("warc_type"), col("content_type"),
        col("http_status"), col("http_content_type"), col("body"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 10)
    got.foreach { case (id, r) =>
      assert(r.getAs[String]("warc_type") == "response")
      assert(r.getAs[String]("content_type")
        .startsWith("application/http"))
      assert(r.getAs[Int]("http_status") == 200)
      assert(r.getAs[String]("http_content_type") == "text/html; charset=utf-8")
      val body = r.getAs[String]("body")
      assert(body.startsWith("<html>") && body.endsWith("</html>"),
        s"body not split at the header boundary for doc $id")
    }
  }

  test("http split: payload without a header boundary yields null status, empty body") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "not an http payload at all".getBytes(StandardCharsets.UTF_8)))
      .toDF("doc_id", "payload")
    val r = Warc.splitHttp(rows).collect().head
    assert(r.getAs[Any]("http_status") == null)
    assert(r.getAs[String]("body") == "")
  }

  test("http extract recovers the document text through the full chain") {
    val five = docs.limit(5)
    val got = Warc.roundTripHttpExtract(five, tag = "spec_http_chain")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = five.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, t) =>
      // template adds "Doc N" (title + h1) before and "& more" after
      assert(t == s"Doc $id Doc $id ${expected(id)} & more"
        .replaceAll("\\s+", " ").trim, s"chain mangled doc $id: $t")
    }
  }

  test("streaming drop-directory ingest matches the batch read") {
    val dir = freshDir("stream")
    val five = docs.limit(5)
    Warc.write(five, "doc_id", "text", s"$dir/out", numPartitions = 2)
    val q = Warc.readStream(spark, s"$dir/out", maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("warc_stream")
        .select(col("record_id"), col("payload").cast("string"))
      val batch = Warc.read(spark, s"$dir/out")
        .select(col("record_id"), col("payload").cast("string"))
      assert(streamed.count() == 5)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
      // a file landing later is picked up incrementally, including its
      // quarantined corrupt tail
      Files.write(Paths.get(s"$dir/out", "late.warc"),
        record(99, "late arrival") ++
          "garbage trailer\r\n".getBytes(StandardCharsets.ISO_8859_1))
      q.processAllAvailable()
      val after = spark.table("warc_stream")
      assert(after.filter(col("_corrupt").isNull).count() == 6)
      assert(after.filter(col("_corrupt").isNotNull).count() == 1)
    } finally q.stop()
  }

  test("framing survives adversarial payloads (WARC magic and CRLFs inside)") {
    val s = spark
    import s.implicits._
    // payloads that LOOK like record boundaries — Content-Length
    // framing must carry the parser straight over them
    val traps = Seq(
      1L -> "before\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nafter",
      2L -> "Content-Length: 99999\r\n\r\n<- not a real header",
      3L -> ("\r\n" * 20),
      4L -> "HTTP/1.1 200 OK\r\n\r\nbody with trailing CRLFs\r\n\r\n\r\n",
      // deterministic pseudo-random binary-ish text
      5L -> (0 until 500).map(i => ((i * 2654435761L) % 94 + 33).toChar)
        .mkString)
    val dir = freshDir("adversarial")
    Warc.write(traps.toDF("doc_id", "text"), "doc_id", "text", s"$dir/out", 1)
    val back = Warc.read(spark, s"$dir/out")
      .select(
        regexp_extract(col("record_id"), "(\\d+)$", 1).cast("long").as("id"),
        col("payload").cast("string").as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back.size == 5, s"record count wrong: ${back.keySet}")
    traps.foreach { case (id, text) =>
      assert(back(id) == text, s"payload $id mangled by framing")
    }
  }

  test("parallelism is per file: each archive is its own partition") {
    val dir = freshDir("par")
    Warc.write(docs, "doc_id", "text", s"$dir/out", numPartitions = 6)
    val parts = new java.io.File(s"$dir/out").listFiles()
      .count(_.getName.endsWith(".warc.gz"))
    assert(parts == 6)
    assert(Warc.read(spark, s"$dir/out").rdd.getNumPartitions >= 1)
    assert(Warc.read(spark, s"$dir/out").count() == docs.count())
  }
}
