package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** OAI-PMH XML source/sink: round trip on real data, entity escaping,
  * deleted-record null shape, malformed-page quarantine vs FAILFAST,
  * and XXE hardening (external entities must not resolve).
  */
class XmlRecordsSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"oaixml-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def writePage(dir: String, name: String, body: String): Unit =
    Files.write(java.nio.file.Paths.get(dir, name),
      body.getBytes(StandardCharsets.UTF_8))

  test("round trip preserves ids, sets, datestamps, and text") {
    val dir = freshDir("rt")
    XmlRecords.write(docs, s"$dir/out", numPartitions = 4)
    val back = XmlRecords.read(spark, s"$dir/out")
      .select(
        regexp_extract(col("identifier"), "(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("datestamp"), col("deleted"), col("sets"), col("text"))
    val orig = docs.select(col("doc_id"),
      concat(lit("language:"), col("lang"), lit(",source:"), col("source"))
        .as("sets"),
      (col("doc_id") % 13 === 0).as("deleted"), col("text"))
    assert(back.count() == orig.count())
    val joined = back.as("b").join(orig.as("o"), Seq("doc_id"))
    assert(joined.filter(col("b.sets") =!= col("o.sets")).isEmpty)
    assert(joined.filter(col("b.deleted") =!= col("o.deleted")).isEmpty)
    // non-deleted records round-trip text exactly; deleted carry none
    assert(joined.filter(!col("b.deleted") &&
      !(col("b.text") <=> col("o.text"))).isEmpty)
    assert(joined.filter(col("b.deleted") && col("b.text").isNotNull).isEmpty)
    // datestamp replays the closed form
    val bad = back.filter(col("datestamp") =!=
      date_format(date_add(lit("2024-01-01").cast("date"),
        (col("doc_id") % 365).cast("int")), "yyyy-MM-dd"))
    assert(bad.isEmpty)
  }

  test("entity escaping survives the loop (&, <, >, unicode)") {
    val s = spark
    import s.implicits._
    val tricky = Seq(
      (1L, "en", "alpha", "a < b && c > d &amp; literal"),
      (2L, "de", "beta", "tags <record> inside </record> text ✓"))
      .toDF("doc_id", "lang", "source", "text")
    val dir = freshDir("esc")
    XmlRecords.write(tricky, s"$dir/out")
    val back = XmlRecords.read(spark, s"$dir/out")
      .select(regexp_extract(col("identifier"), "(\\d+)$", 1)
        .cast("long").as("doc_id"), col("text"))
    val orig = tricky.select(col("doc_id"), col("text"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("FAILFAST read fails on a malformed page naming the file") {
    val dir = freshDir("ff")
    writePage(dir, "page-00000.xml",
      "<OAI-PMH><ListRecords><record><header>" +
        "<identifier>oai:graft:1</identifier></header>")
    val e = intercept[SparkException] {
      XmlRecords.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("page-00000.xml") ||
      e.getCause != null)
  }

  test("audited read quarantines the malformed page, keeps good pages") {
    val dir = freshDir("aud")
    writePage(dir, "good.xml",
      "<OAI-PMH><ListRecords>" +
        XmlRecords.recordXml(5L, "en", "alpha", "hello") +
        "</ListRecords></OAI-PMH>")
    writePage(dir, "bad.xml",
      "<OAI-PMH><ListRecords><record><header>" +
        "<identifier>oai:graft:9</identifier>")
    val rows = XmlRecords.readAudited(spark, dir)
    assert(rows.filter(col("_corrupt").isNotNull).count() == 1)
    val good = rows.filter(col("_corrupt").isNull)
    assert(good.count() == 1)
    assert(good.select("identifier").head().getString(0) == "oai:graft:5")
  }

  test("record without identifier is malformed, not a null row") {
    val dir = freshDir("noid")
    writePage(dir, "page.xml",
      "<OAI-PMH><ListRecords><record><header>" +
        "<datestamp>2024-01-01</datestamp></header></record>" +
        "</ListRecords></OAI-PMH>")
    val rows = XmlRecords.readAudited(spark, dir)
    assert(rows.filter(col("_corrupt").isNotNull).count() == 1)
  }

  test("external entities do not resolve (XXE hardening)") {
    val dir = freshDir("xxe")
    writePage(dir, "page.xml",
      """<?xml version="1.0"?>
        |<!DOCTYPE r [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<OAI-PMH><ListRecords><record><header>
        |<identifier>oai:graft:&xxe;</identifier>
        |</header></record></ListRecords></OAI-PMH>""".stripMargin)
    // DTD support is off: the page must land in quarantine, never
    // with file contents spliced into the identifier
    val rows = XmlRecords.readAudited(spark, dir).collect()
    assert(rows.forall(r =>
      Option(r.getAs[String]("identifier"))
        .forall(_ == "oai:graft:")))
    assert(rows.exists(r => r.getAs[String]("_corrupt") != null ||
      Option(r.getAs[String]("identifier")).contains("oai:graft:")))
  }

  test("readStream ingests dropped pages and quarantines the bad one") {
    val dir = freshDir("stream")
    val ckpt = freshDir("ckpt")
    writePage(dir, "p1.xml",
      "<OAI-PMH><ListRecords>" +
        XmlRecords.recordXml(1L, "en", "alpha", "one") +
        XmlRecords.recordXml(2L, "de", "beta", "two") +
        "</ListRecords></OAI-PMH>")
    writePage(dir, "p2.xml",
      "<OAI-PMH><ListRecords><record><header>" +
        "<identifier>oai:graft:9</identifier>") // truncated page
    val q = XmlRecords.readStream(spark, dir, maxFilesPerTrigger = 10)
      .writeStream.format("memory").queryName("xml_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM xml_stream").collect()
      assert(rows.length == 3)
      assert(rows.count(_.getAs[String]("_corrupt") != null) == 1)
      assert(rows.filter(_.getAs[String]("_corrupt") == null)
        .map(_.getAs[String]("identifier")).toSet ==
        Set("oai:graft:1", "oai:graft:2"))
    } finally q.stop()
  }

  test("deleted records carry header sets but no metadata") {
    val s = spark
    import s.implicits._
    val one = Seq((13L, "fi", "gamma", "should not appear"))
      .toDF("doc_id", "lang", "source", "text")
    val dir = freshDir("del")
    XmlRecords.write(one, s"$dir/out")
    val r = XmlRecords.read(spark, s"$dir/out").head()
    assert(r.getAs[Boolean]("deleted"))
    assert(r.getAs[String]("sets") == "language:fi,source:gamma")
    assert(r.getAs[String]("language") == null)
    assert(r.getAs[String]("text") == null)
  }
}
