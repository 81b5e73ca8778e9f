package graft.sources

import graft.SparkSpec
import org.apache.spark.SparkException
import java.nio.file.{Files, Paths}

class JsonlSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"jsonl-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("round trip preserves every row, including newline/quote text") {
    val original = docs
    val dir = freshDir("rt")
    Jsonl.write(original, s"$dir/out")
    val back = Jsonl.read(spark, s"$dir/out", original.schema)
    assert(back.schema == original.schema)
    assert(back.count() == original.count())
    assert(back.exceptAll(original).isEmpty && original.exceptAll(back).isEmpty)
  }

  test("gzip round trip is identical to plain") {
    val original = docs.limit(50)
    val dir = freshDir("gz")
    Jsonl.write(original, s"$dir/out", numPartitions = 2, gzip = true)
    val back = Jsonl.read(spark, s"$dir/out", original.schema)
    assert(back.exceptAll(original).isEmpty && original.exceptAll(back).isEmpty)
    // compression actually happened (part files are .gz)
    val parts = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".gz")))
  }

  test("strict read fails fast on a malformed line") {
    val dir = freshDir("bad")
    Files.writeString(Paths.get(dir, "data.jsonl"),
      """{"doc_id": 1, "text": "ok"}
        |{not json at all
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    intercept[SparkException] {
      Jsonl.read(spark, dir, schema).collect()
    }
  }

  test("audited read quarantines the malformed line, keeps the rest") {
    val dir = freshDir("audit")
    Files.writeString(Paths.get(dir, "data.jsonl"),
      """{"doc_id": 1, "text": "ok"}
        |{not json at all
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val rows = Jsonl.readAudited(spark, dir, schema)
      .collect().sortBy(r => Option(r.get(0)).map(_.toString).getOrElse("z"))
    assert(rows.length == 3)
    val good = rows.filter(_.isNullAt(2))
    val bad = rows.filter(!_.isNullAt(2))
    assert(good.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(bad.length == 1 && bad.head.getString(2).startsWith("{not json"))
  }

  test("streaming read ingests files incrementally as they land") {
    val dir = freshDir("stream")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    Files.writeString(Paths.get(dir, "a.jsonl"),
      "{\"doc_id\": 1, \"text\": \"first\"}\n")
    val q = Jsonl.readStream(spark, dir, schema, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_stream").count() == 1)
      // a second file landing later is picked up incrementally
      Files.writeString(Paths.get(dir, "b.jsonl"),
        "{\"doc_id\": 2, \"text\": \"second\"}\n")
      q.processAllAvailable()
      val got = spark.table("jsonl_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(1L -> "first", 2L -> "second"))
    } finally q.stop()
  }

  test("roundTrip helper writes once per tag and re-reads equal rows") {
    val original = docs.limit(20)
    val a = Jsonl.roundTrip(original, tag = s"spec-${System.nanoTime()}")
    assert(a.exceptAll(original).isEmpty && original.exceptAll(a).isEmpty)
  }
}
