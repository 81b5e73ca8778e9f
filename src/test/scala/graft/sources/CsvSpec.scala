package graft.sources

import graft.SparkSpec
import org.apache.spark.SparkException
import java.nio.file.{Files, Paths}

class CsvSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"csv-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("round trip preserves every row and the schema") {
    val original = docs
    val dir = freshDir("rt")
    Csv.write(original, s"$dir/out")
    val back = Csv.read(spark, s"$dir/out", original.schema)
    assert(back.schema == original.schema)
    assert(back.count() == original.count())
    assert(back.exceptAll(original).isEmpty && original.exceptAll(back).isEmpty)
  }

  test("headers are written once per part and never parsed as data") {
    val original = docs.limit(40)
    val dir = freshDir("hdr")
    Csv.write(original, s"$dir/out", numPartitions = 4)
    val parts = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 4)
    parts.foreach { f =>
      val first = scala.io.Source.fromFile(f).getLines().next()
      assert(first.startsWith("doc_id,"), s"missing header in ${f.getName}")
    }
    val back = Csv.read(spark, s"$dir/out", original.schema)
    assert(back.count() == 40)
  }

  test("strict read fails fast on a malformed line") {
    val dir = freshDir("bad")
    Files.writeString(Paths.get(dir, "data.csv"),
      "doc_id,text\n1,ok\nnot_a_number,broken,extra,cols\n2,also ok\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    intercept[SparkException] {
      Csv.read(spark, dir, schema).collect()
    }
  }

  test("audited read quarantines the malformed line, keeps the rest") {
    val dir = freshDir("audit")
    Files.writeString(Paths.get(dir, "data.csv"),
      "doc_id,text\n1,ok\nnot_a_number,broken\n2,also ok\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val rows = Csv.readAudited(spark, dir, schema).collect()
    assert(rows.length == 3)
    val good = rows.filter(_.isNullAt(2))
    val bad = rows.filter(!_.isNullAt(2))
    assert(good.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(bad.length == 1 &&
      bad.head.getString(2).startsWith("not_a_number"))
  }
}
