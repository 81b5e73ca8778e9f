package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroIoSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-avro-spec-").toString

  test("primitive + timestamp + date round trip, nulls preserved") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", BooleanType),
      StructField("n", IntegerType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("s", StringType),
      StructField("b", BinaryType),
      StructField("ts", TimestampType),
      StructField("day", DateType)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val day = java.sql.Date.valueOf("2024-03-01")
    val rows = Seq(
      Row(1L, true, 7, 1.5f, 2.25, "hej", Array[Byte](1, 2, 3), ts, day),
      Row(2L, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val p = tmp()
    AvroIo.write(df, p)
    val back = AvroIo.read(spark, p, schema).orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getLong(0) === 1L)
    assert(back(0).getAs[java.sql.Timestamp]("ts") === ts)
    assert(back(0).getAs[java.sql.Date]("day") === day)
    assert(back(0).getAs[Array[Byte]]("b").toSeq === Seq[Byte](1, 2, 3))
    assert(back(0).getAs[String]("s") === "hej")
    assert(back(1).isNullAt(1) && back(1).isNullAt(5) && back(1).isNullAt(7))
  }

  test("array columns round trip (float embeddings, nullable elements)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("emb", ArrayType(FloatType, containsNull = false)),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq(0.5f, -1.0f), Seq("a", null, "c")),
      Row(2L, Seq.empty[Float], null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val p = tmp()
    AvroIo.write(df, p)
    val back = AvroIo.read(spark, p, schema).orderBy("id").collect()
    assert(back(0).getAs[Seq[Float]]("emb") === Seq(0.5f, -1.0f))
    assert(back(0).getAs[Seq[String]]("tags") === Seq("a", null, "c"))
    assert(back(1).getAs[Seq[Float]]("emb") === Seq.empty[Float])
    assert(back(1).isNullAt(2))
  }

  test("schema evolution: added nullable column resolves to null on old files") {
    val v1 = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val p = tmp()
    AvroIo.write(v1, p)
    val v2 = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      StructField("extra", StringType))) // not in the writer schema
    val back = AvroIo.read(spark, p, v2).orderBy("id").collect()
    assert(back.map(_.getAs[String]("s")).toSeq === Seq("x", "y"))
    assert(back.forall(_.isNullAt(2)))
  }

  test("FAILFAST read throws on a torn file; readAudited quarantines it") {
    val df = Seq((1L, "ok")).toDF("id", "s")
    val p = tmp()
    AvroIo.write(df, p)
    // torn header: garbage bytes under .avro
    Files.write(java.nio.file.Paths.get(p, "part-junk.avro"),
      "not an avro container".getBytes)
    val schema = df.schema
    intercept[org.apache.spark.SparkException] {
      AvroIo.read(spark, p, schema).count()
    }
    val audited = AvroIo.readAudited(spark, p, schema).collect()
    val bad = audited.filter(!_.isNullAt(2))
    val good = audited.filter(_.isNullAt(2))
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("_corrupt").contains("part-junk.avro"))
    assert(good.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("one part file per non-empty partition; repartition honored") {
    val df = Seq.tabulate(10)(i => (i.toLong, s"t$i")).toDF("id", "s")
    val p = tmp()
    AvroIo.write(df, p, numPartitions = 3)
    val parts = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length === 3)
    val back = AvroIo.read(spark, p, df.schema)
    assert(back.count() === 10L)
  }

  test("readStream: drop-dir containers decode incrementally, torn " +
    "file quarantined, batch face agrees") {
    val drop = tmp()
    val wave1 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val stage = tmp()
    AvroIo.write(wave1, stage)
    // move wave-1 parts into the drop dir before the stream starts
    val dropP = java.nio.file.Paths.get(drop)
    new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".avro")).zipWithIndex
      .foreach { case (f, i) =>
        Files.move(f.toPath, dropP.resolve(s"w1-$i.avro"))
      }
    Files.write(dropP.resolve("torn.avro"), "garbage".getBytes)
    val ckpt = tmp()
    val got = scala.collection.mutable.ArrayBuffer.empty[(Option[Long], String)]
    val q = AvroIo.readStream(spark, drop, wave1.schema)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r =>
          (if (r.isNullAt(0)) None else Some(r.getLong(0)),
            if (r.isNullAt(2)) "ok" else r.getString(2)))
        got.synchronized { got ++= rows }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      // wave 2 lands mid-stream
      val stage2 = tmp()
      AvroIo.write(Seq((3L, "c")).toDF("id", "s"), stage2)
      new java.io.File(stage2).listFiles()
        .filter(_.getName.endsWith(".avro")).zipWithIndex
        .foreach { case (f, i) =>
          Files.move(f.toPath, dropP.resolve(s"w2-$i.avro"))
        }
      q.processAllAvailable()
    } finally q.stop()
    val ok = got.filter(_._2 == "ok").flatMap(_._1).sorted
    assert(ok === Seq(1L, 2L, 3L))
    val corrupt = got.filterNot(_._2 == "ok")
    assert(corrupt.size === 1 && corrupt.head._2.contains("torn.avro"))
  }

  test("illegal column name and unsupported type are explicit errors") {
    intercept[IllegalArgumentException] {
      AvroIo.avroSchema(StructType(Seq(StructField("bad name", LongType))))
    }
    intercept[IllegalArgumentException] {
      AvroIo.avroSchema(StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
  }
}
