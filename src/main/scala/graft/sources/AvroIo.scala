package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink — the remaining mainstream
  * interchange format (Kafka ecosystems ship Avro; a training-data
  * pipeline meets it at every CDC/ingest boundary). Built directly on
  * the Apache Avro Java library (`DataFileWriter`/`DataFileReader` +
  * generic records): container files are BLOCK-compressed with the
  * writer schema embedded, and every part file is self-describing.
  *
  * Scale rules, enforced like [[Jsonl]]'s:
  *
  *  - READS TAKE AN EXPLICIT SPARK SCHEMA — it becomes the Avro READER
  *    schema, so Avro's own resolution rules (field matching by name,
  *    defaults for added nullable fields, numeric promotions) implement
  *    schema evolution; there is no inference pass and no schema drift
  *    across shards.
  *  - Malformed input is never silently dropped: [[read]] is FAILFAST
  *    (a corrupt block or irresolvable schema stops the job),
  *    [[readAudited]] quarantines the broken FILE into `_corrupt` rows
  *    (Avro corruption is block-scoped — sync markers resynchronize,
  *    but a torn header poisons the whole file) so cleanup pipelines
  *    count instead of crash.
  *  - The FILE is the split unit here (one part per write task, one
  *    reader per file). Avro blocks are splittable in principle;
  *    keeping parts at write-partition granularity makes part size the
  *    caller's explicit parallelism choice, the [[Warc.write]]
  *    contract.
  *
  * Type mapping (both directions): boolean/int/long/float/double ↔
  * themselves, string ↔ string, binary ↔ bytes, TimestampType ↔ long +
  * `timestamp-micros`, DateType ↔ int + `date`, ArrayType(primitive) ↔
  * array; a nullable Spark field ↔ `union(null, T)` with null default
  * (which is what makes added columns resolvable on old files).
  */
object AvroIo {

  // ----------------------------------------------------------- schema

  /** Spark StructType → Avro record schema (the subset documented
    * above; anything else is an explicit error, not a guess).
    */
  def avroSchema(schema: StructType, recordName: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"column '${f.name}' is not an Avro-legal field name")
      val base = fieldSchema(f.dataType, f.name)
      if (f.nullable) {
        val u = Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base))
        new Schema.Field(f.name, u, null, Schema.Field.NULL_DEFAULT_VALUE)
      } else new Schema.Field(f.name, base, null, null.asInstanceOf[AnyRef])
    }
    Schema.createRecord(recordName, null, "graft.avro", false,
      java.util.Arrays.asList(fields: _*))
  }

  private def fieldSchema(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, containsNull) =>
      val elem = fieldSchema(et, s"$name.element")
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(
            java.util.List.of(Schema.create(Schema.Type.NULL), elem))
        else elem)
    case other => throw new IllegalArgumentException(
      s"column '$name': Spark type $other has no Avro mapping here " +
        "(supported: boolean/int/long/float/double/string/binary/" +
        "timestamp/date/array-of-those)")
  }

  // ------------------------------------------------------------ write

  /** Write `df` as Avro container part files under `path` (deflate
    * block compression), one part per partition; `numPartitions` > 0
    * repartitions first (round-robin), 0 keeps the input layout.
    */
  def write(df: DataFrame, path: String, numPartitions: Int = 0): Unit = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema).toString // Schema isn't Serializable-stable; ship JSON
    val root = new Path(path)
    val fsDriver = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsDriver.exists(root)) fsDriver.delete(root, true)
    fsDriver.mkdirs(root)
    val base = if (numPartitions > 0) df.repartition(numPartitions) else df
    base.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val avro = new Schema.Parser().parse(schemaJson)
        val p = new Path(path, f"part-$idx%05d.avro")
        val fs = p.getFileSystem(new Configuration())
        val out = fs.create(p, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avro))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(avro, out) // DataFileWriter owns/closes the stream
        var n = 0L
        try it.foreach { row =>
          writer.append(toRecord(row, sparkSchema, avro))
          n += 1
        } finally writer.close()
        Iterator.single(n)
      }
    }.count(): Unit
  }

  private def toRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < st.length) {
      val v = if (row.isNullAt(i)) null
      else toAvroValue(row.get(i), st.fields(i).dataType)
      rec.put(i, v)
      i += 1
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType): AnyRef = dt match {
    case TimestampType =>
      val ts = v.asInstanceOf[java.sql.Timestamp]
      java.lang.Long.valueOf(
        Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
          ts.getNanos / 1000L)
    case DateType =>
      java.lang.Integer.valueOf(
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
    case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(e => if (e == null) null else toAvroValue(e, et))
        .asJava
    case _ => v.asInstanceOf[AnyRef] // boolean/int/long/float/double/string
  }

  /** Streaming read of an Avro drop directory — the continuous-ingest
    * shape shared with [[Warc.readStream]]/[[Jsonl.readStream]]: new
    * `.avro` container files land, each micro-batch admits up to
    * `maxFilesPerTrigger` whole containers (`binaryFile` source — the
    * FILE is the unit here, matching [[read]]'s split contract), and
    * the bytes decode through `DataFileStream` against the SAME reader
    * schema as the batch face. Always audited: a torn container
    * becomes a `_corrupt` row — FAILFAST inside a stream would wedge
    * the query on one bad file.
    */
  def readStream(
      spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame = {
    val readerJson = avroSchema(schema).toString
    val n = schema.length
    val out = StructType(schema.fields.map(_.copy(nullable = true)))
      .add("_corrupt", StringType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    import org.apache.spark.sql.functions.col
    spark.readStream.format("binaryFile")
      .schema(StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.avro")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY))
      .flatMap({ fb: (String, Array[Byte]) =>
        val (file, bytes) = fb
        try {
          val rs = new Schema.Parser().parse(readerJson)
          val stream = new org.apache.avro.file.DataFileStream[GenericRecord](
            new java.io.ByteArrayInputStream(bytes),
            new GenericDatumReader[GenericRecord](null, rs))
          streamRows(stream, file, schema, n)
        } catch {
          case e: Exception =>
            Iterator.single(Row.fromSeq(
              Seq.fill[Any](n)(null) :+ s"$file: ${e.getMessage}"))
        }
      })(enc)
      .toDF()
  }

  private def streamRows(
      stream: org.apache.avro.file.DataFileStream[GenericRecord],
      file: String, schema: StructType, n: Int): Iterator[Row] =
    new Iterator[Row] {
      private var broken: String = null
      private var done = false
      override def hasNext: Boolean = {
        if (done) false
        else if (broken != null) true
        else try {
          val h = stream.hasNext
          if (!h) { stream.close(); done = true }
          h
        } catch {
          case e: Exception =>
            broken = s"$file: ${e.getMessage}"
            try stream.close() catch { case _: Exception => () }
            true
        }
      }
      override def next(): Row = {
        if (broken != null) {
          val msg = broken; broken = null; done = true
          Row.fromSeq(Seq.fill[Any](n)(null) :+ msg)
        } else {
          val rec =
            try stream.next()
            catch {
              case e: Exception =>
                done = true
                try stream.close() catch { case _: Exception => () }
                return Row.fromSeq(
                  Seq.fill[Any](n)(null) :+ s"$file: ${e.getMessage}")
            }
          Row.fromSeq(
            schema.fields.indices.map(i =>
              fromAvroValue(rec.get(i), schema.fields(i).dataType)) :+
              null.asInstanceOf[Any])
        }
      }
    }

  private val written = new graft.operators.LruCache[String, String](64)

  /** Round-trip helper (the [[Orc.roundTrip]] pattern): written once
    * per tag, then read back with the frame's own schema as the Avro
    * reader schema.
    */
  def roundTrip(df: DataFrame, tag: String): DataFrame = {
    val schema = df.schema
    val path = written.getOrElseUpdate(tag) {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-avro/$tag"
      write(df, p)
      p
    }
    read(df.sparkSession, path, schema)
  }

  // ------------------------------------------------------------- read

  /** Strict read: explicit Spark schema (→ Avro reader schema, so old
    * files resolve through Avro evolution rules); any corrupt file or
    * irresolvable schema fails the job.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readImpl(spark, path, schema, failFast = true).drop("_corrupt")

  /** Auditing read: when a file turns corrupt mid-stream, rows decoded
    * before the corruption stand and the remainder becomes ONE row
    * with `_corrupt` = "file: error" (data columns null); a file whose
    * header won't open becomes a single `_corrupt` row. Healthy files
    * are unaffected.
    */
  def readAudited(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    readImpl(spark, path, schema, failFast = false)

  private def readImpl(
      spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
    val readerJson = avroSchema(schema).toString
    // quarantine rows null every data column, so the output relaxes
    // nullability regardless of what the caller's schema claims
    val out = StructType(schema.fields.map(_.copy(nullable = true)))
      .add("_corrupt", StringType)
    val n = schema.length
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { file =>
        try {
          val in = new FsInput(new Path(file), new Configuration())
          val rs = new Schema.Parser().parse(readerJson)
          val reader = new DataFileReader[GenericRecord](
            in, new GenericDatumReader[GenericRecord](null, rs))
          recordRows(reader, file, schema, n, failFast)
        } catch {
          // torn header / irresolvable schema: quarantine the file
          case e: Exception if !failFast =>
            Iterator.single(Row.fromSeq(
              Seq.fill[Any](n)(null) :+ s"$file: ${e.getMessage}"))
        }
      }
    spark.createDataFrame(rows, out)
  }

  private def recordRows(
      reader: DataFileReader[GenericRecord], file: String,
      schema: StructType, n: Int, failFast: Boolean): Iterator[Row] = {
    val it = new Iterator[Row] {
      private var broken: String = null
      private var done = false
      override def hasNext: Boolean = {
        if (done) false
        else if (broken != null) true
        else try {
          val h = reader.hasNext
          if (!h) { reader.close(); done = true }
          h
        } catch {
          case e: Exception if !failFast =>
            broken = s"$file: ${e.getMessage}"
            try reader.close() catch { case _: Exception => () }
            true
        }
      }
      override def next(): Row = {
        if (broken != null) {
          val msg = broken; broken = null; done = true
          Row.fromSeq(Seq.fill[Any](n)(null) :+ msg)
        } else {
          val rec =
            try reader.next()
            catch {
              case e: Exception if !failFast =>
                broken = null; done = true
                try reader.close() catch { case _: Exception => () }
                return Row.fromSeq(
                  Seq.fill[Any](n)(null) :+ s"$file: ${e.getMessage}")
            }
          Row.fromSeq(
            schema.fields.indices.map(i =>
              fromAvroValue(rec.get(i), schema.fields(i).dataType)) :+
              null.asInstanceOf[Any])
        }
      }
    }
    it
  }

  private def fromAvroValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Utf8 → String
      case TimestampType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue()))
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(e => fromAvroValue(e, et))
      case _ => v
    }
}
