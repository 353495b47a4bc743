package graft.formats

import java.io.OutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Avro object-container interchange (SURVEY §3 "what's missing" item 1:
  * the one format a Common Crawl-adjacent user eventually asks for). The
  * distribution ships no `spark-avro` connector jar, but the plain Avro
  * Java library (`avro-1.12.1.jar`, public Apache API) IS on the
  * classpath — so the engine implements the container format directly:
  * this module owns the Spark↔Avro schema mapping and the sink;
  * [[graft.sources.AvroSource]] owns the split-aware V2 reader.
  *
  * Scale notes: the sink streams each partition through ONE
  * `DataFileWriter` (O(1) memory, deflate-compressed blocks, sync marker
  * every block so the files are SPLITTABLE on read); writes are
  * attempt-isolated (temp name + overwrite rename, the CdxSink/ZipNumWrite
  * discipline) so speculative retries can't truncate a winner. The reader
  * side splits on byte ranges aligned to the writer's sync markers —
  * a 100 TB avro drop fans out across executors like parquet does,
  * instead of one-task-per-file.
  */
object Avro {

  /** Spark→Avro schema for the supported interchange subset. Nullable
    * fields map to `union{null, T}` (null first — Avro's default-friendly
    * ordering); timestamps map to `long` + `timestamp-micros` logical
    * type, Spark's native micros domain, so the round trip is exact.
    */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      val base = avroType(f.dataType, s"${name}_${f.name}")
      val sch =
        if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def avroType(dt: DataType, name: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(elem, containsNull) =>
      val e = avroType(elem, name + "_elem")
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e)
        else e)
    case other =>
      throw new IllegalArgumentException(
        s"Avro sink: unsupported Spark type $other (field $name); " +
          "supported: long/int/double/float/boolean/string/binary/" +
          "timestamp/array")
  }

  /** One Spark value → the Avro-runtime value the `GenericDatumWriter`
    * expects for the mapped schema. */
  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) =>
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (i: java.time.Instant, TimestampType) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (ldt: java.time.LocalDateTime, TimestampNTZType) =>
      val i = ldt.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(elem, _)) =>
      seq.map(x => toAvro(x, elem)).asJava
    case (x, _) => x
  }

  /** Write `df` as splittable deflate-compressed Avro container files,
    * one per partition, attempt-isolated. Returns the Avro schema JSON
    * (also embedded in every file header). */
  def write(df: DataFrame, dir: String, deflateLevel: Int = 6,
            syncInterval: Int = 16 * 1024): String = {
    val spark = df.sparkSession
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val level = deflateLevel
    val sync = syncInterval
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val attempt = s"$pid-${tc.taskAttemptId()}"
        val schema = new Schema.Parser().parse(schemaJson)
        val pfs = org.apache.hadoop.fs.FileSystem.newInstance(
          new Path(dir).toUri, sconf.value)
        val tmp = new Path(dir, f".part-$pid%05d.$attempt.avro.tmp")
        val fin = new Path(dir, f"part-$pid%05d.avro")
        // the non-cached FS instance and the attempt temp must not
        // outlive a failed attempt: close in finally, reap tmp on error
        try {
          val out: OutputStream = pfs.create(tmp, true)
          val writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          writer.setCodec(CodecFactory.deflateCodec(level))
          // a sync marker every ~16 KiB of serialized data keeps the
          // split-seek granularity fine even for wide rows
          writer.setSyncInterval(sync)
          writer.create(schema, out)
          try {
            it.foreach { row =>
              val rec = new GenericData.Record(schema)
              var i = 0
              while (i < st.length) {
                rec.put(i, toAvro(row.get(i), st(i).dataType))
                i += 1
              }
              writer.append(rec)
            }
          } finally writer.close() // closes `out`
          // overwrite rename (atomic where the FS supports it): last
          // complete attempt wins, partial attempts never hold the final name
          val fctx = org.apache.hadoop.fs.FileContext.getFileContext(
            new Path(dir).toUri, sconf.value)
          fctx.rename(tmp, fin, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case t: Throwable =>
            try pfs.delete(tmp, false) catch { case _: Exception => () }
            throw t
        } finally pfs.close()
      }
    }
    // an all-empty write must still be READABLE (parquet/orc leave an
    // empty footer file; gavro's schema inference needs one header):
    // publish a header-only container when no partition produced a file
    if (AvroSource0.listEmpty(dir, spark.sparkContext.hadoopConfiguration)) {
      val schema = new Schema.Parser().parse(schemaJson)
      val out = fs.create(new Path(dir, "part-empty.avro"), true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      try writer.create(schema, out) finally writer.close()
    }
    schemaJson
  }

  /** small indirection so formats/ doesn't import sources/ at the top
    * level (the listing logic lives with the reader) */
  private object AvroSource0 {
    def listEmpty(dir: String, conf: org.apache.hadoop.conf.Configuration): Boolean =
      graft.sources.AvroSource.listAvro(dir, conf).isEmpty
  }

  /** Avro→Spark type for the fields [[avroSchema]] emits (plus the common
    * aliases a foreign writer uses). Unions `{null, T}` unwrap to nullable
    * T. */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"Avro scan: only union{null,T} supported, got $s")
      sparkType(nonNull.head)
    case Schema.Type.LONG =>
      if (s.getLogicalType == null) LongType
      else s.getLogicalType.getName match {
        case "timestamp-micros"       => TimestampType
        case "local-timestamp-micros" => TimestampNTZType
        case _                        => LongType
      }
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   =>
      val elem = s.getElementType
      val elemNullable = elem.getType == Schema.Type.UNION &&
        elem.getTypes.asScala.exists(_.getType == Schema.Type.NULL)
      ArrayType(sparkType(elem), containsNull = elemNullable)
    case other =>
      throw new IllegalArgumentException(s"Avro scan: unsupported type $other")
  }

  /** Spark StructType for an Avro record schema (field order preserved). */
  def sparkSchema(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD,
      s"Avro scan: top-level schema must be a record, got ${record.getType}")
    StructType(record.getFields.asScala.map { f =>
      val nullable = f.schema().getType == Schema.Type.UNION &&
        f.schema().getTypes.asScala.exists(_.getType == Schema.Type.NULL)
      StructField(f.name(), sparkType(f.schema()), nullable)
    }.toArray)
  }
}
