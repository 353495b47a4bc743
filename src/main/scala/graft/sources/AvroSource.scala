package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.formats.{Avro, SerializableHadoopConf}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for Avro object-container files:
  * `spark.read.format("gavro").load(dir)` (shortName `gavro` so a future
  * spark-avro jar can't collide on `avro`). Built on the PUBLIC plain-Avro
  * API ([[graft.formats.Avro]] has the schema mapping; `avro-1.12.1.jar`
  * ships in the distribution even though the spark-avro connector does
  * not).
  *
  * Scale design — the two things a 100 TB avro drop needs:
  *   - SPLITTABLE reads: partitions are byte ranges, not files. The
  *     container format interleaves a sync marker between blocks, so a
  *     reader seeks `sync(start)` and consumes blocks until
  *     `pastSync(end)` — the classic Hadoop Avro split contract: each
  *     block belongs to exactly one range, no duplicates, no loss,
  *     regardless of where range boundaries fall.
  *   - COLUMN PRUNING: `SupportsPushDownRequiredColumns` — Avro is
  *     row-major so pruning can't save IO, but the reader materializes
  *     only requested fields into rows (decode-and-drop beats
  *     decode-and-carry for wide records under codegen downstream).
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gavro"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.headerSchema(
      options.get("path"),
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.getOrDefault("path", ""), schema)
  override def supportsExternalMetadata(): Boolean = true
}

object AvroSource {
  /** File schema from the first container header under `pathGlob` — one
    * driver-side header read (~bytes), the avro analogue of parquet
    * footer-based inference. */
  def headerSchema(pathGlob: String, conf: Configuration): StructType = {
    val files = listAvro(pathGlob, conf)
    require(files.nonEmpty, s"gavro: no .avro files under $pathGlob")
    val in = new FsInput(files.head._1, conf)
    try {
      val r = new DataFileReader[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      val st = Avro.sparkSchema(r.getSchema)
      r.close()
      st
    } finally in.close()
  }

  /** (path, length) of every data file: explicit file/glob verbatim,
    * directories expanded RECURSIVELY (partitioned layouts nest files
    * under key=value dirs; one-level listing would silently plan zero
    * partitions for them), skipping hidden/in-progress names and
    * depth-capped against filesystem loops — the WarcSource listing
    * discipline. */
  def listAvro(pathGlob: String, conf: Configuration): Seq[(Path, Long)] = {
    val p = new Path(pathGlob)
    val fs = p.getFileSystem(conf)
    def hidden(name: String): Boolean =
      name.startsWith("_") || name.startsWith(".")
    def expand(s: org.apache.hadoop.fs.FileStatus, depth: Int)
        : Seq[(Path, Long)] =
      if (s.isFile) {
        if (!hidden(s.getPath.getName) && s.getPath.getName.endsWith(".avro"))
          Seq(s.getPath -> s.getLen)
        else Seq.empty
      } else if (depth >= 16) Seq.empty
      else fs.listStatus(s.getPath).toSeq
        .filterNot(c => hidden(c.getPath.getName))
        .flatMap(c => expand(c, depth + 1))
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty).flatMap { s =>
      if (s.isFile) Seq(s.getPath -> s.getLen) else expand(s, 0)
    }
  }
}

final class AvroTable(path: String, declared: StructType)
  extends Table with SupportsRead {
  override def name(): String = s"gavro:$path"
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val p = Option(options.get("path")).filter(_.nonEmpty).getOrElse(path)
    val split = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    // capture the session Hadoop conf at analysis time (AQE threads have
    // no active session — the WarcSource/ZipNumSource rule)
    val conf = new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    new AvroScanBuilder(p, declared, split, conf)
  }
}

final class AvroScanBuilder(
    pathGlob: String, full: StructType, maxSplitBytes: Long,
    sconf: SerializableHadoopConf)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the table's field order (the prune contract allows any
    // order; sorting by source position keeps row layout deterministic)
    val want = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => want.contains(f.name)))
  }
  override def build(): Scan =
    new AvroScan(pathGlob, required, maxSplitBytes, sconf)
}

final class AvroScan(
    pathGlob: String, required: StructType, maxSplitBytes: Long,
    sconf: SerializableHadoopConf)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"AvroScan[$pathGlob, ReadSchema: ${required.simpleString}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    AvroSource.listAvro(pathGlob, sconf.value).flatMap { case (path, len) =>
      // byte-range splits; the sync-marker contract assigns every block
      // to exactly one range
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until n).map { i =>
        val start = i * maxSplitBytes
        val end = math.min(len, start + maxSplitBytes)
        AvroSplit(path.toString, start, end): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = required
    val conf = sconf
    (partition: InputPartition) => {
      val s = partition.asInstanceOf[AvroSplit]
      new AvroPartitionReader(s, schema, conf)
    }
  }
}

final case class AvroSplit(file: String, start: Long, end: Long)
  extends InputPartition

final class AvroPartitionReader(
    split: AvroSplit, required: StructType, sconf: SerializableHadoopConf)
  extends PartitionReader[InternalRow] {
  private val in = new FsInput(new Path(split.file), sconf.value)
  // the input must not leak if the header parse or seek throws (a
  // truncated/corrupt container fails `new DataFileReader`; with task
  // retries × splits-per-file an unguarded open leaks a descriptor per
  // attempt)
  private val reader =
    try {
      val r = new DataFileReader[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      // position at the first block whose sync marker is at/after `start`
      // (for start=0 this lands on the first block, past the header)
      r.sync(split.start)
      r
    } catch {
      case t: Throwable =>
        try in.close() catch { case _: Exception => () }
        throw t
    }
  // field index in the FILE schema for each required output field: exact
  // name match first, then UNAMBIGUOUS case-insensitive fallback (Spark
  // resolves declared schemas case-insensitively by default — an exact-only
  // lookup would silently null out a column over a foreign writer's
  // capitalization); missing fields surface as null, the usual
  // schema-evolution read semantics
  private val fileSchema = reader.getSchema
  private val plan: Array[(Int, DataType)] = required.fields.map { f =>
    val pos = Option(fileSchema.getField(f.name)).map(_.pos()).getOrElse {
      val ci = fileSchema.getFields.asScala
        .filter(_.name().equalsIgnoreCase(f.name))
      if (ci.size == 1) ci.head.pos() else -1
    }
    (pos, f.dataType)
  }
  private var rec: GenericRecord = _

  override def next(): Boolean = {
    if (!reader.hasNext || reader.pastSync(split.end)) false
    else { rec = reader.next(rec); true }
  }

  override def get(): InternalRow = {
    val out = new Array[Any](plan.length)
    var i = 0
    while (i < plan.length) {
      val (pos, dt) = plan(i)
      out(i) = if (pos < 0) null else convert(rec.get(pos), dt)
      i += 1
    }
    new GenericInternalRow(out)
  }

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: CharSequence, StringType) => UTF8String.fromString(s.toString)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      // copy out: the buffer's backing array is reused by the decoder
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.lang.Long, TimestampType | TimestampNTZType) =>
      l.longValue() // already micros — InternalRow's native encoding
    case (arr: java.util.Collection[_], ArrayType(elem, _)) =>
      new GenericArrayData(arr.asScala.map(x => convert(x, elem)).toArray)
    case (x, _) => x
  }

  override def close(): Unit = { reader.close() } // closes `in`
}
