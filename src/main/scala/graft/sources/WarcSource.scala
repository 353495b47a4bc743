package graft.sources

import java.util

import graft.formats.{Gzip, SerializableHadoopConf, Warc}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for WARC files: `spark.read.format("warc").load(glob)`.
  * One input partition per WARC file (gzip members are not splittable
  * mid-file — SURVEY §2.1 scan_warc); the partition reader iterates
  * members and parses records, so executors stream records without
  * materializing whole files.
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Warc.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(properties.getOrDefault("path", ""))
}

final class WarcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"warc:$path"
  override def schema(): StructType = Warc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val p = Option(options.get("path")).filter(_.nonEmpty).getOrElse(path)
    // capture the session's Hadoop conf HERE (analysis time, session
    // thread), exactly like ZipNumSource: planInputPartitions can run on
    // AQE threads where getActiveSession is empty, and a bare
    // `new Configuration()` fallback silently drops every
    // spark.hadoop.* setting (S3 credentials, custom FS)
    val conf = new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    () => new WarcScan(p, conf)
  }
}

final class WarcScan(pathGlob: String, sconf0: SerializableHadoopConf)
  extends Scan with Batch {
  override def readSchema(): StructType = Warc.schema
  override def description(): String = s"WarcScan[$pathGlob]"
  override def toBatch: Batch = this

  private def sessionConf: Configuration = sconf0.value

  override def planInputPartitions(): Array[InputPartition] = {
    val path = new Path(pathGlob)
    val fs = path.getFileSystem(sessionConf)
    // a glob match may be a directory (load("/data/warcs") — the common
    // idiom every builtin file source supports): expand one level to its
    // archive files. The expansion skips hidden/metadata names (_SUCCESS,
    // .warc.open in-progress files) and non-.gz sidecars — one stray
    // README would otherwise fail the whole scan on bad gzip magic.
    // An EXPLICIT glob/file is taken verbatim (the user asked for it).
    def isArchive(name: String): Boolean =
      !name.startsWith("_") && !name.startsWith(".") && name.endsWith(".gz")
    // directories expand RECURSIVELY (crawls ship as
    // /crawl/seg-N/*.warc.gz — one-level listing silently returned zero
    // partitions for the standard layout); depth-capped so a filesystem
    // loop can't hang planning
    def expand(s: org.apache.hadoop.fs.FileStatus, depth: Int)
        : Seq[org.apache.hadoop.fs.FileStatus] =
      if (s.isFile) {
        if (isArchive(s.getPath.getName)) Seq(s) else Seq.empty
      } else if (depth >= 16) Seq.empty
      else fs.listStatus(s.getPath).toSeq
        .filterNot(c => c.getPath.getName.startsWith("_") ||
          c.getPath.getName.startsWith("."))
        .flatMap(c => expand(c, depth + 1))
    val statuses = Option(fs.globStatus(path))
      .map(_.toSeq).getOrElse(Seq.empty)
      .flatMap { s =>
        // an EXPLICIT glob/file match is taken verbatim (the user asked
        // for that exact file); directories expand to their archives
        if (s.isFile) Seq(s) else expand(s, 0)
      }
    statuses.map(s => WarcFilePartition(s.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val sconf = new SerializableHadoopConf(sessionConf)
    (partition: InputPartition) =>
      new WarcPartitionReader(partition.asInstanceOf[WarcFilePartition].file, sconf)
  }
}

final case class WarcFilePartition(file: String) extends InputPartition

final class WarcPartitionReader(file: String, sconf: SerializableHadoopConf)
  extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val in = path.getFileSystem(sconf.value).open(path)
  private val shortName = file.substring(file.lastIndexOf('/') + 1)
  // permissive like Warc.scan: damaged members surface as
  // record_type='corrupt' rows, not task failures
  private val entries = Gzip.entries(in, permissive = true)
  private var row: InternalRow = _
  // a (non-conforming but real) multi-record gzip member yields several
  // rows from one entry — buffer the member's remainder between next()s
  private val pending = new scala.collection.mutable.Queue[InternalRow]()

  override def next(): Boolean = {
    while (pending.isEmpty) {
      if (!entries.hasNext) return false
      entries.next() match {
        case m: Gzip.Member =>
          Warc.parseRows(m.bytes, m.offset, m.compressedLength, shortName).foreach { r =>
            pending.enqueue(new GenericInternalRow(Array[Any](
              utf8(r._1), utf8(r._2), utf8(r._3), utf8(r._4),
              r._5, utf8(r._6), m.offset, m.compressedLength,
              UTF8String.fromString(shortName), r._7)))
          }
        case s: Gzip.CorruptSpan =>
          pending.enqueue(new GenericInternalRow(Array[Any](
            utf8("corrupt"), null, null, null,
            null, null, s.offset, s.compressedLength,
            UTF8String.fromString(shortName), null)))
      }
    }
    row = pending.dequeue()
    true
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
