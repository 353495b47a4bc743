package graft.sources

import java.io.ByteArrayOutputStream

import graft.formats.{Gzip, SerializableHadoopConf, ZipNum}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._

/** V2 write path for ZipNum clusters (SURVEY §4 custom-work item 3, the
  * "promote" form of [[graft.formats.ZipNum.write]]):
  *
  * `df.write.format("zipnum").option("shards", 8)
  *    .option("linesPerBlock", 3000).mode("overwrite").save(dir)`
  *
  * [[ZipNumWrite]] declares `RequiresDistributionAndOrdering` — an
  * ordered distribution on `line` with `shards` partitions — so CATALYST
  * plans the range exchange + per-partition sort; the writer never
  * repartitions by hand. Each task streams its sorted partition into one
  * `cdx-NNNNN.gz` of gzip-member blocks and returns its idx entries as
  * the commit message; the driver-side commit assembles `cluster.idx`
  * (entries only — ~1/linesPerBlock of the data, same contract as the
  * library writer). A failed job never publishes an idx, so readers
  * (which always start from cluster.idx) cannot observe partial output.
  */
final case class ZipNumCommit(entries: Seq[ZipNum.IdxEntry]) extends WriterCommitMessage

final class ZipNumWriteBuilder(
    dir: String, info: LogicalWriteInfo, sconf: SerializableHadoopConf)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val lineIdx = info.schema().fieldNames.indexOf("line")
    require(lineIdx >= 0,
      s"zipnum write needs a 'line' STRING column; got [${info.schema().fieldNames.mkString(", ")}]")
    val shards = Option(info.options.get("shards")).map(_.toInt).getOrElse(8)
    val linesPerBlock = Option(info.options.get("linesPerBlock")).map(_.toInt).getOrElse(3000)
    require(shards > 0 && linesPerBlock > 0, "shards and linesPerBlock must be positive")
    new ZipNumWrite(dir, lineIdx, shards, linesPerBlock, doTruncate, sconf)
  }
}

final class ZipNumWrite(
    dir: String, lineIdx: Int, shards: Int, linesPerBlock: Int,
    doTruncate: Boolean, sconf: SerializableHadoopConf)
  extends Write with RequiresDistributionAndOrdering {

  private def sortOrders: Array[SortOrder] =
    Array(Expressions.sort(Expressions.column("line"), SortDirection.ASCENDING))

  /** ordered distribution == range partitioning on the sort key: the
    * planner inserts the exchange (reservoir-sampling bounds) for us */
  override def requiredDistribution(): Distribution = Distributions.ordered(sortOrders)
  override def requiredOrdering(): Array[SortOrder] = sortOrders
  override def requiredNumPartitions(): Int = shards

  override def toBatch: BatchWrite = {
    val p = new Path(dir)
    val fs = p.getFileSystem(sconf.value)
    if (doTruncate && fs.exists(p)) fs.delete(p, true)
    require(!fs.exists(new Path(p, "cluster.idx")),
      s"zipnum cluster already exists at $dir — use mode(\"overwrite\")")
    fs.mkdirs(p)
    new ZipNumBatchWrite(dir, lineIdx, linesPerBlock, sconf)
  }
}

final class ZipNumBatchWrite(
    dir: String, lineIdx: Int, linesPerBlock: Int, sconf: SerializableHadoopConf)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ZipNumWriterFactory(dir, lineIdx, linesPerBlock, sconf)

  /** driver-side: assemble cluster.idx from the per-shard entries; shard
    * names are range-ordered, so (shard, seq) order == global key order */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.collect { case ZipNumCommit(es) => es }.flatten
    val sorted = entries.sortBy(e => (e.shard, e.seq))
    val lines = sorted.zipWithIndex.map { case (e, i) =>
      s"${e.firstKey}\t${e.shard}\t${e.offset}\t${e.length}\t$i"
    }
    val idxPath = new Path(dir, "cluster.idx")
    val out = idxPath.getFileSystem(sconf.value).create(idxPath, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class ZipNumWriterFactory(
    dir: String, lineIdx: Int, linesPerBlock: Int, sconf: SerializableHadoopConf)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ZipNumDataWriter(dir, partitionId, lineIdx, linesPerBlock, sconf)
}

/** One sorted shard per task: lines buffered into `linesPerBlock` groups,
  * each flushed as an independent gzip member with streaming offset
  * accounting — memory is O(block), never O(partition). */
final class ZipNumDataWriter(
    dir: String, pid: Int, lineIdx: Int, linesPerBlock: Int,
    sconf: SerializableHadoopConf)
  extends DataWriter[InternalRow] {

  private val shardName = f"cdx-$pid%05d.gz"
  private var out: org.apache.hadoop.fs.FSDataOutputStream = null
  private val pending = new scala.collection.mutable.ArrayBuffer[String](linesPerBlock)
  private val entries = Vector.newBuilder[ZipNum.IdxEntry]
  private var offset = 0L
  private var blockSeq = 0L

  private def flushBlock(): Unit = if (pending.nonEmpty) {
    if (out == null) {
      val p = new Path(dir, shardName)
      out = p.getFileSystem(sconf.value).create(p, true)
    }
    val payload = new ByteArrayOutputStream()
    pending.foreach { l => payload.write(l.getBytes("UTF-8")); payload.write('\n') }
    val compLen = Gzip.writeMember(out, payload.toByteArray)
    val firstKey = pending.head.split(" ", 3).take(2).mkString(" ")
    entries += ZipNum.IdxEntry(firstKey, shardName, offset, compLen, blockSeq)
    offset += compLen
    blockSeq += 1
    pending.clear()
  }

  override def write(row: InternalRow): Unit = {
    pending += row.getUTF8String(lineIdx).toString
    if (pending.size >= linesPerBlock) flushBlock()
  }

  override def commit(): WriterCommitMessage = {
    flushBlock()
    if (out != null) { out.close(); out = null }
    ZipNumCommit(entries.result())
  }

  override def abort(): Unit = close()
  override def close(): Unit = if (out != null) { out.close(); out = null }
}
