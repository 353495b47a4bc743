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
final case class ZipNumCommit(pid: Int, entries: Seq[ZipNum.IdxEntry]) extends WriterCommitMessage

final class ZipNumWriteBuilder(
    dir: String, info: LogicalWriteInfo, sconf: SerializableHadoopConf)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val lineIdx = info.schema().fieldNames.indexOf("line")
    require(lineIdx >= 0,
      s"zipnum write needs a 'line' STRING column; got [${info.schema().fieldNames.mkString(", ")}]")
    require(info.schema()(lineIdx).dataType == org.apache.spark.sql.types.StringType,
      s"'line' must be STRING, got ${info.schema()(lineIdx).dataType.simpleString} — " +
        "failing here beats a per-task ClassCastException after the exchange has run")
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

  /** driver-side: assemble cluster.idx from the per-shard entries,
    * ordered by NUMERIC partition id (lexicographic shard-name order
    * diverges from it once names outgrow the %05d padding), which the
    * range exchange made equal to global key order */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val sorted = messages.collect { case c: ZipNumCommit => c }
      .sortBy(_.pid)
      .flatMap(c => c.entries.sortBy(_.seq))
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
    new ZipNumDataWriter(dir, partitionId, taskId, lineIdx, linesPerBlock, sconf)
}

/** One sorted shard per task: lines buffered into `linesPerBlock` groups,
  * each flushed as an independent gzip member with streaming offset
  * accounting — memory is O(block), never O(partition).
  *
  * Attempt isolation: bytes stream into a temp file keyed by `taskId`
  * and are renamed to the final shard name only in [[commit]] — a
  * speculative or zombie attempt writing the final path directly would
  * truncate/interleave the winner's bytes mid-stream. The rename is
  * atomic per attempt, the content is deterministic (the partition is
  * sorted), and Spark delivers exactly one attempt's commit message to
  * BatchWrite.commit. */
final class ZipNumDataWriter(
    dir: String, pid: Int, taskId: Long, lineIdx: Int, linesPerBlock: Int,
    sconf: SerializableHadoopConf)
  extends DataWriter[InternalRow] {

  private val shardName = f"cdx-$pid%05d.gz"
  private val tempName = f".cdx-$pid%05d.gz.attempt-$taskId"
  private var out: org.apache.hadoop.fs.FSDataOutputStream = null
  private val pending = new scala.collection.mutable.ArrayBuffer[String](linesPerBlock)
  private val entries = Vector.newBuilder[ZipNum.IdxEntry]
  private var offset = 0L
  private var blockSeq = 0L

  private def fs = new Path(dir).getFileSystem(sconf.value)

  private def flushBlock(): Unit = if (pending.nonEmpty) {
    if (out == null) {
      out = fs.create(new Path(dir, tempName), true)
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
    val wrote = out != null
    if (wrote) { out.close(); out = null }
    if (wrote) {
      val from = new Path(dir, tempName)
      val to = new Path(dir, shardName)
      if (fs.exists(to)) fs.delete(to, false) // losing attempt's rename target
      fs.rename(from, to)
    }
    ZipNumCommit(pid, entries.result())
  }

  override def abort(): Unit = {
    close()
    try fs.delete(new Path(dir, tempName), false)
    catch { case _: java.io.IOException => }
  }
  override def close(): Unit = if (out != null) { out.close(); out = null }
}
