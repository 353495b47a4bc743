package graft.formats

import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-WARC CDX sink: one sorted `<warcbase>.cdx.gz` per input WARC file,
  * the reference's job-1 upload layout (indexwarcsjob.py §upload recon
  * ~L120–150: output key = WARC name with `.warc.gz` -> `.cdx.gz`). This
  * name contract is what makes `--skip-existing` interoperate with
  * existing pywb-written index layouts (anti-join manifest vs the names
  * already present, see `join_skip_existing`).
  *
  * Scale notes: parallelism is per WARC (repartition on filename — the
  * same unit of work as the WARC scan itself); each task streams its
  * sorted group through one GZIPOutputStream, so memory is O(1) per file
  * and skew is bounded by the largest single WARC's index (tiny — CDX is
  * ~1/1000 of the WARC bytes).
  */
object CdxSink {

  /** `crawl/seg-3/warc-17.warc.gz` -> `warc-17.cdx.gz` */
  def cdxName(warcPath: String): String = {
    val base = warcPath.substring(warcPath.lastIndexOf('/') + 1)
    (if (base.endsWith(".warc.gz")) base.dropRight(8)
     else if (base.endsWith(".arc.gz")) base.dropRight(7)
     else base) + ".cdx.gz"
  }

  /** Write one sorted gz of `line`s per distinct `filename` under `dir`. */
  def writePerWarc(df: DataFrame, dir: String): Unit = {
    require(df.columns.contains("filename") && df.columns.contains("line"),
      s"CdxSink.writePerWarc needs filename+line columns; got [${df.columns.mkString(", ")}]")
    val spark = df.sparkSession
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    df.select(col("filename"), col("line"))
      .repartition(col("filename"))
      .sortWithinPartitions("filename", "line")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        // newInstance, NOT getFileSystem: the cached instance is shared
        // JVM-wide, and setWriteChecksum(false) on it would silently
        // disable .crc integrity files for every other writer in the
        // executor. This private instance only affects this sink (which
        // must emit exactly the <warc>.cdx.gz names a pywb layout expects,
        // no sidecars) and is closed when the partition finishes.
        val pfs = org.apache.hadoop.fs.FileSystem.newInstance(
          new Path(dir).toUri, sconf.value)
        pfs.setWriteChecksum(false)
        // attempt isolation (the ZipNumWrite discipline): write to an
        // attempt-keyed temp name, rename into place on roll — a
        // speculative or zombie attempt racing its retry on the FINAL
        // name would truncate the winner's gzip mid-write (local/NFS) or
        // fail on a lease conflict (HDFS). Publish prefers FileContext's
        // overwrite-capable rename (atomic where the FS supports it), so
        // whichever attempt renames last leaves a complete file.
        val fctx: Option[org.apache.hadoop.fs.FileContext] =
          try Some(org.apache.hadoop.fs.FileContext.getFileContext(
            new Path(dir).toUri, sconf.value))
          catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None }
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(tc => s"${tc.partitionId()}-${tc.taskAttemptId()}")
          .getOrElse(java.util.UUID.randomUUID().toString)
        // filenames are grouped by the sort; roll files on change
        var current: String = null
        var out: GZIPOutputStream = null
        def close(): Unit = if (out != null) {
          out.finish(); out.close(); out = null
          val tmp = new Path(dir, s".${cdxName(current)}.$attempt.tmp")
          val fin = new Path(dir, cdxName(current))
          fctx match {
            case Some(fc) =>
              // single-call overwrite rename. Truly atomic where the
              // AbstractFileSystem overrides 3-arg renameInternal (HDFS
              // does); LocalFs/ChecksumFs fall back to delete-then-rename
              // INSIDE this call, so a small absent-final-name window
              // still exists there — a later retry attempt republishes
              // from its own .tmp, which is the recovery story either way
              fc.rename(tmp, fin, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            case None =>
              // FS without an AbstractFileSystem binding: FileSystem.rename
              // signals failure by RETURNING false (dest exists on some
              // filesystems) — replace explicitly. NOT atomic: a task
              // killed between the delete and the rename leaves no final
              // file for this WARC until a retry attempt republishes it
              // (the .tmp survives; only the final name has a gap).
              if (!pfs.rename(tmp, fin)) {
                pfs.delete(fin, false)
                require(pfs.rename(tmp, fin),
                  s"could not publish ${fin.getName} from ${tmp.getName}")
              }
          }
        }
        try {
          it.foreach { row =>
            val warc = row.getString(0)
            if (warc != current) {
              close()
              current = warc
              out = new GZIPOutputStream(
                pfs.create(new Path(dir, s".${cdxName(warc)}.$attempt.tmp"), true))
            }
            out.write(row.getString(1).getBytes("UTF-8"))
            out.write('\n')
          }
          close()
        } finally {
          // an abandoned attempt leaves only its hidden .tmp (readers'
          // underscore/dot filters skip it); never a truncated final file
          if (out != null) { try { out.close() } catch { case _: java.io.IOException => } }
          try pfs.close() catch { case _: java.io.IOException => }
        }
      }
  }
}
