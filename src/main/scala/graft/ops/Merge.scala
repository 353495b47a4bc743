package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert) into a partitioned parquet table — the
  * incremental table-maintenance primitive behind Delta/Iceberg MERGE
  * INTO and Hive dynamic-partition INSERT OVERWRITE (north-star
  * extension; the reference's analog is the skip-existing re-crawl
  * loop, recon `indexwarcsjob.py §skip_existing`).
  *
  * Scale shape: a batch touches a bounded set of partitions (days), so
  * the merge must never read or rewrite the rest of a 100 TB table.
  * Three legs enforce that:
  *  1. the affected-partition list comes off the BATCH (distinct over
  *     its partition column — a calendar-bounded driver artifact, like
  *     the ZipNum idx), and becomes a STATIC `isin` partition filter on
  *     the base read: untouched partitions are pruned at planning, not
  *     scanned-and-dropped;
  *  2. deleted-or-updated keys leave via a LEFT ANTI join against the
  *     batch's key column (batch-sized build side — broadcasts);
  *  3. the write uses dynamic partitionOverwriteMode, which replaces
  *     ONLY the partitions present in the output; every other
  *     partition's files are untouched bytes (MergeSpec pins the file
  *     listing).
  *
  * Commit protocol (the ZipNum.write discipline): the merged output is
  * written ONCE into a hidden dot-prefixed staging dir under the base
  * (invisible to parquet readers), validated (_SUCCESS + one staged dir
  * per affected day), then swapped in with per-partition backup →
  * rename → drop-backup. The base table is untouched bytes until the
  * first rename, so a crash anywhere in stage or validate leaves the
  * table exactly as it was (MergeSpec pins this window). The only
  * non-atomic residue is per-partition: a crash mid-swap can leave one
  * day at its backup name — restored on rename failure, and strictly
  * smaller exposure than the previous localCheckpoint stand-in, which
  * also paid a second full materialization of the survivors.
  */
object Merge {

  /** the partition-pruned survivors relation: affected partitions of the
    * base minus rows whose key the batch replaces. Exposed so MergeSpec
    * can pin that its scan lists exactly |affected| partitions. */
  def survivors(
      spark: SparkSession, baseDir: String, batch: DataFrame,
      keyCol: String, partCol: String, days: Seq[Any]): DataFrame =
    spark.read.parquet(baseDir)
      .filter(col(partCol).isin(days: _*))
      .join(batch.select(keyCol), Seq(keyCol), "left_anti")

  /** MERGE `batch` (updates + inserts, keyed by `keyCol`, partitioned by
    * `partCol`) into the parquet table at `baseDir` in place. Returns the
    * partition values that were rewritten.
    *
    * PRECONDITION — key-partition stability: a key's `partCol` value must
    * never change between the base table and the batch. The anti-join
    * reads only the batch's own partitions, so a batch row whose
    * partition differs from the key's existing base partition would leave
    * the old copy untouched and duplicate the key after the merge. This
    * is the standard partitioned-upsert contract (partition key derives
    * from the merge key, e.g. day-of-event); it is NOT a Delta-style
    * global-key MERGE. MergeSpec pins the contract with a
    * moved-partition counter-example. */
  def upsertPartitioned(
      spark: SparkSession, baseDir: String, batch: DataFrame,
      keyCol: String, partCol: String): Seq[Any] = {
    // limit BEFORE collect (the Corpus.packSequences discipline): the
    // guard exists to catch a key-like column passed as partCol, and that
    // misuse must fail loudly — not OOM the driver materializing millions
    // of distinct values first. 2000 ≈ five years of daily partitions:
    // far above any real batch (which touches days, not years) but low
    // enough to actually fire on the mistake that silently turns the
    // merge into a full-table rewrite.
    val cap = 2000
    val days = batch.select(partCol).distinct().limit(cap + 1)
      .collect().map(_.get(0)).toSeq
    require(days.size <= cap,
      s"batch touches ${if (days.size > cap) ">" + cap else days.size} partitions — " +
        "not a partition-bounded merge")
    // a NULL partition value would silently DELETE base rows: isin(days)
    // never matches null, so null-partition survivors are not read, yet
    // dynamic overwrite still replaces that partition with batch-only
    // rows. A null partition key is a data defect for a partitioned
    // merge — reject it loudly instead.
    require(!days.contains(null),
      s"batch carries a NULL $partCol — null partitions cannot merge " +
        "(survivors of the default partition would be silently dropped)")
    recoverDebris(spark, baseDir)
    val staging = stage(spark, baseDir, batch, keyCol, partCol, days)
    commit(spark, baseDir, staging, days.size)
    days
  }

  /** Crash-debris recovery, run before every merge (single-writer table,
    * the same assumption the whole COW protocol makes):
    *  - orphaned `.merge_staging_*` dirs from a run that died between
    *    stage and commit are deleted — without this every crash leaves an
    *    invisible full copy of its affected partitions under the base
    *    forever;
    *  - an orphaned `.<part>.replaced` backup whose final name is MISSING
    *    marks a crash mid-swap where the backup is the only copy — it is
    *    restored; one whose final name exists is stale (the swap
    *    completed) and is deleted. */
  private[graft] def recoverDebris(spark: SparkSession, baseDir: String): Unit = {
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(basePath)) return
    fs.listStatus(basePath).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && nm.startsWith(".merge_staging_"))
        fs.delete(st.getPath, true)
      else if (st.isDirectory && nm.startsWith(".") && nm.endsWith(".replaced")) {
        val fin = new org.apache.hadoop.fs.Path(
          basePath, nm.stripPrefix(".").stripSuffix(".replaced"))
        if (!fs.exists(fin))
          require(fs.rename(st.getPath, fin),
            s"could not restore crashed-swap backup ${st.getPath} to $fin")
        else fs.delete(st.getPath, true)
      }
    }
  }

  /** Leg A — write the merged partitions ONCE into a hidden staging dir
    * under the base (dot-prefixed, so readers of the base never list it).
    * Returns the staging path. The base table's bytes are untouched. */
  private[graft] def stage(
      spark: SparkSession, baseDir: String, batch: DataFrame,
      keyCol: String, partCol: String, days: Seq[Any]): org.apache.hadoop.fs.Path = {
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val staging = new org.apache.hadoop.fs.Path(
      basePath, s".merge_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    // repartition on the partition column before the write: each task
    // owns whole partitions, so a rewritten day is ONE file instead of
    // (tasks × days) small files — the small-file problem is the other
    // half of why table formats exist. This is the ONLY materialization
    // of the survivors: the read-base/write-staging plan has no
    // read-write cycle, so no localCheckpoint is needed.
    try {
      survivors(spark, baseDir, batch, keyCol, partCol, days)
        .unionByName(batch)
        .repartition(col(partCol))
        .write.partitionBy(partCol).parquet(staging.toString)
    } catch {
      case e: Throwable =>
        // a failed staging job must not leave hidden debris under the base
        try basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(staging, true)
        catch { case _: java.io.IOException => }
        throw e
    }
    staging
  }

  /** Leg B — validate the staging dir, then swap each staged day into the
    * base via backup → rename → drop-backup (ZipNum.write discipline).
    * Refuses to touch the base if the staging job left no _SUCCESS or a
    * wrong partition count. Partition dir names are taken from the
    * staging LISTING, not re-derived, so value escaping can never
    * mismatch the base layout. */
  private[graft] def commit(
      spark: SparkSession, baseDir: String,
      staging: org.apache.hadoop.fs.Path, nDays: Int): Unit = {
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      require(fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")),
        s"staging at $staging carries no _SUCCESS — refusing to commit an incomplete merge")
      val stagedParts = fs.listStatus(staging)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(_.getPath)
      require(stagedParts.length == nDays,
        s"staging holds ${stagedParts.length} partition dirs, expected $nDays — " +
          "refusing to commit a partial merge")
      stagedParts.foreach { sp =>
        val fin = new org.apache.hadoop.fs.Path(basePath, sp.getName)
        val backup = new org.apache.hadoop.fs.Path(basePath, s".${sp.getName}.replaced")
        val had = fs.exists(fin)
        if (had) {
          fs.delete(backup, true)
          require(fs.rename(fin, backup), s"could not back up $fin before swap")
        }
        if (!fs.rename(sp, fin)) {
          // the restore must be CHECKED: if it also fails, the partition
          // data sits only at the hidden backup name and the operator
          // must know — a silent false here would read as a deleted day
          val restored = !had || fs.rename(backup, fin)
          throw new IllegalStateException(
            s"rename $sp -> $fin failed" + (if (restored)
              " (previous partition contents restored)"
            else s"; RESTORE ALSO FAILED — the partition's data sits at " +
              s"$backup; rename it back to ${fin.getName} manually"))
        }
        if (had) fs.delete(backup, true)
      }
    } finally {
      fs.delete(staging, true)
    }
  }
}
