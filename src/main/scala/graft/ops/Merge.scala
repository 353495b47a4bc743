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
  * The localCheckpoint before the write is the local-mode stand-in for
  * a staging-dir commit: Spark (correctly) refuses a plan that reads
  * the same files its write is replacing, so the affected partitions'
  * survivors — batch-scale data by leg 1 — materialize first. A
  * production deployment swaps this for the table format's
  * staging/commit protocol; nothing else changes.
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
    * partition values that were rewritten. */
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
    // repartition on the partition column before the write: each task
    // owns whole partitions, so a rewritten day is ONE file instead of
    // (tasks × days) small files — the small-file problem is the other
    // half of why table formats exist
    val staged = survivors(spark, baseDir, batch, keyCol, partCol, days)
      .unionByName(batch)
      .repartition(col(partCol))
      .localCheckpoint()
    staged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(baseDir)
    days
  }
}
