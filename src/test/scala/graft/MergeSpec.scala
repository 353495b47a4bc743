package graft

import java.nio.file.{Files, Path}

import graft.ops.Merge
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Copy-on-write MERGE (ops/Merge.scala + the sink_merge_upsert driver
  * key): the partition-bounded contract — untouched partitions keep
  * byte-identical files, the survivors read prunes to exactly the
  * affected partitions, and the merged content equals a full
  * recompute. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def listing(dir: Path): Map[String, Seq[(String, Long)]] =
    Files.list(dir).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("p_day="))
      .map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => f.getFileName.toString -> Files.size(f))
            .toSeq.sortBy(_._1)
      }.toMap

  test("merge rewrites ONLY the batch's partitions; content equals a full recompute") {
    val dir = Files.createTempDirectory("merge_cow")
    val base = Seq(
      (1L, 10, "a", 1.0), (2L, 10, "b", 2.0), (3L, 11, "c", 3.0),
      (4L, 11, "d", 4.0), (5L, 12, "e", 5.0), (6L, 13, "f", 6.0))
      .toDF("k", "p_day", "tag", "v")
    base.write.mode("overwrite").partitionBy("p_day").parquet(dir.toString)
    val before = listing(dir)
    assert(before.keySet == Set("p_day=10", "p_day=11", "p_day=12", "p_day=13"))

    // batch: update k=3 (day 11), delete-by-replace k=4 (day 11), insert
    // k=99 (day 10) — days 12 and 13 must not be touched
    val batch = Seq(
      (3L, 11, "c2", 30.0), (4L, 11, "d2", 40.0), (99L, 10, "new", 9.0))
      .toDF("k", "p_day", "tag", "v")
    val days = Merge.upsertPartitioned(spark, dir.toString, batch, "k", "p_day")
    assert(days.toSet == Set(10, 11))

    val after = listing(dir)
    // untouched partitions: identical file names AND sizes
    Seq("p_day=12", "p_day=13").foreach { p =>
      assert(after(p) == before(p), s"$p must be byte-untouched: ${before(p)} -> ${after(p)}")
    }
    // touched partitions really were rewritten (fresh file names)
    Seq("p_day=10", "p_day=11").foreach { p =>
      assert(after(p).map(_._1) != before(p).map(_._1), s"$p should have new files")
    }

    // merged content == declarative recompute over the original base
    val merged = spark.read.parquet(dir.toString)
      .select("k", "p_day", "tag", "v").sort("k")
    val recompute = base.join(batch.select("k"), Seq("k"), "left_anti")
      .unionByName(batch).sort("k")
    assert(merged.collect().toSeq == recompute.collect().toSeq)
  }

  test("survivors read prunes to exactly the affected partitions") {
    val dir = Files.createTempDirectory("merge_prune")
    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"),
      date_format(col("ts"), "yyyyMMdd").cast("int").as("p_day"))
    ev.write.mode("overwrite").partitionBy("p_day").parquet(dir.toString)
    val nDays = ev.select("p_day").distinct().count()
    assert(nDays > 10, s"fixture needs many day partitions, got $nDays")

    val batch = ev.filter(col("p_day").between(20240105, 20240107))
      .filter(col("event_id") % 11 === 0)
    val days = batch.select("p_day").distinct().collect().map(_.get(0)).toSeq
    val surv = Merge.survivors(spark, dir.toString, batch, "event_id", "p_day", days)
    surv.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val baseScan = scans(surv.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(baseScan.nonEmpty, "survivors must scan the base with a partition filter")
    val nParts = baseScan.head.selectedPartitions.partitionCount
    assert(nParts == days.size,
      s"survivors scan must list exactly ${days.size} partitions, listed $nParts")
  }

  test("crash between stage and commit leaves the base table byte-intact") {
    val dir = Files.createTempDirectory("merge_crash")
    val base = Seq((1L, 10, "a", 1.0), (2L, 11, "b", 2.0), (3L, 12, "c", 3.0))
      .toDF("k", "p_day", "tag", "v")
    base.write.mode("overwrite").partitionBy("p_day").parquet(dir.toString)
    val before = listing(dir)
    val batch = Seq((1L, 10, "a2", 10.0), (9L, 11, "new", 9.0))
      .toDF("k", "p_day", "tag", "v")
    val days = Seq(10, 11)
    // stage only — the simulated crash point: the merged output exists
    // (hidden) but no commit rename has run
    val staging = Merge.stage(spark, dir.toString, batch, "k", "p_day", days)
    assert(listing(dir) == before, "base partition files must be untouched after stage")
    // readers of the base must not see the staged (dot-prefixed) dir
    val readBack = spark.read.parquet(dir.toString).select("k", "p_day", "tag", "v").sort("k")
    assert(readBack.collect().toSeq == base.sort("k").collect().toSeq)
    // resuming the commit completes the merge
    Merge.commit(spark, dir.toString, staging, days.size)
    val merged = spark.read.parquet(dir.toString).select("k").as[Long].collect().toSet
    assert(merged == Set(1L, 2L, 3L, 9L))
    // staging debris is gone after commit
    assert(!Files.list(dir).iterator().asScala
      .exists(_.getFileName.toString.startsWith(".merge_staging_")))
  }

  test("recoverDebris: orphaned staging dropped, crashed-swap backup restored, stale backup dropped") {
    val dir = Files.createTempDirectory("merge_debris")
    Seq((1L, 10, "a", 1.0), (2L, 11, "b", 2.0))
      .toDF("k", "p_day", "tag", "v")
      .write.mode("overwrite").partitionBy("p_day").parquet(dir.toString)
    // orphaned staging dir from a run that died between stage and commit
    val batch = Seq((1L, 10, "a2", 10.0)).toDF("k", "p_day", "tag", "v")
    Merge.stage(spark, dir.toString, batch, "k", "p_day", Seq(10))
    // crashed swap: p_day=11 moved to its backup name, final missing
    Files.move(dir.resolve("p_day=11"), dir.resolve(".p_day=11.replaced"))
    // stale backup: p_day=10 exists AND a leftover backup copy of it
    Files.createDirectory(dir.resolve(".p_day=10.replaced"))
    Merge.recoverDebris(spark, dir.toString)
    val names = Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSet
    assert(!names.exists(_.startsWith(".merge_staging_")), s"staging debris survives: $names")
    assert(!names.contains(".p_day=11.replaced") && names.contains("p_day=11"),
      s"crashed-swap backup must be restored: $names")
    assert(!names.contains(".p_day=10.replaced"), s"stale backup must be dropped: $names")
    // the recovered table reads back complete
    val ks = spark.read.parquet(dir.toString).select("k").as[Long].collect().toSet
    assert(ks == Set(1L, 2L))
    // and a subsequent full merge over the recovered table works
    Merge.upsertPartitioned(spark, dir.toString, batch, "k", "p_day")
    assert(spark.read.parquet(dir.toString).filter(col("tag") === "a2").count() == 1L)
  }

  test("commit refuses an incomplete staging dir and leaves the base intact") {
    val dir = Files.createTempDirectory("merge_refuse")
    val base = Seq((1L, 10, "a", 1.0), (2L, 11, "b", 2.0))
      .toDF("k", "p_day", "tag", "v")
    base.write.mode("overwrite").partitionBy("p_day").parquet(dir.toString)
    val before = listing(dir)
    val batch = Seq((1L, 10, "a2", 10.0)).toDF("k", "p_day", "tag", "v")
    val staging = Merge.stage(spark, dir.toString, batch, "k", "p_day", Seq(10))
    // simulate a staging job that died before its commit marker
    Files.delete(dir.resolve(staging.getName).resolve("_SUCCESS"))
    val e = intercept[IllegalArgumentException] {
      Merge.commit(spark, dir.toString, staging, 1)
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
    assert(listing(dir) == before, "refused commit must not touch the base")
  }

  test("precondition: a key that MOVES partitions duplicates (documented non-contract)") {
    // the scaladoc's key-partition-stability precondition, pinned as a
    // counter-example so the behavior is explicit: k=1 lives in day 10,
    // the batch re-sends it under day 11 — the day-10 copy survives
    // (its partition is never read) and the key is now duplicated.
    // Callers needing global-key MERGE must keep partCol derived from
    // the key.
    val dir = Files.createTempDirectory("merge_moved")
    Seq((1L, 10, "a", 1.0), (2L, 11, "b", 2.0))
      .toDF("k", "p_day", "tag", "v")
      .write.mode("overwrite").partitionBy("p_day").parquet(dir.toString)
    val batch = Seq((1L, 11, "moved", 5.0)).toDF("k", "p_day", "tag", "v")
    Merge.upsertPartitioned(spark, dir.toString, batch, "k", "p_day")
    val k1 = spark.read.parquet(dir.toString).filter(col("k") === 1L).count()
    assert(k1 == 2L, "moved-partition key duplicates — the documented precondition violation")
  }

  test("upsertPartitioned rejects a NULL partition value loudly") {
    // isin(null, ...) never matches base null-partition rows, so a null
    // in the batch would silently DELETE every default-partition survivor
    // under dynamic overwrite — the merge must refuse instead
    val dir = Files.createTempDirectory("merge_null")
    Seq((1L, 10, "a", 1.0)).toDF("k", "p_day", "tag", "v")
      .write.mode("overwrite").partitionBy("p_day").parquet(dir.toString)
    val batch = Seq((2L, Option(10), "b", 2.0), (3L, Option.empty[Int], "c", 3.0))
      .toDF("k", "p_day", "tag", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.upsertPartitioned(spark, dir.toString, batch, "k", "p_day")
    }
    assert(e.getMessage.contains("NULL p_day"), e.getMessage)
  }
}
