package graft

import graft.ops.Layout
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order layout (ops/Layout.scala + the layout_zorder driver key):
  * bit-interleave parity with the reference JVM implementation, and the
  * actual SKIPPING claim — a predicate on the non-sort dimension prunes
  * row groups out of the z-clustered table that a single-dimension sort
  * layout must read in full. */
class LayoutSpec extends SparkSpec {

  test("zvalue column expression matches the reference bit-interleave") {
    import spark.implicits._
    val pairs = Seq.tabulate(512) { i =>
      // deterministic spread over the 16-bit domain incl. edges
      val a = (i * 12345 + 7) & 0xFFFF
      val b = (i * 54321 + 3) & 0xFFFF
      (a, b)
    } ++ Seq((0, 0), (0xFFFF, 0), (0, 0xFFFF), (0xFFFF, 0xFFFF))
    val df = pairs.toDF("a", "b")
      .withColumn("z", Layout.zvalue(col("a").cast("long"), col("b").cast("long")))
    df.collect().foreach { r =>
      val expected = Layout.zvalueRef(r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == expected,
        s"zvalue(${r.getInt(0)}, ${r.getInt(1)}) = ${r.getLong(2)}, want $expected")
    }
  }

  test("zvalue is monotone per dimension when the other is fixed") {
    // sorting by z with one dim fixed must preserve the other dim's order
    // (the property that makes single-dim range predicates prunable)
    val zs = (0 until 0x10000 by 257).map(a => Layout.zvalueRef(a, 12345))
    assert(zs == zs.sorted, "z not monotone in dim a at fixed b")
    val zs2 = (0 until 0x10000 by 257).map(b => Layout.zvalueRef(12345, b))
    assert(zs2 == zs2.sorted, "z not monotone in dim b at fixed a")
  }

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val s = scans(df.queryExecution.executedPlan)
    assert(s.nonEmpty, "expected a parquet scan")
    s.map(_.metrics("numOutputRows").value).sum
  }

  test("z-layout prunes row groups on the NON-sort dimension; a ts-sorted layout cannot") {
    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"))
    val b = ev.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
    val z = Layout.zvalue(
      Layout.norm16(col("user_id"), b.getLong(0), b.getLong(1)),
      Layout.norm16(col("ts_us"), b.getLong(2), b.getLong(3)))

    // 64 files: a z range-interval spans ~2^26 of the 2^32 z-space, so
    // each file's user min/max tightens to ~1/8 of the domain. At 16
    // files EVERY file is a quantile-boundary file whose user range
    // blurs across quarters (measured: only 12% skipped); real tables
    // have files >> partitions-per-dim, which 64-at-sf0.001 models.
    val zDir = java.nio.file.Files.createTempDirectory("zorder_layout").toString
    val tsDir = java.nio.file.Files.createTempDirectory("ts_layout").toString
    ev.withColumn("z", z).repartitionByRange(64, col("z"))
      .sortWithinPartitions("z").drop("z")
      .write.mode("overwrite").parquet(zDir)
    ev.repartitionByRange(64, col("ts_us")).sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(tsDir)

    // user-only box (the dimension the ts layout is NOT sorted on):
    // users 5-9 of 0-14 at sf0.001
    def box(dir: String) =
      spark.read.parquet(dir).filter(col("user_id").between(5L, 9L))
    val total = ev.count()
    val zRows = scanRows(box(zDir))
    val tsRows = scanRows(box(tsDir))
    // same answer from both layouts
    assert(box(zDir).count() == box(tsDir).count())
    // the ts-sorted layout reads everything (every file spans all users);
    // the z-layout's per-file user boxes let parquet stats skip row groups
    assert(tsRows == total,
      s"ts layout should scan all $total rows for a user-only filter, got $tsRows")
    assert(zRows < (total * 3) / 4,
      s"z layout should skip >=25% of rows for the user box, scanned $zRows of $total")
  }

  test("sink_compact_small_files: 64 fragments collapse to a handful of files, no exchange") {
    // run the driver key (it plants the 64-file fragmentation, compacts,
    // and returns the re-read), then audit the directories it left behind
    SparkEntry.queries("sink_compact_small_files")(spark, sfDir).collect()
    val sf = java.nio.file.Paths.get(sfDir).getFileName.toString
    def parquetFiles(p: String): Int =
      new java.io.File(s"/tmp/graft_fmt/$sf/$p").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles("frag_parquet") == 64, "the planted fragmentation")
    val out = parquetFiles("compact_parquet")
    assert(out <= 4, s"compaction must collapse 64 fragments to a few files, got $out")
    // the mechanism: with maxPartitionBytes at the target size, Spark's
    // own FilePartition bin-packing groups the fragments into read tasks
    // — partitions == output files, and the write plan carries NO
    // exchange (each task streams its bin; nothing shuffles)
    val packer = spark.newSession() // same isolation the key itself uses
    packer.conf.set("spark.sql.files.maxPartitionBytes", (256L << 20).toString)
    val packed = packer.read.parquet(s"/tmp/graft_fmt/$sf/frag_parquet")
    assert(packed.rdd.getNumPartitions <= 4,
      s"bin-packing expected <=4 read partitions, got ${packed.rdd.getNumPartitions}")
    val p = packed.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"compaction must not shuffle:\n$p")
  }

  test("norm16: a multi-year microsecond domain maps 0..65535 without Long wrap") {
    import spark.implicits._
    // 10 years of µs ≈ 3.2e14 — (c-lo)*65535 would exceed Long.MaxValue
    // and wrap negative under the old integer scaling
    val hi = 10L * 365 * 24 * 3600 * 1000000L
    val ns = Seq(0L, hi / 2, hi).toDF("c")
      .select(Layout.norm16(col("c"), 0L, hi).as("n"))
      .as[Long].collect().sorted
    assert(ns.head == 0L && ns.last == 65535L && ns(1) > 32000L && ns(1) < 33000L,
      s"wide domain garbled: ${ns.toSeq}")
  }
}
