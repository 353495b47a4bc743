package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Tables.events]] must normalize `ts` to TIMESTAMP under BOTH testdata
  * generations: INT64 nanos (decoded as long under `nanosAsLong`) and plain
  * TIMESTAMP(µs). Round 6's bench lost all five §2.8 window queries because
  * the loader assumed the nanos encoding unconditionally and the driver
  * regenerated the parquet with µs timestamps mid-round — this spec pins
  * the type branch so a future regeneration in either direction stays green.
  */
class TablesSpec extends SparkSpec {

  private def writeEvents(dir: String, tsAsNanosLong: Boolean): Unit = {
    import spark.implicits._
    val base = Seq(
      (1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
      (2L, 1700000123456789L, 11L, "view", 2.5, "{}"))
    val df = base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        if (tsAsNanosLong) col("us") * 1000L else expr("timestamp_micros(us)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loader normalizes both long-nanos and timestamp encodings") {
    val nanosDir = Files.createTempDirectory("graft_events_nanos").toString
    val microsDir = Files.createTempDirectory("graft_events_micros").toString
    writeEvents(nanosDir, tsAsNanosLong = true)
    writeEvents(microsDir, tsAsNanosLong = false)

    val fromNanos = Tables.events(spark, nanosDir)
    val fromMicros = Tables.events(spark, microsDir)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromMicros.schema("ts").dataType == TimestampType)

    def tsMicros(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(tsMicros(fromNanos) == tsMicros(fromMicros))
    assert(tsMicros(fromMicros) ==
      Seq((1L, 1700000000000000L), (2L, 1700000123456789L)))
  }

  test("fanOut: single-file scan spreads to defaultParallelism, content unchanged") {
    val docs = Tables.t(spark, sfDir, "documents")
    val fanned = Tables.fanOut(docs, col("doc_id"))
    // the driver parquet is one file (< defaultParallelism), so the
    // fan-out must fire and yield exactly defaultParallelism partitions
    assert(docs.inputFiles.length < spark.sparkContext.defaultParallelism)
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // same multiset of rows — the fan-out is content-invariant
    assert(fanned.count() == docs.count())
    assert(fanned.exceptAll(docs).isEmpty && docs.exceptAll(fanned).isEmpty)
  }

  test("fanOut: identity when the scan already has enough input files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fanout_many").toString
    val n = spark.sparkContext.defaultParallelism
    (0L until 64L).toDF("id").repartition(n)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.inputFiles.length >= n, "fixture must have >= parallelism files")
    // eq: fanOut must return the SAME frame, not a repartitioned copy —
    // at 100 TB (thousands of splits) the helper is the identity
    assert(Tables.fanOut(df, col("id")) eq df)
  }

  test("every driver table loads with rows at sf0.001 (regeneration canary)") {
    // the driver regenerated the testdata mid-round-6 with a changed
    // events encoding; this canary makes the NEXT regeneration fail a
    // named test instead of surfacing as scattered query errors
    Tables.names.foreach { name =>
      val df = Tables.t(spark, sfDir, name)
      assert(df.columns.nonEmpty, s"$name: no columns")
      assert(df.limit(1).count() == 1, s"$name: no rows")
    }
  }

  test("events loader against the driver testdata yields a timestamp ts") {
    // pandas-written parquet carries isAdjustedToUTC=false, which Spark 4
    // decodes as TIMESTAMP_NTZ; with the session TZ pinned UTC the two
    // timestamp types are value-identical, and both satisfy the window /
    // session_window / watermark operators downstream.
    val df = Tables.events(spark, sfDir)
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(df.schema("ts").dataType))
    assert(df.limit(1).count() == 1)
  }
}
