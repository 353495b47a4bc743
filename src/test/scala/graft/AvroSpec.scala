package graft

import java.nio.file.{Files, Paths}

import graft.formats.Avro
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** formats/Avro + sources/AvroSource: the engine's own Avro container
  * interchange (no spark-avro connector ships in this distribution;
  * everything here rides the public plain-Avro API in avro-1.12.1).
  */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/tmp/graft_test/avro"

  test("split reads: no dup, no loss at any maxSplitBytes") {
    val dir = s"$base/split"
    Files.createDirectories(Paths.get(base))
    // one partition → ONE file with many sync blocks (syncInterval 1KB),
    // so byte-range splits land mid-file and the sync contract is what
    // keeps the read exact
    val df = spark.range(0, 5000).select(
      col("id"), concat(lit("doc-"), col("id")).as("tag"))
    Avro.write(df.coalesce(1), dir, syncInterval = 1024)
    val expected = (0L until 5000L).map(i => (i, s"doc-$i"))
    for (split <- Seq(700L, 4096L, 100L * 1024 * 1024)) {
      val got = spark.read.format("gavro")
        .schema("id LONG, tag STRING")
        .option("maxSplitBytes", split.toString).load(dir)
        .as[(Long, String)].collect().sorted.toSeq
      assert(got == expected, s"split=$split")
    }
    // the tiny split sizes really do fan out into many partitions
    val n = spark.read.format("gavro").schema("id LONG, tag STRING")
      .option("maxSplitBytes", "700").load(dir).rdd.getNumPartitions
    assert(n > 5, s"expected multi-split read, got $n partition(s)")
  }

  test("nulls, arrays, binary and timestamp-micros round trip exactly") {
    val dir = s"$base/types"
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("raw", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "a", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-02T03:04:05.123456Z")),
        Seq(1.5f, -2.25f), Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null),
      Row(3L, "", java.sql.Timestamp.from(java.time.Instant.EPOCH),
        Seq.empty[Float], Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    Avro.write(df, dir)
    val back = spark.read.format("gavro").schema(schema).load(dir)
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getAs[String]("s") == "a")
    assert(back(0).getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.parse("2024-01-02T03:04:05.123456Z"))
    assert(back(0).getAs[scala.collection.Seq[Float]]("vec").toSeq == Seq(1.5f, -2.25f))
    assert(back(0).getAs[Array[Byte]]("raw").toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) &&
      back(1).isNullAt(3) && back(1).isNullAt(4))
    assert(back(2).getAs[scala.collection.Seq[Float]]("vec").isEmpty)
    assert(back(2).getAs[Array[Byte]]("raw").isEmpty)
  }

  test("schema inference reads the container header") {
    val dir = s"$base/types" // written by the previous test's fixture
    val st = spark.read.format("gavro").load(dir).schema
    assert(st.fieldNames.toSeq == Seq("id", "s", "ts", "vec", "raw"))
    assert(st("ts").dataType == TimestampType)
    assert(st("vec").dataType == ArrayType(FloatType, containsNull = false))
    // the sink's nullability survives the header round trip
    assert(!st("id").nullable && st("s").nullable)
  }

  test("column pruning reaches the gavro scan; missing fields read null") {
    val dir = s"$base/split"
    val q = spark.read.format("gavro").schema("id LONG, tag STRING")
      .load(dir).select("tag").filter(col("tag") === "doc-7")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    // the pruned read schema carries ONLY the projected column
    assert(scans.head.scan.description().contains("ReadSchema: struct<tag:string>"),
      scans.head.scan.description())
    assert(q.count() == 1)
    // schema-evolution read: a declared column absent from the file
    // surfaces as null, by-name resolution (not positional)
    val ev = spark.read.format("gavro")
      .schema("tag STRING, added INT, id LONG").load(dir)
      .filter(col("id") === 3).collect()
    assert(ev.head.getAs[String]("tag") == "doc-3" && ev.head.isNullAt(1))
  }

  test("nested partitioned layouts list recursively") {
    val dir = s"$base/nested"
    val sub = s"$dir/date=2024-01-01"
    Avro.write(spark.range(0, 10).toDF("id").coalesce(1), sub)
    // a second leaf one level deeper
    Avro.write(spark.range(10, 15).toDF("id").coalesce(1),
      s"$dir/date=2024-01-02/hour=03")
    val got = spark.read.format("gavro").schema("id LONG").load(dir)
      .as[Long].collect().sorted.toSeq
    assert(got == (0L until 15L).toSeq)
  }

  test("an empty write is still readable (header-only container)") {
    val dir = s"$base/empty"
    Avro.write(spark.range(10).toDF("id").filter(col("id") < 0), dir)
    val back = spark.read.format("gavro").load(dir) // schema inference
    assert(back.schema.fieldNames.toSeq == Seq("id"))
    assert(back.count() == 0)
  }

  test("declared-schema field names resolve case-insensitively like Spark") {
    val dir = s"$base/casing"
    Avro.write(spark.range(3).select(col("id").as("Tag")).coalesce(1), dir)
    val got = spark.read.format("gavro").schema("tag LONG").load(dir)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 1L, 2L), "case-insensitive by-name resolution")
  }

  test("a corrupt container fails loudly, not silently empty") {
    val dir = s"$base/corrupt"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/bad.avro"), Array.fill[Byte](64)(7))
    val e = intercept[Exception] {
      spark.read.format("gavro").schema("id LONG").load(dir).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.toString +: chain(t.getCause)
    assert(chain(e).exists(_.toLowerCase.contains("not a")) ||
      chain(e).exists(_.toLowerCase.contains("avro")), chain(e).mkString(" | "))
  }

  test("unsupported write type fails loudly") {
    val df = spark.range(1).select(struct(col("id")).as("nested"))
    val e = intercept[Exception] { Avro.write(df, s"$base/bad") }
    assert(e.getMessage.contains("unsupported Spark type"))
  }
}
