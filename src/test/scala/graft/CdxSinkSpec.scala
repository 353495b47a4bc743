package graft

import graft.formats.CdxSink
import org.apache.spark.sql.functions._

/** Per-WARC `.cdx.gz` sink: name contract, per-file sortedness, and the
  * --skip-existing anti-join over the REAL written names. */
class CdxSinkSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_test/warc_cdx_sink"

  private def writeAll(): Unit =
    CdxSink.writePerWarc(
      Cdx.df(spark, sfDir).selectExpr("filename", "urlkey || ' ' || ts AS line"), dir)

  test("one <warc>.cdx.gz per input WARC, each internally sorted") {
    writeAll()
    val expectedNames = Cdx.df(spark, sfDir).select("filename").distinct()
      .as[String].collect().map(CdxSink.cdxName).toSet
    val written = new java.io.File(dir).list().toSet
    assert(written == expectedNames, s"missing=${expectedNames -- written} extra=${written -- expectedNames}")
    assert(written.forall(_.endsWith(".cdx.gz")))
    // spot-check one file is sorted and gzip-readable by the JDK
    val f = new java.io.File(dir, written.head)
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    assert(lines.nonEmpty && lines == lines.sorted)
  }

  test("skip-existing anti-join over the written names") {
    writeAll()
    val manifest = Cdx.df(spark, sfDir).select("filename").distinct()
      .withColumn("expected_cdx", udf((f: String) => CdxSink.cdxName(f)).apply(col("filename")))
    val existing = spark.createDataset(
      new java.io.File(dir).list().toSeq).toDF("expected_cdx")
    // everything written -> nothing left to do
    assert(manifest.join(existing, Seq("expected_cdx"), "left_anti").count() == 0)
    // drop one output: exactly that WARC becomes pending again
    val dropped = existing.limit(1).as[String].collect().head
    val remaining = existing.filter(col("expected_cdx") =!= dropped)
    val pending = manifest.join(remaining, Seq("expected_cdx"), "left_anti")
      .select("expected_cdx").as[String].collect().toSeq
    assert(pending == Seq(dropped))
  }
}
