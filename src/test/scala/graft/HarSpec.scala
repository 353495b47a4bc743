package graft

import org.apache.spark.sql.functions._

import graft.formats.Har

/** HAR writer/parser pair (formats/Har.scala) — goldens for the
  * escaping, base64, and multi-shard contracts; the full-corpus round
  * trips live behind the scan_har / pipeline_har2warc driver oracles. */
class HarSpec extends SparkSpec {
  import spark.implicits._

  private def captures(rows: Seq[(String, String, String, Int, String, Array[Byte], Boolean)]) =
    rows.toDF("shard", "url", "ts", "status", "mime", "payload", "b64")
      .withColumn("method", lit("GET"))

  test("round trip: JSON escaping, base64 arm, multi-shard grouping, entry order") {
    val dir = java.nio.file.Files.createTempDirectory("har_rt").toString
    val hostile = "he said \"hi\"\\ then\n\ttabbed and 日本語"
    val bin = Array[Byte](0, 1, -1, 127, -128, 10, 13, 34)
    val in = captures(Seq(
      ("s1", "http://a.org/2", "20260101000002", 200, "text/html",
        hostile.getBytes("UTF-8"), false),
      ("s1", "http://a.org/1", "20260101000001", 404, "text/plain",
        "plain".getBytes("UTF-8"), false),
      ("s2", "http://b.org/x", "20260101000003", 200, "application/octet-stream",
        bin, true)))
    Har.write(in, dir)
    // two session files, named by shard
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("s1.har", "s2.har"), files.mkString(", "))
    val back = Har.scan(spark, dir + "/*.har")
      .select("url", "ts", "status", "mime", "payload").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getAs[Array[Byte]](4).toSeq)).sortBy(_._1)
    assert(back.length == 3)
    assert(back(0) == (("http://a.org/1", "20260101000001", 404, "text/plain",
      "plain".getBytes("UTF-8").toSeq)))
    assert(back(1)._5 == hostile.getBytes("UTF-8").toSeq,
      "hostile text must survive JSON escaping byte-exactly")
    assert(back(2)._5 == bin.toSeq, "binary payload must survive the base64 arm")
    // url-sorted entries inside a file (deterministic output)
    val s1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "s1.har")), "UTF-8")
    assert(s1.indexOf("http://a.org/1") < s1.indexOf("http://a.org/2"),
      "entries must be url-sorted within a session file")
    assert(s1.startsWith("""{"log":{"version":"1.2""""), s1.take(40))
  }

  test("scan: a non-HAR file yields zero rows, never a failure") {
    val dir = java.nio.file.Files.createTempDirectory("har_junk").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "junk.har"),
      "this is not { json at all".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "empty.har"),
      "{\"log\":{\"version\":\"1.2\",\"entries\":[]}}".getBytes("UTF-8"))
    assert(Har.scan(spark, dir + "/*.har").count() == 0)
  }

  test("escapeJson golden: every control path") {
    assert(Har.escapeJson("a\"b\\c\nd\re\tf" + 1.toChar + "g") ==
      "a\\\"b\\\\c\\nd\\re\\tf\\u0001g")
    assert(Har.escapeJson("") == "")
    assert(Har.escapeJson("日本語 ok") == "日本語 ok")
  }
}
