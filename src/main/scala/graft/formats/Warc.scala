package graft.formats

import java.io.{ByteArrayInputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) container support: a `.warc.gz` is one gzip member per
  * record; each record is `WARC/1.0\r\n` + headers + CRLF CRLF + block.
  * Response records embed an HTTP response (status line + headers + body).
  *
  * Mirrors the fields the reference extracts per record
  * (indexwarcsjob.py §mapper via pywb ArchiveIterator, recon ~L60–120;
  * SURVEY.md §1.1): type, target URI, date, payload digest, HTTP status,
  * payload mime, compressed offset/length, filename.
  *
  * Scale notes: gzip members are not splittable mid-file, so parallelism is
  * per WARC file (`scan`'s unit of work) — the crawl reality of many
  * ~1 GB WARCs per segment makes that the natural partitioning; AQE
  * coalesces small files.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("record_type", StringType),
    StructField("url", StringType),
    StructField("ts", StringType), // 14-digit, derived from WARC-Date
    StructField("digest", StringType),
    StructField("status", IntegerType),
    StructField("mime", StringType),
    StructField("offset", LongType),
    StructField("length", LongType),
    StructField("filename", StringType),
    StructField("payload", BinaryType)))

  final case class FixtureRecord(
      recordType: String,
      url: String,
      isoDate: String, // e.g. 2015-02-15T01:23:45Z
      digest: String,
      status: Int,
      mime: String,
      payload: Array[Byte])

  /** Write records as a `.warc.gz` (one gzip member each) — fixture/golden
    * generation for tests and for the scan_warc demo query. */
  def writeFixture(path: String, records: Seq[FixtureRecord]): Unit = {
    val out = Files.newOutputStream(Paths.get(path))
    try records.foreach(r => Gzip.writeMember(out, renderRecord(r)))
    finally out.close()
  }

  private def renderRecord(r: FixtureRecord): Array[Byte] = {
    val isResponse = r.recordType == "response"
    val block: Array[Byte] =
      if (isResponse) {
        val head = s"HTTP/1.1 ${r.status} OK\r\nContent-Type: ${r.mime}\r\n" +
          s"Content-Length: ${r.payload.length}\r\n\r\n"
        head.getBytes(UTF_8) ++ r.payload
      } else r.payload
    val contentType =
      if (isResponse) "application/http; msgtype=response" else "application/octet-stream"
    val headerLines = Seq("WARC/1.0", s"WARC-Type: ${r.recordType}") ++
      Option(r.url).map(u => s"WARC-Target-URI: $u") ++
      Seq(
        s"WARC-Date: ${r.isoDate}",
        s"WARC-Payload-Digest: sha1:${r.digest}",
        s"Content-Type: $contentType",
        s"Content-Length: ${block.length}")
    val headers = headerLines.mkString("", "\r\n", "\r\n\r\n")
    headers.getBytes(UTF_8) ++ block
  }

  /** Parse one decompressed WARC record into raw fields:
    * (record_type, url, ts14, digest, status (nullable), mime, payload). */
  private[graft] def parseRow(
      bytes: Array[Byte], offset: Long, length: Long, filename: String)
      : (String, String, String, String, java.lang.Integer, String, Array[Byte]) = {
    val r = parseRecord(bytes, offset, length, filename)
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.get(4).asInstanceOf[java.lang.Integer], r.getString(5),
      r.get(9).asInstanceOf[Array[Byte]])
  }

  /** Parse one decompressed WARC record into a row-shaped tuple. */
  /** byte index of the first CRLF CRLF, or -1 — header/body split MUST be
    * found on bytes: non-ASCII header values (UTF-8 URLs are common in
    * real crawls) make char indexes diverge from byte offsets. */
  private def crlfCrlf(bytes: Array[Byte], from: Int = 0): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private[graft] def parseRecord(
      bytes: Array[Byte], offset: Long, length: Long, filename: String): Row = {
    val headerEnd = crlfCrlf(bytes)
    val headerBlock =
      new String(bytes, 0, if (headerEnd >= 0) headerEnd else bytes.length, UTF_8)
    val headers = headerBlock.split("\r\n").drop(1).flatMap { line =>
      val i = line.indexOf(':')
      if (i > 0) Some(line.substring(0, i).toLowerCase -> line.substring(i + 1).trim) else None
    }.toMap
    val recordType = headers.getOrElse("warc-type", "")
    val url = headers.getOrElse("warc-target-uri", null)
    val isoDate = headers.get("warc-date")
    val ts = isoDate.map(_.replaceAll("[^0-9]", "").take(14)).orNull
    val digest = headers.get("warc-payload-digest").map(_.stripPrefix("sha1:")).orNull
    // no terminator -> header-only record, empty body
    val body = if (headerEnd >= 0) bytes.drop(headerEnd + 4) else Array.emptyByteArray
    val isHttpResponse = recordType == "response" &&
      headers.getOrElse("content-type", "").startsWith("application/http")
    var status: Integer = null
    var mime: String = null
    var payload = body
    if (isHttpResponse) {
      val httpEnd = crlfCrlf(body)
      if (httpEnd >= 0) {
        val httpHead = new String(body, 0, httpEnd, UTF_8).split("\r\n")
        val statusLine = httpHead.headOption.getOrElse("")
        val parts = statusLine.split(" ")
        if (parts.length >= 2 && parts(1).forall(_.isDigit)) status = parts(1).toInt
        mime = httpHead.drop(1).flatMap { line =>
          val i = line.indexOf(':')
          if (i > 0 && line.substring(0, i).equalsIgnoreCase("Content-Type"))
            Some(line.substring(i + 1).trim)
          else None
        }.headOption.orNull
        payload = body.drop(httpEnd + 4)
      }
    }
    Row(recordType, url, ts, digest, status, mime, offset, length, filename, payload)
  }

  /** Distributed scan: one task per WARC file, iterating gzip members
    * inside the partition (SURVEY §2.1 `scan_warc`). */
  def scan(spark: SparkSession, pathGlob: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(pathGlob).flatMap {
      case (file, pds) =>
        val in = pds.open()
        // close even when the downstream stops consuming early (limit, error)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => try in.close() catch { case _: Throwable => }))
        val shortName = file.substring(file.lastIndexOf('/') + 1)
        val it = Gzip.members(in).map(m =>
          parseRecord(m.bytes, m.offset, m.compressedLength, shortName))
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) try in.close() catch { case _: Throwable => }
            h
          }
          override def next(): Row = it.next()
        }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Deterministic 8-record fixture over 3 URLs — used by the scan_warc
    * demo query and the golden spec. */
  def fixtureRecords: Seq[FixtureRecord] = {
    def b32(seed: String): String =
      seed.flatMap(c => Integer.toString((c.toInt % 32), 32)).toUpperCase.padTo(32, '2').take(32)
    Seq(
      FixtureRecord("warcinfo", null, "2015-02-15T01:00:00Z", b32("info"), 0, null,
        "software: graft-fixture".getBytes(UTF_8)),
      FixtureRecord("response", "http://www.example.com/path?b=2&a=1", "2015-02-15T01:23:45Z",
        b32("alpha"), 200, "text/html; charset=UTF-8", "<html>alpha</html>".getBytes(UTF_8)),
      FixtureRecord("request", "http://www.example.com/path?b=2&a=1", "2015-02-15T01:23:45Z",
        b32("alpha-req"), 0, null, "GET /path?b=2&a=1 HTTP/1.1\r\n\r\n".getBytes(UTF_8)),
      FixtureRecord("response", "http://example.com/other", "2015-03-01T12:00:00Z",
        b32("beta"), 404, "text/plain", "not here".getBytes(UTF_8)),
      FixtureRecord("revisit", "http://www.example.com/path?b=2&a=1", "2015-04-02T08:30:00Z",
        b32("alpha"), 0, null, Array.emptyByteArray),
      FixtureRecord("response", "https://sub.iana.org/x", "2015-05-10T23:59:59Z",
        b32("gamma"), 301, "text/html", "<a>moved</a>".getBytes(UTF_8)),
      FixtureRecord("metadata", "http://example.com/other", "2015-03-01T12:00:01Z",
        b32("meta"), 0, null, "outlink: http://example.com/next".getBytes(UTF_8)),
      FixtureRecord("response", "http://example.com/other", "2015-06-01T00:00:00Z",
        b32("beta"), 200, "text/plain", "now here".getBytes(UTF_8)))
  }
}
