package graft.formats

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HAR (HTTP Archive 1.2, public spec — the devtools/proxy capture
  * export `webrecorder/har2warc` converts into WARC): one JSON document
  * per page-load session, `log.entries[]` carrying request/response
  * pairs with the response body inline (plain or base64).
  *
  * Two independent stacks on purpose (the Warc/WarcSink discipline):
  * [[write]] hand-renders the JSON (full string escaping, deterministic
  * entry order), [[scan]] parses through Spark's `from_json` with an
  * explicit schema — so the round trip crosses two implementations, and
  * the `pipeline_har2warc` key then crosses into the WARC stack via
  * [[graft.formats.WarcSink]].
  *
  * Scale notes: a HAR is one page-load's captures, so files are small
  * and numerous — parallelism is per shard file (repartition on shard,
  * one streamed file per group, O(1) memory — the CdxSink layout), and
  * the scan is `wholetext` per file + one `from_json` projection +
  * posexplode, all map-side; a million HARs are a million input splits,
  * no shuffle anywhere in the read. */
object Har {

  /** `sessions/page-7` -> `page-7.har` */
  private[graft] def harName(shard: String): String = {
    val base = shard.substring(shard.lastIndexOf('/') + 1)
    if (base.endsWith(".har")) base else base + ".har"
  }

  /** minimal complete JSON string escaping (", \, and all control chars) */
  private[graft] def escapeJson(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case ctrl if ctrl < ' ' => sb.append(f"\\u${ctrl.toInt}%04x")
        case other => sb.append(other)
      }
      i += 1
    }
    sb.toString
  }

  private def iso(ts14: String): String =
    s"${ts14.substring(0, 4)}-${ts14.substring(4, 6)}-${ts14.substring(6, 8)}T" +
      s"${ts14.substring(8, 10)}:${ts14.substring(10, 12)}:${ts14.substring(12, 14)}.000Z"

  /** Write `df` (columns: shard, url, ts [14-digit], method, status,
    * mime, payload [binary], b64 [boolean — render the body base64 like
    * a binary-response HAR, vs inline text]) as one `<shard>.har` per
    * distinct shard under `dir`. Entries are url-sorted within a file so
    * output is deterministic. Attempt-isolated temp + overwrite rename
    * per file (the CdxSink publish discipline). */
  def write(df: DataFrame, dir: String): Unit = {
    val need = Seq("shard", "url", "ts", "method", "status", "mime", "payload", "b64")
    require(need.forall(df.columns.contains),
      s"Har.write needs [${need.mkString(", ")}]; got [${df.columns.mkString(", ")}]")
    val spark = df.sparkSession
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    df.select(col("shard"), col("url"), col("ts"), col("method"),
        col("status"), col("mime"), col("payload"), col("b64"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "url", "ts")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pfs = org.apache.hadoop.fs.FileSystem.newInstance(
          new Path(dir).toUri, sconf.value)
        pfs.setWriteChecksum(false)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(tc => s"${tc.partitionId()}-${tc.taskAttemptId()}")
          .getOrElse(java.util.UUID.randomUUID().toString)
        var current: String = null
        var out: java.io.OutputStream = null
        var first = true
        def close(): Unit = if (out != null) {
          out.write("\n]}}\n".getBytes(StandardCharsets.UTF_8))
          out.close(); out = null
          val tmp = new Path(dir, s".${harName(current)}.$attempt.tmp")
          val fin = new Path(dir, harName(current))
          if (pfs.exists(fin)) pfs.delete(fin, false)
          require(pfs.rename(tmp, fin), s"Har.write: publish rename failed for $fin")
        }
        it.foreach { r =>
          val shard = r.getString(0)
          require(shard != null, "Har.write: null shard")
          if (shard != current) {
            close()
            current = shard
            first = true
            out = pfs.create(new Path(dir, s".${harName(current)}.$attempt.tmp"), true)
            out.write(("{\"log\":{\"version\":\"1.2\"," +
              "\"creator\":{\"name\":\"graft\",\"version\":\"0.1\"},\"entries\":[")
              .getBytes(StandardCharsets.UTF_8))
          }
          val (url, ts, method) = (r.getString(1), r.getString(2), r.getString(3))
          val status = r.getInt(4)
          val mime = r.getString(5)
          val payload = if (r.isNullAt(6)) Array.emptyByteArray
            else r.getAs[Array[Byte]](6)
          val b64 = r.getBoolean(7)
          val content =
            if (b64)
              s"""{"size":${payload.length},"mimeType":"${escapeJson(mime)}",""" +
                s""""text":"${java.util.Base64.getEncoder.encodeToString(payload)}",""" +
                s""""encoding":"base64"}"""
            else
              s"""{"size":${payload.length},"mimeType":"${escapeJson(mime)}",""" +
                s""""text":"${escapeJson(new String(payload, StandardCharsets.UTF_8))}"}"""
          val entry =
            s"""${if (first) "" else ","}
               |{"startedDateTime":"${iso(ts)}","time":1,
               |"request":{"method":"${escapeJson(method)}","url":"${escapeJson(url)}","httpVersion":"HTTP/1.1","headers":[],"queryString":[],"headersSize":-1,"bodySize":0},
               |"response":{"status":$status,"statusText":"","httpVersion":"HTTP/1.1","headers":[{"name":"Content-Type","value":"${escapeJson(mime)}"}],"content":$content,"redirectURL":"","headersSize":-1,"bodySize":${payload.length}},
               |"cache":{},"timings":{"send":0,"wait":1,"receive":0}}""".stripMargin
          first = false
          out.write(entry.getBytes(StandardCharsets.UTF_8))
        }
        close()
        pfs.close()
      }
  }

  private val Schema =
    "STRUCT<log: STRUCT<entries: ARRAY<STRUCT<" +
      "startedDateTime: STRING, " +
      "request: STRUCT<method: STRING, url: STRING>, " +
      "response: STRUCT<status: INT, content: STRUCT<" +
      "size: BIGINT, mimeType: STRING, text: STRING, encoding: STRING>>>>>>"

  /** Scan `.har` files under `glob` into capture rows:
    * (har_file, url, ts, method, status, mime, payload binary). A file
    * that is not HAR-shaped JSON yields zero rows (from_json -> null
    * log, filtered), never a failure — crawl dumps mix formats. */
  def scan(spark: SparkSession, glob: String): DataFrame = {
    spark.read.option("wholetext", "true").text(glob)
      .select(input_file_name().as("har_file"),
        from_json(col("value"),
          org.apache.spark.sql.types.DataType.fromDDL(Schema)).as("h"))
      .select(col("har_file"), explode(col("h.log.entries")).as("e"))
      .select(
        col("har_file"),
        col("e.request.url").as("url"),
        substring(regexp_replace(col("e.startedDateTime"), "[^0-9]", ""), 1, 14).as("ts"),
        col("e.request.method").as("method"),
        col("e.response.status").as("status"),
        col("e.response.content.mimeType").as("mime"),
        when(col("e.response.content.encoding") === "base64",
          unbase64(col("e.response.content.text")))
          .otherwise(encode(coalesce(col("e.response.content.text"), lit("")), "UTF-8"))
          .as("payload"))
  }
}
