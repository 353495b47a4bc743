package graft

import graft.formats.{Warc, ZipNum}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's whole three-job pipeline as ONE lazy Spark plan
  * (SURVEY §3.3 "Spark shape"):
  *
  *   indexwarcsjob.py  -> [[cdxLines]]   (scan WARC members, derive CDX)
  *   samplecdxjob.py   -> (deleted)      (RangePartitioner samples internally)
  *   zipnumclusterjob  -> [[ZipNum.write]] (range exchange + local sort +
  *                                          gzip blocks + cluster.idx)
  *
  * One shuffle total — the range exchange — exactly the reference's single
  * Hadoop shuffle, with job 2's sample pass folded into it. At 100 TB the
  * WARC scan parallelizes per file (gzip members are not splittable
  * mid-file), the exchange is skew-managed by AQE, and the driver only
  * ever holds cluster.idx (~1/linesPerBlock of the data).
  */
object Pipeline {

  /** WARC files -> CDXJ lines (`urlkey SP ts SP {json}`), the job-1
    * derivation: keep response/revisit records, SURT-key the URL via the
    * native codegen expression, re-encode the digest, pack the JSON. */
  def cdxLines(spark: SparkSession, warcGlob: String): DataFrame = {
    GraftFunctions.register(spark)
    Warc.scan(spark, warcGlob)
      .filter(col("record_type").isin("response", "revisit") &&
        col("url").isNotNull && col("ts").isNotNull)
      .selectExpr(
        "surt_key_native(url) AS urlkey",
        "ts",
        "to_json(named_struct(" +
          "'url', url, 'mime', coalesce(mime, '-'), " +
          "'status', coalesce(CAST(status AS STRING), '-'), " +
          "'digest', coalesce(digest, '-'), " +
          "'length', CAST(length AS STRING), " +
          "'offset', CAST(offset AS STRING), " +
          "'filename', filename)) AS json")
      .filter(col("urlkey").isNotNull)
      .selectExpr("concat(urlkey, ' ', ts, ' ', json) AS line")
  }

  /** full pipeline: WARC glob -> ZipNum cluster under `outDir`. */
  def warcToZipNum(
      spark: SparkSession, warcGlob: String, outDir: String,
      shards: Int = 8, linesPerBlock: Int = 3000): Unit =
    ZipNum.write(cdxLines(spark, warcGlob), outDir, shards, linesPerBlock)
}
