package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic CDX capture table, derived deterministically from the driver's
  * `orders` parquet so that every CDX-shaped operator (SURVEY.md §1.2, §2)
  * has a DuckDB-oracle-able input. The Spark derivation ([[df]]) and the
  * DuckDB CTE ([[duckCte]]) are kept semantically identical — every oracle
  * query is written against the CTE, so any drift shows up as a hash
  * mismatch in `proj_cdx_fields`.
  *
  * Field semantics mirror the reference's CDX(J) row
  * (indexwarcsjob.py §mapper output, recon ~L100–120; SURVEY §1.2):
  * urlkey=SURT key, ts=14-digit capture time, url/mime/status/digest/
  * length/filename, plus CDX-11's nullable redirect/robotflags.
  */
object Cdx {

  /** Null-tolerant (urlkey, ts, json) columns from a raw CDX(J) line —
    * THE line-splitting idiom, in one place (it was six hand-copied
    * selectExpr triples). try_element_at, not element_at: under Spark
    * 4's default ANSI mode a short or blank line (split -> fewer than 3
    * parts) raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT, killing the whole
    * query — and, behind a streaming checkpoint, poisoning it forever;
    * the try_ form yields nulls, which is what a 2-field CDX line means.
    * `names` lets callers keep their local aliases. */
  def lineCols(
      line: org.apache.spark.sql.Column,
      names: (String, String, String) = ("urlkey", "ts", "json"))
      : Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{lit, split, try_element_at}
    val p = split(line, " ", 3)
    Seq(try_element_at(p, lit(1)).as(names._1),
      try_element_at(p, lit(2)).as(names._2),
      try_element_at(p, lit(3)).as(names._3))
  }

  /** Spark-side derivation. Columns:
    * id, hostword, host, path, qs, url, urlkey, ts, epoch_us, status, mime,
    * record_type, digest, length, filename, redirect, robotflags.
    */
  def df(spark: SparkSession, dir: String): DataFrame =
    derive(Tables.t(spark, dir, "orders"))

  /** [[df]] with the scale-adaptive scan fan-out UNDER the derivation:
    * wrapping the derived frame in [[Tables.fanOut]] leaves the derive
    * Project below the exchange (Catalyst never pulls a Project above a
    * repartition), so the regex/sha2/date_format work would still run in
    * the single scan task. Fanning the RAW orders read first puts the
    * derivation on every core. For the CPU-heavy consumers (sink
    * round-trips, cluster builds) whose results are partition-independent;
    * identity at scale like fanOut itself. */
  def dfFan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    derive(Tables.fanOut(Tables.t(spark, dir, "orders"), col("o_orderkey")))
  }

  private def derive(base: DataFrame): DataFrame =
    base.selectExpr(
      "o_orderkey AS id",
      "lower(regexp_replace(split_part(o_orderpriority, '-', 2), '[^A-Za-z]', '')) AS hostword",
      "'/order/' || (o_orderkey % 1000) AS path",
      "'b=' || (o_orderkey % 7) || '&a=' || (o_custkey % 5) AS qs",
      "date_format(o_orderdate, 'yyyyMMddHHmmss') AS ts",
      // o_orderdate is TIMESTAMP_NTZ in the driver parquet; unix_micros
      // needs TIMESTAMP (session TZ is pinned UTC, so the cast is exact).
      "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS epoch_us",
      "CASE WHEN o_orderkey % 37 = 0 THEN 503 WHEN o_orderstatus = 'F' THEN 200 " +
        "WHEN o_orderstatus = 'O' THEN 301 ELSE 404 END AS status",
      "CASE o_orderkey % 4 WHEN 0 THEN 'Text/HTML; charset=UTF-8' WHEN 1 THEN 'application/JSON' " +
        "WHEN 2 THEN 'image/png' ELSE 'text/plain; charset=ISO-8859-1' END AS mime",
      // record_type modulus (7) is deliberately coprime to the digest-class
      // modulus (1000, via path): rows sharing a digest span all id%7
      // residues, so revisits DO find originals with an equal digest —
      // id%10 here would make join_revisit_resolve empty by construction
      // (two rows share (hostword, path) only when id₁ ≡ id₂ mod 1000,
      // which with a mod-10 record_type forces the same record_type).
      "CASE WHEN o_orderkey % 7 = 5 THEN 'revisit' WHEN o_orderkey % 7 = 3 THEN 'request' " +
        "ELSE 'response' END AS record_type",
      "CAST(floor(o_totalprice * 100) AS BIGINT) % 90000 + 100 AS length",
      "'crawl/seg-' || (o_orderkey % 8) || '/warc-' || (o_orderkey % 64) || '.warc.gz' AS filename",
      "CASE WHEN o_orderkey % 9 = 0 THEN 'http://redirect.example.org/' || (o_orderkey % 13) END AS redirect",
      "CASE WHEN o_orderkey % 11 = 0 THEN 'A' END AS robotflags"
    ).selectExpr(
      "*",
      "'www.' || hostword || '.example.org' AS host",
      "'http://www.' || hostword || '.example.org' || path || '?' || qs AS url",
      "'org,example,' || hostword || ')' || path || '?' || concat_ws('&', array_sort(split(qs, '&'))) AS urlkey",
      "sha2(concat(hostword, path), 256) AS digest"
    )

  /** DuckDB CTE `cdx` with identical columns/values. Note DuckDB-specific
    * spellings: regexp_replace needs the 'g' flag (Spark replaces all
    * matches by default), strftime vs date_format, list_sort/string_split
    * vs array_sort/split.
    */
  val duckCte: String =
    """WITH cdx AS (
      |  SELECT *,
      |    'www.' || hostword || '.example.org' AS host,
      |    'http://www.' || hostword || '.example.org' || path || '?' || qs AS url,
      |    'org,example,' || hostword || ')' || path || '?' ||
      |      array_to_string(list_sort(string_split(qs, '&')), '&') AS urlkey,
      |    sha256(hostword || path) AS digest
      |  FROM (
      |    SELECT o_orderkey AS id,
      |      lower(regexp_replace(split_part(o_orderpriority, '-', 2), '[^A-Za-z]', '', 'g')) AS hostword,
      |      '/order/' || (o_orderkey % 1000) AS path,
      |      'b=' || (o_orderkey % 7) || '&a=' || (o_custkey % 5) AS qs,
      |      strftime(o_orderdate, '%Y%m%d%H%M%S') AS ts,
      |      epoch_us(o_orderdate) AS epoch_us,
      |      CASE WHEN o_orderkey % 37 = 0 THEN 503 WHEN o_orderstatus = 'F' THEN 200
      |           WHEN o_orderstatus = 'O' THEN 301 ELSE 404 END AS status,
      |      CASE o_orderkey % 4 WHEN 0 THEN 'Text/HTML; charset=UTF-8' WHEN 1 THEN 'application/JSON'
      |           WHEN 2 THEN 'image/png' ELSE 'text/plain; charset=ISO-8859-1' END AS mime,
      |      CASE WHEN o_orderkey % 7 = 5 THEN 'revisit' WHEN o_orderkey % 7 = 3 THEN 'request'
      |           ELSE 'response' END AS record_type,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) % 90000 + 100 AS length,
      |      'crawl/seg-' || (o_orderkey % 8) || '/warc-' || (o_orderkey % 64) || '.warc.gz' AS filename,
      |      CASE WHEN o_orderkey % 9 = 0 THEN 'http://redirect.example.org/' || (o_orderkey % 13) END AS redirect,
      |      CASE WHEN o_orderkey % 11 = 0 THEN 'A' END AS robotflags
      |    FROM orders))
      |""".stripMargin
}
