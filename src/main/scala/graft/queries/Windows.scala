package graft.queries

import graft.{Cdx, QueryModule}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 window functions — the ZipNum accounting trio
  * (block id / running byte offset / next block key, mirroring
  * zipnumclusterjob.py §reducer recon ~L90–170 and the cluster.idx
  * consumer contract), plus capture ranking and collapse.
  *
  * Scale notes: every window here partitions by the shard key
  * (`hostword` stands in for the range-partition id), so no
  * single-partition WindowExec appears in the plan — the same shape
  * survives a 1000-shard layout where each shard's accounting is
  * independent.
  */
object Windows extends QueryModule {

  private def o(sql: String): String = Cdx.duckCte + sql

  /** shard-local CDX order: within a shard (hostword), ZipNum lines sort
    * by (urlkey, ts); id breaks ties deterministically. */
  private val shardOrder = Seq("urlkey", "ts", "id")

  override def queries: Map[String, QFn] = Map(
    // block id = floor((line_number - 1) / numlines) within the shard
    "win_rownum_block" -> ((s, d) => {
      val w = Window.partitionBy("hostword").orderBy(shardOrder.map(col): _*)
      Cdx.df(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("block", expr("CAST((rn - 1) DIV 100 AS BIGINT)"))
        .select("id", "hostword", "rn", "block")
        .orderBy("hostword", "rn")
    }),

    // running byte offset of each line within its shard (frame spec:
    // rows unbounded preceding .. -1, i.e. sum of lengths before me)
    "win_running_offset" -> ((s, d) => {
      val w = Window.partitionBy("hostword").orderBy(shardOrder.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      Cdx.df(s, d)
        .withColumn("boffset", coalesce(sum("length").over(w), lit(0L)))
        .select("id", "hostword", "length", "boffset")
        .orderBy("hostword", "boffset", "id")
    }),

    // cluster.idx consumption: each block's first key + the next block's
    // first key = the block's search upper bound (pywb zipnum §search)
    "win_lead_next_key" -> ((s, d) => {
      val w = Window.partitionBy("hostword").orderBy(shardOrder.map(col): _*)
      val blocks = Cdx.df(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("block", expr("CAST((rn - 1) DIV 100 AS BIGINT)"))
        .groupBy("hostword", "block")
        .agg(min("urlkey").as("first_key"), count(lit(1)).as("n_lines"))
      blocks
        .withColumn("next_key",
          lead("first_key", 1).over(Window.partitionBy("hostword").orderBy("block")))
        .select("hostword", "block", "first_key", "next_key", "n_lines")
        .orderBy("hostword", "block")
    }),

    // rank captures per url by recency (sort=reverse / latest-capture)
    "win_rank_captures" -> ((s, d) => {
      val w = Window.partitionBy("prefix_key").orderBy(col("ts").desc, col("id").desc)
      val wd = Window.partitionBy("prefix_key").orderBy(col("ts").desc)
      Cdx.df(s, d)
        .withColumn("prefix_key", split_part(col("urlkey"), lit("?"), lit(1)))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(wd))
        .select("prefix_key", "id", "ts", "rk", "drk")
        .orderBy("prefix_key", "rk", "id")
    }),

    // collapse=timestamp:6 — one capture per (url, ts-month), first wins
    "win_collapse" -> ((s, d) => {
      val w = Window
        .partitionBy(col("prefix_key"), substring(col("ts"), 1, 6))
        .orderBy(col("ts"), col("id"))
      Cdx.df(s, d)
        .withColumn("prefix_key", split_part(col("urlkey"), lit("?"), lit(1)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("prefix_key", "ts", "id")
        .orderBy("prefix_key", "ts", "id")
    }),

    // pywb collapse=digest: drop a capture when the payload digest equals
    // the PREVIOUS capture's for the same page — "page didn't change
    // since last crawl", the highest-leverage dedup a replay index does.
    // Run-length semantics (A,B,A keeps 3), not first-per-granule like
    // win_collapse. The fixture's stored digest is constant per page, so
    // the content digest here models a page that changes yearly — the
    // lag/IS-DISTINCT-FROM machinery is what's under test, and at every
    // sf the fixture yields both kept and dropped adjacents (10 dropped
    // at sf0.001, 2752 at sf0.01). First capture always kept (lag null).
    "win_collapse_digest" -> ((s, d) => {
      val w = Window
        .partitionBy(col("hostword"), col("path"))
        .orderBy(col("ts"), col("id"))
      Cdx.df(s, d)
        .withColumn("content_digest",
          sha2(concat(col("hostword"), col("path"), substring(col("ts"), 1, 4)), 256))
        .withColumn("prev_digest", lag(col("content_digest"), 1).over(w))
        .filter(!(col("content_digest") <=> col("prev_digest")))
        .select("urlkey", "ts", "id", "content_digest")
        .orderBy("urlkey", "ts", "id")
    }),

    // distribution ranks per shard: quartile bucket (ntile), percent_rank,
    // cume_dist over capture length — the shard-balance diagnostics a
    // 1000-shard layout reads per shard. One WindowExec pass partitioned
    // by hostword (no single-partition window); the (length, id) order is
    // total, so the rank functions are tie-free and oracle-exact.
    "win_ntile_cume" -> ((s, d) => {
      val w = Window.partitionBy("hostword").orderBy(col("length"), col("id"))
      Cdx.df(s, d)
        .withColumn("q4", ntile(4).over(w))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .select("hostword", "id", "length", "q4", "pr", "cd")
        .orderBy("hostword", "id")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "win_rownum_block" -> o(
      "SELECT id, hostword, rn, (rn - 1) // 100 AS block FROM " +
        "(SELECT id, hostword, row_number() OVER (PARTITION BY hostword ORDER BY urlkey, ts, id) AS rn FROM cdx) " +
        "ORDER BY hostword, rn"),
    "win_running_offset" -> o(
      "SELECT id, hostword, length, CAST(coalesce(sum(length) OVER (PARTITION BY hostword " +
        "ORDER BY urlkey, ts, id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS boffset " +
        "FROM cdx ORDER BY hostword, boffset, id"),
    "win_lead_next_key" -> o(
      ", blocks AS (SELECT hostword, (rn - 1) // 100 AS block, min(urlkey) AS first_key, count(*) AS n_lines " +
        "FROM (SELECT hostword, urlkey, row_number() OVER (PARTITION BY hostword ORDER BY urlkey, ts, id) AS rn FROM cdx) " +
        "GROUP BY hostword, block) " +
        "SELECT hostword, block, first_key, " +
        "lead(first_key) OVER (PARTITION BY hostword ORDER BY block) AS next_key, n_lines " +
        "FROM blocks ORDER BY hostword, block"),
    "win_rank_captures" -> o(
      "SELECT prefix_key, id, ts, rk, drk FROM " +
        "(SELECT split_part(urlkey, '?', 1) AS prefix_key, id, ts, " +
        "rank() OVER (PARTITION BY split_part(urlkey, '?', 1) ORDER BY ts DESC, id DESC) AS rk, " +
        "dense_rank() OVER (PARTITION BY split_part(urlkey, '?', 1) ORDER BY ts DESC) AS drk FROM cdx) " +
        "ORDER BY prefix_key, rk, id"),
    "win_collapse" -> o(
      "SELECT prefix_key, ts, id FROM " +
        "(SELECT split_part(urlkey, '?', 1) AS prefix_key, ts, id, " +
        "row_number() OVER (PARTITION BY split_part(urlkey, '?', 1), substr(ts, 1, 6) ORDER BY ts, id) AS rn FROM cdx) " +
        "WHERE rn = 1 ORDER BY prefix_key, ts, id"),
    // IS DISTINCT FROM = Spark's !(a <=> b); first row kept (lag null)
    "win_collapse_digest" -> o(
      "SELECT urlkey, ts, id, content_digest FROM " +
        "(SELECT urlkey, ts, id, sha256(hostword || path || substr(ts, 1, 4)) AS content_digest, " +
        "lag(sha256(hostword || path || substr(ts, 1, 4))) OVER (PARTITION BY hostword, path ORDER BY ts, id) AS prev_digest FROM cdx) " +
        "WHERE content_digest IS DISTINCT FROM prev_digest ORDER BY urlkey, ts, id"),
    "win_ntile_cume" -> o(
      "SELECT hostword, id, length, " +
        "ntile(4) OVER (PARTITION BY hostword ORDER BY length, id) AS q4, " +
        "round(percent_rank() OVER (PARTITION BY hostword ORDER BY length, id), 6) AS pr, " +
        "round(cume_dist() OVER (PARTITION BY hostword ORDER BY length, id), 6) AS cd " +
        "FROM cdx ORDER BY hostword, id")
  )
}
