package graft.queries

import graft.{Cdx, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 joins: anti (skip-existing), equi on digest (revisit
  * resolution), broadcast dim, large-large sort-merge, semi, non-equi
  * range-block (the join form of pywb's cluster.idx binary search), and
  * as-of/closest.
  *
  * Scale notes (100 TB): the dim sides of `join_broadcast_dim` and the idx
  * side of `join_range_block` are explicitly `broadcast()` — the idx is
  * ~1/3000 of the data by construction (zipnumclusterjob.py §reducer block
  * accounting, recon ~L90–170), so a broadcast nested-loop join on the
  * range predicate is the right physical plan at any scale. The
  * revisit/original join keys on `digest`, which is high-cardinality and
  * well-distributed (SHA-1), so the shuffle is skew-free.
  */
object Joins extends QueryModule {

  private def o(sql: String): String = Cdx.duckCte + sql

  override def queries: Map[String, QFn] = Map(
    // --skip-existing: WARCs in the manifest whose output doesn't already
    // exist (indexwarcsjob.py §skip-existing option, recon ~L40–60).
    // Done-set = "segments 0–5 were indexed by a prior run". filename
    // embeds seg = id % 8 and warc = id % 64, and id % 64 determines
    // id % 8, so exactly the 16 warc-k files with k % 8 ∈ {6,7} survive
    // the anti join at ANY scale factor — an id-divisibility done-set
    // (the old id % 3) covers every filename class and made this join
    // provably empty.
    "join_skip_existing" -> ((s, d) => {
      val c = Cdx.df(s, d)
      val manifest = c.select("filename").distinct()
      val done = c.filter(col("id") % 8 < 6).select("filename").distinct()
      manifest.join(done, Seq("filename"), "left_anti").orderBy("filename")
    }),

    // resolve revisit records to their original capture by payload digest
    "join_revisit_resolve" -> ((s, d) => {
      val c = Cdx.df(s, d)
      val revisits = c.filter(col("record_type") === "revisit")
        .select(col("id").as("revisit_id"), col("urlkey").as("revisit_key"), col("digest"))
      val originals = c.filter(col("record_type") === "response")
        .select(col("id").as("orig_id"), col("url").as("orig_url"), col("digest"))
      revisits.join(originals, "digest")
        .select("revisit_id", "orig_id", "revisit_key", "orig_url")
        .orderBy("revisit_id", "orig_id")
    }),

    // small-dim enrich: customer -> nation -> region, counts per region
    "join_broadcast_dim" -> ((s, d) => {
      val customer = Tables.t(s, d, "customer")
      val nation = broadcast(Tables.t(s, d, "nation"))
      val region = broadcast(Tables.t(s, d, "region"))
      customer
        .join(nation, customer("c_nationkey") === nation("n_nationkey"))
        .join(region, nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 6).as("sum_bal"))
        .orderBy("r_name")
    }),

    // large-large equi join (SMJ/shuffled-hash path under AQE)
    "join_sortmerge_large" -> ((s, d) => {
      val li = Tables.t(s, d, "lineitem")
      val ord = Tables.t(s, d, "orders")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority")
    }),

    // Salted skew join — the 100 TB hot-key recipe. hostword has 5
    // distinct values (every capture lands on one of 5 join keys), the
    // worst case for a shuffled join: 5 reducers own all the data. The
    // fix: left rows spread across 16 salt buckets (salt = id % 16 keeps
    // it DuckDB-derivable), the dim side replicated ×16 via explode, join
    // on (key, salt) → 80 evenly-loaded partitions instead of 5 hot ones.
    // The merge hint forces the shuffle path (broadcast would dodge the
    // skew this query exists to demonstrate — a real dim at this fan-in
    // is too big to broadcast). The oracle is the UNSALTED join: salting
    // must be invisible in the result, only in the shuffle layout.
    "join_skew_salted" -> ((s, d) => {
      val c = Cdx.df(s, d)
      val saltN = 16
      val dim = c.groupBy("hostword")
        .agg(count(lit(1)).as("host_captures"), max("length").as("host_max_len"))
      val saltedDim = dim.withColumn(
        "salt", explode(sequence(lit(0L), lit((saltN - 1).toLong))))
      val saltedLeft = c.withColumn("salt", col("id") % saltN)
      saltedLeft.hint("merge")
        .join(saltedDim, Seq("hostword", "salt"))
        .groupBy("hostword", "host_captures", "host_max_len")
        .agg(count(lit(1)).as("joined_rows"), sum("length").as("sum_len"))
        .orderBy("hostword")
    }),

    // EXISTS-style semi join: orders having a high-quantity line
    "join_semi" -> ((s, d) => {
      val li = Tables.t(s, d, "lineitem").filter(col("l_quantity") > 45)
      val ord = Tables.t(s, d, "orders")
      ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    // FULL OUTER: reconcile observed per-host capture counts against a
    // configured quota list — rows survive from BOTH unmatched sides
    // (hosts crawled but not configured, hosts configured but never
    // crawled), the audit shape a crawl-coverage report needs. Full
    // outer can't broadcast by definition (both sides' unmatched rows
    // must surface), so the shuffled join on the host key is the right
    // plan; both inputs are already aggregated to |hosts| rows before
    // the join, never corpus-sized.
    "join_full_outer" -> ((s, d) => {
      import s.implicits._
      val got = Cdx.df(s, d).groupBy("hostword").agg(count(lit(1)).as("cnt"))
      val quota = Seq(("high", 100L), ("low", 200L), ("offline", 50L))
        .toDF("hostword", "quota")
      got.join(quota, Seq("hostword"), "full_outer")
        .select(col("hostword"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          coalesce(col("quota"), lit(-1L)).as("quota"),
          col("cnt").isNotNull.as("crawled"),
          col("quota").isNotNull.as("configured"))
        .orderBy("hostword")
    }),

    // non-equi range join: probe key -> containing ZipNum block
    // (join form of pywb.cdx.zipnum §search over cluster.idx).
    //
    // The idx side is built WITHOUT any data-sized single-partition window:
    // the global rank over distinct urlkeys uses the two-phase pattern —
    // range-partition the keys, rank locally per partition, then add each
    // partition's prefix offset (a triangular broadcast self-join over the
    // 32-row per-partition count table — never the keys themselves, and no
    // unpartitioned WindowExec anywhere in the plan, which PlanSpec
    // asserts). next_key comes from a broadcast self-join on block+1
    // instead of a global lead(). Every stage is parallel in the number of
    // key partitions, so the same plan survives 10^9 distinct keys; only
    // the finished idx (~1/50 of keys, the cluster.idx analog) is
    // broadcast to the probes.
    "join_range_block" -> ((s, d) => {
      val c = Cdx.df(s, d)
      val parted = c.select("urlkey").distinct()
        .repartitionByRange(32, col("urlkey"))
        .withColumn("pid", spark_partition_id())
      val localRanked = parted.withColumn("local_rn",
        row_number().over(Window.partitionBy("pid").orderBy("urlkey")))
      // 32-row offset table: cumulative key count of all preceding
      // partitions, via triangular self-join (input is #partitions-sized)
      val counts = parted.groupBy("pid").agg(count(lit(1)).as("n"))
      val offsets = counts.alias("a")
        .join(broadcast(counts.alias("b")), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(coalesce(sum(col("b.n")), lit(0L)).as("offset"))
      val keys = localRanked.join(broadcast(offsets), "pid")
        .withColumn("rn", col("local_rn") + col("offset"))
      val blocks = keys
        .withColumn("block", expr("CAST((rn - 1) DIV 50 AS BIGINT)"))
        .groupBy("block").agg(min("urlkey").as("start_key"))
      val idx = blocks.join(
          broadcast(blocks.select((col("block") - 1).as("block"), col("start_key").as("next_key"))),
          Seq("block"), "left")
      val probes = c.filter(col("id") % 97 === 0).select("id", "urlkey")
      probes.join(
          broadcast(idx),
          probes("urlkey") >= idx("start_key") &&
            (idx("next_key").isNull || probes("urlkey") < idx("next_key")))
        .select("id", "urlkey", "block")
        .orderBy("id")
    }),

    // bucketed co-located join: both sides persisted bucketBy(join key) +
    // sortBy, so the join plans with NO exchange on either side — the
    // pre-shuffled layout a 100 TB deployment keeps its fact tables in
    // (one shuffle at write time amortized over every subsequent join).
    // PlanSpec asserts the join subtree is exchange-free.
    "join_bucketed_colocated" -> ((s, d) => {
      val nBuckets = 8
      // sf-scoped table names, the tmp() discipline for the catalog: an
      // sf0.001 smoke run overlapping an sf0.01 Verify would otherwise
      // DROP+rewrite the same warehouse location mid-scan of the other
      val sfTag = java.nio.file.Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9_]", "_")
      val (liT, ordT) = (s"graft_li_bucketed_$sfTag", s"graft_ord_bucketed_$sfTag")
      // the in-memory catalog is per-session but the warehouse dir is not:
      // drop any registered table AND its leftover physical location
      val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(liT, ordT).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(wh, t)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      // repartition on the bucket key with the bucket count BEFORE the
      // bucketed write: the single-split scan otherwise makes ONE task
      // sort+write all 8 bucket files of each table serially. Spark's
      // bucket id and HashPartitioning share the murmur3 hash, so each
      // writer task owns whole buckets and every bucket stays one sorted
      // file — the shuffle-free colocated join below is untouched.
      val li = Tables.t(s, d, "lineitem").select("l_orderkey", "l_quantity")
        .repartition(nBuckets, col("l_orderkey"))
      val ord = Tables.t(s, d, "orders").select("o_orderkey", "o_orderpriority")
        .repartition(nBuckets, col("o_orderkey"))
      li.write.mode("overwrite")
        .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liT)
      ord.write.mode("overwrite")
        .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordT)
      // merge hint: at 100 TB neither side broadcasts; at test scale the
      // hint keeps the plan in the sort-merge shape the bucketing serves
      s.table(liT)
        .hint("merge")
        .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum("l_quantity"), 6).as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority")
    }),

    // interval-overlap join via the TIME-BUCKET equi-join rewrite. The
    // declarative form is a theta join (ev.ts BETWEEN iv.lo AND iv.hi),
    // which Spark can only plan as a broadcast-NLJ or cartesian — O(n·m)
    // compares, dead at 10^6 intervals. The rewrite: pick a bucket width
    // ≥ the max interval length, explode each interval to its covered
    // buckets (≤ 2 rows each, bounded by len/width + 1), map each event
    // to its single bucket, EQUI-join on the bucket, then re-check the
    // exact bounds. Same result, but the shuffle keys on bucket — both
    // sides scale linearly and AQE handles any hot bucket like any other
    // skewed equi-join (join_skew_salted's machinery applies unchanged).
    // join_range_block broadcasts a tiny idx instead; this is the shape
    // for when NEITHER side is broadcastable. PlanSpec pins no
    // NLJ/cartesian anywhere. 50 deterministic 45-min maintenance
    // windows every 14 h, literal arithmetic on both engines.
    "join_interval_bucket" -> ((s, d) => {
      val t0 = 1704067200L // 2024-01-01 00:00 UTC, epoch s
      val ev = Tables.events(s, d).select(
        col("event_id"),
        Tables.eventsTsSec.as("ts_s"),
        col("value"))
      val iv = s.range(0, 50).select(
        col("id").as("window_id"),
        (lit(t0) + col("id") * lit(14L * 3600L)).as("lo"))
        .withColumn("hi", col("lo") + lit(45L * 60L))
      val ivB = iv.withColumn("bucket",
        explode(expr("sequence(lo DIV 3600, hi DIV 3600)")))
      val evB = ev.withColumn("bucket", expr("ts_s DIV 3600"))
      evB.hint("shuffle_hash").join(ivB, Seq("bucket"))
        .filter(col("ts_s") >= col("lo") && col("ts_s") < col("hi"))
        .groupBy("window_id")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_v"))
        .orderBy("window_id")
    }),

    // DYNAMIC partition pruning on a day-partitioned fact — the classic
    // star-schema scan cut: the weekend filter lives on the CALENDAR
    // dim, so no static partition predicate exists at plan time; the
    // broadcast of the filtered dim doubles as the runtime pruning
    // subquery (dynamicpruningexpression on the fact scan), and the scan
    // lists only the weekend day-directories (8 of 30 — PlanSpec pins
    // the count). The dim is a shuffle-free range projection ON PURPOSE:
    // AQE's broadcast-reuse match fails across a shuffle/window in the
    // dim subtree and DPP silently degrades to a full scan (the
    // sim_ann_ivfpq_serve lesson, SURVEY §2.11). At 100 TB this is the
    // difference between reading 8 and 3650 day-partitions.
    "join_dpp_partitioned" -> ((s, d) => {
      val dir = tmp(d, "events_day_part")
      graft.Tables.events(s, d)
        .select(col("event_id"), col("value"),
          date_format(col("ts"), "yyyyMMdd").cast("int").as("p_day"))
        .repartition(col("p_day"))
        .write.mode("overwrite").partitionBy("p_day").parquet(dir)
      val cal = s.range(0, 30)
        .select((lit(20240101L) + col("id")).cast("int").as("p_day"))
        .withColumn("dow", dayofweek(to_date(col("p_day").cast("string"), "yyyyMMdd")))
        .filter(col("dow").isin(1, 7)) // Sunday=1, Saturday=7
        .select("p_day")
      s.read.parquet(dir).join(cal, Seq("p_day"))
        .groupBy("p_day")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_v"))
        .orderBy("p_day")
    }),

    // as-of/nearest: capture closest to a target instant per url-prefix
    // (cdx-server sort=closest consumer contract)
    "join_asof_closest" -> ((s, d) => {
      val target = "unix_micros(TIMESTAMP '1998-06-01 00:00:00')"
      val w = Window.partitionBy("prefix_key")
        .orderBy(col("diff_us"), col("id"))
      Cdx.df(s, d)
        .withColumn("prefix_key", split_part(col("urlkey"), lit("?"), lit(1)))
        .withColumn("diff_us", abs(col("epoch_us") - expr(target)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("prefix_key", "id", "ts", "diff_us")
        .orderBy("prefix_key")
    }),

    // As-of join WITH TOLERANCE via the union-window trick — the
    // scalable distributed as-of: instead of a range join (quadratic
    // blow-up risk) or a per-left-row subquery, UNION both sides tagged,
    // sort once per key by (time, side), and carry the latest right-side
    // row forward with a running struct-max — ZERO joins, one
    // urlkey-partitioned window. Semantics: each revisit resolves to the
    // most recent response at-or-before its timestamp for the same
    // query-stripped URL prefix (response sorts first on ties), but only
    // within a 180-day tolerance — older matches are stale and return
    // null, the asof-join backward-tolerance contract (pandas
    // merge_asof / QuestDB ASOF). Keyed on the prefix, not the full
    // urlkey: the fixture's qs is id-unique by construction, and the
    // prefix is the real revisit identity anyway (same page, any query).
    "join_asof_tolerance" -> ((s, d) => {
      val tolUs = 180L * 86400 * 1000000
      val c = Cdx.df(s, d)
        .withColumn("pkey", split_part(col("urlkey"), lit("?"), lit(1)))
      val tagged = c.filter(col("record_type") === "response")
        .select(col("pkey"), col("epoch_us"), col("id"), lit(0).as("side"))
        .unionByName(
          c.filter(col("record_type") === "revisit")
            .select(col("pkey"), col("epoch_us"), col("id"), lit(1).as("side")))
      val w = Window.partitionBy("pkey")
        .orderBy(col("epoch_us"), col("side"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val best = max(when(col("side") === 0,
        struct(col("epoch_us").as("e"), col("id").as("i")))).over(w)
      tagged
        .withColumn("best", best)
        .filter(col("side") === 1)
        .select(col("id").as("rev_id"), col("pkey"),
          when(col("epoch_us") - col("best.e") <= tolUs, col("best.i"))
            .as("resp_id"),
          when(col("epoch_us") - col("best.e") <= tolUs,
            col("epoch_us") - col("best.e")).as("gap_us"))
        .orderBy("rev_id")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "join_skip_existing" -> o(
      "SELECT DISTINCT filename FROM cdx m WHERE NOT EXISTS " +
        "(SELECT 1 FROM cdx f WHERE f.id % 8 < 6 AND f.filename = m.filename) ORDER BY filename"),
    // the oracle is the plain unsalted join: salting must not change the
    // result, only the shuffle layout (sum casts: DuckDB sum -> HUGEINT)
    "join_skew_salted" -> o(
      "SELECT c.hostword, d.host_captures, d.host_max_len, " +
        "count(*) AS joined_rows, CAST(sum(c.length) AS BIGINT) AS sum_len " +
        "FROM cdx c JOIN (SELECT hostword, count(*) AS host_captures, max(length) AS host_max_len " +
        "FROM cdx GROUP BY hostword) d USING (hostword) " +
        "GROUP BY c.hostword, d.host_captures, d.host_max_len ORDER BY c.hostword"),
    "join_revisit_resolve" -> o(
      "SELECT r.id AS revisit_id, o.id AS orig_id, r.urlkey AS revisit_key, o.url AS orig_url " +
        "FROM cdx r JOIN cdx o ON r.digest = o.digest " +
        "WHERE r.record_type = 'revisit' AND o.record_type = 'response' " +
        "ORDER BY revisit_id, orig_id"),
    "join_broadcast_dim" ->
      ("SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 6) AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name ORDER BY r_name"),
    "join_sortmerge_large" ->
      ("SELECT o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, " +
        "count(*) AS n_lines FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "join_bucketed_colocated" ->
      ("SELECT o_orderpriority, round(sum(l_quantity), 6) AS sum_qty, count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "join_semi" ->
      ("SELECT o_orderkey, o_orderpriority FROM orders WHERE EXISTS " +
        "(SELECT 1 FROM lineitem WHERE l_quantity > 45 AND l_orderkey = o_orderkey) " +
        "ORDER BY o_orderkey"),
    "join_full_outer" -> o(
      ", got AS (SELECT hostword, count(*) AS cnt FROM cdx GROUP BY hostword), " +
        "quota AS (SELECT * FROM (VALUES ('high', 100), ('low', 200), ('offline', 50)) " +
        "AS t(hostword, quota)) " +
        "SELECT coalesce(g.hostword, q.hostword) AS hostword, " +
        "coalesce(g.cnt, 0) AS cnt, CAST(coalesce(q.quota, -1) AS BIGINT) AS quota, " +
        "g.cnt IS NOT NULL AS crawled, q.quota IS NOT NULL AS configured " +
        "FROM got g FULL JOIN quota q USING (hostword) ORDER BY hostword"),
    // extra CTEs compose with the cdx prefix via a leading comma
    "join_range_block" -> o(
      ", keys AS (SELECT urlkey, row_number() OVER (ORDER BY urlkey) AS rn " +
        "FROM (SELECT DISTINCT urlkey FROM cdx)), " +
        "idx AS (SELECT (rn - 1) // 50 AS block, min(urlkey) AS start_key FROM keys GROUP BY block), " +
        "idx2 AS (SELECT block, start_key, lead(start_key) OVER (ORDER BY block) AS next_key FROM idx) " +
        "SELECT c.id, c.urlkey, i.block FROM cdx c JOIN idx2 i " +
        "ON c.id % 97 = 0 AND c.urlkey >= i.start_key AND (i.next_key IS NULL OR c.urlkey < i.next_key) " +
        "ORDER BY c.id"),
    // weekend selection recomputed independently (DuckDB dayofweek:
    // 0=Sunday, 6=Saturday); the partitioned layout must be invisible
    "join_dpp_partitioned" ->
      ("SELECT p_day, count(*) AS cnt, round(sum(value), 2) AS sum_v FROM " +
        "(SELECT strftime(ts, '%Y%m%d')::INT AS p_day, value FROM events) e " +
        "JOIN (SELECT (20240101 + unnest(range(0, 30)))::INT AS p_day) c USING (p_day) " +
        "WHERE dayofweek(strptime(p_day::VARCHAR, '%Y%m%d')) IN (0, 6) " +
        "GROUP BY p_day ORDER BY p_day"),
    // the declarative theta form — the bucket rewrite must be invisible
    "join_interval_bucket" ->
      ("WITH iv AS (SELECT i AS window_id, 1704067200 + i * 50400 AS lo, " +
        "1704067200 + i * 50400 + 2700 AS hi " +
        "FROM (SELECT unnest(range(0, 50)) AS i)), " +
        "ev AS (SELECT event_id, epoch_us(ts) // 1000000 AS ts_s, value FROM events) " +
        "SELECT window_id, count(*) AS cnt, round(sum(value), 2) AS sum_v " +
        "FROM ev JOIN iv ON ev.ts_s >= iv.lo AND ev.ts_s < iv.hi " +
        "GROUP BY window_id ORDER BY window_id"),
    "join_asof_closest" -> o(
      "SELECT prefix_key, id, ts, diff_us FROM (" +
        "SELECT split_part(urlkey, '?', 1) AS prefix_key, id, ts, " +
        "abs(epoch_us - epoch_us(TIMESTAMP '1998-06-01 00:00:00')) AS diff_us, " +
        "row_number() OVER (PARTITION BY split_part(urlkey, '?', 1) " +
        "ORDER BY abs(epoch_us - epoch_us(TIMESTAMP '1998-06-01 00:00:00')), id) AS rn " +
        "FROM cdx) WHERE rn = 1 ORDER BY prefix_key"),
    // same union-window replay; struct-field access on a NULL running
    // max yields NULL, which the CASE propagates — both engines agree
    "join_asof_tolerance" -> o(
      "SELECT id AS rev_id, pkey, " +
        "CASE WHEN epoch_us - (best).e <= 15552000000000 THEN (best).i END AS resp_id, " +
        "CASE WHEN epoch_us - (best).e <= 15552000000000 THEN epoch_us - (best).e END AS gap_us " +
        "FROM (SELECT *, max(CASE WHEN side = 0 THEN {'e': epoch_us, 'i': id} END) OVER " +
        "(PARTITION BY pkey ORDER BY epoch_us, side, id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best " +
        "FROM (SELECT split_part(urlkey, '?', 1) AS pkey, epoch_us, id, 0 AS side " +
        "FROM cdx WHERE record_type = 'response' " +
        "UNION ALL SELECT split_part(urlkey, '?', 1), epoch_us, id, 1 " +
        "FROM cdx WHERE record_type = 'revisit')) " +
        "WHERE side = 1 ORDER BY rev_id")
  )
}
