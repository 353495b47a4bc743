package graft.queries

import graft.{Cdx, QueryModule, Tables}
import graft.functions.Surt
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 projections/scalar functions + §2.3 filters, over the
  * synthetic CDX capture table ([[graft.Cdx]]) and `events`.
  */
object CdxOps extends QueryModule {

  private def o(sql: String): String = Cdx.duckCte + sql

  /** crawl-to-crawl diff over a (urlkey, ts, status) capture relation:
    * per urlkey, the LATEST capture in generation A (ts < cut) vs
    * generation B (ts >= cut), classified new / gone / changed /
    * unchanged by that latest status. The per-generation latest rides a
    * conditional max over the sortable LONG key ts*100000+status
    * (14-digit ts ~2e18 < int64 max; status < 1e3), so the buffer stays
    * primitive and the aggregation stays HashAggregate (a string key
    * demotes to SortAggregate — per-partition sorts the corpus doesn't
    * need); ties on (urlkey, ts) break on the higher status in BOTH
    * engines. Exposed as a helper so OperatorPropertiesSpec can drive a
    * planted fixture through every classification arm (the synthetic
    * corpus never plants all four at once). */
  def crawlDiff(captures: org.apache.spark.sql.DataFrame, cut: String): org.apache.spark.sql.DataFrame = {
    def genKey(cond: org.apache.spark.sql.Column) =
      max(when(cond, col("ts").cast("long") * 100000L + col("status")))
    captures
      .groupBy("urlkey")
      .agg(
        genKey(col("ts") < cut).as("ka"),
        genKey(col("ts") >= cut).as("kb"))
      .select(
        col("urlkey"),
        (col("ka") % 100000L).cast("int").as("status_a"),
        (col("kb") % 100000L).cast("int").as("status_b"),
        when(col("ka").isNull, "new")
          .when(col("kb").isNull, "gone")
          .when(col("ka") % 100000L === col("kb") % 100000L, "unchanged")
          .otherwise("changed").as("change"))
      .orderBy("urlkey")
  }

  /** cdx_revisit_generate body over a (id, urlkey, ts, url, digest)
    * response relation — a helper so OperatorPropertiesSpec can drive the
    * null-digest arm (the synthetic corpus's digests are all non-null).
    *
    * Shape (r13 rework): original-picking is a MERGEABLE min_by AGG +
    * equi-join, not a digest-partitioned window — the
    * cdc_compact_changelog idiom. The difference only shows under
    * mega-digest skew, which real crawls have (a global error page is
    * ONE digest with 10⁸ captures): a window must sort that digest's
    * whole history in one task, while the agg collapses it map-side to
    * one (url, ts, id) row per digest before the shuffle, and AQE's
    * skew-join split handles the join-side hot partition. SkewSpec's
    * hot-digest ladder pins the exponent. Output is unchanged — the
    * original is the (ts, id)-first capture per digest; null digests
    * take a synthetic singleton key (never deduped, warcio/pywb never
    * emit a revisit without a payload digest). */
  def revisitGenerate(responses: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val keyed = responses
      .select(col("id"), col("urlkey"), col("ts"), col("url"), col("digest"))
      .withColumn("dkey", coalesce(col("digest"), concat(lit(" null:"), col("id"))))
    val orig = keyed.groupBy("dkey")
      .agg(min_by(
        struct(col("url").as("url"), col("ts").as("ts"), col("id").as("id")),
        struct(col("ts"), col("id"))).as("o"))
    keyed.join(orig, "dkey")
      .select(col("id"), col("urlkey"), col("ts"), col("digest"),
        when(col("id") === col("o.id"), "response").otherwise("revisit").as("out_type"),
        when(col("id") =!= col("o.id"), col("o.url")).as("refers_to_url"),
        when(col("id") =!= col("o.id"), col("o.ts")).as("refers_to_ts"))
      .orderBy("id")
  }

  override def queries: Map[String, QFn] = Map(
    // ---- §2.2 projections / scalars ----
    "proj_cdx_fields" -> ((s, d) =>
      Cdx.df(s, d)
        .select("urlkey", "ts", "url", "mime", "status", "digest", "length", "filename", "id")
        .orderBy("id")),

    "surt_key" -> ((s, d) => {
      // the composed path's non-ASCII arm delegates to surt_key_native
      graft.functions.GraftFunctions.register(s)
      Cdx.df(s, d).select(col("id"), col("url"), Surt.surtKey(col("url")).as("urlkey"))
        .orderBy("id")
    }),

    // same op through the native codegen Expression (SURVEY §4 item 1);
    // oracle identical to surt_key -> cross-checks expr vs DuckDB
    "surt_key_native" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Cdx.df(s, d).selectExpr("id", "url", "surt_key_native(url) AS urlkey")
        .orderBy("id")
    }),

    // base32(sha1) digest parity with pywb's WARC-Payload-Digest encoding.
    // Oracle-exempt (DuckDB has no base32); NativeExprSpec holds goldens.
    "digest_b32" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Cdx.df(s, d)
        .selectExpr("id", "base32(unhex(sha1(url))) AS digest_b32")
        .orderBy("id")
    }),

    "surt_host_reverse" -> ((s, d) =>
      Cdx.df(s, d).select(col("host")).distinct()
        .select(col("host"), Surt.hostReverse(col("host")).as("rhost"))
        .orderBy("host")),

    "surt_query_sort" -> ((s, d) =>
      Cdx.df(s, d).select(col("id"), col("qs"), Surt.querySort(col("qs")).as("qsorted"))
        .orderBy("id")),

    "url_parse" -> ((s, d) =>
      Cdx.df(s, d).select(
        col("id"),
        parse_url(col("url"), lit("HOST")).as("u_host"),
        parse_url(col("url"), lit("PATH")).as("u_path"),
        parse_url(col("url"), lit("QUERY")).as("u_query"))
        .orderBy("id")),

    "ts_14digit" -> ((s, d) =>
      Cdx.df(s, d).select(
        col("id"), col("ts"),
        unix_micros(to_timestamp(col("ts"), "yyyyMMddHHmmss")).as("roundtrip_epoch_us"))
        .orderBy("id")),

    "digest_sha1" -> ((s, d) =>
      Cdx.df(s, d).select(col("id"), sha2(col("url"), 256).as("url_digest"), col("digest"))
        .orderBy("id")),

    "json_pack_cdxj" -> ((s, d) =>
      Cdx.df(s, d).selectExpr("id", s"${cdxjJsonSpark} AS json")
        .selectExpr("id", "json")
        .orderBy("id")),

    "json_extract_cdxj" -> ((s, d) =>
      Cdx.df(s, d)
        .selectExpr("id", s"${cdxjJsonSpark} AS json")
        .selectExpr(
          "id",
          "from_json(json, 'url STRING, mime STRING, status STRING, digest STRING, length STRING, filename STRING') AS j")
        .selectExpr("id", "j.url AS url", "j.mime AS mime", "j.status AS status_s", "j.length AS length_s")
        .orderBy("id")),

    "split_cdx_line" -> ((s, d) =>
      Cdx.df(s, d)
        .selectExpr("id", s"urlkey || ' ' || ts || ' ' || ${cdxjJsonSpark} AS line")
        .select(col("id") +: graft.Cdx.lineCols(col("line"), ("k", "t", "j")): _*)
        .orderBy("id")),

    "status_class" -> ((s, d) =>
      Cdx.df(s, d).selectExpr(
        "id", "status",
        "CAST(floor(status / 100) AS INT) AS cls",
        "CAST(floor(status / 100) AS INT) || 'xx' AS cls_label")
        .orderBy("id")),

    "mime_norm" -> ((s, d) =>
      Cdx.df(s, d).selectExpr(
        "id", "mime",
        "lower(trim(regexp_extract(mime, '^[^;]+', 0))) AS mime_norm")
        .orderBy("id")),

    "props_map" -> ((s, d) =>
      Tables.t(s, d, "events")
        .select(
          col("event_id"),
          element_at(from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)), "k").as("k_str"))
        .orderBy("event_id")),

    // ---- §2.3 filters ----
    "filter_record_type" -> ((s, d) =>
      Cdx.df(s, d).filter(col("record_type").isin("response", "revisit"))
        .select("id", "record_type", "url").orderBy("id")),

    "filter_status" -> ((s, d) =>
      Cdx.df(s, d).filter(col("status").between(200, 399))
        .select("id", "status").orderBy("id")),

    "filter_regex" -> ((s, d) =>
      Cdx.df(s, d).filter(col("mime").rlike("(?i)(html|json)"))
        .select("id", "mime").orderBy("id")),

    "filter_prefix" -> ((s, d) =>
      Cdx.df(s, d).filter(col("urlkey").startsWith("org,example,medium)/order/1"))
        .select("id", "urlkey", "ts").orderBy("urlkey", "ts", "id")),

    "filter_ts_range" -> ((s, d) =>
      Cdx.df(s, d).filter(col("ts") >= "19970101000000" && col("ts") < "19990101000000")
        .select("id", "ts").orderBy("id")),

    "filter_null_safe" -> ((s, d) =>
      Cdx.df(s, d).filter(col("redirect") <=> col("robotflags"))
        .selectExpr("id", "coalesce(redirect, '-') AS redirect_c", "coalesce(robotflags, '-') AS robot_c")
        .orderBy("id")),

    // crawl-to-crawl diff — "what changed since the last crawl", the
    // operational query an archive runs after every ingest: per urlkey,
    // compare the LATEST capture in generation A (ts < cut) against
    // generation B (ts >= cut) and classify new / gone / changed /
    // unchanged (by latest HTTP status — "did the page start erroring /
    // redirecting since last crawl", the crawl-health signal; status
    // collides across generations so BOTH change arms are live under the
    // sf0.01+ oracle, unlike response length whose ~uniform 90k values
    // never repeat). Shape: ONE partial+final hash aggregation — see
    // [[CdxOps.crawlDiff]]; a planted 4-arm golden lives in
    // OperatorPropertiesSpec. At 100 TB this is a single shuffle of
    // (urlkey, 2 longs).
    "crawl_diff" -> ((s, d) => crawlDiff(Cdx.df(s, d), cut = "19960101000000")),

    // pywb access control (.aclj): longest-SURT-prefix-match rule
    // application — the serving-side policy sweep every public archive
    // runs before a capture leaves the building. The fixture plants the
    // contract's one subtle case: a path-level allow INSIDE a host-level
    // block (`…urgent)/order/1` beats `…urgent)`), so most-specific-wins
    // is pinned, not just any-match. Plan shape: a length-descending
    // coalesce(when(startswith)) chain — pure map-side codegen, zero
    // shuffles/joins (see [[graft.CdxServer.aclApply]]); the oracle
    // replays it as a starts_with-join + longest-prefix row_number.
    "cdx_acl_policy" -> ((s, d) =>
      graft.CdxServer.aclApply(
        Cdx.df(s, d), col("urlkey"), aclRules, default = "allow")
        .select("id", "urlkey", "rule_prefix", "access")
        .orderBy("id")),

    // RFC 9309 robots.txt parse: comment/blank stripping, case-folded
    // directives, stacked User-agent groups via a lag+running-sum window,
    // pre-group and empty rules dropped. Output is the flattened
    // auditable rule table; the oracle replays the whole grammar in SQL.
    "robots_parse" -> ((s, _) => {
      import s.implicits._
      graft.ops.Robots.parse(
        graft.ops.Robots.fixture.toDF("host", "txt"))
        .orderBy("host", "ln", "agent")
    }),

    // robots.txt SITEMAP DISCOVERY — how crawlers learn sitemap URLs
    // (then Sitemap.expand walks index -> urlsets -> frontier): the
    // group-independent `Sitemap:` directive, case-insensitive, spaced
    // or not, cross-host CDN targets legal; hosts without one are the
    // negative arm. One regexp pass per host file, O(hosts).
    "robots_sitemaps" -> ((s, _) => {
      import s.implicits._
      graft.ops.Robots.sitemaps(
        graft.ops.Robots.sitemapFixture.toDF("host", "txt"))
        .orderBy("host", "sitemap")
    }),

    // RFC 9309 verdict for every capture: agent-specific group beats *,
    // longest path prefix wins, allow beats disallow at equal length,
    // no rule / no robots.txt => allow. Captures join rules on HOST
    // equality (prefix match as join residual) and the winner window
    // keys (host, id) so it reuses the join exchange — one corpus
    // shuffle total (see [[graft.ops.Robots]] scaladoc).
    "robots_check" -> ((s, d) => {
      import s.implicits._
      graft.ops.Robots.check(
        Cdx.df(s, d).selectExpr("id", "host", "path || '?' || qs AS upath"),
        graft.ops.Robots.fixture.toDF("host", "txt"),
        agent = "graftbot")
        .orderBy("id")
    }),

    // The COMPOSED policy gate — "may this capture be served?": pywb
    // .aclj access control (map-side longest-prefix chain, rides the
    // scan for free) AND the RFC 9309 robots verdict, in ONE plan. The
    // ACL verdict is carried THROUGH robots_check's join+window via the
    // keep columns, so the composition still costs exactly one corpus
    // shuffle — not a verdict-join on id.
    "cdx_policy_gate" -> ((s, d) => {
      import s.implicits._
      val acl = graft.CdxServer.aclApply(
        Cdx.df(s, d), col("urlkey"), aclRules, default = "allow")
        .selectExpr("id", "host", "urlkey", "access", "path || '?' || qs AS upath")
      graft.ops.Robots.check(
        acl, graft.ops.Robots.fixture.toDF("host", "txt"),
        agent = "graftbot", keep = Seq("urlkey", "access"))
        .select(col("id"), col("urlkey"), col("access"), col("allowed"),
          (col("access") === "allow" && col("allowed")).as("servable"))
        .orderBy("id")
    }),

    // Politeness driven by the POLICY surface, not a constant: per-host
    // crawl delays come from robots.txt `Crawl-delay` (the de-facto
    // extension; [[graft.ops.Robots.crawlDelays]] — specific group beats
    // `*`, first delay wins, non-numeric and pre-group delays ignored,
    // absent → 1 s default), then the closed-form schedule
    // (crawl_politeness's window algebra) runs under those delays. The
    // delay table is O(hosts) and broadcasts; the schedule still costs
    // ONE corpus shuffle on host. The fixture grants 2 s (specific
    // beats the * group's 10), 5 s (lowercase directive), and three
    // default arms (no file / non-numeric / pre-group) — all live.
    "crawl_politeness_robots" -> ((s, d) => {
      import s.implicits._
      val delays = graft.ops.Robots.crawlDelays(
        graft.ops.Robots.fixture.toDF("host", "txt"),
        agent = "graftbot", defaultSec = politeDefaultSec)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("host").orderBy("epoch_us", "id")
      Cdx.df(s, d)
        .join(broadcast(delays), Seq("host"), "left")
        .withColumn("delay_us",
          coalesce(col("delay_sec"), lit(politeDefaultSec)) * 1000000L)
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .withColumn("sched_us",
          col("delay_us") * col("rn") +
            max(col("epoch_us") - col("delay_us") * col("rn")).over(
              w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select(col("id"), col("host"), col("epoch_us"), col("delay_us"),
          col("sched_us"), (col("sched_us") - col("epoch_us")).as("wait_us"))
        .orderBy("id")
    }),

    // The composed RECRAWL SCHEDULER — what a crawler actually runs:
    // crawl_change_rate's per-URL counters decide each URL's priority
    // class and desired next-fetch time (last capture + a class-keyed
    // recrawl interval; Cho & Garcia-Molina's uniform-allocation lesson:
    // fast-changing pages get short intervals, 'new' single-capture URLs
    // explore first), and crawl_politeness_robots' closed window form
    // serializes them under each host's robots Crawl-delay. Exchanges:
    // the lag window and the per-urlkey rollup share ONE urlkey exchange
    // (the crawl_change_rate shape), the robots delays broadcast, and
    // the schedule window is the single host shuffle. Fully
    // DuckDB-oracled: both building blocks already have closed forms.
    "crawl_recrawl_schedule" -> ((s, d) => {
      import s.implicits._
      val delays = graft.ops.Robots.crawlDelays(
        graft.ops.Robots.fixture.toDF("host", "txt"),
        agent = "graftbot", defaultSec = politeDefaultSec)
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy("urlkey").orderBy("ts", "id")
      val rates = Cdx.df(s, d)
        .withColumn("ver", concat(col("digest"), lit(":"),
          ((col("id") % 13) % 3).cast("string")))
        .withColumn("prev_ver", lag(col("ver"), 1).over(wk))
        .groupBy("urlkey")
        .agg(
          min(col("host")).as("host"), // host is functionally 1:1 with urlkey
          max(col("epoch_us")).as("last_us"),
          sum(when(col("prev_ver").isNotNull, 1L).otherwise(0L)).as("n_pairs"),
          sum(when(col("prev_ver").isNotNull && col("ver") =!= col("prev_ver"), 1L)
            .otherwise(0L)).as("n_changed"))
      val classed = rates
        .withColumn("change_class",
          when(col("n_pairs") === 0, "new")
            .when(col("n_changed") * 10 >= col("n_pairs") * 8, "fast")
            .when(col("n_changed") * 10 >= col("n_pairs") * 3, "medium")
            .otherwise("slow"))
        .withColumn("priority",
          when(col("change_class") === "new", 0)
            .when(col("change_class") === "fast", 1)
            .when(col("change_class") === "medium", 2)
            .otherwise(3).cast("int"))
        .withColumn("desired_us", col("last_us") +
          when(col("change_class") === "new", lit(RecrawlNewUs))
            .when(col("change_class") === "fast", lit(RecrawlFastUs))
            .when(col("change_class") === "medium", lit(RecrawlMediumUs))
            .otherwise(lit(RecrawlSlowUs)))
      val wh = org.apache.spark.sql.expressions.Window
        .partitionBy("host").orderBy("priority", "desired_us", "urlkey")
      classed
        .join(broadcast(delays), Seq("host"), "left")
        .withColumn("delay_us",
          coalesce(col("delay_sec"), lit(politeDefaultSec)) * 1000000L)
        .withColumn("rn", row_number().over(wh).cast("bigint"))
        .withColumn("sched_us",
          col("delay_us") * col("rn") +
            max(col("desired_us") - col("delay_us") * col("rn")).over(
              wh.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select(col("urlkey"), col("host"), col("change_class"), col("priority"),
          col("n_pairs"), col("last_us"), col("desired_us"), col("delay_us"), col("sched_us"))
        .orderBy("urlkey")
    }),

    // The deduplicating indexer's revisit emission — the INVERSE of
    // join_revisit_resolve: within each payload digest, the time-first
    // response capture is stored; every later identical capture becomes a
    // `revisit` row carrying WARC-Refers-To-Target-URI/-Date of the
    // original (warcio/pywb dedup contract; reference recon
    // indexwarcsjob.py revisit rows, SURVEY §1.2). Original-picking is a
    // mergeable min_by agg + digest equi-join (see revisitGenerate's
    // scaladoc for the mega-digest skew rationale); digest-less
    // responses are NOT deduped (warcio/pywb never emit a revisit
    // without a payload digest) — each takes a synthetic singleton key.
    "cdx_revisit_generate" -> ((s, d) =>
      revisitGenerate(Cdx.df(s, d).where(col("record_type") === "response"))),

    // STORAGE ACCOUNTING for the revisit-dedup family — the report an
    // operator reads before/after enabling sink_warc_revisit_write:
    // per WARC shard, captures vs distinct payloads, logical bytes
    // (every capture's length) vs stored bytes (only globally-original
    // captures keep their bytes; the original lives in ONE shard, so
    // dedup skews savings ACROSS shards — exactly what this surfaces),
    // and the percent saved. Same min_by-agg + join shape as
    // revisitGenerate (mega-digest-safe); the rollup is |shards| rows.
    "obs_dedup_savings" -> ((s, d) => {
      // dkey coalesces null digests to a synthetic singleton (the
      // revisitGenerate arm): digest-less captures are their OWN
      // originals — a bare equi-join would drop them from the ledger
      val resp = Cdx.dfFan(s, d).where(col("record_type") === "response")
        .select(col("id"), col("ts"), col("filename"), col("length"), col("digest"),
          coalesce(col("digest"), concat(lit(" null:"), col("id"))).as("dkey"))
      val orig = resp.groupBy("dkey")
        .agg(min_by(col("id"), struct(col("ts"), col("id"))).as("orig_id"))
      resp.join(orig, "dkey")
        .groupBy("filename")
        .agg(count(lit(1)).as("n_captures"),
          countDistinct("digest").as("n_digests"),
          sum("length").as("logical_bytes"),
          sum(when(col("id") === col("orig_id"), col("length")).otherwise(0L))
            .as("stored_bytes"))
        .withColumn("pct_saved",
          round(lit(100.0) * (col("logical_bytes") - col("stored_bytes")) /
            col("logical_bytes"), 4))
        .orderBy("filename")
    }),

    // URL-AGNOSTIC dedup audit — the observability twin obs_dedup_savings
    // implies: per payload digest, surface (a) DANGLING revisits — revisit
    // rows whose digest has NO stored response original (server-side churn:
    // a Date-header-bearing digest recorded at crawl time no longer matches
    // any stored content — replay of these revisits will 404), and
    // (b) CROSS-URL duplicates — one digest served under >1 urlkey (the
    // duplicates a URL-keyed dedup pass structurally misses; the case for
    // digest-keyed revisit writing). ONE digest aggregation, fully
    // DuckDB-oracled; output is only the mismatch rows, so the report
    // stays audit-sized at 100 TB (healthy digests never leave the agg).
    "url_agnostic_dedup" -> ((s, d) =>
      Cdx.dfFan(s, d)
        .where(col("digest").isNotNull &&
          col("record_type").isin("response", "revisit"))
        .groupBy("digest")
        .agg(
          count(when(col("record_type") === "response", 1)).as("n_responses"),
          count(when(col("record_type") === "revisit", 1)).as("n_revisits"),
          countDistinct("urlkey").as("n_urlkeys"),
          // ts min/max over the BIGINT form: a string min/max buffer is
          // not hash-agg-mutable and would demote the whole aggregation
          // to SortAggregate — a corpus SORT at 100 TB. 14-digit ts has
          // no leading zero, so the round trip is exact (PlanSpec pins
          // the HashAggregate plan).
          min(col("ts").cast("bigint")).cast("string").as("first_ts"),
          max(col("ts").cast("bigint")).cast("string").as("last_ts"))
        .withColumn("dangling_revisit",
          col("n_responses") === 0 && col("n_revisits") > 0)
        .withColumn("cross_url", col("n_urlkeys") > 1)
        .filter(col("dangling_revisit") || col("cross_url"))
        .orderBy("digest")),

    // publicsuffix.org eTLD+1 over the corpus's DISTINCT hosts plus the
    // planted precedence fixture — wildcard, exception, ccSLD-style
    // multi-label suffix, default-* (see [[graft.ops.Psl]]). At corpus
    // scale the per-capture application is a broadcast of THIS bounded
    // host->domain table; the key measures the distinct-host derivation.
    "url_registered_domain" -> ((s, d) => {
      import s.implicits._
      // distinct AFTER the union: the oracle's UNION dedupes, so a
      // fixture host overlapping the corpus must not double a row here
      val hosts = Cdx.df(s, d).select("host")
        .unionByName(graft.ops.Psl.fixtureHosts.toDF("host"))
        .distinct()
      graft.ops.Psl.registeredDomain(hosts).orderBy("host")
    }),

    // DOMAIN-LEVEL WEB-GRAPH collapse — the public webgraph release
    // shape above the URL-level feed (html_links): edges roll up to PSL
    // REGISTERED domains (naive last-two-labels is wrong for ccSLDs,
    // wildcards, and exceptions — the reason this routes through
    // ops.Psl), endpoints with no registrable domain (the host IS a
    // public suffix) drop their edges, weight = link count. Shape: PSL
    // runs on the DISTINCT endpoint hosts only; the edge corpus takes
    // two broadcast host→domain joins + ONE (src, dst) hash agg —
    // a billion-edge graph never shuffles on anything but the final
    // bounded (domain, domain) key. Planted dst hosts cycle the full
    // PSL precedence fixture, so wildcard/exception/suffix-null arms
    // all reach the collapsed graph (3 of 8 dst classes legitimately
    // drop — the oracle proves exactly which).
    "graph_domain_collapse" -> ((s, d) => {
      // dfFan (guide §2.5): the edge derive, BOTH broadcast host→domain
      // joins and the partial (src,dst) aggregation all sit below the
      // first exchange — single-task on the unfanned scan. Exact count
      // agg + broadcast joins ⇒ partition-independent result.
      val edges = Cdx.dfFan(s, d).where(col("record_type") === "response")
        .select(col("host").as("src_host"),
          element_at(
            typedLit(graft.ops.Psl.fixtureHosts),
            (col("id") % 8 + 1).cast("int")).as("dst_host"))
      val hosts = edges.select(col("src_host").as("host"))
        .unionByName(edges.select(col("dst_host").as("host"))).distinct()
      val reg = graft.ops.Psl.registeredDomain(hosts)
        .select(col("host"), col("registered_domain"))
      edges
        .join(broadcast(reg.withColumnRenamed("host", "src_host")
          .withColumnRenamed("registered_domain", "src_domain")), "src_host")
        .join(broadcast(reg.withColumnRenamed("host", "dst_host")
          .withColumnRenamed("registered_domain", "dst_domain")), "dst_host")
        .where(col("src_domain").isNotNull && col("dst_domain").isNotNull)
        .groupBy("src_domain", "dst_domain")
        .agg(count(lit(1)).as("n_links"))
        .orderBy("src_domain", "dst_domain")
    }),

    // C4-style broadcast URL/domain blocklist gate (Raffel et al. 2020
    // §2.2): registered-domain membership through the FULL public-suffix
    // precedence (listing low.example.org blocks every www.low.… capture;
    // the planted captures keep the exception-beats-wildcard arm live)
    // plus a lowercased-URL substring arm. Corpus side is one broadcast
    // join + a map-side HOF — the PSL window runs on distinct hosts only
    // ([[graft.ops.Blocklist]]).
    "filter_url_blocklist" -> ((s, d) => {
      import s.implicits._
      val caps = Cdx.df(s, d).select("id", "host", "url")
        .unionByName(blocklistPlants.toDF("id", "host", "url"))
      graft.ops.Blocklist.gate(caps)
        .select("id", "host", "blocked_domain", "blocked_term", "keep")
        .orderBy("id")
    })
  )

  /** Planted captures keeping the blocklist gate's PSL precedence arms
    * live (the synthetic corpus serves only *.example.org hosts): the
    * exception domain itself, a subdomain of it (blocks THROUGH the
    * exception rule), a wildcard-suffix host (not blocked), and a
    * default-* host (not blocked). Shared verbatim with the oracle. */
  private val blocklistPlants = Seq(
    (-1L, "free.wild.test", "http://free.wild.test/x"),
    (-2L, "sub.free.wild.test", "http://sub.free.wild.test/x"),
    (-3L, "a.b.wild.test", "http://a.b.wild.test/x"),
    (-4L, "unknown.zz", "http://unknown.zz/x"))

  private def blocklistPlantsDuck: String =
    blocklistPlants.map { case (i, h, u) => s"($i, '$h', '$u')" }.mkString(", ")

  private def blockDomainsDuck: String =
    graft.ops.Blocklist.fixtureDomains.mkString("('", "', '", "')")

  private def blockTermsDuck: String =
    graft.ops.Blocklist.fixtureUrlTerms
      .map(t => s"contains(lower(c.url), '$t')").mkString(" OR ")

  /** Shared DuckDB CTE chain for the PSL registered-domain replay
    * (hosts → rules → lab → cand → m → best); `hostsSel` PARAMETERIZES
    * the host universe (never string-replaced — a reformat would
    * silently no-op a replace). Callers append their own final SELECT
    * over `lab`/`best`. */
  private def pslChainDuck(hostsSel: String): String =
    s", hosts AS ($hostsSel), " +
      "rules(pattern, is_exc, rule_n, ps_n) AS (VALUES " + graft.ops.Psl.rulesDuck() + "), " +
      "lab AS (SELECT host, string_split(host, '.') AS labels, " +
      "len(string_split(host, '.')) AS n FROM hosts), " +
      "cand AS (SELECT host, n, i, array_to_string(labels[i:], '.') AS suffix, " +
      "CASE WHEN i < n THEN '*.' || array_to_string(labels[i+1:], '.') END AS wild " +
      "FROM (SELECT *, unnest(range(1, n+1)) AS i FROM lab)), " +
      "m AS (SELECT c.host, r.is_exc, r.rule_n, r.ps_n, r.pattern FROM cand c " +
      "JOIN rules r ON c.suffix = r.pattern OR c.wild = r.pattern), " +
      "best AS (SELECT host, ps_n FROM (SELECT *, row_number() OVER (" +
      "PARTITION BY host ORDER BY is_exc DESC, rule_n DESC, pattern DESC) AS rn FROM m) " +
      "WHERE rn = 1)"

  /** ONE definition of the no-grant crawl delay — used by the Spark key
    * (crawlDelays default + the non-fixture-host coalesce) AND the
    * DuckDB oracle, so the three sites cannot drift apart. */
  private val politeDefaultSec = 1L

  /** recrawl intervals per change class (µs): fast pages daily, slow
    * monthly, never-reobserved URLs explored within 2 days — the
    * uniform-allocation-beats-proportional lesson applied as a bounded
    * class ladder. KEEP IN LOCKSTEP with the crawl_recrawl_schedule
    * oracle literals. */
  private val RecrawlNewUs = 2L * 86400000000L
  private val RecrawlFastUs = 1L * 86400000000L
  private val RecrawlMediumUs = 7L * 86400000000L
  private val RecrawlSlowUs = 30L * 86400000000L

  // ---- robots.txt oracle scaffolding (see graft.ops.Robots) ----

  /** Directive lines with group ids — DuckDB replay of Robots.directives
    * (string_split + unnest(range) for 1-based positions, then the same
    * lag + running-sum group assignment). The visible-directive list is
    * a PARAMETER (not post-hoc string surgery on the SQL, which would
    * silently no-op if the literal were ever reformatted). */
  private def robotsGroupedFor(directiveList: String): String =
    s"""SELECT host, ln, directive, value,
      | sum(CASE WHEN directive = 'user-agent' AND coalesce(prev_ua, FALSE) = FALSE
      |     THEN 1 ELSE 0 END)
      |   OVER (PARTITION BY host ORDER BY ln ROWS UNBOUNDED PRECEDING) AS block
      |FROM (
      | SELECT *, lag(directive = 'user-agent') OVER (PARTITION BY host ORDER BY ln) AS prev_ua
      | FROM (
      |  SELECT host, ln,
      |    lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS directive,
      |    trim(regexp_extract(line, '^[A-Za-z-]+\\s*:\\s*(.*)$$', 1)) AS value
      |  FROM (
      |   SELECT host, i AS ln, trim(regexp_replace(parts[i], '#.*$$', '')) AS line
      |   FROM (SELECT host, string_split(txt, chr(10)) AS parts,
      |                unnest(range(1, len(string_split(txt, chr(10)))+1)) AS i
      |         FROM ${graft.ops.Robots.fixtureDuck})
      |  ) WHERE line <> ''
      | ) WHERE directive IN $directiveList
      |)""".stripMargin

  private def robotsGrouped: String =
    robotsGroupedFor("('user-agent','allow','disallow')")

  /** the WIDENED grammar view crawlDelays parses through — crawl-delay
    * lines visible, so one between stacked User-agent lines correctly
    * ends the stack (invisible to the strict [[robotsGrouped]] view) */
  private def robotsGroupedWide: String =
    robotsGroupedFor("('user-agent','allow','disallow','crawl-delay')")

  /** per-host granted Crawl-delay for graftbot: specific group beats *,
    * first (min ln) numeric delay of the chosen group wins */
  private def robotsDelays: String =
    s"""SELECT host, delay_sec FROM (
       | SELECT c.host, CAST(c.value AS BIGINT) AS delay_sec,
       |        row_number() OVER (PARTITION BY c.host ORDER BY c.ln) AS rn
       | FROM ($robotsGroupedWide) c
       | JOIN (SELECT host, block, lower(value) AS agent FROM ($robotsGroupedWide)
       |       WHERE directive = 'user-agent') a
       |   ON c.host = a.host AND c.block = a.block
       | JOIN (SELECT host, max(CASE WHEN lower(value) = 'graftbot' THEN 1 ELSE 0 END) AS spec
       |       FROM ($robotsGroupedWide) WHERE directive = 'user-agent' GROUP BY host) h
       |   ON c.host = h.host
       | WHERE c.directive = 'crawl-delay' AND regexp_matches(c.value, '^[0-9]{1,6}$$')
       |   AND c.block > 0
       |   AND a.agent = CASE WHEN h.spec = 1 THEN 'graftbot' ELSE '*' END
       |) WHERE rn = 1""".stripMargin

  private def robotsAgents: String =
    s"SELECT host, block, lower(value) AS agent FROM ($robotsGrouped) WHERE directive = 'user-agent'"

  private def robotsRules: String =
    s"SELECT host, block, ln, directive AS rule, value AS path FROM ($robotsGrouped) " +
      "WHERE directive IN ('allow','disallow') AND value <> '' AND block > 0"

  private def robotsApplicable: String =
    s"""SELECT g.host, g.rule, g.path FROM
       | (SELECT a.host, a.agent, r.rule, r.path
       |  FROM ($robotsRules) r JOIN ($robotsAgents) a ON r.host = a.host AND r.block = a.block) g
       | JOIN (SELECT host, max(CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END) AS spec
       |       FROM ($robotsAgents) GROUP BY host) h ON g.host = h.host
       | WHERE g.agent = CASE WHEN h.spec = 1 THEN 'graftbot' ELSE '*' END""".stripMargin

  private def aclRulesDuck: String =
    aclRules.map { case (p, a) => s"('$p', '$a')" }.mkString(", ")

  /** ACL fixture rules (prefix, access) — see `cdx_acl_policy`. */
  private val aclRules: Seq[(String, String)] = Seq(
    "org,example,urgent)" -> "block",
    "org,example,urgent)/order/1" -> "allow",
    "org,example,low)" -> "exclude",
    "org,example,notspecified)/order/9" -> "block")

  /** CDXJ JSON payload expression — identical Spark SQL and DuckDB forms. */
  private val cdxjJsonSpark =
    "to_json(named_struct('url', url, 'mime', mime, 'status', CAST(status AS STRING), " +
      "'digest', digest, 'length', CAST(length AS STRING), 'filename', filename))"
  private val cdxjJsonDuck =
    "to_json(struct_pack(url := url, mime := mime, status := status::VARCHAR, " +
      "digest := digest, length := length::VARCHAR, filename := filename))"

  override def oracleSql: Map[String, String] = Map(
    "proj_cdx_fields" -> o(
      "SELECT urlkey, ts, url, mime, status, digest, length, filename, id FROM cdx ORDER BY id"),
    "surt_key" -> o("SELECT id, url, urlkey FROM cdx ORDER BY id"),
    "surt_key_native" -> o("SELECT id, url, urlkey FROM cdx ORDER BY id"),
    "surt_host_reverse" -> o(
      "SELECT DISTINCT host, array_to_string(list_reverse(string_split(regexp_replace(host, '^www\\.', ''), '.')), ',') AS rhost " +
        "FROM cdx ORDER BY host"),
    "surt_query_sort" -> o(
      "SELECT id, qs, array_to_string(list_sort(string_split(qs, '&')), '&') AS qsorted FROM cdx ORDER BY id"),
    "url_parse" -> o(
      "SELECT id, host AS u_host, path AS u_path, qs AS u_query FROM cdx ORDER BY id"),
    "ts_14digit" -> o(
      "SELECT id, ts, epoch_us AS roundtrip_epoch_us FROM cdx ORDER BY id"),
    "digest_sha1" -> o(
      "SELECT id, sha256(url) AS url_digest, digest FROM cdx ORDER BY id"),
    "json_pack_cdxj" -> o(
      s"SELECT id, $cdxjJsonDuck AS json FROM cdx ORDER BY id"),
    "json_extract_cdxj" -> o(
      "SELECT id, url, mime, status::VARCHAR AS status_s, length::VARCHAR AS length_s FROM cdx ORDER BY id"),
    "split_cdx_line" -> o(
      s"SELECT id, urlkey AS k, ts AS t, $cdxjJsonDuck AS j FROM cdx ORDER BY id"),
    "status_class" -> o(
      "SELECT id, status, CAST(floor(status / 100) AS INT) AS cls, " +
        "CAST(floor(status / 100) AS INT) || 'xx' AS cls_label FROM cdx ORDER BY id"),
    "mime_norm" -> o(
      "SELECT id, mime, lower(trim(regexp_extract(mime, '^[^;]+'))) AS mime_norm FROM cdx ORDER BY id"),
    "props_map" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events ORDER BY event_id",
    "filter_record_type" -> o(
      "SELECT id, record_type, url FROM cdx WHERE record_type IN ('response', 'revisit') ORDER BY id"),
    "filter_status" -> o(
      "SELECT id, status FROM cdx WHERE status BETWEEN 200 AND 399 ORDER BY id"),
    "filter_regex" -> o(
      "SELECT id, mime FROM cdx WHERE regexp_matches(mime, '(?i)(html|json)') ORDER BY id"),
    "filter_prefix" -> o(
      "SELECT id, urlkey, ts FROM cdx WHERE urlkey LIKE 'org,example,medium)/order/1%' ORDER BY urlkey, ts, id"),
    "filter_ts_range" -> o(
      "SELECT id, ts FROM cdx WHERE ts >= '19970101000000' AND ts < '19990101000000' ORDER BY id"),
    // starts_with-join + longest-prefix row_number replay of the when-chain;
    // an unmatched capture left-joins to exactly one all-NULL rule row,
    // so rn = 1 selects it and coalesce applies the default
    "cdx_acl_policy" -> o(
      "SELECT id, urlkey, rule_prefix, access FROM (" +
        "SELECT c.id, c.urlkey, r.prefix AS rule_prefix, " +
        "coalesce(r.access, 'allow') AS access, " +
        "row_number() OVER (PARTITION BY c.id ORDER BY length(r.prefix) DESC) AS rn " +
        "FROM cdx c LEFT JOIN (VALUES " + aclRulesDuck + ") AS r(prefix, access) " +
        "ON starts_with(c.urlkey, r.prefix)) WHERE rn = 1 ORDER BY id"),
    // both policy replays joined per id: the acl starts_with-join winner and the
    // robots longest-prefix winner, then the AND
    "cdx_policy_gate" -> o(
      "SELECT a.id, a.urlkey, a.access, r.allowed, " +
        "(a.access = 'allow' AND r.allowed) AS servable FROM (" +
        "SELECT id, urlkey, access FROM (" +
        "SELECT c.id, c.urlkey, coalesce(rr.access, 'allow') AS access, " +
        "row_number() OVER (PARTITION BY c.id ORDER BY length(rr.prefix) DESC) AS rn " +
        "FROM cdx c LEFT JOIN (VALUES " + aclRulesDuck + ") AS rr(prefix, access) " +
        "ON starts_with(c.urlkey, rr.prefix)) WHERE rn = 1) a JOIN (" +
        "SELECT id, allowed FROM (" +
        "SELECT u.id, coalesce(p.rule = 'allow', TRUE) AS allowed, " +
        "row_number() OVER (PARTITION BY u.id ORDER BY length(p.path) DESC, p.rule) AS rn " +
        "FROM (SELECT id, host, path || '?' || qs AS upath FROM cdx) u " +
        s"LEFT JOIN ($robotsApplicable) p ON u.host = p.host AND starts_with(u.upath, p.path)) " +
        "WHERE rn = 1) r ON a.id = r.id ORDER BY a.id"),
    // same ONE pattern constant the Spark side reads; '...' literals in
    // DuckDB keep backslashes verbatim, so RE2 sees the same chars
    "robots_sitemaps" -> (
      s"SELECT host, unnest(regexp_extract_all(txt, '${graft.ops.Robots.SitemapRe}', 1)) AS sitemap " +
        s"FROM ${graft.ops.Robots.sitemapFixtureDuck} ORDER BY host, sitemap"),
    // full grammar replay: flattened (host, ln, agent, rule, path) table
    "robots_parse" -> (
      s"SELECT r.host, r.ln, a.agent, r.rule, r.path " +
        s"FROM ($robotsRules) r JOIN ($robotsAgents) a ON r.host = a.host AND r.block = a.block " +
        "ORDER BY r.host, r.ln, a.agent"),
    // starts_with-join (literal prefix — LIKE would treat _/% in a rule path as wildcards); unmatched ids keep one
    // all-NULL rule row, so rn = 1 selects it and coalesce defaults to
    // allow — 'allow' < 'disallow' makes the equal-length tie lexical
    "robots_check" -> o(
      "SELECT id, host, allowed, rule_path FROM (" +
        "SELECT u.id, u.host, coalesce(r.rule = 'allow', TRUE) AS allowed, r.path AS rule_path, " +
        "row_number() OVER (PARTITION BY u.id ORDER BY length(r.path) DESC, r.rule) AS rn " +
        "FROM (SELECT id, host, path || '?' || qs AS upath FROM cdx) u " +
        s"LEFT JOIN ($robotsApplicable) r ON u.host = r.host AND starts_with(u.upath, r.path)) " +
        "WHERE rn = 1 ORDER BY id"),
    // delays via the widened grammar replay; then the identical closed
    // window form as crawl_politeness's oracle
    "crawl_politeness_robots" -> o(
      "SELECT id, host, epoch_us, delay_us, " +
        "delay_us * rn + max(epoch_us - delay_us * rn) OVER " +
        "(PARTITION BY host ORDER BY epoch_us, id ROWS UNBOUNDED PRECEDING) AS sched_us, " +
        "delay_us * rn + max(epoch_us - delay_us * rn) OVER " +
        "(PARTITION BY host ORDER BY epoch_us, id ROWS UNBOUNDED PRECEDING) - epoch_us AS wait_us FROM (" +
        "SELECT c.id, c.host, c.epoch_us, " +
        s"CAST(coalesce(dl.delay_sec, $politeDefaultSec) * 1000000 AS BIGINT) AS delay_us, " +
        "CAST(row_number() OVER (PARTITION BY c.host ORDER BY c.epoch_us, c.id) AS BIGINT) AS rn " +
        s"FROM cdx c LEFT JOIN ($robotsDelays) dl ON c.host = dl.host) ORDER BY id"),

    // full replay of the composed scheduler: the change-rate lag/rollup
    // closed form, the class→(priority, interval) ladder, the robots
    // delays replay, and the politeness running-max recursion over the
    // (priority, desired_us, urlkey) host queue
    "crawl_recrawl_schedule" -> o(
      "SELECT urlkey, host, change_class, priority, n_pairs, last_us, desired_us, delay_us, " +
        "delay_us * rn + max(desired_us - delay_us * rn) OVER " +
        "(PARTITION BY host ORDER BY priority, desired_us, urlkey ROWS UNBOUNDED PRECEDING) AS sched_us " +
        "FROM (" +
        "SELECT q.urlkey, q.host, q.change_class, q.priority, q.n_pairs, q.last_us, q.desired_us, " +
        s"CAST(coalesce(dl.delay_sec, $politeDefaultSec) * 1000000 AS BIGINT) AS delay_us, " +
        "CAST(row_number() OVER (PARTITION BY q.host ORDER BY q.priority, q.desired_us, q.urlkey) AS BIGINT) AS rn " +
        "FROM (" +
        "SELECT urlkey, host, change_class, " +
        "CAST(CASE change_class WHEN 'new' THEN 0 WHEN 'fast' THEN 1 WHEN 'medium' THEN 2 ELSE 3 END AS INT) AS priority, " +
        "n_pairs, last_us, " +
        "last_us + CASE change_class WHEN 'new' THEN 172800000000 WHEN 'fast' THEN 86400000000 " +
        "WHEN 'medium' THEN 604800000000 ELSE 2592000000000 END AS desired_us " +
        "FROM (" +
        "SELECT urlkey, host, n_pairs, n_changed, last_us, " +
        "CASE WHEN n_pairs = 0 THEN 'new' " +
        "WHEN n_changed * 10 >= n_pairs * 8 THEN 'fast' " +
        "WHEN n_changed * 10 >= n_pairs * 3 THEN 'medium' ELSE 'slow' END AS change_class " +
        "FROM (" +
        "SELECT urlkey, min(host) AS host, max(epoch_us) AS last_us, " +
        "CAST(sum(CASE WHEN prev_ver IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CASE WHEN prev_ver IS NOT NULL AND ver <> prev_ver THEN 1 ELSE 0 END) AS BIGINT) AS n_changed " +
        "FROM (" +
        "SELECT urlkey, host, epoch_us, ver, " +
        "lag(ver) OVER (PARTITION BY urlkey ORDER BY ts, id) AS prev_ver FROM (" +
        "SELECT urlkey, host, ts, id, epoch_us, digest || ':' || ((id % 13) % 3) AS ver FROM cdx)) " +
        "GROUP BY urlkey))) q " +
        s"LEFT JOIN ($robotsDelays) dl ON q.host = dl.host" +
        ") ORDER BY urlkey"),

    // same (digest | ts, id) window; first_value's frame start is the
    // partition start in both engines, so ties are irrelevant to it
    // per-shard dedup ledger; origin = (ts, id)-first per digest
    // GLOBALLY; null digests coalesce to a synthetic singleton (each is
    // its own original — SQL PARTITION BY would pool all nulls into one
    // group and wrongly mark all but one as dedupable)
    "obs_dedup_savings" -> o(
      "SELECT filename, count(*) AS n_captures, count(DISTINCT digest) AS n_digests, " +
        "CAST(sum(length) AS BIGINT) AS logical_bytes, " +
        "CAST(sum(CASE WHEN is_orig THEN length ELSE 0 END) AS BIGINT) AS stored_bytes, " +
        "round(100.0 * (sum(length) - sum(CASE WHEN is_orig THEN length ELSE 0 END)) / sum(length), 4) AS pct_saved " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY coalesce(digest, ' null:' || id) " +
        "ORDER BY ts, id) = 1 AS is_orig " +
        "FROM cdx WHERE record_type = 'response') " +
        "GROUP BY filename ORDER BY filename"),
    "url_agnostic_dedup" -> o(
      "SELECT digest, n_responses, n_revisits, n_urlkeys, first_ts, last_ts, " +
        "dangling_revisit, cross_url FROM (" +
        "SELECT digest, " +
        "count(CASE WHEN record_type = 'response' THEN 1 END) AS n_responses, " +
        "count(CASE WHEN record_type = 'revisit' THEN 1 END) AS n_revisits, " +
        "count(DISTINCT urlkey) AS n_urlkeys, " +
        "min(ts) AS first_ts, max(ts) AS last_ts, " +
        "count(CASE WHEN record_type = 'response' THEN 1 END) = 0 AND " +
        "count(CASE WHEN record_type = 'revisit' THEN 1 END) > 0 AS dangling_revisit, " +
        "count(DISTINCT urlkey) > 1 AS cross_url " +
        "FROM cdx WHERE digest IS NOT NULL AND record_type IN ('response', 'revisit') " +
        "GROUP BY digest) WHERE dangling_revisit OR cross_url ORDER BY digest"),
    "cdx_revisit_generate" -> o(
      "SELECT id, urlkey, ts, digest, " +
        "CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS out_type, " +
        "CASE WHEN rn > 1 THEN orig_url END AS refers_to_url, " +
        "CASE WHEN rn > 1 THEN orig_ts END AS refers_to_ts FROM (" +
        "SELECT id, urlkey, ts, digest, " +
        "row_number() OVER w AS rn, first_value(url) OVER w AS orig_url, " +
        "first_value(ts) OVER w AS orig_ts FROM cdx WHERE record_type = 'response' " +
        "WINDOW w AS (PARTITION BY coalesce(digest, ' null:' || id) ORDER BY ts, id)) ORDER BY id"),
    // full PSL algorithm replay: suffix/wildcard candidate generation,
    // exception > most-labels precedence, default-* fallback
    "url_registered_domain" -> o(
      pslChainDuck("SELECT DISTINCT host FROM cdx UNION SELECT host FROM (VALUES " +
        graft.ops.Psl.hostsDuck + ") AS p(host)") +
        " SELECT l.host, array_to_string(l.labels[l.n - coalesce(b.ps_n, 1) + 1:], '.') AS public_suffix, " +
        "CASE WHEN l.n > coalesce(b.ps_n, 1) " +
        "THEN array_to_string(l.labels[l.n - coalesce(b.ps_n, 1):], '.') END AS registered_domain " +
        "FROM lab l LEFT JOIN best b USING (host) ORDER BY l.host"),

    // same PSL chain over the edge endpoints' host universe; the
    // planted dst cycle is replayed as a CASE over id%8
    "graph_domain_collapse" -> o {
      val dstCase = "CASE CAST(id % 8 AS INT) " +
        graft.ops.Psl.fixtureHosts.zipWithIndex
          .map { case (h, i) => s"WHEN $i THEN '$h'" }.mkString(" ") + " END"
      s", edges AS (SELECT host AS src_host, $dstCase AS dst_host " +
        "FROM cdx WHERE record_type = 'response')" +
        pslChainDuck("SELECT DISTINCT src_host AS host FROM edges " +
          "UNION SELECT DISTINCT dst_host FROM edges") +
        ", reg AS (SELECT l.host, CASE WHEN l.n > coalesce(b.ps_n, 1) " +
        "THEN array_to_string(l.labels[l.n - coalesce(b.ps_n, 1):], '.') END " +
        "AS registered_domain FROM lab l LEFT JOIN best b USING (host)) " +
        "SELECT rs.registered_domain AS src_domain, " +
        "rd.registered_domain AS dst_domain, count(*) AS n_links " +
        "FROM edges e JOIN reg rs ON e.src_host = rs.host " +
        "JOIN reg rd ON e.dst_host = rd.host " +
        "WHERE rs.registered_domain IS NOT NULL AND rd.registered_domain IS NOT NULL " +
        "GROUP BY 1, 2 ORDER BY 1, 2"
    },
    // full PSL precedence replay over the gate's host universe, then the
    // two arms exactly as the engine computes them (IN on the nullable
    // registered domain coalesced false, host-equals fallback, substring
    // contains over the lowercased url)
    "filter_url_blocklist" -> o(
      ", caps AS (SELECT id, host, url FROM cdx UNION ALL " +
        s"SELECT * FROM (VALUES $blocklistPlantsDuck) AS p(id, host, url))" +
        pslChainDuck("SELECT DISTINCT host FROM caps") +
        ", reg AS (SELECT l.host, CASE WHEN l.n > coalesce(b.ps_n, 1) " +
        "THEN array_to_string(l.labels[l.n - coalesce(b.ps_n, 1):], '.') END AS registered_domain " +
        "FROM lab l LEFT JOIN best b USING (host)) " +
        "SELECT id, host, blocked_domain, blocked_term, " +
        "(NOT blocked_domain AND NOT blocked_term) AS keep FROM (" +
        "SELECT c.id, c.host, " +
        s"(coalesce(r.registered_domain IN $blockDomainsDuck, FALSE) " +
        s"OR c.host IN $blockDomainsDuck) AS blocked_domain, " +
        s"($blockTermsDuck) AS blocked_term " +
        "FROM caps c JOIN reg r USING (host)) ORDER BY id"),
    "filter_null_safe" -> o(
      "SELECT id, coalesce(redirect, '-') AS redirect_c, coalesce(robotflags, '-') AS robot_c " +
        "FROM cdx WHERE redirect IS NOT DISTINCT FROM robotflags ORDER BY id"),

    "crawl_diff" -> o(
      "SELECT urlkey, CAST(ka % 100000 AS INT) AS status_a, " +
        "CAST(kb % 100000 AS INT) AS status_b, " +
        "CASE WHEN ka IS NULL THEN 'new' WHEN kb IS NULL THEN 'gone' " +
        "WHEN ka % 100000 = kb % 100000 THEN 'unchanged' " +
        "ELSE 'changed' END AS change FROM (" +
        "SELECT urlkey, " +
        "max(CASE WHEN ts < '19960101000000' THEN ts::BIGINT * 100000 + status END) AS ka, " +
        "max(CASE WHEN ts >= '19960101000000' THEN ts::BIGINT * 100000 + status END) AS kb " +
        "FROM cdx GROUP BY urlkey) ORDER BY urlkey")
  )
}
