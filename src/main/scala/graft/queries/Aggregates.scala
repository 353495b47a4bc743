package graft.queries

import graft.{Cdx, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 aggregations. All hash-aggregate with automatic
  * partial (map-side) + final phases under Catalyst; `agg_rollup` expands
  * grouping sets; `agg_count_distinct` uses Spark's expand+two-phase plan.
  */
object Aggregates extends QueryModule {

  private def o(sql: String): String = Cdx.duckCte + sql

  /** count-min sketch geometry: d hash rows × w counters. w=2048 keeps
    * the εN overcount (ε = e/w) well under the uniform per-key count at
    * every sf; the whole merged sketch is d·w = 8192 longs. */
  private[graft] val cmsD = 4
  private[graft] val cmsW = 2048

  /** per-segment CMS cells of `user_id` frequencies: (seg, r, c) -> cnt.
    * The d-way explode is map-local — partial aggregation collapses it
    * to ≤ nSeg·d·w cells before any shuffle. Row hashes are
    * xxhash64(user_id, r): independent-enough rows, computable by any
    * prober without coordination. */
  private[graft] def cmsCells(
      ev: org.apache.spark.sql.DataFrame, nSeg: Int): org.apache.spark.sql.DataFrame =
    ev.select(col("event_id"), col("user_id"))
      .withColumn("seg", pmod(col("event_id"), lit(nSeg.toLong)))
      .select(col("seg"), col("user_id"),
        explode(expr(s"sequence(0, ${cmsD - 1})")).as("r"))
      .withColumn("c", pmod(xxhash64(col("user_id"), col("r")), lit(cmsW)))
      .groupBy("seg", "r", "c").agg(count(lit(1)).as("cnt"))

  override def queries: Map[String, QFn] = Map(
    // crawl stats (mrjob increment_counter analog, indexwarcsjob.py recon ~L90–110)
    "agg_count_by_key" -> ((s, d) =>
      Cdx.df(s, d).groupBy("record_type", "status").count()
        .withColumnRenamed("count", "cnt")
        .orderBy("record_type", "status")),

    "agg_sum_min_max" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 6).as("sum_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          date_format(min("l_shipdate"), "yyyy-MM-dd").as("min_ship"),
          date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_ship"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_count_distinct" -> ((s, d) =>
      Cdx.df(s, d).groupBy("hostword")
        .agg(
          countDistinct("urlkey").as("n_urlkeys"),
          countDistinct("path").as("n_paths"),
          count(lit(1)).as("cnt"))
        .orderBy("hostword")),

    // HLL cardinality — oracle-exempt (sketch is engine-specific); the
    // ScalaTest spec asserts relative error vs exact, and the driver row
    // is SELF-CHECKING: it carries the exact count and the relative error
    // alongside the estimate, so the dump shows the bound directly. (The
    // exact column is the verification harness, not the production shape —
    // at 100 TB you run the approx column alone; that plan is what the
    // ScalaTest spec pins.)
    "agg_approx_distinct" -> ((s, d) =>
      Cdx.df(s, d).groupBy("hostword")
        .agg(
          approx_count_distinct("urlkey").as("approx_urlkeys"),
          countDistinct("urlkey").as("exact_urlkeys"))
        .withColumn("rel_err",
          round(abs(col("approx_urlkeys") - col("exact_urlkeys")) /
            col("exact_urlkeys"), 6))
        .orderBy("hostword")),

    // WEIGHTED percentiles — "half the corpus TOKENS live in docs shorter
    // than this", the curation threshold unweighted quantiles get wrong
    // (one 500-char doc ≠ one 40k-char doc). Neither engine ships a
    // weighted quantile, so this IS the portable form: per-group
    // cumulative-weight window + a pure-INTEGER threshold compare
    // (cum·2 ≥ tot, cum·10 ≥ 9·tot — no float percentile interpolation
    // to disagree on), then one conditional-min agg. The window
    // partitions per group, the agg is |groups|-bounded — nothing global.
    "agg_weighted_percentile" -> ((s, d) => {
      val docs = graft.Tables.t(s, d, "documents")
      val byLen = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("n_chars", "doc_id")
      val grp = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      docs
        .withColumn("cum", sum("n_chars").over(
          byLen.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("tot", sum("n_chars").over(grp))
        .groupBy("lang")
        .agg(
          min(when(col("cum") * 2 >= col("tot"), col("n_chars"))).as("wp50_chars"),
          min(when(col("cum") * 10 >= col("tot") * 9, col("n_chars"))).as("wp90_chars"),
          max("tot").as("total_chars"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    // KMV (k-minimum-values / bottom-k) distinct sketch — the ONE sketch
    // family member whose estimate is hash-deterministic, so unlike
    // HLL/CMS it gets the full DuckDB hash oracle, not a property bound:
    // est = (k−1)·2³² / h_k over md5-derived 32-bit uniforms (Beyer et
    // al. 2007), exact count when a group holds < k distinct keys. The
    // sketch is MERGEABLE (bottom-k of a union = bottom-k of the unioned
    // sketches — set-identical, pinned in OperatorPropertiesSpec), which
    // is what a multi-day pipeline persists instead of re-scanning
    // history. Shape: one distinct on (group, hash) — the only
    // data-sized shuffle — then a group-partitioned bottom-k window over
    // ≤|distinct| rows and a tiny per-group agg. Self-checking like
    // agg_approx_distinct: exact count + rel err ride along.
    "agg_kmv_distinct" -> ((s, d) => {
      val k = 64
      val cdx = Cdx.dfFan(s, d)
      val hashes = cdx.select(col("hostword"),
        conv(substring(md5(concat(col("urlkey"), lit(":kmv"))), 1, 8), 16, 10)
          .cast("bigint").as("h"))
        .distinct()
      val byH = org.apache.spark.sql.expressions.Window
        .partitionBy("hostword").orderBy("h")
      val sketch = hashes
        .withColumn("rn", row_number().over(byH))
        .filter(col("rn") <= k)
        .groupBy("hostword")
        .agg(count(lit(1)).as("n_in_sketch"), max("h").as("h_k"))
      val exact = cdx.groupBy("hostword")
        .agg(countDistinct("urlkey").as("exact_urlkeys"))
      sketch.join(exact, "hostword")
        // floor, not round: CAST(double AS BIGINT) is round-half-even on
        // DuckDB and HALF_UP on Spark — floor is the one function both
        // engines agree on for every representable quotient.
        // greatest(h_k, 1): an all-zero md5 32-bit prefix (~2^-32/key)
        // would divide by 0 → Infinity, which Spark's cast saturates but
        // DuckDB's CAST(floor(inf) AS BIGINT) errors — engine-divergent.
        .withColumn("kmv_est",
          when(col("n_in_sketch") < k, col("n_in_sketch"))
            .otherwise(floor(lit((k - 1).toDouble * 4294967296.0) /
              greatest(col("h_k"), lit(1L))).cast("long")))
        .withColumn("rel_err",
          round(abs(col("kmv_est") - col("exact_urlkeys")) /
            col("exact_urlkeys"), 6))
        .select("hostword", "kmv_est", "exact_urlkeys", "rel_err")
        .orderBy("hostword")
    }),

    // KMV CROSS-CRAWL OVERLAP — the sketch sibling of agg_crawl_overlap,
    // run on PAYLOAD DIGESTS: estimate |A∩B| and Jaccard between two
    // crawl generations' stored-content sets from their MERGEABLE
    // bottom-k sketches alone — "how much would a joint (revisit-style)
    // dedup across the two crawls save?" answered from two k-row
    // artifacts BEFORE paying the exact cross-generation join. KMV theory (Beyer et al. 2007): bottom-k of
    // A∪B = bottom-k of the unioned sketches, and A's kth minimum ≥ the
    // union's (A ⊆ A∪B), so every union minimum's membership in A/B is
    // decidable against the two sketches alone; Ĵ = |union minima in
    // both| / |union minima|, |A∩B|̂ = Ĵ·|A∪B|̂. Hash-deterministic
    // (agg_kmv_distinct's md5 recipe) → FULL DuckDB oracle, and the
    // exact overlap rides along (self-checking). Shape: one distinct on
    // (hostword, gen, hash) is the only data-sized shuffle; every window
    // and join after it runs on ≤ 2k rows per group.
    "agg_kmv_overlap" -> ((s, d) => {
      val k = 64
      val cut = "19960101000000" // the agg_crawl_overlap generation split
      val w = org.apache.spark.sql.expressions.Window
      val hashes = Cdx.dfFan(s, d).select(col("hostword"),
          when(col("ts") < cut, lit("a")).otherwise(lit("b")).as("gen"),
          conv(substring(md5(concat(col("digest"), lit(":kmv"))), 1, 8), 16, 10)
            .cast("bigint").as("h"))
        .distinct()
      val byGen = w.partitionBy("hostword", "gen").orderBy("h")
      val sk = hashes.withColumn("rn", row_number().over(byGen))
        .filter(col("rn") <= k)
        .select("hostword", "gen", "h")
      val byU = w.partitionBy("hostword").orderBy("h")
      val uk = sk.select("hostword", "h").distinct()
        .withColumn("rn", row_number().over(byU)).filter(col("rn") <= k)
        .select("hostword", "h")
      val marked = uk
        .join(sk.filter(col("gen") === "a")
          .select(col("hostword"), col("h"), lit(1L).as("in_a")),
          Seq("hostword", "h"), "left")
        .join(sk.filter(col("gen") === "b")
          .select(col("hostword"), col("h"), lit(1L).as("in_b")),
          Seq("hostword", "h"), "left")
        .na.fill(0L, Seq("in_a", "in_b"))
      val est = marked.groupBy("hostword").agg(
          count(lit(1)).as("n_u"),
          max("h").as("h_k"),
          sum(col("in_a") * col("in_b")).as("both_sk"))
        // exact when the union fits the sketch; floor() is the one
        // double→int step both engines agree on (the kmv_distinct note)
        .withColumn("union_est",
          when(col("n_u") < k, col("n_u"))
            .otherwise(floor(lit((k - 1).toDouble * 4294967296.0) /
              greatest(col("h_k"), lit(1L))).cast("long")))
        .withColumn("jaccard_est",
          round(col("both_sk").cast("double") / col("n_u"), 6))
        .withColumn("inter_est",
          floor(col("both_sk").cast("double") * col("union_est") / col("n_u"))
            .cast("long"))
      val exact = Cdx.df(s, d)
        .groupBy("hostword", "digest")
        .agg(max(when(col("ts") < cut, 1L).otherwise(0L)).as("ina"),
          max(when(col("ts") >= cut, 1L).otherwise(0L)).as("inb"))
        .groupBy("hostword")
        .agg(sum(col("ina") * col("inb")).as("exact_both"),
          count(lit(1)).as("exact_union"))
      est.join(exact, "hostword")
        .select("hostword", "n_u", "union_est", "jaccard_est", "inter_est",
          "exact_both", "exact_union")
        .orderBy("hostword")
    }),

    // Mergeable distinct sketches — the cross-job form of
    // agg_approx_distinct. Each segment builds its own DataSketches HLL
    // (map-side; only sketch BYTES cross the wire), a final union merges
    // them into the global estimate. This is what a 1000-executor /
    // multi-day pipeline persists and re-merges: approx_count_distinct
    // answers once, stored sketches compose forever. Oracle-exempt
    // (sketch internals are engine-specific); the property spec bounds
    // relative error vs the exact count and pins union-order invariance,
    // and the driver row is SELF-CHECKING: the exact count and relative
    // error ride next to the merged estimate (exact is the harness
    // column; production runs the sketch side alone).
    "agg_hll_merge" -> ((s, d) => {
      val cdx = Cdx.df(s, d)
      val perSegment = cdx
        .withColumn("seg", col("id") % 8)
        .groupBy("seg")
        .agg(hll_sketch_agg(col("urlkey"), lit(12)).as("sketch"))
      val est = perSegment
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("est_distinct_urlkeys"))
      val exact = cdx.agg(countDistinct("urlkey").as("exact_distinct_urlkeys"))
      est.crossJoin(broadcast(exact))
        .withColumn("rel_err",
          round(abs(col("est_distinct_urlkeys") - col("exact_distinct_urlkeys")) /
            col("exact_distinct_urlkeys"), 6))
    }),

    // Count-min sketch, merged across segments — the mergeable FREQUENCY
    // sketch, completing the family next to HLL (agg_hll_merge, distinct),
    // bloom (dedup_bloom_prefilter, membership) and GK
    // (agg_approx_quantile, quantiles). Each segment's sketch is d×w
    // counters REGARDLESS of key cardinality; merge is counter addition
    // (groupBy sum over ≤ d×w cells), and a point estimate is
    // min over d rows of the counter each row hashes the key to — the
    // deterministic guarantee est ≥ exact holds because every occurrence
    // of the key incremented all d of its counters, and collisions only
    // ever ADD. Relational build: the explode to (seg, row, col) cells
    // collapses map-side (partial agg), so the shuffle carries ≤
    // nSeg·d·w cells, never events. Oracle-exempt (xxhash64 row hashes
    // are engine-specific); the driver row is SELF-CHECKING (exact count
    // and overcount ride along) and OperatorPropertiesSpec pins est ≥
    // exact, the εN overcount bound, and merged == built-whole cell
    // equality.
    "agg_cms_merge" -> ((s, d) => {
      val merged = cmsCells(Tables.events(s, d), nSeg = 8)
        .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      // probe the 20 lowest user ids: est(u) = min_r counter[r][h_r(u)]
      val probes = s.range(0, 20).toDF("user_id")
        .select(col("user_id"),
          explode(expr(s"sequence(0, ${cmsD - 1})")).as("r"))
        .withColumn("c", pmod(xxhash64(col("user_id"), col("r")), lit(cmsW)))
      val est = probes.join(merged, Seq("r", "c"), "left")
        .na.fill(0L, Seq("cnt"))
        .groupBy("user_id").agg(min("cnt").as("est_cnt"))
      val exact = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("user_id"), "left")
        .na.fill(0L, Seq("exact_cnt"))
        .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
        .orderBy("user_id")
    }),

    // heavy hitters through the NATIVE Misra-Gries mergeable aggregate
    // (functions/SketchAggregates.MisraGriesAgg — the repo's first
    // TypedImperativeAggregate: a bounded-map summary whose
    // decrement-on-overflow update genuinely can't be composed from
    // built-ins the way the CMS/KMV cells are). One pass, map-side
    // partials, ≤ capacity pairs per partition on the wire, final state
    // capacity-bounded at any corpus size — the "which hosts dominate
    // the crawl" one-pass answer. Capacity 2048 EXCEEDS the corpus's
    // distinct-user count at every SF, so the summary is provably EXACT
    // here and the full DuckDB oracle applies; the approximation
    // guarantee at tight capacity (undercount ≤ n/(cap+1), guaranteed
    // retention above it, partitioning-independence) is property-pinned
    // in NativeExprSpec.
    "agg_heavy_hitters" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.events(s, d)
        .agg(expr("heavy_hitters(user_id, 2048)").as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.key").as("user_id"), col("e.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(20)
    }),

    // CDC changelog compaction — last-writer-wins: an ordered op log
    // (I/U/D per key, seq = the change's position) collapses to the
    // final table state. The natural form is a per-key window (rank by
    // seq desc, keep rn=1) — but the window buffers every key's whole
    // history at the shuffle. max_by/arg_max is the plan you want at
    // 100 TB: a MERGEABLE aggregate whose partial state is one
    // (seq, payload) pair per key, so the map side compacts each
    // partition's history before the single hash shuffle, and a key's
    // wire cost is O(partitions touched), not O(ops). Deletes survive
    // compaction to the HAVING (a delete must win over older upserts,
    // then drop from the state). This is the op-log leg feeding
    // sink_merge_upsert's batch; PlanSpec pins agg-not-window.
    //
    // The op travels through the aggregate as an INT code, decoded to
    // its letter after: a string in a max_by buffer is a non-mutable
    // agg-buffer type, which silently demotes the whole aggregate to
    // SortAggregate (two extra per-partition sorts); all-primitive
    // buffers keep it a HashAggregate (the demotion is exactly what the
    // PlanSpec pin would catch).
    "cdc_compact_changelog" -> ((s, d) => {
      val log = Tables.events(s, d).select(
        col("user_id"), col("event_id").as("seq"),
        expr("CASE WHEN event_id % 10 = 0 THEN 3 " +
          "WHEN event_id % 10 < 5 THEN 1 ELSE 2 END").as("opc"),
        col("value"))
      log.groupBy("user_id")
        .agg(
          max("seq").as("last_seq"),
          max_by(col("opc"), col("seq")).as("opc"),
          round(max_by(col("value"), col("seq")), 6).as("value"),
          count(lit(1)).as("n_ops"))
        .filter(col("opc") =!= 3)
        .select(col("user_id"), col("last_seq"),
          expr("CASE opc WHEN 1 THEN 'I' ELSE 'U' END").as("op"),
          col("value"), col("n_ops"))
        .orderBy("user_id")
    }),

    // single-pass data-quality audit (the Deequ/dbt-test shape): EVERY
    // profile metric — row count, key uniqueness, null fraction, domain
    // violations, bounds — comes out of ONE aggregate over the fact
    // (each check is a when().otherwise() partial sum, so the audit
    // costs one scan regardless of how many checks ride it), plus one
    // broadcast anti-join for referential integrity (orphan o_custkey ∉
    // customer). At 100 TB the audit is exactly one pass over the table
    // it certifies; checks never multiply scans. Long output format so
    // adding a check adds a row, not a schema change.
    "pipeline_data_audit" -> ((s, d) => {
      val ord = Tables.t(s, d, "orders")
      val cust = Tables.t(s, d, "customer")
      val prof = ord.agg(
        count(lit(1)).as("n_rows"),
        countDistinct("o_orderkey").as("n_keys"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos_price"),
        sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
          .as("bad_status"))
      // nulls are the null_custkey check's job, and anti-join vs NOT IN
      // disagree on them (anti keeps a null key, NOT IN drops the row) —
      // exclude them from the orphan check in BOTH engines
      val orphans = ord.select("o_custkey").filter(col("o_custkey").isNotNull)
        .join(cust.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_custkey"))
      prof.crossJoin(orphans)
        .selectExpr("stack(6, " +
          "'n_rows', n_rows, " +
          "'dup_keys', n_rows - n_keys, " +
          "'null_custkey', null_custkey, " +
          "'nonpos_price', nonpos_price, " +
          "'bad_status', bad_status, " +
          "'orphan_custkey', orphan_custkey) AS (chk, v)")
        .orderBy("chk")
    }),

    // exact per-group MODE with a deterministic tie-break — built-in
    // mode() breaks ties arbitrarily (engine- and order-dependent), so
    // it can never hash-match an oracle. Two mergeable hash aggs
    // instead: count per (group, value) — |groups × domain| rows, the
    // only data-sized shuffle — then max over a (count, value) STRUCT,
    // whose lexicographic comparison IS the tie-break (max count, then
    // max value), evaluated identically by Spark struct max and DuckDB
    // struct max. Same two-level-reduction shape as agg_pivot's second
    // level: the final agg runs on already-reduced rows.
    "agg_mode" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("event_type"))).as("m"))
        .select(col("user_id"),
          col("m.event_type").as("mode_event"), col("m.n").as("n_mode"))
        .orderBy("user_id")),

    "agg_rollup" -> ((s, d) =>
      Cdx.df(s, d).rollup("hostword", "status")
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("cnt"))
        .selectExpr("gid", "coalesce(hostword, '') AS hostword_c", "coalesce(status, -1) AS status_c", "cnt")
        .orderBy("gid", "hostword_c", "status_c")),

    // full cube over (record_type, status-class): all 4 grouping sets —
    // same Expand code path as rollup, covering the GROUPING SETS surface
    "agg_cube" -> ((s, d) =>
      Cdx.df(s, d)
        .withColumn("cls", expr("CAST(floor(status / 100) AS INT)"))
        .cube("record_type", "cls")
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("cnt"))
        .selectExpr("gid", "coalesce(record_type, '') AS rt", "coalesce(cls, -1) AS cls_c", "cnt")
        .orderBy("gid", "rt", "cls_c")),

    // skew-resistant two-phase aggregation: salt the (few, giant) groups,
    // partial-agg per (key, salt), then merge. At 100 TB this is the manual
    // fallback when a pathological host (com,google)*) overwhelms even
    // AQE's skew splitting; here it must produce byte-identical results to
    // the plain group-by, which is exactly what the oracle asserts.
    "agg_skew_salted" -> ((s, d) => {
      val salted = Cdx.df(s, d)
        .withColumn("salt", pmod(col("id"), lit(16)))
        .groupBy("status", "salt")
        .agg(count(lit(1)).as("c"), sum("length").as("l"))
      salted.groupBy("status")
        .agg(sum("c").as("cnt"), sum("l").as("sum_len"))
        .orderBy("status")
    }),

    // per-group ordered capture timeline (cdx-server per-url capture list)
    "agg_collect_sorted" -> ((s, d) =>
      Cdx.df(s, d)
        .withColumn("prefix_key", split_part(col("urlkey"), lit("?"), lit(1)))
        .withColumn("capture", concat_ws(":", col("ts"), col("id")))
        .groupBy("prefix_key")
        .agg(concat_ws(",", sort_array(collect_list("capture"))).as("timeline"))
        .orderBy("prefix_key")),

    // exact percentiles of response length per record type — the stats
    // surface behind shard sizing (SURVEY §2.7 split_points notes both
    // exact and approx quantile paths; approx_percentile is the
    // sketch-based 100 TB variant, property-tested next to this)
    "agg_percentiles" -> ((s, d) =>
      Cdx.df(s, d)
        .groupBy("record_type")
        .agg(
          expr("percentile(length, array(0.25, 0.5, 0.75))").as("p"),
          round(expr("percentile(length, 0.9)"), 6).as("p90"))
        .selectExpr(
          "record_type",
          "round(p[0], 6) AS p25", "round(p[1], 6) AS p50", "round(p[2], 6) AS p75",
          "p90")
        .orderBy("record_type")),

    // first/last capture per host (limit=1 / reverse cdx-server params).
    // lpad width 20 covers any BIGINT id — lpad TRUNCATES when the value
    // is wider (both engines), and truncated ids collapse distinct
    // captures to equal order keys, making the min_by/max_by pick
    // engine-arbitrary at 11+-digit ids
    "agg_first_last" -> ((s, d) =>
      Cdx.df(s, d)
        .withColumn("ord", concat(col("ts"), lpad(col("id").cast("string"), 20, "0")))
        .groupBy("hostword")
        .agg(
          min_by(col("url"), col("ord")).as("first_url"),
          max_by(col("url"), col("ord")).as("last_url"),
          min("ts").as("first_ts"),
          max("ts").as("last_ts"))
        .orderBy("hostword")),

    // pivot with an EXPLICIT value list — stays a single-pass partial+final
    // hash agg. Enumerating the pivot values at plan time is the difference
    // between one and two corpus scans at 100 TB: the no-values overload
    // first runs a distinct-collect job just to discover column names.
    "agg_pivot" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 6))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")),

    // explicit GROUPING SETS ((hostword), (status)) — just the two one-dim
    // marginals, without the base or grand-total rows that rollup/cube
    // force; same single-scan Expand plan as agg_rollup (each input row is
    // replicated once per set, then one hash agg — never two scans)
    "agg_grouping_sets" -> ((s, d) =>
      Cdx.df(s, d)
        .groupingSets(
          Seq(Seq(col("hostword")), Seq(col("status"))),
          col("hostword"), col("status"))
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("cnt"),
          sum("length").as("sl"))
        .selectExpr("gid", "coalesce(hostword, '') AS hostword_c",
          "coalesce(status, -1) AS status_c", "cnt", "CAST(sl AS BIGINT) AS sum_len")
        .orderBy("gid", "hostword_c", "status_c")),

    // second-moment statistics per group — correlation / covariance /
    // stddev / variance in ONE partial+final pass (Spark's co-moment
    // aggregates are mergeable, so the map-side partials carry
    // (n, mean, M2, co-moment) tuples, not row buffers). The profiling
    // surface a feature-store build reads per column pair.
    "agg_corr_stats" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qp"),
          round(covar_samp("l_quantity", "l_extendedprice"), 4).as("covar_qp"),
          round(stddev_samp("l_quantity"), 6).as("sd_q"),
          round(var_samp("l_quantity"), 6).as("var_q"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // INCREMENTAL aggregation via mergeable partial states — the
    // stats-table maintenance loop: day-1 persists per-group partials
    // (count/sum/min/max — all mergeable), day-2 aggregates ONLY its own
    // batch and merges with the stored states. The merged result must
    // equal a full recompute over both days (the oracle), while the
    // day-2 job's input is the batch + a |groups|-row state table, never
    // the historical data. agg_hll_merge is the sketch sibling; this is
    // the exact-aggregate form every incremental dashboard runs.
    "agg_incremental_merge" -> ((s, d) => {
      val e = Tables.events(s, d).select("event_type", "value", "event_id")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type").agg(
          count(lit(1)).as("cnt"), sum("value").as("sv"),
          min("value").as("mn"), max("value").as("mx"))
      val dir = tmp(d, "agg_states")
      partial(e.filter(col("event_id") % 4 =!= 0))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .unionByName(partial(e.filter(col("event_id") % 4 === 0)))
        .groupBy("event_type")
        .agg(sum("cnt").as("cnt"), sum("sv").as("sv"),
          min("mn").as("mn"), max("mx").as("mx"))
        .select(col("event_type"), col("cnt"),
          // sum_v rounds COARSER than the other float queries: the
          // two-partial accumulation order differs from the oracle's
          // single pass, so agreement is only to ~1e-10 relative — at a
          // 1e-6 boundary the last digit could flip and hash-mismatch.
          // min/max are order-independent and keep 6 digits.
          round(col("sv"), 2).as("sum_v"),
          round(col("mn"), 6).as("min_v"), round(col("mx"), 6).as("max_v"))
        .orderBy("event_type")
    }),

    // quantile SKETCH per group (Greenwald-Khanna via percentile_approx)
    // — the mergeable bounded-memory member of the sketch family (HLL =
    // agg_approx_distinct, bloom = dedup_bloom_prefilter): state is
    // O(accuracy · log n) per group regardless of group size, merged
    // partial+final like any agg, where agg_percentiles' exact form
    // buffers the group. The 100 TB latency-dashboard shape. Oracle-
    // exempt (sketch internals are engine-specific); the rank-error
    // bound |rank(v) − p·n| ≤ n/accuracy is pinned in
    // OperatorPropertiesSpec against the exact distribution.
    "agg_approx_quantile" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(percentile_approx(
          col("value"), array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
        .select(col("event_type"),
          col("q")(0).as("p50"), col("q")(1).as("p90"), col("q")(2).as("p99"))
        .orderBy("event_type")),

    // fixed-bin histogram of document lengths — the one-pass distribution
    // profile a corpus report draws. width_bucket keeps the bin id a pure
    // per-row expression (no percentile state), so the whole histogram is
    // one partial+final hash agg over AT MOST nbins+2 groups — the
    // shuffle carries bins, never rows, at any corpus size. Bucket 0 /
    // nbins+1 are the underflow/overflow bins (PostgreSQL semantics,
    // identical in Spark and DuckDB).
    "agg_histogram" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(expr("width_bucket(n_chars, 0, 600, 12)").as("bucket"),
          col("n_chars"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          min("n_chars").as("lo"), max("n_chars").as("hi"))
        .orderBy("bucket")),

    // wide→long melt (Dataset.unpivot = SQL UNPIVOT): three measure
    // columns become (metric, val) rows in one narrow Expand — per-row,
    // no shuffle, whole-stage codegen'd; the shape feeding any
    // metric-per-row observability store
    "agg_unpivot" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .withColumn("val", round(col("val"), 6))
        // (l_orderkey, l_linenumber) is NOT unique in the driver testdata —
        // val joins the sort to keep the dump order total
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")),

    driftEntry
  )

  /** distribution-DRIFT report between a reference population and a
    * simulated drifted batch (event_id % 3 splits; the drifted side's
    * values shift by v·1.1 + 5) — the day-over-day input-monitoring
    * check every training-data pipeline runs before a batch is admitted.
    * Two metrics from ONE corpus scan: PSI (population stability index,
    * Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with +0.5 count smoothing over a FIXED 13-bin
    * spine so empty bins stay finite and well-defined) and the binned
    * two-sample KS statistic (max |cumP/Nₚ − cumQ/N_q|).
    *
    * Scale: the scan reduces to ≤13 (bucket, cp, cq) rows via one
    * conditional-sum hash agg (the agg_histogram bucket arithmetic);
    * everything after — the bin spine join, totals, running sums — runs
    * on that bounded artifact, so the single-partition WindowExec is a
    * 13-row driver-sized tail, never data-sized. Determinism: counts are
    * exact integers; PSI accumulates via a RUNNING sum in bucket order
    * (both engines left-fold identically — the float-sum-order trap the
    * hash agg would hit); KS's max is order-independent.
    */
  private def driftEntry: (String, QFn) =
    "agg_drift_report" -> { (s: org.apache.spark.sql.SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val binned = Tables.t(s, d, "events")
        .select((col("event_id") % 3 === 0).as("isq"),
          when(col("event_id") % 3 === 0, col("value") * 1.1 + 5)
            .otherwise(col("value")).as("v"))
        .select(col("isq"),
          when(col("v") < 0, 0L).when(col("v") >= 550, 12L)
            .otherwise(floor(col("v") / 50) + 1).as("bucket"))
        .groupBy("bucket")
        .agg(sum(when(!col("isq"), 1L).otherwise(0L)).as("cp"),
          sum(when(col("isq"), 1L).otherwise(0L)).as("cq"))
      val spine = s.range(0, 13).select(col("id").as("bucket"))
      val j = spine.join(binned, Seq("bucket"), "left")
        .select(col("bucket"),
          coalesce(col("cp"), lit(0L)).as("cp"),
          coalesce(col("cq"), lit(0L)).as("cq"))
      val all = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val run = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def p(c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
        (c + 0.5) / (n + 6.5)
      val w = j
        .withColumn("np", sum("cp").over(all)).withColumn("nq", sum("cq").over(all))
        .withColumn("cump", sum("cp").over(run)).withColumn("cumq", sum("cq").over(run))
        .withColumn("ksb",
          abs(col("cump").cast("double") / col("np") -
            col("cumq").cast("double") / col("nq")))
        .withColumn("psirun", sum(
          (p(col("cp"), col("np")) - p(col("cq"), col("nq"))) *
            log(p(col("cp"), col("np")) / p(col("cq"), col("nq")))).over(run))
      w.agg(
        round(max(col("ksb")), 6).as("ks"),
        round(max(when(col("bucket") === 12, col("psirun"))), 6).as("psi"))
        .selectExpr("stack(2, 'ks', ks, 'psi', psi) AS (metric, v)")
        .orderBy("metric")
    }}

  override def oracleSql: Map[String, String] = Map(
    // capacity > distinct users at every SF ⇒ the Misra-Gries summary is
    // exact and the plain GROUP BY replays it; tie-break (cnt desc,
    // user_id asc) matches the aggregate's eval ordering
    "agg_heavy_hitters" ->
      ("SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events " +
        "GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 20"),
    // struct max compares fields in order — the same (n, event_type)
    // lexicographic tie-break as the Spark side
    "agg_mode" ->
      ("WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events " +
        "GROUP BY user_id, event_type) " +
        "SELECT user_id, (max({'n': n, 'event_type': event_type})).event_type AS mode_event, " +
        "(max({'n': n, 'event_type': event_type})).n AS n_mode " +
        "FROM c GROUP BY user_id ORDER BY user_id"),
    "pipeline_data_audit" ->
      ("WITH prof AS (SELECT count(*) AS n_rows, " +
        "count(DISTINCT o_orderkey) AS n_keys, " +
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey, " +
        "CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price, " +
        "CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS BIGINT) AS bad_status " +
        "FROM orders), " +
        "orph AS (SELECT count(*) AS orphan_custkey FROM orders " +
        "WHERE o_custkey IS NOT NULL " +
        "AND o_custkey NOT IN (SELECT c_custkey FROM customer)) " +
        "SELECT chk, v FROM (" +
        "SELECT 'n_rows' AS chk, n_rows AS v FROM prof " +
        "UNION ALL SELECT 'dup_keys', n_rows - n_keys FROM prof " +
        "UNION ALL SELECT 'null_custkey', null_custkey FROM prof " +
        "UNION ALL SELECT 'nonpos_price', nonpos_price FROM prof " +
        "UNION ALL SELECT 'bad_status', bad_status FROM prof " +
        "UNION ALL SELECT 'orphan_custkey', orphan_custkey FROM orph) " +
        "ORDER BY chk"),
    "cdc_compact_changelog" ->
      ("WITH log AS (SELECT user_id, event_id AS seq, " +
        "CASE WHEN event_id % 10 = 0 THEN 'D' " +
        "WHEN event_id % 10 < 5 THEN 'I' ELSE 'U' END AS op, value FROM events) " +
        "SELECT user_id, max(seq) AS last_seq, max_by(op, seq) AS op, " +
        "round(max_by(value, seq), 6) AS value, count(*) AS n_ops " +
        "FROM log GROUP BY user_id HAVING max_by(op, seq) <> 'D' " +
        "ORDER BY user_id"),
    "agg_count_by_key" -> o(
      "SELECT record_type, status, count(*) AS cnt FROM cdx GROUP BY record_type, status ORDER BY record_type, status"),
    "agg_sum_min_max" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty, " +
        "round(avg(l_extendedprice), 6) AS avg_price, " +
        "strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship, " +
        "strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship, count(*) AS cnt " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "agg_count_distinct" -> o(
      "SELECT hostword, count(DISTINCT urlkey) AS n_urlkeys, count(DISTINCT path) AS n_paths, count(*) AS cnt " +
        "FROM cdx GROUP BY hostword ORDER BY hostword"),
    // identical cumulative-weight window + integer threshold compares
    "agg_weighted_percentile" ->
      ("SELECT lang, " +
        "min(CASE WHEN cum * 2 >= tot THEN n_chars END) AS wp50_chars, " +
        "min(CASE WHEN cum * 10 >= tot * 9 THEN n_chars END) AS wp90_chars, " +
        "max(tot) AS total_chars, count(*) AS n_docs " +
        "FROM (SELECT lang, doc_id, n_chars, " +
        "CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY n_chars, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
        "CAST(sum(n_chars) OVER (PARTITION BY lang) AS BIGINT) AS tot " +
        "FROM documents) GROUP BY lang ORDER BY lang"),

    // hash-deterministic sketch: identical md5 uniforms, identical
    // bottom-k, floor() for the one engine-agreed double→int step;
    // subqueries, not a second WITH (duckCte owns the prefix)
    "agg_kmv_distinct" -> o(
      "SELECT s.hostword, CASE WHEN s.n_in_sketch < 64 THEN s.n_in_sketch " +
        "ELSE CAST(floor(270582939648.0 / greatest(s.h_k, 1)) AS BIGINT) END AS kmv_est, " +
        "e.exact_urlkeys, " +
        "round(abs((CASE WHEN s.n_in_sketch < 64 THEN s.n_in_sketch " +
        "ELSE CAST(floor(270582939648.0 / greatest(s.h_k, 1)) AS BIGINT) END) - e.exact_urlkeys) " +
        "/ e.exact_urlkeys, 6) AS rel_err " +
        "FROM (SELECT hostword, CAST(count(*) AS BIGINT) AS n_in_sketch, max(h) AS h_k " +
        "FROM (SELECT hostword, h, row_number() OVER (PARTITION BY hostword ORDER BY h) AS rn " +
        "FROM (SELECT DISTINCT hostword, " +
        "CAST('0x' || substring(md5(urlkey || ':kmv'), 1, 8) AS BIGINT) AS h FROM cdx)) " +
        "WHERE rn <= 64 GROUP BY hostword) s " +
        "JOIN (SELECT hostword, count(DISTINCT urlkey) AS exact_urlkeys " +
        "FROM cdx GROUP BY hostword) e USING (hostword) ORDER BY hostword"),
    // same md5 uniforms, same bottom-k windows, same floor()s — the sk
    // fragment is inlined three times because duckCte owns the WITH
    "agg_kmv_overlap" -> o {
      val sk = "(SELECT hostword, gen, h FROM (SELECT hostword, gen, h, " +
        "row_number() OVER (PARTITION BY hostword, gen ORDER BY h) AS rn " +
        "FROM (SELECT DISTINCT hostword, " +
        "CASE WHEN ts < '19960101000000' THEN 'a' ELSE 'b' END AS gen, " +
        "CAST('0x' || substring(md5(digest || ':kmv'), 1, 8) AS BIGINT) AS h " +
        "FROM cdx)) WHERE rn <= 64)"
      val unionEst = "CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT) " +
        "ELSE CAST(floor(270582939648.0 / greatest(max(h), 1)) AS BIGINT) END"
      "SELECT x.hostword, x.n_u, x.union_est, x.jaccard_est, x.inter_est, " +
        "e.exact_both, e.exact_union FROM (" +
        "SELECT hostword, CAST(count(*) AS BIGINT) AS n_u, " +
        s"$unionEst AS union_est, " +
        "round(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 6) AS jaccard_est, " +
        "CAST(floor(CAST(sum(in_a * in_b) AS DOUBLE) * " +
        s"($unionEst) / count(*)) AS BIGINT) AS inter_est " +
        "FROM (SELECT u.hostword, u.h, " +
        "CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS in_a, " +
        "CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS in_b " +
        "FROM (SELECT hostword, h FROM (SELECT hostword, h, " +
        "row_number() OVER (PARTITION BY hostword ORDER BY h) AS rn " +
        s"FROM (SELECT DISTINCT hostword, h FROM $sk)) WHERE rn <= 64) u " +
        s"LEFT JOIN (SELECT hostword, h FROM $sk WHERE gen = 'a') a " +
        "ON u.hostword = a.hostword AND u.h = a.h " +
        s"LEFT JOIN (SELECT hostword, h FROM $sk WHERE gen = 'b') b " +
        "ON u.hostword = b.hostword AND u.h = b.h) " +
        "GROUP BY hostword) x " +
        "JOIN (SELECT hostword, CAST(sum(ina * inb) AS BIGINT) AS exact_both, " +
        "count(*) AS exact_union FROM (SELECT hostword, digest, " +
        "max(CASE WHEN ts < '19960101000000' THEN 1 ELSE 0 END) AS ina, " +
        "max(CASE WHEN ts >= '19960101000000' THEN 1 ELSE 0 END) AS inb " +
        "FROM cdx GROUP BY hostword, digest) GROUP BY hostword) e " +
        "ON x.hostword = e.hostword ORDER BY x.hostword"
    },
    "agg_rollup" -> o(
      "SELECT CAST(GROUPING(hostword, status) AS INT) AS gid, coalesce(hostword, '') AS hostword_c, " +
        "coalesce(status, -1) AS status_c, count(*) AS cnt " +
        "FROM cdx GROUP BY ROLLUP (hostword, status) ORDER BY gid, hostword_c, status_c"),
    "agg_cube" -> o(
      "SELECT CAST(GROUPING(record_type, cls) AS INT) AS gid, coalesce(record_type, '') AS rt, " +
        "coalesce(cls, -1) AS cls_c, count(*) AS cnt " +
        "FROM (SELECT record_type, CAST(floor(status / 100) AS INT) AS cls FROM cdx) " +
        "GROUP BY CUBE (record_type, cls) ORDER BY gid, rt, cls_c"),
    "agg_skew_salted" -> o(
      "SELECT status, count(*) AS cnt, CAST(sum(length) AS BIGINT) AS sum_len FROM cdx " +
        "GROUP BY status ORDER BY status"),
    "agg_collect_sorted" -> o(
      "SELECT split_part(urlkey, '?', 1) AS prefix_key, string_agg(ts || ':' || id, ',' ORDER BY ts || ':' || id) AS timeline " +
        "FROM cdx GROUP BY split_part(urlkey, '?', 1) ORDER BY prefix_key"),
    // DuckDB quantile_cont = Spark exact percentile (both linear-interp)
    "agg_percentiles" -> o(
      "SELECT record_type, round(quantile_cont(length, 0.25), 6) AS p25, " +
        "round(quantile_cont(length, 0.5), 6) AS p50, " +
        "round(quantile_cont(length, 0.75), 6) AS p75, " +
        "round(quantile_cont(length, 0.9), 6) AS p90 " +
        "FROM cdx GROUP BY record_type ORDER BY record_type"),
    "agg_first_last" -> o(
      "SELECT hostword, arg_min(url, ts || lpad(id::VARCHAR, 20, '0')) AS first_url, " +
        "arg_max(url, ts || lpad(id::VARCHAR, 20, '0')) AS last_url, " +
        "min(ts) AS first_ts, max(ts) AS last_ts " +
        "FROM cdx GROUP BY hostword ORDER BY hostword"),
    "agg_pivot" ->
      ("SELECT l_returnflag, " +
        "round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS qty_f, " +
        "round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS qty_o " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // corr/covar_samp/stddev_samp/var_samp share definitions across
    // engines; covar rounds at 4 (values ~1e5, so 6 decimals would sit
    // inside cross-engine summation-order noise)
    "agg_corr_stats" ->
      ("SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS corr_qp, " +
        "round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp, " +
        "round(stddev_samp(l_quantity), 6) AS sd_q, round(var_samp(l_quantity), 6) AS var_q, " +
        "count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "agg_grouping_sets" -> o(
      "SELECT CAST(GROUPING(hostword, status) AS INT) AS gid, " +
        "coalesce(hostword, '') AS hostword_c, coalesce(status, -1) AS status_c, " +
        "count(*) AS cnt, CAST(sum(length) AS BIGINT) AS sum_len " +
        "FROM cdx GROUP BY GROUPING SETS ((hostword), (status)) " +
        "ORDER BY gid, hostword_c, status_c"),
    // the merged states must equal a full single-pass recompute
    "agg_incremental_merge" ->
      ("SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_v, " +
        "round(min(value), 6) AS min_v, round(max(value), 6) AS max_v " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // DuckDB has no width_bucket — the closed form below IS its contract
    // for (0, 600, 12): underflow -> 0, overflow (v >= max) -> 13, else
    // floor(v / 50) + 1
    "agg_histogram" ->
      ("SELECT CASE WHEN n_chars < 0 THEN 0 WHEN n_chars >= 600 THEN 13 " +
        "ELSE (n_chars // 50) + 1 END AS bucket, count(*) AS cnt, " +
        "min(n_chars) AS lo, max(n_chars) AS hi " +
        "FROM documents GROUP BY bucket ORDER BY bucket"),
    "agg_unpivot" ->
      ("SELECT l_orderkey, l_linenumber, metric, round(val, 6) AS val FROM (" +
        "UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount " +
        "FROM lineitem) ON l_quantity, l_extendedprice, l_discount " +
        "INTO NAME metric VALUE val) " +
        "ORDER BY l_orderkey, l_linenumber, metric, val"),
    // identical bin arithmetic and identical LEFT-FOLD order for the PSI
    // running sum; casts keep DuckDB's HUGEINT count sums out of the
    // float divisions
    "agg_drift_report" ->
      ("WITH base AS (SELECT event_id % 3 = 0 AS isq, " +
        "CASE WHEN event_id % 3 = 0 THEN value * 1.1 + 5 ELSE value END AS v FROM events), " +
        // floor(), NOT `//`: DuckDB's `//` on DOUBLE is plain division
        // and CAST(double AS BIGINT) rounds-half-even — together they'd
        // shift every bin boundary up by half a bin
        "cnt AS (SELECT CASE WHEN v < 0 THEN 0 WHEN v >= 550 THEN 12 " +
        "ELSE CAST(floor(v / 50) AS BIGINT) + 1 END AS bucket, " +
        "sum(CASE WHEN NOT isq THEN 1 ELSE 0 END) AS cp, " +
        "sum(CASE WHEN isq THEN 1 ELSE 0 END) AS cq FROM base GROUP BY bucket), " +
        "spine AS (SELECT unnest(generate_series(0, 12)) AS bucket), " +
        "j AS (SELECT s.bucket, CAST(coalesce(cp, 0) AS BIGINT) AS cp, " +
        "CAST(coalesce(cq, 0) AS BIGINT) AS cq FROM spine s LEFT JOIN cnt USING (bucket)), " +
        "w AS (SELECT bucket, cp, cq, " +
        "CAST(sum(cp) OVER () AS BIGINT) AS np, CAST(sum(cq) OVER () AS BIGINT) AS nq, " +
        "CAST(sum(cp) OVER (ORDER BY bucket) AS BIGINT) AS cump, " +
        "CAST(sum(cq) OVER (ORDER BY bucket) AS BIGINT) AS cumq FROM j), " +
        "t AS (SELECT bucket, " +
        "abs(CAST(cump AS DOUBLE) / np - CAST(cumq AS DOUBLE) / nq) AS ksb, " +
        "sum(((cp + 0.5) / (np + 6.5) - (cq + 0.5) / (nq + 6.5)) * " +
        "ln(((cp + 0.5) / (np + 6.5)) / ((cq + 0.5) / (nq + 6.5)))) " +
        "OVER (ORDER BY bucket) AS psirun FROM w) " +
        "SELECT metric, v FROM (SELECT 'ks' AS metric, round(max(ksb), 6) AS v FROM t " +
        "UNION ALL SELECT 'psi', round(max(CASE WHEN bucket = 12 THEN psirun END), 6) FROM t) " +
        "ORDER BY metric")
  )
}
