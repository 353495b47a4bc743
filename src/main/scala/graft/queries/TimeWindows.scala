package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 time windows over the `events` table, batch-mode.
  * The reference pipeline is pure batch (incremental indexing = re-run with
  * --skip-existing), so these are extension surface; the same expressions
  * run unchanged on a stream (`readStream` + watermark) per Spark's unified
  * model — the streaming wiring lives in [[graft.streaming]] and is
  * unit-tested with MemoryStream rather than DuckDB.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations on a
  * derived key (no global sort); session windows shuffle once on user_id.
  */
object TimeWindows extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    // per-hour event counts (tumbling)
    "win_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))
        .orderBy("wstart", "event_type")),

    // 1h window sliding every 15m — each event lands in 4 windows
    "win_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))
        .orderBy("wstart", "event_type")),

    // session windows, 30m inactivity gap, per user
    "win_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("sstart"), col("user_id"), col("n_events"))
        .orderBy("user_id", "sstart")),

    // drop duplicate event_ids (batch form of streaming dedup): feed the
    // stream twice, expect the original back
    // batch contract of the watermark: keep rows within `delay` of the
    // max event time (the streaming form + late-drop proof lives in
    // StreamOps.lateDataCounts / StreamingSpec)
    "stream_late_policy" -> ((s, d) => {
      val e = Tables.events(s, d)
      val horizon = e.agg(max("ts").as("max_ts"))
      e.crossJoin(broadcast(horizon))
        .filter(col("ts") >= col("max_ts") - expr("INTERVAL 1 HOUR"))
        .select("event_id", "user_id")
        .orderBy("event_id")
    }),

    "stream_dedup" -> ((s, d) => {
      val e = Tables.events(s, d).select("event_id", "user_id", "event_type")
      e.unionAll(e).dropDuplicates("event_id").orderBy("event_id")
    }),

    // time-RANGE window frame: per-user rolling 1-hour sum of `value` —
    // the "activity in the trailing hour at each event" feature a
    // sessionized feature store computes per row. RANGE (value-based)
    // bounds, not ROWS, so ties and gaps are handled by the frame itself;
    // one WindowExec partitioned by user_id, and the epoch-seconds sort
    // key keeps the frame arithmetic integer-exact in both engines.
    "win_range_frame" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id").orderBy(col("ts_sec"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        // ts may read as TIMESTAMP_NTZ; the session TZ is pinned UTC so
        // the cast is exact (same pattern as Cdx's epoch_us)
        .withColumn("ts_sec", Tables.eventsTsSec)
        .withColumn("roll_sum", round(sum("value").over(w), 6))
        .select("event_id", "user_id", "ts_sec", "roll_sum")
        .orderBy("event_id")
    }),

    // time-series RESAMPLE to a regular hourly grid with LINEAR
    // interpolation between observations — the gap-filling step every
    // metrics/feature pipeline runs before joining series on aligned
    // timestamps (win_fill_forward is the LOCF member; this is the
    // interpolating one). Shape: observations pre-aggregate to one row
    // per (user, second) — deterministic under duplicate timestamps —
    // then UNION with the grid points and ONE shuffle on user_id feeds
    // two user-partitioned windows (prev = last real obs at-or-before,
    // next = first real obs at-or-after, via a reversed frame); the
    // interpolation itself is a narrow expression. Grid size is bounded
    // by users × horizon (never corpus-sized); an exact-hit grid point
    // takes the observation's value, points outside the observed range
    // stay NULL. The oracle is an independent formulation: two DuckDB
    // ASOF joins (<= / >=) with the identical arithmetic.
    "ts_resample_linear" -> ((s, d) => {
      val g0 = 1704844800L // 2024-01-10 00:00 UTC; 72 hourly points
      val obs = Tables.events(s, d)
        .filter(col("user_id") < 15) // present at every sf
        .withColumn("ts_s", Tables.eventsTsSec)
        .groupBy("user_id", "ts_s").agg(avg("value").as("v"))
      val grid = obs.select("user_id").distinct()
        .crossJoin(broadcast(
          s.range(0, 72).select((lit(g0) + col("id") * 3600L).as("ts_s"))))
      val all = obs.select(col("user_id"), col("ts_s"), col("v"), lit(0).as("is_grid"))
        .unionByName(grid.select(col("user_id"), col("ts_s"),
          lit(null).cast("double").as("v"), lit(1).as("is_grid")))
      // real rows sort BEFORE grid rows at the same ts in BOTH window
      // directions, so an exact-hit observation is visible to each side
      val wPrev = Window.partitionBy("user_id")
        .orderBy(col("ts_s").asc, col("is_grid").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("user_id")
        .orderBy(col("ts_s").desc, col("is_grid").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      all
        .withColumn("pv", last("v", ignoreNulls = true).over(wPrev))
        .withColumn("pt", last(when(col("is_grid") === 0, col("ts_s")), ignoreNulls = true).over(wPrev))
        .withColumn("nv", last("v", ignoreNulls = true).over(wNext))
        .withColumn("nt", last(when(col("is_grid") === 0, col("ts_s")), ignoreNulls = true).over(wNext))
        .filter(col("is_grid") === 1)
        .select(col("user_id"), col("ts_s"),
          round(
            when(col("pt") === col("ts_s"), col("pv"))
              .when(col("pt").isNull || col("nt").isNull, lit(null).cast("double"))
              .otherwise(col("pv") +
                (col("nv") - col("pv")) * ((col("ts_s") - col("pt")) / (col("nt") - col("pt")))),
            6).as("v"))
        .orderBy("user_id", "ts_s")
    }),

    // CUSTOM STATEFUL sessionization (flatMapGroupsWithState) through the
    // driver gate — the §2.8 "stateful custom ops" surface, batch-run:
    // per-user gap sessions with per-session (start, end, count) state,
    // O(active users) state in a streaming deployment (StreamingSpec pins
    // the cross-batch merge through MemoryStream; this entry pins the
    // session arithmetic against the gaps-and-islands oracle). Epoch-µs
    // outputs keep the compare integer-exact.
    "stream_stateful_session" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          Tables.eventsTsUs.as("tsUs"))
        .as[graft.streaming.StreamOps.SessEvent]
      graft.streaming.StreamOps
        .sessionize(ev, gapUs = 30L * 60 * 1000000, flushOpen = true)
        .toDF()
        .orderBy("user_id", "sstart_us")
    }),

    // EVENT-TIME-TIMER sessionization (transformWithState + registerTimer /
    // handleExpiredTimer) through the driver gate — the last StreamOps
    // entry point without a CORRECTNESS row. Batch-run via
    // sessionFlushBatch (ProcessingTime mode: batch plans carry no
    // watermark, so the end-of-batch timer sweep is what flushes each
    // key's final open session — see its scaladoc). All history per key
    // arrives in one invocation, so the emitted set is the complete
    // gaps-and-islands sessions at a 10-minute gap (distinct from
    // stream_stateful_session's 30-minute flatMapGroupsWithState leg).
    // Epoch-MILLIS outputs (Timestamp.getTime) keep the compare
    // integer-exact: Spark's micros→Timestamp floors to ms, matching the
    // oracle's epoch_us // 1000.
    "stream_session_flush" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
        .as[graft.streaming.StreamOps.TimedEvent]
      graft.streaming.StreamOps.sessionFlushBatch(ev, gapMs = 10L * 60 * 1000)
        .toDF()
        .orderBy("user_id", "sstart_ms")
    }),

    // crawl-frontier dedup-and-emit via transformWithState (arbitrary
    // state v2 — the TTL-capable typed-ValueState handle) through the
    // driver gate: each urlkey emits ONCE, on first discovery, with its
    // first-capture ts and sighting count. Batch-run each key's history
    // arrives in one invocation, so the output equals the
    // min-ts/count-per-key oracle; StreamingSpec pins the cross-batch
    // suppression contract through MemoryStream.
    "stream_frontier" -> ((s, d) => {
      import s.implicits._
      val in = graft.Cdx.df(s, d)
        .select(col("urlkey"), col("ts"))
        .as[graft.streaming.StreamOps.FrontierIn]
      graft.streaming.StreamOps.frontier(in)
        .toDF()
        .orderBy("urlkey")
    }),

    // latest-k capture buffer per urlkey (ListState changelog; see
    // RecentKProcessor) — batch-run admissions == the row_number()<=k set
    "stream_recent_k" -> ((s, d) => {
      import s.implicits._
      val in = graft.Cdx.df(s, d)
        .select(col("urlkey"), col("ts"), col("digest"))
        .as[graft.streaming.StreamOps.CaptureIn]
      graft.streaming.StreamOps.recentK(in, k = 3)
        .toDF()
        .orderBy(col("urlkey"), col("ts").desc, col("digest").desc)
    }),

    // deterministic uniform k-sample per source as CONTINUOUS state
    // (bottom-k by hash, ListState; see ReservoirProcessor): "keep k
    // uniformly-random captures per source forever, as they arrive" —
    // Algorithm R's coin flips replaced by one global hash permutation,
    // so replicas, re-runs, and the DuckDB oracle all agree, and the
    // per-group samples stay MERGEABLE (the KMV bottom-k theorem).
    // Batch-run admissions == the row_number()-over-hash closed form.
    "stream_sample_reservoir" -> ((s, d) => {
      import s.implicits._
      val in = graft.Cdx.df(s, d)
        .select(col("hostword").as("group"), col("urlkey"), col("ts"),
          conv(substring(
            md5(concat(col("urlkey"), lit(":"), col("ts"), lit(":smp"))), 1, 8),
            16, 10).cast("bigint").as("h"))
        .as[graft.streaming.StreamOps.SampleIn]
      graft.streaming.StreamOps.sampleReservoir(in, k = 16)
        .toDF()
        .withColumnRenamed("group", "grp")
        .orderBy("grp", "urlkey", "ts")
    }),

    // per-host status-class running counts (MapState changelog; see
    // HostStatusProcessor) — batch-run totals == the GROUP BY oracle
    "stream_host_status" -> ((s, d) => {
      import s.implicits._
      val in = graft.Cdx.df(s, d)
        .select(col("host"),
          concat(floor(col("status") / 100).cast("int").cast("string"), lit("xx"))
            .as("status_class"))
        .as[graft.streaming.StreamOps.HostStatusIn]
      graft.streaming.StreamOps.hostStatus(in)
        .toDF()
        .orderBy("host", "status_class")
    }),

    // per-group Misra-Gries heavy hitters as CONTINUOUS state (one
    // capacity-bounded summary per event_type, folded forward batch
    // after batch — the SAME kernel as the agg_heavy_hitters batch
    // aggregate, so the streaming and batch surfaces share one
    // definition; see HeavyHittersProcessor). Capacity exceeds the
    // corpus's distinct users, so the batch-run summary is exact and
    // the top-10-per-group oracle is a plain window over GROUP BY.
    "stream_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val in = Tables.events(s, d)
        .select(col("event_type").as("group"), col("user_id").as("k"))
        .as[graft.streaming.StreamOps.HHIn]
      graft.streaming.StreamOps.heavyHitters(in, capacity = 2048, topN = 10)
        .toDF()
        .select(col("group").as("event_type"), col("key").as("user_id"), col("cnt"))
        .orderBy(col("event_type"), col("cnt").desc, col("user_id"))
    }),

    // the politeness planner as CONTINUOUS state (ValueState = one long
    // per host, the last granted slot; see PolitenessProcessor): the
    // streaming twin of crawl_politeness, sharing its closed-form oracle
    // verbatim — batch-run the fold over each host's full history must
    // equal the window algebra, or one of the two implementations is
    // wrong. StreamingSpec pins cross-batch slot continuity.
    "stream_politeness" -> ((s, d) => {
      import s.implicits._
      val in = graft.Cdx.df(s, d)
        .select(col("id"), col("host"), col("epoch_us"),
          ((length(col("hostword")) % 3 + 1).cast("bigint") * 1000000L).as("delay_us"))
        .as[graft.streaming.StreamOps.FetchIn]
      graft.streaming.StreamOps.politeness(in)
        .toDF()
        .orderBy("id")
    }),

    // the recrawl estimator's counters as CONTINUOUS state (ValueState =
    // one last-observation + counters record per urlkey; see
    // ChangeRateProcessor): the streaming twin of crawl_change_rate,
    // sharing its lag-window closed-form oracle verbatim — the
    // cross-batch consecutive pair is what the ValueState buys over a
    // windowed recompute. StreamingSpec pins counter continuity across
    // batches; the `ver` plant is the batch key's, byte-for-byte.
    "stream_change_rate" -> ((s, d) => {
      import s.implicits._
      val in = graft.Cdx.df(s, d)
        .withColumn("ver", concat(col("digest"), lit(":"),
          ((col("id") % 13) % 3).cast("string")))
        .select(col("id"), col("urlkey"), col("epoch_us"), col("ts"), col("ver"))
        .as[graft.streaming.StreamOps.ChangeIn]
      graft.streaming.StreamOps.changeRate(in)
        .toDF()
        .orderBy("urlkey")
    }),

    // the deduplicating indexer as CONTINUOUS state (ValueState = one
    // (url, ts) original per payload digest; see RevisitProcessor): the
    // streaming twin of cdx_revisit_generate — and the ingest half of
    // sink_warc_revisit_write — sharing the batch key's closed-form
    // window oracle verbatim. Batch-run the per-digest fold over full
    // history must equal the window algebra, or one of the two
    // implementations is wrong. StreamingSpec pins that a recrawl in a
    // LATER micro-batch still resolves to the day-1 original.
    "stream_revisit_generate" -> ((s, d) => {
      import s.implicits._
      val in = graft.Cdx.df(s, d).where(col("record_type") === "response")
        .select(col("id"), col("urlkey"), col("ts"), col("url"), col("digest"))
        .as[graft.streaming.StreamOps.RevisitIn]
      graft.streaming.StreamOps.revisitGenerate(in)
        .toDF()
        .orderBy("id")
    }),

    // STREAM-STREAM interval join, batch-run (the stream_* driver
    // convention): revisit records join original responses by payload
    // digest with the original required to PRECEDE the revisit within
    // the horizon — the continuous form of join_revisit_resolve, whose
    // unbounded-history equi-join becomes O(horizon) state under the
    // two watermarks revisitResolveStream sets. Batch-run, the SAME
    // function computes the interval join over full history (the
    // analyzer eliminates watermarks on batch inputs); the oracle
    // replays digest equality + the time bound in epoch-µs arithmetic.
    // Cross-batch arrival (original and revisit in different
    // micro-batches) and the batch==stream agreement are pinned in
    // StreamingSpec.
    "stream_revisit_resolve" -> ((s, d) => {
      val c = graft.Cdx.df(s, d)
      def leg(rt: String) = c.filter(col("record_type") === rt)
        .select(col("id").as("event_id"),
          timestamp_micros(col("epoch_us")).as("ts"),
          col("digest").as("value"))
      graft.streaming.StreamOps
        .revisitResolveStream(leg("revisit"), leg("response"), horizon = "17520 hours")
        .select(col("revisit_id"), col("orig_id"))
        .orderBy("revisit_id", "orig_id")
    }),

    // ordered funnel (view -> click within 30m -> purchase within 30m of
    // the click) — the product-analytics sequence query. Shape: three
    // event-type slices equi-join on user_id with in-plan time-range
    // bounds, then first-step aggregation; everything shuffles on
    // user_id only, and the per-user fan-out is bounded by the 30-minute
    // window (a hot user's views only meet the clicks inside each
    // window, not the full history). Epoch-µs keeps the arithmetic
    // integer-exact in both engines.
    "win_funnel_steps" -> ((s, d) => {
      val gapUs = 30L * 60 * 1000000
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          Tables.eventsTsUs.as("ts_us"))
      def slice(t: String, uAs: String, tsAs: String) =
        e.filter(col("event_type") === t)
          .select(col("user_id").as(uAs), col("ts_us").as(tsAs))
      // the range bound lives IN the left join's ON-clause: a view with
      // no in-window click keeps its row (null c_ts) instead of fanning
      // out to the user's whole click history and getting filtered away.
      // event_id keys each view so two views at the same microsecond
      // stay two funnel starts (matching the oracle's per-row semantics)
      val vc = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"), col("ts_us").as("v_ts"))
        .join(slice("click", "cu", "c_ts"),
          col("user_id") === col("cu") &&
            col("c_ts") > col("v_ts") && col("c_ts") <= col("v_ts") + gapUs,
          "left")
        .groupBy("user_id", "v_id", "v_ts")
        .agg(min(col("c_ts")).as("first_click"))
      val vcp = vc
        .join(slice("purchase", "pu", "p_ts"),
          col("user_id") === col("pu") &&
            col("p_ts") > col("first_click") && col("p_ts") <= col("first_click") + gapUs,
          "left")
        .groupBy("user_id", "v_id", "first_click")
        .agg(min(col("p_ts")).as("first_purchase"))
      vcp.groupBy("user_id")
        .agg(count(lit(1)).as("n_views"),
          count(col("first_click")).as("n_clicked"),
          count(col("first_purchase")).as("n_purchased"))
        .orderBy("user_id")
    }),

    // forward-fill (last-observation-carried-forward) per user — the gap
    // repair every telemetry/feature pipeline runs before resampling.
    // `click` events model the sensor dropping its reading (value -> null);
    // last(ignoreNulls) over an unbounded-preceding ROWS frame carries the
    // previous reading forward. One user-partitioned WindowExec (never a
    // global window); values pass through untouched (no arithmetic), so
    // the double column stays oracle-exact. The (ts, event_id) order is
    // total — ties on ts can't flip the fill source.
    "win_fill_forward" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("v",
          when(col("event_type") === "click", lit(null).cast("double"))
            .otherwise(col("value")))
        .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
        .select("event_id", "user_id", "v", "filled")
        .orderBy("event_id")
    }),

    // cohort RETENTION matrix — the product-analytics staple over an
    // event log: users cohort by their first-seen day, and cell
    // (cohort_day, day_offset) counts the distinct cohort members active
    // offset days later. Two shuffles, both on user_id with the exchange
    // reusable between them (first-seen min-agg, then the events⋈cohort
    // equi-join); the final (cohort, offset) agg is |days²|-bounded — 900
    // groups for a 30-day log, a broadcast-sized artifact no matter the
    // corpus. count_distinct's expand runs AFTER the per-user collapse,
    // so it sees (cohort, offset, user) rows, never raw events.
    "win_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        // DATE stays internal; the output renders it as a string so the
        // dump/oracle compare sees one type (DuckDB DATE fetches as
        // Timestamp, Spark DATE as datetime.date — same day, hash FAIL)
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Longest consecutive-day activity streak per user — the classic
    // gaps-and-islands engagement metric (and the dashboard sibling of
    // win_retention_cohorts' cohort view). day − row_number is constant
    // within a run of consecutive days, so streaks fall out of one
    // distinct + one user-partitioned window + two hash aggs; the
    // longest-streak pick is the (max len, min start) struct-max
    // tie-break, no second window. All shuffles on user_id.
    "win_streak" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val streaks = days
        .withColumn("g", expr(
          "date_sub(day, row_number() OVER (PARTITION BY user_id ORDER BY day))"))
        .groupBy("user_id", "g")
        .agg(count(lit(1)).as("len"), min("day").as("start"))
      streaks.groupBy("user_id").agg(
        sum("len").as("n_active_days"),
        max(struct(col("len"),
          (lit(0) - unix_date(col("start"))).as("negs"))).as("best"))
        .select(col("user_id"), col("n_active_days"),
          col("best.len").as("max_streak"),
          date_format(date_from_unix_date(-col("best.negs")), "yyyy-MM-dd")
            .as("streak_start"))
        .orderBy("user_id")
    }),

    // Interval union / coverage — merge overlapping per-user activity
    // intervals (the crawl-window / session-coverage primitive: "how much
    // wall-clock was this user active, in how many contiguous stretches").
    // Each event opens a deterministic half-open interval
    // [t, t + 60 + (id%10)·30); overlapping or touching intervals fuse.
    // Same islands discipline as text_dedup_substring but in the seconds
    // domain: running max-end window partitioned per user with a
    // DETERMINISTIC (start, end, event_id) sort so peer ties can't flip
    // islands between engines; merged spans then reduce per user.
    "ts_interval_coverage" -> ((s, d) => {
      val iv = Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        Tables.eventsTsSec.as("s0"),
        (Tables.eventsTsSec + lit(60L) + (col("event_id") % 10) * 30L).as("e0"))
      val byStart = Window.partitionBy("user_id").orderBy("s0", "e0", "event_id")
      val prevMax = max("e0").over(
        byStart.rowsBetween(Window.unboundedPreceding, -1))
      val merged = iv
        .withColumn("brk",
          when(coalesce(prevMax, lit(Long.MinValue)) < col("s0"), 1L)
            .otherwise(0L))
        .withColumn("iid",
          sum("brk").over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "iid")
        .agg(min("s0").as("ivs"), max("e0").as("ive"))
      merged.groupBy("user_id").agg(
        count(lit(1)).as("n_intervals"),
        sum(col("ive") - col("ivs")).as("covered_sec"),
        min("ivs").as("first_start"),
        max("ive").as("last_end"))
        .orderBy("user_id")
    }),

    // robust per-group anomaly flagging via median absolute deviation —
    // agg_drift_report's row-level sibling (drift watches the
    // distribution, this flags individual readings): a value is anomalous
    // when |v − median| > 3σ-equivalent (3 · 1.4826 ≈ 4.4478 MADs, the
    // Gaussian-consistency constant). Exact grouped percentile (the
    // agg_percentiles buffering trade-off, per event_type not per key) —
    // both medians broadcast back as |event_types|-row artifacts, so the
    // flag itself is a map-side filter over one more corpus pass. Scores
    // stay oracle-exact: Spark's exact percentile and DuckDB's
    // quantile_cont use the same linear interpolation.
    // CUSUM change detection (Page 1954) over per-host daily capture
    // counts — "this host's crawl volume has drifted above baseline",
    // the alarm a crawl operator watches. The textbook recursion
    // s_i = max(0, s_{i-1} + x_i − k) is CLOSED under windows exactly
    // like the politeness scheduler's: s_i = prefix_i − min(0, running
    // min of prefix), where prefix is the running sum of (x − k) — two
    // frames over ONE (host | day) sort, pure integer arithmetic, so
    // the DuckDB replay is exact and there is no per-day iteration.
    // Shape: one hash agg to (host, day) counts (the only data-sized
    // shuffle), then windows over the tiny per-host day series.
    "ts_cusum_alarm" -> ((s, d) => {
      val k = 2L // per-day reference rate; h = 4 alarm threshold
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("hostword").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      graft.Cdx.df(s, d)
        .groupBy(col("hostword"), substring(col("ts"), 1, 8).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prefix", sum(col("cnt") - k).over(w))
        .withColumn("cusum", col("prefix") - least(min("prefix").over(w), lit(0L)))
        .select(col("hostword"), col("day"), col("cnt"), col("cusum"),
          (col("cusum") >= 4).as("alarm"))
        .orderBy("hostword", "day")
    }),

    "ts_anomaly_mad" -> ((s, d) => {
      val ev = Tables.t(s, d, "events")
        .select("event_id", "event_type", "value")
      // med/mad ROUND to 6 digits before any downstream use: the two
      // engines' median interpolation formulas can differ in the last
      // ulp, and the outlier filter below consumes these values raw —
      // rounding first confines any divergence to the same
      // rounding-boundary risk class as every other rounded float column
      val med = ev.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(round(expr("percentile(ad, 0.5)"), 6).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .filter(col("mad") > 0 && col("ad") > col("mad") * 4.4478)
        .select(col("event_id"), col("event_type"),
          round(col("ad") / col("mad"), 6).as("score"))
        .orderBy("event_id")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    // the SAME oracle string as the batch window form — the stream fold
    // and the closed-form window algebra must agree row-for-row
    "stream_politeness" -> Curation.oracleSql("crawl_politeness"),
    // the streaming fold must equal the batch window algebra — ONE oracle
    "stream_revisit_generate" -> CdxOps.oracleSql("cdx_revisit_generate"),
    // join_revisit_resolve's digest join plus the stream op's interval
    // bound, replayed in epoch-µs (17520 h = 730 d = 63_072_000_000_000 µs
    // — the fixture ts is daily-grain over years, so the horizon is sized
    // to produce matches at every SF)
    "stream_revisit_resolve" -> (graft.Cdx.duckCte +
      "SELECT r.id AS revisit_id, o.id AS orig_id " +
      "FROM cdx r JOIN cdx o ON r.digest = o.digest " +
      "WHERE r.record_type = 'revisit' AND o.record_type = 'response' " +
      "AND o.epoch_us <= r.epoch_us " +
      "AND o.epoch_us >= r.epoch_us - 63072000000000 " +
      "ORDER BY revisit_id, orig_id"),
    "stream_change_rate" -> Curation.oracleSql("crawl_change_rate"),
    // the hash permutation is shared verbatim, so the streamed bottom-k
    // must equal the windowed closed form row-for-row
    "stream_sample_reservoir" -> (graft.Cdx.duckCte +
      "SELECT grp, urlkey, ts FROM (" +
        "SELECT hostword AS grp, urlkey, ts, " +
        "row_number() OVER (PARTITION BY hostword ORDER BY h, urlkey, ts) AS rn " +
        "FROM (SELECT DISTINCT hostword, urlkey, ts, " +
        "CAST('0x' || substring(md5(urlkey || ':' || ts || ':smp'), 1, 8) AS BIGINT) AS h " +
        "FROM cdx)) WHERE rn <= 16 ORDER BY grp, urlkey, ts"),
    // same two-frame closed form over the same (host | day) sort
    "ts_cusum_alarm" -> (graft.Cdx.duckCte +
      "SELECT hostword, day, cnt, " +
        "prefix - least(min(prefix) OVER w2, 0) AS cusum, " +
        "(prefix - least(min(prefix) OVER w2, 0)) >= 4 AS alarm FROM (" +
        "SELECT hostword, day, cnt, " +
        "CAST(sum(cnt - 2) OVER (PARTITION BY hostword ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix " +
        "FROM (SELECT hostword, substring(ts, 1, 8) AS day, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM cdx GROUP BY 1, 2)) " +
        "WINDOW w2 AS (PARTITION BY hostword ORDER BY day ROWS UNBOUNDED PRECEDING) " +
        "ORDER BY hostword, day"),
    // independent formulation: two ASOF joins (<= prev / >= next), same
    // pre-aggregation and the identical interpolation arithmetic
    "ts_resample_linear" ->
      ("WITH obs AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_s, " +
        "avg(value) AS v FROM events WHERE user_id < 15 GROUP BY 1, 2), " +
        "grid AS (SELECT u.user_id, g.ts_s FROM " +
        "(SELECT DISTINCT user_id FROM obs) u, " +
        "(SELECT 1704844800 + unnest(range(0, 72)) * 3600 AS ts_s) g), " +
        "prev AS (SELECT g.user_id, g.ts_s, e.ts_s AS pt, e.v AS pv " +
        "FROM grid g ASOF LEFT JOIN obs e ON g.user_id = e.user_id AND e.ts_s <= g.ts_s), " +
        "nxt AS (SELECT g.user_id, g.ts_s, e.ts_s AS nt, e.v AS nv " +
        "FROM grid g ASOF LEFT JOIN obs e ON g.user_id = e.user_id AND e.ts_s >= g.ts_s) " +
        "SELECT p.user_id, p.ts_s, round(CASE WHEN p.pt = p.ts_s THEN p.pv " +
        "WHEN p.pt IS NULL OR n.nt IS NULL THEN NULL " +
        "ELSE p.pv + (n.nv - p.pv) * ((p.ts_s - p.pt) / (n.nt - p.pt)) END, 6) AS v " +
        "FROM prev p JOIN nxt n ON p.user_id = n.user_id AND p.ts_s = n.ts_s " +
        "ORDER BY p.user_id, p.ts_s"),
    "win_tumbling" ->
      ("SELECT date_trunc('hour', ts) AS wstart, event_type, count(*) AS cnt " +
        "FROM events GROUP BY wstart, event_type ORDER BY wstart, event_type"),
    // Spark aligns sliding windows to epoch multiples of the slide; an event
    // at t is in the 4 windows starting at floor(t/15m)*15m - i*15m, i=0..3
    "win_sliding" ->
      ("SELECT wstart, event_type, count(*) AS cnt FROM (" +
        "SELECT make_timestamp(((floor(epoch(ts))::BIGINT // 900) * 900 - i * 900) * 1000000) AS wstart, event_type " +
        "FROM events, (SELECT unnest([0, 1, 2, 3]) AS i)) " +
        "GROUP BY wstart, event_type ORDER BY wstart, event_type"),
    // gaps-and-islands; new session when gap >= 30m (Spark windows are
    // [start, end), so an event exactly at prev+30m opens a new session)
    "win_session" ->
      ("WITH marked AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "sess AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM marked) " +
        "SELECT min(ts) AS sstart, user_id, count(*) AS n_events " +
        "FROM sess GROUP BY user_id, sid ORDER BY user_id, sstart"),
    // per-view first-step resolution as correlated scalar subqueries —
    // semantically identical to the Spark range-bounded left joins
    "win_funnel_steps" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events), " +
        "vc AS (SELECT v.user_id, v.ts_us AS v_ts, " +
        "(SELECT min(c.ts_us) FROM ev c WHERE c.user_id = v.user_id AND c.event_type = 'click' " +
        "AND c.ts_us > v.ts_us AND c.ts_us <= v.ts_us + 1800000000) AS first_click " +
        "FROM ev v WHERE v.event_type = 'view'), " +
        "vcp AS (SELECT user_id, v_ts, first_click, " +
        "(SELECT min(p.ts_us) FROM ev p WHERE p.user_id = vc.user_id AND p.event_type = 'purchase' " +
        "AND p.ts_us > vc.first_click AND p.ts_us <= vc.first_click + 1800000000) AS first_purchase " +
        "FROM vc) " +
        "SELECT user_id, count(*) AS n_views, count(first_click) AS n_clicked, " +
        "count(first_purchase) AS n_purchased FROM vcp GROUP BY user_id ORDER BY user_id"),
    // same gaps-and-islands as win_session, in epoch-µs, with session
    // end + count — the complete session set the batch run must emit
    "stream_stateful_session" ->
      ("WITH marked AS (SELECT user_id, epoch_us(ts) AS ts_us, " +
        "CASE WHEN lag(epoch_us(ts)) OVER w IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))), " +
        "sess AS (SELECT user_id, ts_us, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM marked) " +
        "SELECT user_id, min(ts_us) AS sstart_us, max(ts_us) AS send_us, " +
        "count(*) AS n_events FROM sess GROUP BY user_id, sid ORDER BY user_id, sstart_us"),
    // gaps-and-islands at ms resolution, 10-minute gap — the complete
    // session set the batch-run timer sweep must emit (open sessions
    // included: the processing-time flush fires for every key)
    "stream_session_flush" ->
      ("WITH marked AS (SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, " +
        "CASE WHEN lag(epoch_us(ts) // 1000) OVER w IS NULL " +
        "OR epoch_us(ts) // 1000 - lag(epoch_us(ts) // 1000) OVER w >= 600000 THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000, epoch_us(ts))), " +
        "sess AS (SELECT user_id, ts_ms, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM marked) " +
        "SELECT user_id, min(ts_ms) AS sstart_ms, max(ts_ms) AS send_ms, " +
        "count(*) AS n_events FROM sess GROUP BY user_id, sid " +
        "ORDER BY user_id, sstart_ms"),

    // batch-run frontier == first capture + sighting count per urlkey
    "stream_frontier" ->
      (graft.Cdx.duckCte + "SELECT urlkey, min(ts) AS first_ts, " +
        "count(*) AS n_seen FROM cdx GROUP BY urlkey ORDER BY urlkey"),
    "stream_recent_k" ->
      (graft.Cdx.duckCte + "SELECT urlkey, ts, digest FROM (" +
        "SELECT urlkey, ts, digest, row_number() OVER (" +
        "PARTITION BY urlkey ORDER BY ts DESC, digest DESC) AS rn FROM cdx) " +
        "WHERE rn <= 3 ORDER BY urlkey, ts DESC, digest DESC"),
    "stream_host_status" ->
      (graft.Cdx.duckCte + "SELECT host, " +
        "CAST(floor(status / 100) AS INT) || 'xx' AS status_class, " +
        "count(*) AS n FROM cdx GROUP BY host, status_class " +
        "ORDER BY host, status_class"),
    "stream_late_policy" ->
      ("SELECT event_id, user_id FROM events " +
        "WHERE ts >= (SELECT max(ts) - INTERVAL 1 HOUR FROM events) ORDER BY event_id"),
    // capacity > distinct users ⇒ the folded summary is exact; tie-break
    // (cnt desc, user_id asc) matches the kernel's top() ordering
    "stream_heavy_hitters" ->
      ("SELECT event_type, user_id, cnt FROM (" +
        "SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id) AS rn " +
        "FROM events GROUP BY event_type, user_id) " +
        "WHERE rn <= 10 ORDER BY event_type, cnt DESC, user_id"),
    "stream_dedup" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "win_range_frame" ->
      ("SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_sec, " +
        "round(sum(value) OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000) " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS roll_sum " +
        "FROM events ORDER BY event_id"),
    "win_fill_forward" ->
      ("SELECT event_id, user_id, v, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled " +
        "FROM (SELECT *, CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v " +
        "FROM events) ORDER BY event_id")
      ,
    "win_retention_cohorts" ->
      ("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id) " +
        "SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day, " +
        "CAST(date_diff('day', c.cohort_day, e.day) AS INT) AS day_offset, " +
        "count(DISTINCT e.user_id) AS n_users " +
        "FROM ev e JOIN cohort c USING (user_id) " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // day − row_number islands; the (max len, min start) pick is the
    // agg_mode struct-max idiom with negated epoch-days
    "win_streak" ->
      ("WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "streaks AS (SELECT user_id, g, CAST(count(*) AS BIGINT) AS len, min(day) AS start " +
        "FROM (SELECT user_id, day, day - CAST(row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day) AS INT) AS g FROM days) GROUP BY user_id, g) " +
        "SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days, " +
        "(max({'len': len, 'negs': -(start - DATE '1970-01-01')})).len AS max_streak, " +
        "strftime(DATE '1970-01-01' + CAST(-(max({'len': len, 'negs': -(start - DATE '1970-01-01')})).negs AS INT), '%Y-%m-%d') AS streak_start " +
        "FROM streaks GROUP BY user_id ORDER BY user_id"),
    // identical islands SQL in the seconds domain; the coalesce seed is
    // LONG_MIN so the first interval per user always opens a span
    "ts_interval_coverage" ->
      ("WITH iv AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s0, " +
        "epoch_us(ts) // 1000000 + 60 + (event_id % 10) * 30 AS e0 FROM events), " +
        "m AS (SELECT user_id, event_id, s0, e0, CASE WHEN coalesce(max(e0) OVER " +
        "(PARTITION BY user_id ORDER BY s0, e0, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
        "-9223372036854775808) < s0 THEN 1 ELSE 0 END AS brk FROM iv), " +
        "m2 AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY s0, e0, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS iid FROM m), " +
        "mg AS (SELECT user_id, iid, min(s0) AS ivs, max(e0) AS ive FROM m2 GROUP BY user_id, iid) " +
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals, " +
        "CAST(sum(ive - ivs) AS BIGINT) AS covered_sec, " +
        "min(ivs) AS first_start, max(ive) AS last_end " +
        "FROM mg GROUP BY user_id ORDER BY user_id"),
    "ts_anomaly_mad" ->
      ("WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med " +
        "FROM events GROUP BY event_type), " +
        "dev AS (SELECT e.event_id, e.event_type, abs(e.value - m.med) AS ad " +
        "FROM events e JOIN med m USING (event_type)), " +
        "mad AS (SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad " +
        "FROM dev GROUP BY event_type) " +
        "SELECT d.event_id, d.event_type, round(d.ad / m.mad, 6) AS score " +
        "FROM dev d JOIN mad m USING (event_type) " +
        "WHERE m.mad > 0 AND d.ad > m.mad * 4.4478 ORDER BY d.event_id")
  )
}
