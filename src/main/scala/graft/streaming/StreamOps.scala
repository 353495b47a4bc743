package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SURVEY.md §2.8 — the streaming side of the time-window operators.
  * Each transform takes a (possibly streaming) events DataFrame with
  * columns (event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,
  * value DOUBLE) and returns the transformed frame; identical expressions
  * run in batch (DuckDB-oracled via graft.queries.TimeWindows) and on a
  * stream (unit-tested with MemoryStream in StreamingSpec).
  *
  * The reference pipeline is pure batch — incremental indexing is re-run
  * with --skip-existing (indexwarcsjob.py, recon) — so this surface is the
  * engine's extension for continuous ingest: the same CDX derivations
  * running on a WARC-arrival stream.
  *
  * Scale notes: watermarks bound all state; session/dedup state is keyed
  * (user_id / event_id) so it shards across executors; no global windows.
  */
object StreamOps {

  /** per-hour event counts; watermark bounds window state to 1h of lag */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))

  /** 1h windows sliding every 15m */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))

  /** session windows with a 30m inactivity gap, per user */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sstart"), col("user_id"), col("n_events"))

  /** Stream-stream interval join — the continuous form of
    * join_revisit_resolve: a stream of revisit records joined to the
    * stream of original captures with the same digest, where the
    * original must precede the revisit by at most `horizon`. BOTH sides
    * are watermarked and the join condition time-bounds both event
    * times, so Spark can evict originals older than the horizon and
    * revisits older than the watermark — state is O(horizon of data),
    * never unbounded (the non-negotiable property of a stream-stream
    * join at crawl scale). */
  def revisitResolveStream(
      revisits: DataFrame, originals: DataFrame,
      horizon: String = "1 hour"): DataFrame = {
    // the watermark delay must track the join horizon: a hardcoded 1h
    // with horizon="24 hours" would silently drop any revisit arriving
    // over 1h late even though the bound promises day-old originals
    val r = revisits
      .withWatermark("ts", horizon)
      .select(col("event_id").as("revisit_id"), col("ts").as("revisit_ts"),
        col("value").as("digest_r"))
    val o = originals
      .withWatermark("ts", horizon)
      .select(col("event_id").as("orig_id"), col("ts").as("orig_ts"),
        col("value").as("digest_o"))
    r.join(o,
      col("digest_r") === col("digest_o") &&
        col("orig_ts") <= col("revisit_ts") &&
        col("orig_ts") >= col("revisit_ts") - expr(s"INTERVAL $horizon"))
  }

  /** exactly-once style dedup on event_id — the streaming form of
    * `stream_dedup`. State caveat: the watermark does NOT evict this
    * operator's state (eviction requires the event-time column in the
    * dedup key set, and keying on (event_id, ts) would stop catching a
    * duplicate whose replay carries a different ts — the contract the
    * spec pins), so state grows with DISTINCT event_ids for the query's
    * lifetime. Right for bounded replays/backfills; a 100 TB/day
    * always-on stream uses [[dedupWithinWatermark]], whose state tracks
    * the watermark window. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Like [[dedup]] but with BOUNDED state: dropDuplicatesWithinWatermark
    * evicts a key's dedup state once the watermark passes its event time,
    * so state size tracks the watermark window, not the full key
    * cardinality. The trade: a duplicate arriving after eviction is kept
    * — the right contract for at-least-once sources whose duplicates
    * cluster near the original (crawl fetch retries), and the ONLY viable
    * one at 100 TB/day where plain dropDuplicates state grows forever. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** `stream_late_policy`: records older than the watermark are dropped
    * from aggregations — demonstrated by aggregating AFTER the watermark;
    * the spec drives late rows through MemoryStream and asserts they do
    * not resurrect closed windows */
  def lateDataCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("cnt"))

  // ---- custom stateful operator (crawl-frontier-style state) ----

  final case class UserEvent(event_id: Long, user_id: Long, event_type: String, tsMs: Long)
  final case class UserState(nEvents: Long, lastTsMs: Long)
  final case class UserUpdate(user_id: Long, nEvents: Long, newInBatch: Long)

  /** per-user running counts via mapGroupsWithState — the pattern a
    * continuous crawl frontier would use (per-host politeness state,
    * last-fetch time, fetch counts). ProcessingTimeTimeout keeps state
    * bounded in real deployments; the spec uses NoTimeout determinism. */
  def userRunningCounts(events: Dataset[UserEvent]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          val events = batch.toSeq
          // Long.MinValue sentinel, not 0: epochs are SIGNED, and a 0L
          // seed would clamp pre-1970 event times (mergeSessions' guard)
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          val next = UserState(
            prev.nEvents + events.size,
            if (events.isEmpty) prev.lastTsMs
            else math.max(prev.lastTsMs, events.map(_.tsMs).max))
          state.update(next)
          UserUpdate(userId, next.nEvents, events.size.toLong)
      }
  }

  final case class SessEvent(user_id: Long, tsUs: Long)
  final case class SessState(startUs: Long, endUs: Long, n: Long)
  final case class SessionOut(
      user_id: Long, sstart_us: Long, send_us: Long, n_events: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * operator session_window can't express when the emission contract is
    * per-CLOSED-session with arbitrary per-session state. A session is a
    * maximal run of a user's events where consecutive gaps are < `gapUs`
    * (gap >= gapUs opens a new one — the same boundary convention as
    * win_session). State is ONE open session per user (three longs), so
    * state size is O(active users) regardless of history length; closed
    * sessions are emitted and forgotten.
    *
    * `flushOpen = true` (the batch/driver path, where each key's full
    * history arrives in the one invocation) also emits the trailing
    * still-open session, making the output the complete session set —
    * exactly the gaps-and-islands SQL the DuckDB oracle runs. A streaming
    * deployment keeps `flushOpen = false` and flushes idle sessions with
    * an EventTimeTimeout instead (StreamingSpec pins the cross-batch
    * session merge through MemoryStream).
    *
    * Per-invocation work sorts ONE user's batch slice in memory —
    * the bounded-per-key pattern every mapGroups state op relies on.
    * Late-data policy (streaming only — a batch invocation sees each
    * key's history sorted, so no branch below ever fires): an event
    * within `gapUs` of the open session's start extends it backward; an
    * event older than that belongs to an already-emitted past and is
    * dropped, the same contract a watermark enforces — retro-splitting
    * would need unbounded history, which O(1) state forbids. */
  /** THE session-merge discipline, defined once for both sessionizer legs
    * (the flatMapGroupsWithState leg in µs and the timer leg in ms — the
    * two previously carried verbatim copies of this loop, and a boundary
    * bug lived in both): merge one key's SORTED batch timestamps into the
    * open `(start, end, n)` session. Forward: a gap `>= gap` closes the
    * open session and starts a new one. Backward (late data, streaming
    * only — batch invocations see each key's full sorted history): an
    * event STRICTLY within `gap` of the open session's start extends it
    * backward; an event at or beyond `start - gap` belongs to an
    * already-emitted past and is dropped — `t == start - gap` is a
    * full-gap distance, which the forward rule would split on, so the
    * backward rule must too (dropping is the same contract a watermark
    * enforces; retro-splitting would need unbounded history, which O(1)
    * state forbids). Returns (closed sessions, open session). */
  private[streaming] def mergeSessions(
      ts: Array[Long], open: Option[(Long, Long, Long)], gap: Long)
      : (Seq[(Long, Long, Long)], Option[(Long, Long, Long)]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    // explicit hasOpen flag, NOT a sentinel timestamp — epoch times are
    // signed, so pre-1970 timestamps are valid values
    var hasOpen = open.isDefined
    var (st, en, n) = open.getOrElse((0L, 0L, 0L))
    var i = 0
    while (i < ts.length) {
      val t = ts(i)
      if (!hasOpen) { hasOpen = true; st = t; en = t; n = 1 }
      else if (t <= st - gap) {
        // late event at or beyond the open session's reach — dropped
      } else if (t - en >= gap) {
        out += ((st, en, n)); st = t; en = t; n = 1
      } else {
        if (t < st) st = t
        if (t > en) en = t
        n += 1
      }
      i += 1
    }
    (out.toSeq, if (hasOpen) Some((st, en, n)) else None)
  }

  def sessionize(events: Dataset[SessEvent], gapUs: Long,
      flushOpen: Boolean): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          val ts = rows.map(_.tsUs).toArray
          java.util.Arrays.sort(ts)
          val (closed, openAfter) = mergeSessions(
            ts, state.getOption.map(s => (s.startUs, s.endUs, s.n)), gapUs)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          closed.foreach { case (s, e, n) => out += SessionOut(uid, s, e, n) }
          openAfter match {
            case Some((s, e, n)) if flushOpen =>
              out += SessionOut(uid, s, e, n); state.remove()
            case Some((s, e, n)) => state.update(SessState(s, e, n))
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** transformWithState form of the frontier state (Spark 4 arbitrary
    * state v2): typed ValueState per user, TTL-capable handle — the
    * SURVEY §2.8 "stateful custom ops" hard-tail item. */
  final class UserCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserUpdate] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var state: ValueState[UserState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[UserState](
        "userState", Encoders.product[UserState], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, inputRows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserUpdate] = {
      val events = inputRows.toSeq
      // Long.MinValue sentinel — signed-epoch guard, same as above
      val prev = Option(state.get()).getOrElse(UserState(0L, Long.MinValue))
      val next = UserState(
        prev.nEvents + events.size,
        if (events.isEmpty) prev.lastTsMs
        else math.max(prev.lastTsMs, events.map(_.tsMs).max))
      state.update(next)
      Iterator.single(UserUpdate(key, next.nEvents, events.size.toLong))
    }
  }

  // ---- crawl-frontier dedup-and-emit (transformWithState driver key) ----

  final case class FrontierIn(urlkey: String, ts: String)
  final case class FrontierState(firstTs: String, n: Long)
  final case class FrontierOut(urlkey: String, first_ts: String, n_seen: Long)

  /** Crawl-frontier dedup-and-emit: a candidate URL stream where each
    * urlkey must be fetched ONCE — the frontier answers "is this new?"
    * and emits a key only on first discovery, with per-key
    * (first-capture ts, seen count) state. transformWithState (arbitrary
    * state v2) rather than mapGroupsWithState: the typed ValueState
    * handle is TTL-capable (`ttl` — a real frontier expires keys to
    * re-crawl after N days; the driver key passes TTLConfig.NONE for
    * determinism) and the processor generalizes to multiple state
    * variables (politeness timers, retry counters) without re-keying.
    *
    * State is O(distinct urlkeys) × three fields — at 100 TB this is the
    * shape that stays bounded only WITH the TTL eviction, which is
    * exactly why the TTL-capable handle is the right primitive here.
    *
    * Batch-run through the driver gate, each key's full history arrives
    * in one invocation, so the output is (urlkey, min ts, count) —
    * the `SELECT urlkey, min(ts), count(*) GROUP BY urlkey` oracle.
    * StreamingSpec pins the cross-batch contract: a key introduced in
    * batch 1 is SUPPRESSED in batch 2 (emitted once, counted twice). */
  final class FrontierProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, FrontierIn, FrontierOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var seen: ValueState[FrontierState] = _

    override def init(
        outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getValueState[FrontierState](
        "frontier", Encoders.product[FrontierState], ttl)
    }

    override def handleInputRows(
        key: String, inputRows: Iterator[FrontierIn],
        timerValues: TimerValues): Iterator[FrontierOut] = {
      var mn: String = null
      var cnt = 0L
      inputRows.foreach { r =>
        if (mn == null || r.ts < mn) mn = r.ts
        cnt += 1L
      }
      Option(seen.get()) match {
        case Some(prev) =>
          // known key: count the re-sighting, emit nothing — the
          // dedup-and-emit contract (first_ts never moves backward in a
          // stream: earlier-ts arrivals after discovery are late data)
          seen.update(FrontierState(prev.firstTs, prev.n + cnt))
          Iterator.empty
        case None =>
          seen.update(FrontierState(mn, cnt))
          Iterator.single(FrontierOut(key, mn, cnt))
      }
    }
  }

  /** BATCH-run TWS still loads a RocksDB store per task, and store load
    * reports its snapshot version to the driver's StateStoreCoordinator
    * RPC endpoint — which only STREAMING query startup registers
    * (StreamingQueryManager's lazy stateStoreCoordinator). Force that
    * same lazy so batch tasks find the endpoint; going through the
    * manager (reflectively — the member is private[sql]) means a later
    * real streaming query SHARES the ref instead of double-registering.
    * One definition for every batch-run transformWithState entry point
    * (frontier / recentK / hostStatus). */
  private def ensureStateStoreCoordinator(
      s: org.apache.spark.sql.SparkSession): Unit = {
    val mgr = s.streams
    try mgr.getClass.getMethod("stateStoreCoordinator").invoke(mgr)
    catch {
      // a real initialization failure inside the getter arrives wrapped —
      // surface ITS cause rather than misdiagnosing it as an API change
      case e: java.lang.reflect.InvocationTargetException =>
        throw new IllegalStateException(
          "StateStoreCoordinator initialization failed (batch " +
            "transformWithState needs the coordinator)", e.getCause)
      // private-API dependency (no public batch hook exists): fail with
      // a message that names the fix instead of a bare NoSuchMethod
      // deep inside a task retry loop
      case e @ (_: NoSuchMethodException | _: IllegalAccessException) =>
        throw new IllegalStateException(
          "could not pre-register the StateStoreCoordinator via " +
            "StreamingQueryManager.stateStoreCoordinator (private API " +
            "changed in this Spark version?) — batch transformWithState " +
            "needs the coordinator; start any streaming query first, or " +
            "update this shim", e)
    }
  }

  /** frontier over a candidate stream/batch; see [[FrontierProcessor]] */
  def frontier(in: Dataset[FrontierIn],
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[FrontierOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.urlkey)
      .transformWithState(new FrontierProcessor(ttl), TimeMode.None(), OutputMode.Append())
  }

  // ---- per-group Misra-Gries heavy hitters as CONTINUOUS state ----

  final case class HHIn(group: String, k: Long)
  final case class HHOut(group: String, key: Long, cnt: Long)

  /** Per-group heavy hitters as CONTINUOUS state: each group carries a
    * capacity-bounded Misra-Gries summary (the SAME kernel the batch
    * `heavy_hitters` aggregate runs — [[graft.functions.MisraGries]],
    * one definition so the two surfaces cannot drift), folded forward
    * batch after batch, emitting the current top-`topN` per group on
    * every update. State is ≤ capacity (key, count) pairs per group
    * FOREVER — the property that makes an all-time "who dominates this
    * host/type" dashboard affordable where an exact GROUP BY's state
    * grows with distinct keys. Exact while a group's distinct keys fit
    * the capacity; past it, the n/(capacity+1) undercount bound holds
    * per group (the batch aggregate's property suite covers the bound;
    * StreamingSpec pins cross-batch fold == one-shot here). */
  def heavyHitters(
      in: Dataset[HHIn], capacity: Int, topN: Int): Dataset[HHOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.group)
      .transformWithState(
        new HeavyHittersProcessor(capacity, topN), TimeMode.None(), OutputMode.Update())
  }

  final class HeavyHittersProcessor(capacity: Int, topN: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, HHIn, HHOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var mg: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mg = getHandle.getValueState[Array[Byte]]("mg", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(
        key: String, inputRows: Iterator[HHIn],
        timerValues: TimerValues): Iterator[HHOut] = {
      val buf = Option(mg.get())
        .map(graft.functions.MisraGries.deserialize)
        .getOrElse(scala.collection.mutable.HashMap.empty[Long, Long])
      inputRows.foreach(r => graft.functions.MisraGries.update(buf, r.k, capacity))
      mg.update(graft.functions.MisraGries.serialize(buf))
      graft.functions.MisraGries.top(buf).take(topN).iterator
        .map { case (k, c) => HHOut(key, k, c) }
    }
  }

  // ---- event-time-timer session flush (arbitrary state v2 TIMERS) ----

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)
  final case class FlushedSession(
      user_id: Long, sstart_ms: Long, send_ms: Long, n_events: Long)

  /** The streaming-deployment leg [[sessionize]]'s scaladoc promises: an
    * IDLE session flushes when the event-time watermark passes its
    * gap deadline, WITHOUT the key receiving another event — via
    * transformWithState's event-time timers (registerTimer /
    * handleExpiredTimer), the arbitrary-state-v2 facility
    * mapGroupsWithState exposed only as coarse GroupStateTimeout.
    *
    * Per batch a key merges its events into the open session (same gap /
    * late-data discipline as [[sessionize]]), emits any sessions an
    * in-batch gap closed, then re-arms a flush timer at `end + gap`.
    * Stale timers from extended sessions fire and are IGNORED by the
    * expiry check (`expiry >= end + gap` fails once the session grew) —
    * cheaper than delete-and-re-register, and the timer count per key is
    * bounded by its batch count and drains as the watermark advances.
    * State is O(active keys) × three longs; a flushed key leaves no
    * state and no live timer deadline. StreamingSpec drives this through
    * MemoryStream and pins the no-further-input flush. */
  final class SessionFlushProcessor(gapMs: Long, flushAtBatchEnd: Boolean = false)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TimedEvent, FlushedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[FlushedSession] = {
      val ts = rows.map(_.ts.getTime).toArray
      java.util.Arrays.sort(ts)
      // one RocksDB point lookup per key per batch — each ValueState.get
      // is a real store read, unlike GroupState.getOption's in-memory view
      val cur = Option(open.get()).map(s => (s.startMs, s.endMs, s.n))
      // same merge discipline as the flatMapGroupsWithState leg — ONE
      // definition (mergeSessions), so the two legs cannot drift
      val (closed, openAfter) = mergeSessions(ts, cur, gapMs)
      openAfter.foreach { case (st, en, n) =>
        open.update(OpenSession(st, en, n))
        // one-shot batch: the event-time deadline en+gap can sit in the
        // FUTURE of the processing-time sweep (live-tail data whose last
        // event is within gap of wall-clock now) — register an
        // already-expired timer instead, so END OF INPUT is the flush
        // point and the output never depends on when the batch ran
        if (flushAtBatchEnd)
          getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() - 1)
        else getHandle.registerTimer(en + gapMs)
      }
      closed.iterator.map { case (st, en, n) => FlushedSession(key, st, en, n) }
    }

    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FlushedSession] =
      Option(open.get()) match {
        // batch mode: one invocation per key means the open state IS the
        // final session — flush unconditionally (the staleness check
        // below compares against an event-time deadline this mode never
        // registers)
        case Some(s)
          if flushAtBatchEnd ||
            expiredTimerInfo.getExpiryTimeInMs >= s.endMs + gapMs =>
          open.clear()
          Iterator.single(FlushedSession(key, s.startMs, s.endMs, s.n))
        case _ => Iterator.empty // stale timer — the session grew since
      }
  }

  /** idle-flushing sessionizer over a timestamped stream; 0-delay
    * watermark keeps the spec deterministic (the caller picks a real
    * allowed-lateness in production) */
  def sessionFlush(in: Dataset[TimedEvent], gapMs: Long): Dataset[FlushedSession] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    in.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionFlushProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[sessionFlush]] for one-shot BATCH execution (the driver gate's
    * `stream_session_flush` key): batch plans carry no watermark
    * (`eventTimeWatermarkForEviction` is None in
    * `TransformWithStateExec.generateSparkPlanForBatchQueries`), so
    * EventTime timers throw INTERNAL_ERROR_TWS — ProcessingTime mode
    * instead, with `flushAtBatchEnd`: each key registers an
    * already-expired timer, so the end-of-batch sweep flushes every open
    * session regardless of how its event times relate to wall-clock now
    * (registering the event-time deadline `end + gap` would silently
    * drop any key whose last event is within gap of now — live-tail
    * data). Identical per-key session arithmetic as the streaming leg;
    * the ONLY behavioral delta is WHEN the final open session flushes,
    * and in a one-shot batch end-of-input is the correct flush point.
    * Output is therefore the complete gaps-and-islands session set. */
  def sessionFlushBatch(in: Dataset[TimedEvent], gapMs: Long): Dataset[FlushedSession] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.user_id)
      .transformWithState(
        new SessionFlushProcessor(gapMs, flushAtBatchEnd = true),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** same running counts through transformWithState */
  def userRunningCountsTws(events: Dataset[UserEvent]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new UserCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  // ---- latest-k capture buffer (transformWithState LIST state) ----

  final case class CaptureIn(urlkey: String, ts: String, digest: String)
  final case class CaptureOut(urlkey: String, ts: String, digest: String)

  /** Per-urlkey latest-k capture buffer — the state a continuously-fed
    * replay index maintains so `closest`/memento queries never scan
    * history: each key keeps its k most-recent captures (ts desc, digest
    * desc tie-break), merged incrementally as batches arrive.
    *
    * ListState rather than a ValueState[Seq]: the list is the native
    * multi-value handle (`put`/`get` of the kept rows without re-encoding
    * a wrapper struct), and it generalizes to unbounded append patterns
    * where ValueState would rewrite the whole blob per arrival.
    *
    * Emission contract is the ADMISSION CHANGELOG: a capture row is
    * emitted exactly when it enters the kept top-k (multiset-aware, so
    * duplicate identical captures each count once) — the delta a
    * downstream incremental index consumes. An evicted row is never
    * re-emitted. Batch-run for the driver gate, one invocation sees the
    * full history, so admissions == the final kept set == the
    * `row_number() <= k` oracle; StreamingSpec pins the cross-batch
    * contract (later batch admits the newer capture only, evictions stay
    * silent). State is O(keys) × k rows. */
  final class RecentKProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, CaptureIn, CaptureOut] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var kept: ListState[CaptureIn] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      kept = getHandle.getListState[CaptureIn](
        "recent", Encoders.product[CaptureIn], TTLConfig.NONE)

    // most-recent-first total order over the kept triple (rows with equal
    // (ts, digest) under one urlkey are identical rows, so the order is
    // deterministic for the oracle compare)
    private def newer(a: CaptureIn, b: CaptureIn): Boolean =
      a.ts > b.ts || (a.ts == b.ts && a.digest > b.digest)

    override def handleInputRows(
        key: String, rows: Iterator[CaptureIn],
        timerValues: TimerValues): Iterator[CaptureOut] = {
      val prev = {
        val b = scala.collection.mutable.ArrayBuffer.empty[CaptureIn]
        val it = kept.get(); while (it.hasNext) b += it.next()
        b.toArray
      }
      val merged = (prev ++ rows).sortWith(newer).take(k)
      kept.put(merged)
      // multiset delta vs prev: emit each admitted occurrence once
      val remaining = scala.collection.mutable.ArrayBuffer.from(prev)
      merged.iterator.filter { c =>
        val i = remaining.indexOf(c)
        if (i >= 0) { remaining.remove(i); false } else true
      }.map(c => CaptureOut(c.urlkey, c.ts, c.digest))
    }
  }

  // ---- deterministic uniform k-sample (transformWithState LIST state) ----

  final case class SampleIn(group: String, urlkey: String, ts: String, h: Long)
  final case class SampleOut(group: String, urlkey: String, ts: String)

  /** Uniform k-sample per group over an UNBOUNDED stream — the
    * training-data primitive ("keep 10k uniformly-random docs per source
    * forever, as they arrive"). Classic streaming sampling is Vitter's
    * Algorithm R, but its coin flips make replicas diverge and oracles
    * impossible; BOTTOM-K BY HASH is the distributed-systems answer: a
    * fixed hash assigns every distinct item a rank in one global random
    * permutation, so "the k smallest hashes seen so far" IS a uniform
    * sample without replacement — deterministic (re-runs and replicas
    * agree, the DuckDB oracle replays it), MERGEABLE (bottom-k of a
    * union = bottom-k of the unioned samples — the same theorem the KMV
    * sketch rides), and incrementally maintainable in O(k) state per
    * group. Items are identified by (urlkey, ts); re-deliveries of an
    * identical row are absorbed (exactly-once sample membership under
    * at-least-once delivery).
    *
    * Emission contract is the ADMISSION CHANGELOG (the RecentKProcessor
    * discipline): a row is emitted exactly when it enters the kept
    * bottom-k; evictions stay silent. Batch-run one invocation sees all
    * rows, so admissions == the final kept set == the row_number()-
    * over-hash oracle. State is O(groups × k). */
  final class ReservoirProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, SampleIn, SampleOut] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var kept: ListState[SampleIn] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      kept = getHandle.getListState[SampleIn](
        "sample", Encoders.product[SampleIn], TTLConfig.NONE)

    // total order: hash rank first, (urlkey, ts) as the collision
    // tie-break so equal hashes still sort identically in both engines
    private def lt(a: SampleIn, b: SampleIn): Boolean =
      a.h < b.h || (a.h == b.h &&
        (a.urlkey < b.urlkey || (a.urlkey == b.urlkey && a.ts < b.ts)))

    override def handleInputRows(
        key: String, rows: Iterator[SampleIn],
        timerValues: TimerValues): Iterator[SampleOut] = {
      val prev = {
        val b = scala.collection.mutable.ArrayBuffer.empty[SampleIn]
        val it = kept.get(); while (it.hasNext) b += it.next()
        b.toArray
      }
      // set semantics: a redelivered identical row must not double-admit
      val merged = (prev ++ rows).distinct.sortWith(lt).take(k)
      kept.put(merged)
      val prevSet = prev.toSet
      merged.iterator.filterNot(prevSet.contains)
        .map(s => SampleOut(s.group, s.urlkey, s.ts))
    }
  }

  /** deterministic bottom-k-by-hash sample; see [[ReservoirProcessor]] */
  def sampleReservoir(in: Dataset[SampleIn], k: Int): Dataset[SampleOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.group)
      .transformWithState(new ReservoirProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  /** latest-k buffer over a capture stream/batch; see [[RecentKProcessor]] */
  def recentK(in: Dataset[CaptureIn], k: Int): Dataset[CaptureOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.urlkey)
      .transformWithState(new RecentKProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  // ---- per-host status-class counts (transformWithState MAP state) ----

  final case class HostStatusIn(host: String, status_class: String)
  final case class HostStatusOut(host: String, status_class: String, n: Long)

  /** Per-host fetch-health monitor: running counts per status class
    * (2xx/3xx/4xx/5xx) under each host key — the state a crawl
    * controller consults for backoff decisions ("this host started
    * 5xx-ing").
    *
    * MapState rather than re-keying by (host, class): the host is the
    * natural key (one politeness/budget decision per host) and the class
    * map is its sub-keyed state — `getMapState` reads/writes ONE class
    * entry per update without deserializing the host's whole profile,
    * which is the point of the v2 map handle. Emits the updated totals
    * for the classes a batch touched (update-mode changelog). Batch-run
    * for the driver gate, one invocation sees all rows, so the emission
    * is the `GROUP BY host, class` oracle; StreamingSpec pins cross-batch
    * accumulation. State is O(hosts × 4). */
  final class HostStatusProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, HostStatusIn, HostStatusOut] {
    import org.apache.spark.sql.streaming.{MapState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[HostStatusIn],
        timerValues: TimerValues): Iterator[HostStatusOut] = {
      val batch = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach(r => batch.update(r.status_class, batch.getOrElse(r.status_class, 0L) + 1L))
      // strict: the state writes must not ride a lazily-consumed iterator
      batch.toArray.map { case (cls, delta) =>
        val total = (if (counts.containsKey(cls)) counts.getValue(cls) else 0L) + delta
        counts.updateValue(cls, total)
        HostStatusOut(key, cls, total)
      }.iterator
    }
  }

  /** per-host status-class totals; see [[HostStatusProcessor]] */
  def hostStatus(in: Dataset[HostStatusIn]): Dataset[HostStatusOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.host)
      .transformWithState(new HostStatusProcessor, TimeMode.None(), OutputMode.Update())
  }

  // ---- per-host politeness scheduler (transformWithState VALUE state) ----

  final case class FetchIn(id: Long, host: String, epoch_us: Long, delay_us: Long)
  final case class FetchOut(id: Long, host: String, epoch_us: Long,
      delay_us: Long, sched_us: Long, wait_us: Long)

  /** The crawl controller's continuous form of the batch
    * `crawl_politeness` planner: per host, assign each arriving fetch
    * request the earliest slot respecting
    * sched = max(arrival, prevSched + delay). State is ONE long per host
    * (the last granted slot), so a resumed query keeps spacing fetches
    * correctly across batches — the property StreamingSpec pins. Within
    * an invocation rows sort by (epoch_us, id) before the fold (stream
    * micro-batches deliver a key's rows unordered); the per-key buffer is
    * O(key rows in the batch) — the RecentK/SessionFlush bound, which at
    * crawl scale is one host's arrivals per micro-batch, not history.
    * Batch-run each key's whole history arrives in one invocation, so
    * the emitted schedule equals the closed-form window oracle of
    * `crawl_politeness` — the two driver keys share ONE oracle string. */
  final class PolitenessProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, FetchIn, FetchOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var lastSched: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSched = getHandle.getValueState[Long](
        "lastSched", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[FetchIn],
        timerValues: TimerValues): Iterator[FetchOut] = {
      val sorted = rows.toArray.sortBy(r => (r.epoch_us, r.id))
      var hasPrev = lastSched.exists()
      var prev = if (hasPrev) lastSched.get() else 0L
      val out = sorted.map { r =>
        val sched =
          if (hasPrev) math.max(r.epoch_us, prev + r.delay_us) else r.epoch_us
        hasPrev = true
        prev = sched
        FetchOut(r.id, r.host, r.epoch_us, r.delay_us, sched, sched - r.epoch_us)
      }
      if (sorted.nonEmpty) lastSched.update(prev)
      out.iterator
    }
  }

  // ---- per-URL change-rate counters (transformWithState VALUE state) ----

  final case class ChangeIn(id: Long, urlkey: String, epoch_us: Long, ts: String, ver: String)
  final case class ChangeOut(urlkey: String, n_pairs: Long, n_changed: Long,
      span_us: Long, change_class: String)
  /** last observation + cumulative counters per urlkey */
  final case class ChangeState(lastTs: String, lastId: Long, lastUs: Long,
      lastVer: String, nPairs: Long, nChanged: Long, spanUs: Long)

  /** `crawl_change_rate` as CONTINUOUS state — the Cho & Garcia-Molina
    * estimator counters maintained per urlkey as captures ARRIVE instead
    * of recomputed over history: state is one (last observation +
    * counters) record per URL, each arrival extends the consecutive-pair
    * chain (the cross-batch pair — last capture of batch N paired with
    * the first of batch N+1 — is exactly what a windowed recompute pays
    * a full-history rescan for). Emits the updated rollup per key per
    * batch (Update-mode changelog). Batch-run, each urlkey's history
    * arrives in one (ts, id)-sorted invocation, so the emitted rows
    * equal the batch key's lag-window closed form — ONE shared oracle.
    * Same in-order-across-batches assumption as [[PolitenessProcessor]]. */
  final class ChangeRateProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, ChangeIn, ChangeOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[ChangeState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ChangeState](
        "change", Encoders.product[ChangeState], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[ChangeIn],
        timerValues: TimerValues): Iterator[ChangeOut] = {
      val sorted = rows.toArray.sortBy(r => (r.ts, r.id))
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else null
      sorted.foreach { r =>
        s =
          if (s == null) ChangeState(r.ts, r.id, r.epoch_us, r.ver, 0L, 0L, 0L)
          // SQL null semantics, matching the shared batch oracle exactly:
          // a pair exists iff the PREVIOUS ver is non-null (`prev_ver IS
          // NOT NULL`), and `ver <> prev_ver` is only TRUE when both
          // sides are non-null and differ — a null-digest capture breaks
          // the chain as the prev but never counts as a change itself
          else if (s.lastVer == null)
            ChangeState(r.ts, r.id, r.epoch_us, r.ver,
              s.nPairs, s.nChanged, s.spanUs)
          else ChangeState(r.ts, r.id, r.epoch_us, r.ver,
            s.nPairs + 1L,
            s.nChanged + (if (r.ver != null && r.ver != s.lastVer) 1L else 0L),
            s.spanUs + (r.epoch_us - s.lastUs))
      }
      st.update(s)
      // single-capture URLs emit nothing — the batch key's
      // prev-non-null filter, held under incremental arrival
      if (s.nPairs == 0L) Iterator.empty
      else Iterator.single(ChangeOut(key, s.nPairs, s.nChanged, s.spanUs,
        if (s.nChanged * 10 >= s.nPairs * 8) "fast"
        else if (s.nChanged * 10 >= s.nPairs * 3) "medium"
        else "slow"))
    }
  }

  /** change-rate counters over a capture stream/batch; see
    * [[ChangeRateProcessor]] */
  def changeRate(in: Dataset[ChangeIn]): Dataset[ChangeOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.urlkey)
      .transformWithState(new ChangeRateProcessor, TimeMode.None(), OutputMode.Update())
  }

  // ---- digest-keyed revisit generation (transformWithState VALUE state) ----

  final case class RevisitIn(id: Long, urlkey: String, ts: String, url: String, digest: String)
  final case class RevisitOut(id: Long, urlkey: String, ts: String, digest: String,
      out_type: String, refers_to_url: String, refers_to_ts: String)
  /** the stored original: first capture of each payload digest */
  final case class OrigRef(url: String, ts: String)

  /** The deduplicating indexer as CONTINUOUS state — the streaming twin
    * of `cdx_revisit_generate` (and the ingest half of
    * `sink_warc_revisit_write`): per payload digest, the first capture
    * ever seen is the stored original; every later arrival emits as a
    * `revisit` row pointing at it. State is ONE (url, ts) pair per
    * distinct digest, so a resumed ingest keeps deduplicating against
    * everything it has already stored — the property a daily-crawl
    * pipeline needs (a recrawl next month still resolves to the day-1
    * original). Within an invocation rows sort by (ts, id) before the
    * fold; batch-run each digest's whole history arrives at once, so the
    * emitted rows equal the closed-form window oracle of
    * `cdx_revisit_generate` — the two driver keys share ONE oracle
    * string. StreamingSpec pins cross-batch original continuity. */
  final class RevisitProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, RevisitIn, RevisitOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var orig: ValueState[OrigRef] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      orig = getHandle.getValueState[OrigRef](
        "orig", Encoders.product[OrigRef], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[RevisitIn],
        timerValues: TimerValues): Iterator[RevisitOut] = {
      val sorted = rows.toArray.sortBy(r => (r.ts, r.id))
      var cur = if (orig.exists()) orig.get() else null
      val out = sorted.map { r =>
        if (cur == null) {
          cur = OrigRef(r.url, r.ts)
          RevisitOut(r.id, r.urlkey, r.ts, r.digest, "response", null, null)
        } else RevisitOut(r.id, r.urlkey, r.ts, r.digest, "revisit", cur.url, cur.ts)
      }
      if (sorted.nonEmpty) orig.update(cur)
      out.iterator
    }
  }

  /** revisit generation over a capture stream/batch; digest-less rows
    * key on a synthetic singleton (never deduped — warcio/pywb never
    * emit a revisit without a payload digest), matching the batch
    * operator's null arm. See [[RevisitProcessor]]. */
  def revisitGenerate(in: Dataset[RevisitIn]): Dataset[RevisitOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(r => if (r.digest != null) r.digest else " null:" + r.id)
      .transformWithState(new RevisitProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** per-host fetch scheduling over a request stream/batch; see
    * [[PolitenessProcessor]] */
  def politeness(in: Dataset[FetchIn]): Dataset[FetchOut] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ensureStateStoreCoordinator(in.sparkSession)
    in.groupByKey(_.host)
      .transformWithState(new PolitenessProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** outputMode for each op when run as a sink: update for stateful aggs,
    * append for session/dedup — complete mode would retain all aggregation
    * state forever, defeating the watermark's state eviction; session
    * windows emit on close under append, which is the bounded-state mode */
  val outputModes: Map[String, OutputMode] = Map(
    "tumbling" -> OutputMode.Update(),
    "sliding" -> OutputMode.Update(), // windowed agg, same as tumbling
    "session" -> OutputMode.Append(),
    "dedup" -> OutputMode.Append(),
    "late" -> OutputMode.Update())
}
