package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming semantics via MemoryStream (SURVEY §5.4):
  * watermark/late-data drop, streaming dedup, session windows, and the
  * custom stateful operator. Each test drives batches through a query and
  * reads the in-memory sink. */
class StreamingSpec extends SparkSpec {

  test("streamingCdxIngest appends arriving files exactly once") {
    import java.nio.file.{Files, Paths}
    val base = "/tmp/graft_test/stream_ingest"
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    // clean slate INCLUDING the input dir: a stale batch2.cdx from a prior
    // suite run would be drained by the first AvailableNow pass (the
    // checkpoint is fresh) and break the == 10 assertion
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    Files.createDirectories(Paths.get(in))
    def lines(n: Range): String =
      n.map(i => f"org,example)/p$i%03d 201502150123$i%02d " + s"""{"url":"http://example.org/p$i"}""")
        .mkString("", "\n", "\n")
    Files.writeString(Paths.get(s"$in/batch1.cdx"), lines(0 to 9))
    Pipeline.streamingCdxIngest(spark, in, out, ck).awaitTermination()
    assert(spark.read.parquet(out).count() == 10)
    // second arrival: only the NEW file's rows append (source offset log);
    // the trailing malformed lines (blank + truncated) must be DROPPED,
    // not appended as null-field rows the batch pipeline can never produce
    Files.writeString(Paths.get(s"$in/batch2.cdx"),
      lines(10 to 14) + "\ncom,example)/truncated 20260101\n")
    Pipeline.streamingCdxIngest(spark, in, out, ck).awaitTermination()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 15, "no reprocessing of batch1; malformed lines dropped")
    assert(rows.filter("urlkey IS NULL OR ts IS NULL OR json IS NULL").count() == 0)
    val parsed = rows.orderBy("urlkey").collect()
    assert(parsed.head.getString(0) == "org,example)/p000")
    assert(parsed.head.getString(1).startsWith("201502150123"))
    assert(parsed.head.getString(2).startsWith("{\"url\""))
  }
  test("streamingZipNumBatches + compactBatches = continuous index maintenance") {
    import java.nio.file.{Files, Paths}
    import graft.formats.ZipNum
    import spark.implicits._
    val base = "/tmp/graft_test/stream_zipnum"
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val serving = s"$base/serving"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    Files.createDirectories(Paths.get(in))
    def lines(n: Range): Seq[String] =
      n.map(i => f"org,example)/p${(i * 37) % 100}%03d-$i 2015021501$i%04d rec")
    // wave 1 -> its own sorted mini-cluster
    Files.writeString(Paths.get(s"$in/w1.cdx"), lines(0 until 40).mkString("", "\n", "\n"))
    Pipeline.streamingZipNumBatches(spark, in, out, ck, shards = 2, linesPerBlock = 5)
      .awaitTermination()
    // wave 2 -> a second cluster; the offset log skips wave 1
    Files.writeString(Paths.get(s"$in/w2.cdx"), lines(40 until 70).mkString("", "\n", "\n"))
    Pipeline.streamingZipNumBatches(spark, in, out, ck, shards = 2, linesPerBlock = 5)
      .awaitTermination()
    val batchDirs = new java.io.File(out).list().filter(_.startsWith("batch-")).sorted
    assert(batchDirs.length == 2, s"one cluster per non-empty batch, got ${batchDirs.toSeq}")
    // compaction: one serving cluster == the index of all lines at once
    Pipeline.compactBatches(spark, out, serving, shards = 2, linesPerBlock = 5)
    val got = ZipNum.readLines(spark, serving).as[String].collect().toSeq
    assert(got == lines(0 until 70).sorted, "serving cluster = all waves, total order")
    // and it serves lookups through the standard surface
    assert(new CdxServer(spark, serving).numPages("org,example)/", 1) > 0)
  }

  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def tsAt(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  // (event_id, ts, user_id, event_type, value)
  private type E = (Long, Timestamp, Long, String, Double)
  private def toDf(s: MemoryStream[E]) =
    s.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("stream_dedup drops duplicate event_ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    val q = StreamOps.dedup(toDf(input)).writeStream
      .format("memory").queryName("dedup_sink").outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts(0), 1L, "a", 1.0), (2L, ts(1), 1L, "b", 1.0))
      q.processAllAvailable()
      input.addData((1L, ts(2), 1L, "a", 1.0), (3L, ts(3), 2L, "c", 1.0)) // 1 is a dup
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize: an open session carries across batches and merges") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user_id, tsUs)
    // arithmetic, not Timestamp.valueOf: minutes >= 60 would lean on the
    // deprecated Date constructor's lenient normalization
    val baseUs = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
    def us(minute: Int): Long = baseUs + minute * 60L * 1000000L
    val gap = 30L * 60 * 1000000
    val q = StreamOps.sessionize(
        input.toDS().map { case (u, t) => StreamOps.SessEvent(u, t) },
        gap, flushOpen = false)
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: (10:00, 10:10) close when 11:00 arrives (gap >= 30m);
      // 11:00 stays OPEN in state
      input.addData((1L, us(0)), (1L, us(10)), (1L, us(60)))
      q.processAllAvailable()
      val afterB1 = spark.table("sess_sink")
        .as[StreamOps.SessionOut].collect().toSet
      assert(afterB1 == Set(StreamOps.SessionOut(1L, us(0), us(10), 2L)),
        s"only the closed session emits, got $afterB1")
      // batch 2: 11:10 continues the OPEN 11:00 session (cross-batch
      // merge via state); 12:30 closes it as a 2-event session
      input.addData((1L, us(70)), (1L, us(150)))
      q.processAllAvailable()
      val afterB2 = spark.table("sess_sink")
        .as[StreamOps.SessionOut].collect().toSet
      assert(afterB2 == Set(
        StreamOps.SessionOut(1L, us(0), us(10), 2L),
        StreamOps.SessionOut(1L, us(60), us(70), 2L)),
        s"batch-2 session must span the batch boundary, got $afterB2")
    } finally q.stop()
  }

  test("sessionize: negative (pre-1970) timestamps sessionize normally") {
    // epoch-µs is signed — an open session must be tracked by an explicit
    // flag, not a negative-sentinel timestamp
    val ev = Seq(
      StreamOps.SessEvent(1L, -120L * 1000000),
      StreamOps.SessEvent(1L, -60L * 1000000)).toDS()
    val got = StreamOps.sessionize(ev, 30L * 60 * 1000000, flushOpen = true).collect().toSeq
    assert(got == Seq(StreamOps.SessionOut(1L, -120000000L, -60000000L, 2L)),
      s"one 2-event session expected, got $got")
  }

  test("sessionize late-data policy: in-gap extends backward, older drops") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val baseUs = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
    def us(minute: Int): Long = baseUs + minute * 60L * 1000000L
    val q = StreamOps.sessionize(
        input.toDS().map { case (u, t) => StreamOps.SessEvent(u, t) },
        30L * 60 * 1000000, flushOpen = false)
      .writeStream.format("memory").queryName("sess_late_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, us(120))) // open session at 12:00
      q.processAllAvailable()
      // 9:00 is older than start - gap -> dropped; 11:30 is EXACTLY
      // start - gap -> also dropped (a full-gap distance splits forward,
      // so it must split backward too — the r10 boundary fix); 11:45 is
      // strictly within the gap of the start -> extends BACKWARD
      input.addData((1L, us(-60)), (1L, us(90)), (1L, us(105)))
      q.processAllAvailable()
      input.addData((1L, us(240))) // 14:00 closes it
      q.processAllAvailable()
      val got = spark.table("sess_late_sink").as[StreamOps.SessionOut].collect().toSet
      assert(got == Set(StreamOps.SessionOut(1L, us(105), us(120), 2L)),
        s"expected the backward-extended closed session only, got $got")
    } finally q.stop()
  }

  test("dedupWithinWatermark: dups near the original drop, state is bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    val q = StreamOps.dedupWithinWatermark(toDf(input)).writeStream
      .format("memory").queryName("dedup_wm_sink").outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts(0), 1L, "a", 1.0), (2L, ts(1), 1L, "b", 1.0))
      q.processAllAvailable()
      // duplicate of 1 arrives within the 1h watermark -> dropped
      input.addData((1L, ts(5), 1L, "a", 1.0), (3L, ts(6), 2L, "c", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_sink").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
      // advance the watermark far past event 1's time, then replay it:
      // its dedup state was evicted, so the late duplicate is KEPT — the
      // documented bounded-state trade
      input.addData((4L, tsAt(14, 0), 3L, "d", 1.0))
      q.processAllAvailable()
      input.addData((1L, tsAt(13, 30), 1L, "a", 1.0))
      q.processAllAvailable()
      val replayed = spark.table("dedup_wm_sink").select("event_id").as[Long].collect()
      assert(replayed.count(_ == 1L) == 2,
        s"evicted key must be re-admitted after the watermark passes: ${replayed.toSeq.sorted}")
    } finally q.stop()
  }

  test("stream-stream interval join resolves revisits within the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val revisits = MemoryStream[E]
    val originals = MemoryStream[E]
    val q = StreamOps.revisitResolveStream(toDf(revisits), toDf(originals))
      .writeStream.format("memory").queryName("rr_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // original digest=7 at 10:00; revisit with same digest at 10:30 -> match
      originals.addData((100L, ts(0), 1L, "response", 7.0))
      revisits.addData((200L, ts(30), 1L, "revisit", 7.0))
      // digest=9 revisit has no original -> no row
      revisits.addData((201L, ts(35), 1L, "revisit", 9.0))
      q.processAllAvailable()
      // an original AFTER the revisit must not match (orig_ts <= revisit_ts)
      originals.addData((101L, ts(40), 1L, "response", 9.0))
      q.processAllAvailable()
      val got = spark.table("rr_sink")
        .select("revisit_id", "orig_id").as[(Long, Long)].collect().toSet
      assert(got == Set((200L, 100L)),
        s"only the in-horizon, earlier original matches, got $got")
      // an original >1h before the revisit is outside the interval
      originals.addData((102L, tsAt(9, 0), 2L, "response", 11.0))
      revisits.addData((202L, tsAt(10, 30), 2L, "revisit", 11.0))
      q.processAllAvailable()
      val after = spark.table("rr_sink")
        .select("revisit_id", "orig_id").as[(Long, Long)].collect().toSet
      assert(after == Set((200L, 100L)), "out-of-horizon original must not match")
    } finally q.stop()
  }

  test("stream_revisit_resolve: streaming run across batch boundaries == batch-run driver key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val c = graft.Cdx.df(spark, sfDir)
      .select(col("id"), timestamp_micros(col("epoch_us")).as("ts"),
        col("digest"), col("record_type"))
    def legRows(rt: String) = c.filter(col("record_type") === rt)
      .select(col("id"), col("ts"), col("digest"))
      .as[(Long, Timestamp, String)].collect().sortBy(_._2.getTime)
    val rev = legRows("revisit")
    val org = legRows("response")
    val rs = MemoryStream[(Long, Timestamp, String)]
    val os = MemoryStream[(Long, Timestamp, String)]
    def leg(m: MemoryStream[(Long, Timestamp, String)]) =
      m.toDF.toDF("event_id", "ts", "value")
    val q = StreamOps.revisitResolveStream(leg(rs), leg(os), horizon = "17520 hours")
      .writeStream.format("memory").queryName("srr_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // two TIME-ORDERED halves per side: crossing a batch boundary is
      // the point (an original from batch 1 resolving a batch-2 revisit);
      // time order keeps every row ahead of the advancing watermark, so
      // the streamed result must equal the batch run EXACTLY
      val (o1, o2) = org.splitAt(org.length / 2)
      val (r1, r2) = rev.splitAt(rev.length / 2)
      os.addData(o1.toIndexedSeq); q.processAllAvailable()
      rs.addData(r1.toIndexedSeq); q.processAllAvailable()
      os.addData(o2.toIndexedSeq); rs.addData(r2.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("srr_sink")
        .select("revisit_id", "orig_id").as[(Long, Long)].collect().toSet
      val batch = SparkEntry.queries("stream_revisit_resolve")(spark, sfDir)
        .select("revisit_id", "orig_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "fixture must produce matches")
      assert(streamed == batch,
        s"stream/batch divergence: stream-only ${(streamed -- batch).take(3)}, " +
          s"batch-only ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("late data beyond the watermark does not resurrect closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    val q = StreamOps.lateDataCounts(toDf(input)).writeStream
      .format("memory").queryName("late_sink").outputMode(OutputMode.Update()).start()
    try {
      // batch 1: events at 10:00 and 10:05 -> window 10:00 has 2
      input.addData((1L, ts(0), 1L, "a", 1.0), (2L, ts(5), 1L, "a", 1.0))
      q.processAllAvailable()
      // batch 2: advance event time to 11:00 -> watermark = 10:50
      input.addData((3L, tsAt(11, 0), 1L, "a", 1.0))
      q.processAllAvailable()
      // batch 3: a LATE event at 10:01 — behind the 10:50 watermark, dropped
      input.addData((4L, ts(1), 1L, "a", 1.0))
      q.processAllAvailable()
      val counts = spark.table("late_sink")
        .groupBy("wstart").agg(max("cnt").as("cnt"))
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(counts(ts(0)) == 2L, "late event must not bump the closed 10:00 window")
    } finally q.stop()
  }

  test("session windows merge events within the 30m gap per user") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    val q = StreamOps.sessionCounts(toDf(input)).writeStream
      .format("memory").queryName("session_sink").outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        (1L, ts(0), 1L, "a", 1.0),   // user 1 session A
        (2L, ts(20), 1L, "a", 1.0),  // +20m -> same session
        (3L, tsAt(11, 30), 1L, "a", 1.0), // +70m -> new session
        (4L, ts(0), 2L, "a", 1.0))   // user 2 own session
      q.processAllAvailable()
      val rows = spark.table("session_sink")
        .select("user_id", "n_events").as[(Long, Long)].collect().sorted.toSeq
      assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    } finally q.stop()
  }

  test("session windows in append mode emit only watermark-closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    // the library's declared sink mode: bounded state, sessions emitted on
    // close — not Complete, which would retain all aggregation state
    val q = StreamOps.sessionCounts(toDf(input)).writeStream
      .format("memory").queryName("session_append_sink")
      .outputMode(StreamOps.outputModes("session")).start()
    try {
      input.addData((1L, ts(0), 1L, "a", 1.0), (2L, ts(20), 1L, "a", 1.0))
      q.processAllAvailable()
      // watermark (max ts − 1h) has not passed the session's end yet
      assert(spark.table("session_append_sink").isEmpty,
        "open sessions must not appear in append mode")
      // an event far ahead advances the watermark past 10:50, closing it
      input.addData((3L, tsAt(13, 0), 1L, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("session_append_sink")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
      assert(rows == Seq((1L, 2L)), s"closed session emitted exactly once: $rows")
    } finally q.stop()
  }

  test("tumbling stream counts match the batch expression on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    val q = StreamOps.tumblingCounts(toDf(input)).writeStream
      .format("memory").queryName("tumbling_sink").outputMode(OutputMode.Update()).start()
    try {
      val data: Seq[E] = Seq(
        (1L, tsAt(10, 5), 1L, "a", 1.0), (2L, tsAt(10, 55), 1L, "a", 1.0),
        (3L, tsAt(11, 5), 1L, "a", 1.0), (4L, tsAt(10, 10), 2L, "b", 1.0))
      input.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_sink")
        .groupBy("wstart", "event_type").agg(max("cnt").as("cnt"))
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = StreamOps.tumblingCounts(
          data.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("transformWithState accumulates per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    // TWS requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.userRunningCountsTws(input.toDS()).writeStream
      .format("memory").queryName("tws_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        StreamOps.UserEvent(1, 10, "a", 1000), StreamOps.UserEvent(2, 20, "b", 2000))
      q.processAllAvailable()
      input.addData(StreamOps.UserEvent(3, 10, "c", 3000))
      q.processAllAvailable()
      val latest = spark.table("tws_sink")
        .groupBy("user_id").agg(max("nEvents").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(latest == Map(10L -> 2L, 20L -> 1L))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("frontier: a key introduced in batch 1 is suppressed in batch 2 (emitted once, counted twice)") {
    implicit val sqlCtx = spark.sqlContext
    // TWS requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.FrontierIn]
    val q = StreamOps.frontier(input.toDS()).writeStream
      .format("memory").queryName("frontier_sink").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        StreamOps.FrontierIn("com,a)/", "20240102000000"),
        StreamOps.FrontierIn("com,a)/", "20240101000000"),
        StreamOps.FrontierIn("com,b)/", "20240103000000"))
      q.processAllAvailable()
      // batch 1: both keys emitted, a's first_ts is the batch minimum
      val b1 = spark.table("frontier_sink")
        .as[StreamOps.FrontierOut].collect().sortBy(_.urlkey)
      assert(b1.toSeq == Seq(
        StreamOps.FrontierOut("com,a)/", "20240101000000", 2L),
        StreamOps.FrontierOut("com,b)/", "20240103000000", 1L)))
      // batch 2: known key a re-sighted -> NO new emission; new key c emits
      input.addData(
        StreamOps.FrontierIn("com,a)/", "20240104000000"),
        StreamOps.FrontierIn("com,c)/", "20240105000000"))
      q.processAllAvailable()
      val b2 = spark.table("frontier_sink")
        .as[StreamOps.FrontierOut].collect().sortBy(_.urlkey)
      assert(b2.toSeq == Seq(
        StreamOps.FrontierOut("com,a)/", "20240101000000", 2L),
        StreamOps.FrontierOut("com,b)/", "20240103000000", 1L),
        StreamOps.FrontierOut("com,c)/", "20240105000000", 1L)),
        s"got ${b2.toSeq}")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("recentK ListState: a newer capture is admitted, the evicted one stays silent") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.CaptureIn]
    def cap(ts: String) = StreamOps.CaptureIn("com,a)/", ts, "d")
    val q = StreamOps.recentK(input.toDS(), k = 3).writeStream
      .format("memory").queryName("recentk_sink").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: three captures fill the buffer — all admitted
      input.addData(cap("20240103000000"), cap("20240101000000"), cap("20240102000000"))
      q.processAllAvailable()
      val b1 = spark.table("recentk_sink")
        .as[StreamOps.CaptureOut].collect().map(_.ts).sorted.toSeq
      assert(b1 == Seq("20240101000000", "20240102000000", "20240103000000"))
      // batch 2: a newer capture admits ONCE and evicts the oldest — the
      // eviction is silent (no retraction row) and the kept rows are not
      // re-emitted; a stale capture older than the kept window is ignored
      input.addData(cap("20240104000000"), cap("20231231000000"))
      q.processAllAvailable()
      val b2 = spark.table("recentk_sink")
        .as[StreamOps.CaptureOut].collect().map(_.ts).sorted.toSeq
      assert(b2 == Seq("20240101000000", "20240102000000",
        "20240103000000", "20240104000000"), s"got $b2")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("changeRate null semantics: a null ver breaks the pair chain and never counts a change") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.ChangeIn]
    def c(id: Long, us: Long, ver: String) =
      StreamOps.ChangeIn(id, "k", us, f"2024010100000$id%01d", ver)
    val q = StreamOps.changeRate(input.toDS()).writeStream
      .format("memory").queryName("chrate_sink").outputMode(OutputMode.Update()).start()
    try {
      // history [null, X, X] ++ [null, Y] — the SQL lag-window semantics:
      // (null,X) filtered (prev_ver IS NULL); (X,X) pair, unchanged;
      // (X,null) pair, `ver <> prev_ver` is NULL -> NOT a change;
      // (null,Y) filtered. Totals: n_pairs=2, n_changed=0, span=200.
      input.addData(c(1, 100L, null), c(2, 200L, "X"), c(3, 300L, "X"))
      q.processAllAvailable()
      input.addData(c(4, 400L, null), c(5, 500L, "Y"))
      q.processAllAvailable()
      val last = spark.table("chrate_sink").as[StreamOps.ChangeOut]
        .collect().maxBy(_.n_pairs)
      assert(last.n_pairs == 2L && last.n_changed == 0L && last.span_us == 200L,
        s"got $last")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sampleReservoir ListState: admissions track the global bottom-k across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.SampleIn]
    def s(url: String, h: Long) = StreamOps.SampleIn("g", url, "20240101000000", h)
    val q = StreamOps.sampleReservoir(input.toDS(), k = 2).writeStream
      .format("memory").queryName("reservoir_sink").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: both rows fit the k=2 sample — both admitted
      input.addData(s("u5", 50L), s("u9", 90L))
      q.processAllAvailable()
      val b1 = spark.table("reservoir_sink")
        .as[StreamOps.SampleOut].collect().map(_.urlkey).sorted.toSeq
      assert(b1 == Seq("u5", "u9"))
      // batch 2: a smaller hash admits (evicting u9 silently), a larger
      // one is rejected, and a REDELIVERY of u5 must not re-admit
      input.addData(s("u1", 10L), s("u7", 70L), s("u5", 50L))
      q.processAllAvailable()
      val b2 = spark.table("reservoir_sink")
        .as[StreamOps.SampleOut].collect().map(_.urlkey).sorted.toSeq
      assert(b2 == Seq("u1", "u5", "u9"), s"got $b2")
      // batch 3: nothing beats the kept {u1, u5} — no emissions
      input.addData(s("u8", 80L))
      q.processAllAvailable()
      val b3 = spark.table("reservoir_sink")
        .as[StreamOps.SampleOut].collect().length
      assert(b3 == 3, s"got $b3 rows")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("politeness ValueState: fetch slots stay spaced across batches and reset after idle gaps") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.FetchIn]
    val d = 2000000L // 2s crawl delay
    def f(id: Long, at: Long) = StreamOps.FetchIn(id, "a.org", at, d)
    val q = StreamOps.politeness(input.toDS()).writeStream
      .format("memory").queryName("polite_sink").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a burst of three simultaneous requests spreads out at
      // delay spacing (0, 2s, 4s)
      input.addData(f(1, 0L), f(2, 0L), f(3, 0L))
      q.processAllAvailable()
      val b1 = spark.table("polite_sink")
        .as[StreamOps.FetchOut].collect().sortBy(_.id).map(_.sched_us).toSeq
      assert(b1 == Seq(0L, d, 2 * d), s"got $b1")
      // batch 2: a request arriving 1s after the last granted slot (4s)
      // must wait for 6s — the CROSS-BATCH continuity only the ValueState
      // can provide; a later request past the backlog fetches on arrival
      input.addData(f(4, 5000000L), f(5, 60000000L))
      q.processAllAvailable()
      val b2 = spark.table("polite_sink")
        .as[StreamOps.FetchOut].collect().sortBy(_.id).map(_.sched_us).toSeq
      assert(b2 == Seq(0L, d, 2 * d, 3 * d, 60000000L), s"got $b2")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("changeRate ValueState: the cross-batch consecutive pair is counted, counters accumulate") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.ChangeIn]
    def c(id: Long, us: Long, ver: String) =
      StreamOps.ChangeIn(id, "key)", us, f"20240101${id}%06d00", ver)
    val q = StreamOps.changeRate(input.toDS()).writeStream
      .format("memory").queryName("chrate_sink").outputMode(OutputMode.Update()).start()
    try {
      // batch 1: three captures, one version flip -> 2 pairs, 1 change
      input.addData(c(1, 1000L, "A"), c(2, 2000L, "A"), c(3, 3000L, "B"))
      q.processAllAvailable()
      val b1 = spark.table("chrate_sink").as[StreamOps.ChangeOut]
        .collect().maxBy(_.n_pairs)
      assert((b1.n_pairs, b1.n_changed, b1.span_us) == ((2L, 1L, 2000L)), s"got $b1")
      // batch 2: one capture — the PAIR (batch-1 last, batch-2 first) and
      // its span/flip must count, which only the carried state allows
      input.addData(c(4, 10000L, "A"))
      q.processAllAvailable()
      val b2 = spark.table("chrate_sink").as[StreamOps.ChangeOut]
        .collect().maxBy(_.n_pairs)
      assert((b2.n_pairs, b2.n_changed, b2.span_us) == ((3L, 2L, 9000L)),
        s"cross-batch pair lost: $b2")
      assert(b2.change_class == "medium", s"2/3 flips -> medium, got ${b2.change_class}")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("revisit ValueState: a later-batch recrawl still resolves to the day-1 original") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.RevisitIn]
    def c(id: Long, ts: String, url: String, digest: String) =
      StreamOps.RevisitIn(id, "key)", ts, url, digest)
    val q = StreamOps.revisitGenerate(input.toDS()).writeStream
      .format("memory").queryName("revisit_sink").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two captures of digest A (second becomes a revisit
      // within the batch), one digest-less capture (never deduped)
      input.addData(
        c(1, "20240101000000", "http://a.org/x", "A"),
        c(2, "20240102000000", "http://mirror.org/x", "A"),
        c(3, "20240101000000", "http://a.org/nodigest", null))
      q.processAllAvailable()
      val b1 = spark.table("revisit_sink")
        .as[StreamOps.RevisitOut].collect().sortBy(_.id).toSeq
      assert(b1.map(_.out_type) == Seq("response", "revisit", "response"), s"got $b1")
      assert(b1(1).refers_to_url == "http://a.org/x" && b1(1).refers_to_ts == "20240101000000")
      // batch 2 — the property only the ValueState provides: a recrawl a
      // month later must still resolve to the day-1 original, and a new
      // digest starts its own original
      input.addData(
        c(4, "20240201000000", "http://late.org/x", "A"),
        c(5, "20240201000000", "http://b.org/y", "B"))
      q.processAllAvailable()
      val b2 = spark.table("revisit_sink")
        .as[StreamOps.RevisitOut].collect().sortBy(_.id).toSeq
      assert(b2.map(_.out_type) == Seq("response", "revisit", "response", "revisit", "response"))
      assert(b2(3).refers_to_url == "http://a.org/x" && b2(3).refers_to_ts == "20240101000000",
        s"cross-batch original lost: ${b2(3)}")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("hostStatus MapState: per-class totals accumulate across batches, untouched classes stay quiet") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.HostStatusIn]
    val q = StreamOps.hostStatus(input.toDS()).writeStream
      .format("memory").queryName("hoststatus_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        StreamOps.HostStatusIn("a.org", "2xx"), StreamOps.HostStatusIn("a.org", "2xx"),
        StreamOps.HostStatusIn("a.org", "5xx"), StreamOps.HostStatusIn("b.org", "2xx"))
      q.processAllAvailable()
      val b1 = spark.table("hoststatus_sink")
        .as[StreamOps.HostStatusOut].collect().sortBy(r => (r.host, r.status_class))
      assert(b1.toSeq == Seq(
        StreamOps.HostStatusOut("a.org", "2xx", 2L),
        StreamOps.HostStatusOut("a.org", "5xx", 1L),
        StreamOps.HostStatusOut("b.org", "2xx", 1L)), s"got ${b1.toSeq}")
      // batch 2: only a.org 2xx arrives — its total accumulates to 3; the
      // untouched 5xx and b.org classes emit nothing new
      input.addData(StreamOps.HostStatusIn("a.org", "2xx"))
      q.processAllAvailable()
      val a2xx = spark.table("hoststatus_sink")
        .as[StreamOps.HostStatusOut].collect()
        .filter(r => r.host == "a.org" && r.status_class == "2xx").map(_.n).sorted.toSeq
      assert(a2xx == Seq(2L, 3L), s"got $a2xx")
      assert(spark.table("hoststatus_sink").count() == 4L,
        "untouched classes must not re-emit")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("heavyHitters ValueState: the MG summary folds across batches == one-shot, capacity-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.HHIn]
    val q = StreamOps.heavyHitters(input.toDS(), capacity = 4, topN = 3).writeStream
      .format("memory").queryName("hh_sink").outputMode(OutputMode.Update()).start()
    try {
      // batch 1: key 7 hot; batch 2 continues the SAME distribution —
      // the fold must carry counts, not restart them
      input.addData(Seq(7L, 7L, 7L, 1L, 2L).map(StreamOps.HHIn("g", _)): _*)
      q.processAllAvailable()
      input.addData(Seq(7L, 7L, 3L, 4L).map(StreamOps.HHIn("g", _)): _*)
      q.processAllAvailable()
      val last = spark.table("hh_sink").as[StreamOps.HHOut].collect()
        .filter(_.cnt >= 0) // typed read
      // the latest update for group g: key 7 must lead with a count
      // reflecting BOTH batches (5 exact occurrences; MG may undercount
      // within n/(cap+1) = 9/5 = 1)
      val top7 = last.filter(_.key == 7L).map(_.cnt).max
      assert(top7 >= 4L && top7 <= 5L, s"cross-batch count for hot key: $top7")
      // capacity bound: no update batch ever reports more than topN rows
      assert(last.groupBy(_.group).forall(_._2.length <= 2 * 3),
        "per-group output must stay topN-bounded per batch")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers flush idle sessions WITHOUT further input from their key") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.TimedEvent]
    def ev(u: Long, sec: Long) = StreamOps.TimedEvent(u, new java.sql.Timestamp(sec * 1000))
    // 10-minute gap
    val q = StreamOps.sessionFlush(input.toDS(), gapMs = 600000L).writeStream
      .format("memory").queryName("flush_sink").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: users 10 (two events, one session) and 20 (one event)
      input.addData(ev(10, 100), ev(10, 200), ev(20, 150))
      q.processAllAvailable()
      // batch 2: only user 30, far in the future — advances the watermark
      // past both idle deadlines (800s and 750s); batch 3 gives the
      // engine a cycle in case timer firing rides the next micro-batch
      input.addData(ev(30, 5000))
      q.processAllAvailable()
      input.addData(ev(30, 5100))
      q.processAllAvailable()
      val rows = spark.table("flush_sink")
        .as[StreamOps.FlushedSession].collect().sortBy(_.user_id)
      // users 10 and 20 flushed with NO further events of their own;
      // user 30's session is still open (watermark has not passed it)
      assert(rows.toSeq == Seq(
        StreamOps.FlushedSession(10L, 100000L, 200000L, 2L),
        StreamOps.FlushedSession(20L, 150000L, 150000L, 1L)), s"got ${rows.toSeq}")
      // a stale timer must NOT flush an extended session: user 40 gets an
      // event, then another inside the gap (re-arming the deadline), then
      // the watermark passes only the FIRST deadline
      input.addData(ev(40, 6000))
      q.processAllAvailable()
      input.addData(ev(40, 6500)) // extends; stale timer at 6600s
      q.processAllAvailable()
      input.addData(ev(30, 6700)) // watermark -> 6500s... then 6700s
      q.processAllAvailable()
      val after = spark.table("flush_sink")
        .as[StreamOps.FlushedSession].collect().filter(_.user_id == 40L)
      assert(after.isEmpty,
        s"stale timer flushed an extended session: ${after.toSeq}")
      // ... and once the watermark passes the RE-ARMED deadline (7100s),
      // the extended session flushes exactly once with the MERGED extent —
      // pins that re-arming registered end+gap (not start+gap) and that
      // the merge preserved the session's full [start, end] and count
      input.addData(ev(30, 8000))
      q.processAllAvailable()
      input.addData(ev(30, 8100))
      q.processAllAvailable()
      val flushed40 = spark.table("flush_sink")
        .as[StreamOps.FlushedSession].collect().filter(_.user_id == 40L)
      assert(flushed40.toSeq == Seq(
        StreamOps.FlushedSession(40L, 6000000L, 6500000L, 2L)),
        s"extended session must flush merged at the re-armed deadline: ${flushed40.toSeq}")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionFlushBatch emits the complete session set in one batch run") {
    withRocksDb {
      def ev(u: Long, sec: Long) = StreamOps.TimedEvent(u, new java.sql.Timestamp(sec * 1000))
      // user 10: two sessions split by a >=10m gap; user 20: one open session
      // — the batch timer sweep must flush BOTH keys' final sessions
      // (EventTime mode cannot run here: batch plans carry no watermark)
      val in = Seq(ev(10, 100), ev(10, 200), ev(10, 900), ev(20, 150)).toDS()
      val rows = StreamOps.sessionFlushBatch(in, gapMs = 600000L)
        .collect().sortBy(r => (r.user_id, r.sstart_ms))
      assert(rows.toSeq == Seq(
        StreamOps.FlushedSession(10L, 100000L, 200000L, 2L),
        StreamOps.FlushedSession(10L, 900000L, 900000L, 1L),
        StreamOps.FlushedSession(20L, 150000L, 150000L, 1L)), s"got ${rows.toSeq}")
      // LIVE-TAIL pin: a session whose last event is wall-clock NOW (its
      // event-time deadline now+gap is in the future of the batch sweep)
      // still flushes — end of input, not the wall clock, is the batch
      // flush point
      val now = System.currentTimeMillis()
      val live = Seq(StreamOps.TimedEvent(40L, new java.sql.Timestamp(now))).toDS()
      val liveRows = StreamOps.sessionFlushBatch(live, gapMs = 600000L).collect()
      assert(liveRows.toSeq == Seq(StreamOps.FlushedSession(40L, now, now, 1L)),
        s"live-tail session must flush at end of input: ${liveRows.toSeq}")
    }
  }

  // ---- restart recovery: kill a stateful query, resume it from its
  // checkpoint, and prove state/timer/watermark continuity (the scale
  // behavior that matters in a real deployment — a 1000-executor job
  // WILL be preempted mid-stream). Each test runs batches, STOPS the
  // query, restarts FROM THE SAME CHECKPOINT (fresh memory sink — the
  // sink is not fault-tolerant, which is exactly why re-emission after
  // restart would be visible), and asserts exactly-once semantics.

  /** run one stateful-query phase against a shared checkpoint dir: start,
    * apply `drive`, stop; returns the rows the SINK saw DURING this phase.
    * foreachBatch, not the memory sink — memory does not support
    * checkpoint recovery ("This query does not support recovering from
    * checkpoint location"), and a per-phase buffer makes re-emission
    * after the resume directly visible. */
  private def phase[T](df: org.apache.spark.sql.Dataset[T], ck: String, name: String)(
      drive: org.apache.spark.sql.streaming.StreamingQuery => Unit): Array[org.apache.spark.sql.Row] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val q = df.writeStream.queryName(name)
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[T], _: Long) =>
        batch.toDF().collect().foreach(got.add)
      }
      .start()
    try { drive(q); got.toArray(Array.empty[org.apache.spark.sql.Row]) }
    finally q.stop()
  }

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def freshDir(name: String): String = {
    val d = s"/tmp/graft_test/$name"
    new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
    d
  }

  test("restart recovery: frontier's ValueState suppresses across a checkpoint resume") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ck = freshDir("rt_frontier_ck")
      val input = MemoryStream[StreamOps.FrontierIn]
      val ds = StreamOps.frontier(input.toDS())
      // phase 1: a (twice) and b discovered
      val p1 = phase(ds, ck, "rt_frontier_1") { q =>
        input.addData(
          StreamOps.FrontierIn("a", "20240101000000"),
          StreamOps.FrontierIn("a", "20240102000000"),
          StreamOps.FrontierIn("b", "20240103000000"))
        q.processAllAvailable()
      }
      assert(p1.map(_.getString(0)).sorted.toSeq == Seq("a", "b"), s"got ${p1.toSeq}")
      // phase 2 resumes from the RocksDB checkpoint with an EMPTY sink:
      // a re-sighting of 'a' must stay suppressed (its ValueState
      // survived the restart), while new key 'c' emits — if state had
      // been lost, 'a' would re-emit here and the sink would show it
      val p2 = phase(ds, ck, "rt_frontier_2") { q =>
        input.addData(
          StreamOps.FrontierIn("a", "20240104000000"),
          StreamOps.FrontierIn("c", "20240105000000"))
        q.processAllAvailable()
      }
      assert(p2.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("c", "20240105000000")),
        s"exactly-once after resume violated: ${p2.toSeq}")
    }
  }

  test("restart recovery: politeness' last granted slot survives a resume") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ck = freshDir("rt_polite_ck")
      val input = MemoryStream[StreamOps.FetchIn]
      val d = 2000000L
      val ds = StreamOps.politeness(input.toDS())
      // phase 1: a burst of three at t=0 books slots 0 / 2s / 4s
      val p1 = phase(ds, ck, "rt_polite_1") { q =>
        input.addData(
          StreamOps.FetchIn(1, "a.org", 0L, d),
          StreamOps.FetchIn(2, "a.org", 0L, d),
          StreamOps.FetchIn(3, "a.org", 0L, d))
        q.processAllAvailable()
      }
      assert(p1.sortBy(_.getLong(0)).map(_.getLong(4)).toSeq == Seq(0L, d, 2 * d),
        s"got ${p1.toSeq}")
      // phase 2 resumes from the checkpoint: an arrival at 5s sits
      // INSIDE the restored backlog (last slot 4s) and must wait for
      // 6s — if the ValueState had been lost, it would fetch at 5s and
      // the crawler would burst-hit the host after every restart
      val p2 = phase(ds, ck, "rt_polite_2") { q =>
        input.addData(StreamOps.FetchIn(4, "a.org", 5000000L, d))
        q.processAllAvailable()
      }
      assert(p2.map(r => (r.getLong(0), r.getLong(4))).toSeq == Seq((4L, 6000000L)),
        s"restored backlog violated: ${p2.toSeq}")
    }
  }

  test("restart recovery: sessionFlush's state, TIMER, and watermark survive a resume") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ck = freshDir("rt_flush_ck")
      val input = MemoryStream[StreamOps.TimedEvent]
      def ev(u: Long, sec: Long) = StreamOps.TimedEvent(u, new java.sql.Timestamp(sec * 1000))
      val ds = StreamOps.sessionFlush(input.toDS(), gapMs = 600000L)
      // phase 1: user 10's session [100s, 200s] stays OPEN — its timer is
      // armed at 800s and the watermark only reaches 700s (user 30's
      // event), below the deadline even for the trailing empty batch
      // processAllAvailable runs — nothing may flush before the kill
      val p1 = phase(ds, ck, "rt_flush_1") { q =>
        input.addData(ev(10, 100), ev(10, 200), ev(30, 700))
        q.processAllAvailable()
      }
      assert(p1.isEmpty, s"nothing should flush in phase 1: ${p1.toSeq}")
      // phase 2 resumes from the checkpoint: user 30's event at 6000s
      // (a) closes user 30's RESTORED open session [700s, 700s] by the
      // in-batch gap, and (b) advances the watermark past user 10's
      // RESTORED 800s timer, which flushes [100s, 200s] exactly once with
      // the merged extent — together pinning all three recovered
      // artifacts (open-session ValueState, the registered timer, and
      // the watermark; losing any would drop or mis-extent a session)
      val p2 = phase(ds, ck, "rt_flush_2") { q =>
        input.addData(ev(30, 6000))
        q.processAllAvailable()
      }
      val flushed = p2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(flushed.toSeq == Seq(
        (10L, 100000L, 200000L, 2L),
        (30L, 700000L, 700000L, 1L)),
        s"resume must flush exactly the two closed sessions: ${flushed.toSeq}")
    }
  }

  test("restart recovery: recentK's ListState keeps its buffer across a resume") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ck = freshDir("rt_recentk_ck")
      val input = MemoryStream[StreamOps.CaptureIn]
      val ds = StreamOps.recentK(input.toDS(), k = 2)
      val p1 = phase(ds, ck, "rt_recentk_1") { q =>
        input.addData(
          StreamOps.CaptureIn("u", "20240101000000", "d1"),
          StreamOps.CaptureIn("u", "20240102000000", "d2"))
        q.processAllAvailable()
      }
      assert(p1.length == 2, s"both captures admitted in phase 1: ${p1.toSeq}")
      // phase 2: a newer capture arrives after the resume — ONLY it is
      // admitted (the restored ListState still holds d1/d2, so d2 stays
      // kept and d1 is evicted SILENTLY; a lost buffer would re-admit
      // both incoming-retained rows or emit a wrong delta)
      val p2 = phase(ds, ck, "rt_recentk_2") { q =>
        input.addData(StreamOps.CaptureIn("u", "20240103000000", "d3"))
        q.processAllAvailable()
      }
      assert(p2.map(_.getString(2)).toSeq == Seq("d3"),
        s"only the new capture may emit after resume: ${p2.toSeq}")
    }
  }

  test("restart recovery: hostStatus' MapState counts continue across a resume") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ck = freshDir("rt_hoststatus_ck")
      val input = MemoryStream[StreamOps.HostStatusIn]
      val ds = StreamOps.hostStatus(input.toDS())
      val p1 = phase(ds, ck, "rt_hoststatus_1") { q =>
        input.addData(
          StreamOps.HostStatusIn("a.org", "2xx"),
          StreamOps.HostStatusIn("a.org", "2xx"),
          StreamOps.HostStatusIn("a.org", "5xx"))
        q.processAllAvailable()
      }
      assert(p1.map(r => (r.getString(1), r.getLong(2))).sorted.toSeq ==
        Seq(("2xx", 2L), ("5xx", 1L)), s"got ${p1.toSeq}")
      // phase 2: the 2xx count CONTINUES from the restored MapState (3,
      // not 1), and the untouched 5xx class stays quiet
      val p2 = phase(ds, ck, "rt_hoststatus_2") { q =>
        input.addData(StreamOps.HostStatusIn("a.org", "2xx"))
        q.processAllAvailable()
      }
      assert(p2.map(r => (r.getString(1), r.getLong(2))).toSeq == Seq(("2xx", 3L)),
        s"count must continue from restored state: ${p2.toSeq}")
    }
  }

  test("mapGroupsWithState accumulates per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.userRunningCounts(input.toDS()).writeStream
      .format("memory").queryName("state_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        StreamOps.UserEvent(1, 10, "a", 1000), StreamOps.UserEvent(2, 10, "b", 2000),
        StreamOps.UserEvent(3, 20, "a", 1500))
      q.processAllAvailable()
      input.addData(StreamOps.UserEvent(4, 10, "c", 3000))
      q.processAllAvailable()
      val latest = spark.table("state_sink")
        .groupBy("user_id").agg(max("nEvents").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(latest == Map(10L -> 3L, 20L -> 1L))
    } finally q.stop()
  }

  test("streamingDedupIngest: batches dedup against the growing index; replay is idempotent") {
    // the daily-ingest loop as a STREAM: each batch dedups against the
    // stored minhash index, survivors fold back in, so batch N+1 sees
    // batch N's keepers — and a crashed batch's replay converges instead
    // of dropping its own keepers as duplicates of themselves
    val base = "/tmp/graft_test/stream_dedup_ingest"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    val corpus = s"$base/corpus"; val ck = s"$base/ck"
    val table = "graft_stream_dedup_index"
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(wh, table)
    if (fs.exists(loc)) fs.delete(loc, true)

    def words(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")
    def dropFirst(s: String) = s.split(" ").drop(1).mkString(" ")
    graft.ops.Dedup.writeMinhashIndex(
      Seq((1L, words("alpha")), (2L, words("beta"))).toDF("doc_id", "text"),
      "doc_id", "text", table)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Pipeline.streamingDedupIngest(
      input.toDF().toDF("doc_id", "text"), table, corpus, ck)
    try {
      // batch 0: 10 is fresh; 11 near-duplicates base doc 1
      input.addData((10L, words("gamma")), (11L, dropFirst(words("alpha"))))
      q.processAllAvailable()
      val kept0 = spark.read.parquet(s"$corpus/batch-00000")
        .select("doc_id").as[Long].collect().toSet
      assert(kept0 == Set(10L), s"batch 0 must keep only the fresh doc: $kept0")
      // batch 1: 12 near-duplicates batch 0's KEEPER (cross-batch, only
      // visible because the keeper was folded into the index); 13 fresh;
      // 14/15 near-duplicate EACH OTHER in-batch (smaller id wins)
      input.addData(
        (12L, dropFirst(words("gamma"))), (13L, words("delta")),
        (14L, words("epsilon")), (15L, dropFirst(words("epsilon"))))
      q.processAllAvailable()
      val kept1 = spark.read.parquet(s"$corpus/batch-00001")
        .select("doc_id").as[Long].collect().toSet
      assert(kept1 == Set(13L, 14L),
        s"batch 1 must drop cross-batch and in-batch near-dups: $kept1")
      // crash replay: re-running batch 1 as the plain per-batch call must
      // rewrite batch-00001 with the SAME keepers (index self-hits are
      // ignored; the corpus dir is batchId-keyed overwrite)
      Pipeline.dedupIngestBatch(
        Seq((12L, dropFirst(words("gamma"))), (13L, words("delta")),
          (14L, words("epsilon")), (15L, dropFirst(words("epsilon"))))
          .toDF("doc_id", "text"),
        table, corpus, 1L)
      val replayed = spark.read.parquet(s"$corpus/batch-00001")
        .select("doc_id").as[Long].collect().toSet
      assert(replayed == kept1, s"replay must be idempotent: $replayed vs $kept1")
    } finally q.stop()
  }

  test("streamingIngest (HNSW): batches fold into versioned indexes; serve == one-shot build; replay idempotent") {
    val base = "/tmp/graft_test/stream_hnsw_ingest"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val all = e.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val q0 = all.find(_._1 == 0L).get._2
    val (b0, b1) = all.splitAt(all.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Double])]
    val q = graft.ops.Hnsw.streamingIngest(
      input.toDF().toDF("vec_id", "ed"), s"$base/ix", s"$base/ck", dim = q0.length)
    try {
      input.addData(b0.toIndexedSeq)
      q.processAllAvailable()
      // after batch 0 the serve answers over b0 only
      val afterB0 = graft.ops.Hnsw.topKLatest(spark, s"$base/ix", q0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val directB0 = graft.ops.Hnsw.topK(b0.toSeq.toDF("vec_id", "ed"), q0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(afterB0 == directB0, s"$afterB0 vs $directB0")
      input.addData(b1.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the folded index answers EXACTLY like a one-shot build over all
    // vectors (ascending batches + id-hash levels = identical graph)
    val served = graft.ops.Hnsw.topKLatest(spark, s"$base/ix", q0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = graft.ops.Hnsw.topK(e, q0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == direct, s"served $served != one-shot $direct")
    // crash replay of batch 1 as a plain call rewrites ITS dirs and the
    // serve is unchanged (batchId-keyed overwrite + deterministic build)
    graft.ops.Hnsw.ingestBatch(
      b1.toSeq.toDF("vec_id", "ed"), s"$base/ix", 1L, dim = q0.length)
    val replayed = graft.ops.Hnsw.topKLatest(spark, s"$base/ix", q0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(replayed == served, s"replay must be idempotent: $replayed vs $served")
    // and the batch-run driver key equals the in-memory family key
    val viaKey = SparkEntry.queries("stream_hnsw_ingest")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaMem = SparkEntry.queries("sim_ann_hnsw")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaKey == viaMem, s"streamed-ingest serve $viaKey != in-memory $viaMem")
  }
}
