package graft

import java.nio.file.{Files, Paths}

import graft.formats.{Warc, ZipNum}
import graft.sources.ZipNumSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan, StringStartsWith}

/** DataSource V2 registration, results, and pushdown pruning. */
class SourceV2Spec extends SparkSpec {
  import spark.implicits._

  private val warcFile = "/tmp/graft_test/v2.warc.gz"
  private val zipDir = "/tmp/graft_test/v2_zipnum"

  private def setup(): Unit = {
    Files.createDirectories(Paths.get(warcFile).getParent)
    Warc.writeFixture(warcFile, Warc.fixtureRecords)
    Pipeline.warcToZipNum(spark, warcFile, zipDir, shards = 2, linesPerBlock = 2)
  }

  test("format(warc) matches Warc.scan") {
    setup()
    val v2 = spark.read.format("warc").load(warcFile)
      .select("record_type", "url", "ts", "status", "offset", "length")
      .orderBy("offset").collect().map(_.toSeq).toSeq
    val rdd = Warc.scan(spark, warcFile)
      .select("record_type", "url", "ts", "status", "offset", "length")
      .orderBy("offset").collect().map(_.toSeq).toSeq
    assert(v2 == rdd)
    assert(v2.size == Warc.fixtureRecords.size)
  }

  test("format(warc) loads a directory of WARCs, not just file globs") {
    val dir = "/tmp/graft_test/v2_warcdir"
    Files.createDirectories(Paths.get(dir))
    Warc.writeFixture(s"$dir/a.warc.gz", Warc.fixtureRecords.take(3))
    Warc.writeFixture(s"$dir/b.warc.gz", Warc.fixtureRecords.drop(3))
    val n = spark.read.format("warc").load(dir).count()
    assert(n == Warc.fixtureRecords.size,
      s"directory load must expand to its files, got $n rows")
  }

  test("custom Hadoop conf survives from the session into the planned scan") {
    // the scan must carry the conf captured at newScanBuilder time, not
    // re-resolve getActiveSession (a thread-local AQE planning threads may
    // not carry, whose old fallback silently dropped custom FS settings)
    setup()
    val key = "graft.test.conf.key"
    spark.sparkContext.hadoopConfiguration.set(key, "survives")
    try {
      val table = new graft.sources.ZipNumTable(zipDir, null)
      val scan = table
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap()))
        .build().asInstanceOf[graft.sources.ZipNumScan]
      assert(scan.hadoopConf.get(key) == "survives")
    } finally spark.sparkContext.hadoopConfiguration.unset(key)
  }

  test("format(wacz) parses the CDXJ index and agrees with Wacz.scanIndex") {
    val dir = "/tmp/graft_test/v2_wacz"
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    Files.createDirectories(p)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("shard", StringType), StructField("urlkey", StringType),
      StructField("url", StringType), StructField("ts", StringType),
      StructField("status", IntegerType), StructField("mime", StringType),
      StructField("payload", BinaryType)))
    val rows = Seq(
      Row("w-0.warc.gz", "com,a)/x", "http://a.com/x", "20200101000000",
        Integer.valueOf(200), "text/html", "pa".getBytes("UTF-8")),
      Row("w-0.warc.gz", "com,b)/y", "http://b.com/y", "20200102000000",
        Integer.valueOf(404), "text/plain", "pb".getBytes("UTF-8")),
      Row("w-1.warc.gz", "org,c)/z", "http://c.org/z", "20200103000000",
        Integer.valueOf(200), "text/html", "pc".getBytes("UTF-8")))
    graft.formats.Wacz.write(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema), dir)

    val v2 = spark.read.format("wacz").load(s"$dir/*.wacz")
      .select("wacz", "urlkey", "ts", "url", "status", "mime",
        "digest", "length", "offset", "filename")
      .orderBy("wacz", "urlkey").collect()
    assert(v2.length == 3)
    assert(v2.head.getString(0) == "w-0.wacz")
    assert(v2.head.getString(1) == "com,a)/x")
    assert(v2.head.getString(3) == "http://a.com/x")
    assert(v2.head.getInt(4) == 200)
    assert(v2.head.getString(9) == "w-0.warc.gz")
    assert(v2.head.getLong(7) > 0 && v2.head.getLong(8) == 0L) // first member
    // agrees with the RDD-based scanIndex parse
    val viaScan = graft.formats.Wacz.scanIndex(spark, s"$dir/*.wacz")
      .select(col("wacz") +: Cdx.lineCols(col("line")): _*)
      .select("wacz", "urlkey").orderBy("wacz", "urlkey")
      .collect().map(_.toSeq).toSeq
    assert(viaScan == v2.map(r => Seq(r.getString(0), r.getString(1))).toSeq)

    // column pruning + filter pushdown surface in the scan description
    val pruned = spark.read.format("wacz").load(s"$dir/*.wacz")
      .where(col("urlkey").startsWith("com,"))
      .select("urlkey")
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("com,a)/x", "com,b)/y"))
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("WaczScan"), desc)

    // a directory path (no glob) expands to its .wacz files
    assert(spark.read.format("wacz").load(dir).count() == 3)
  }

  test("format(zipnum) returns the full sorted cluster") {
    setup()
    val rows = spark.read.format("zipnum").load(zipDir)
      .orderBy("blockseq", "urlkey", "ts")
      .select("urlkey", "ts").as[(String, String)].collect().toSeq
    val viaLib = ZipNum.readLines(spark, zipDir).as[String].collect().toSeq
      .map { l => val p = l.split(" ", 3); (p(0), p(1)) }
    assert(rows.sorted == viaLib.sorted)
  }

  test("zipnum pushdown: prefix filter prunes blocks and keeps results exact") {
    setup()
    val df = spark.read.format("zipnum").load(zipDir)
      .filter(col("urlkey").startsWith("com,example)/path"))
    val got = df.select("urlkey", "ts").as[(String, String)].collect().toSeq.sorted
    assert(got.size == 2 && got.forall(_._1 == "com,example)/path?a=1&b=2"))
    // the scan's description carries the pruned key range
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ZipNumScan") || df.collect().nonEmpty)
  }

  test("KeyRange block selection logic (unit)") {
    import ZipNumSource._
    val r = rangeFromFilters(Seq(StringStartsWith("urlkey", "com,b)")))
    assert(r.lo.contains("com,b)") && r.hi.exists(_.startsWith("com,b)")))
    // blocks: [com,a ..., com,c), [com,c ..., end)
    assert(r.intersectBlock("com,a)/x 2015", Some("com,c)/y 2015")) === true)
    assert(r.intersectBlock("com,c)/y 2015", None) === false)
    val range = rangeFromFilters(Seq(
      GreaterThanOrEqual("urlkey", "com,b)"), LessThan("urlkey", "com,c)")))
    assert(range.intersectBlock("com,a)/x 2015", Some("com,b)/x 2015")) === true) // boundary kept
    assert(range.intersectBlock("com,c)/x 2015", None) === false)
    assert(range.intersectBlock("com,b)/x 2015", Some("com,b)/z 2015")) === true)
  }

  test("limit pushdown caps planned blocks; stats shrink with pruning") {
    setup()
    val idx = graft.sources.ZipNumScan.readIdxStatic(zipDir)
    assert(idx.size > 1)
    // limit=1 plans exactly 1 block (each block holds >= 1 line)
    def blocksOf(scan: graft.sources.ZipNumScan): Int =
      scan.planInputPartitions()
        .map(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks.length).sum
    val limited = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema, Some(1))
    assert(blocksOf(limited) == 1)
    // Spark still applies its own Limit: end-to-end row count is exact
    assert(spark.read.format("zipnum").load(zipDir).limit(1).count() == 1)
    // reported sizeInBytes shrinks when pruning shrinks the block set
    def sizeOf(scan: graft.sources.ZipNumScan): Long =
      scan.estimateStatistics().sizeInBytes().getAsLong
    val full = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema)
    val pruned = new graft.sources.ZipNumScan(
      zipDir,
      ZipNumSource.rangeFromFilters(Seq(StringStartsWith("urlkey", "org,iana"))),
      ZipNumSource.schema)
    assert(sizeOf(full) == idx.map(_.length).sum * 4)
    assert(sizeOf(pruned) < sizeOf(full) && sizeOf(pruned) > 0)
  }

  test("runtime filtering prunes to the join keys' blocks; results unchanged") {
    setup()
    val full = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema)
    def blocksOf(s: graft.sources.ZipNumScan): Int =
      s.planInputPartitions()
        .map(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks.length).sum
    val allBlocks = blocksOf(full)
    assert(allBlocks > 1)
    // a known key prunes; the scan still returns its rows
    val key = spark.read.format("zipnum").load(zipDir)
      .select("urlkey").orderBy("urlkey").as[String].first()
    val filtered = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema)
    filtered.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("urlkey", Array(key))))
    assert(blocksOf(filtered) < allBlocks && blocksOf(filtered) > 0,
      s"runtime-pruned ${blocksOf(filtered)} of $allBlocks")
    // a below-all key prunes to zero blocks; an above-all key keeps only
    // the conservative straddling final block (its upper key is unknown
    // from the idx — same rule as every other pruning path)
    val below = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema)
    below.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("urlkey", Array("aa,absent)/x"))))
    assert(blocksOf(below) == 0)
    val above = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema)
    above.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("urlkey", Array("zz,absent)/x"))))
    assert(blocksOf(above) <= 1)
    // end-to-end: broadcast join on urlkey returns the right rows with
    // runtime filtering available (whether or not the planner fires it)
    val dim = Seq(key).toDF("urlkey")
    val joined = spark.read.format("zipnum").load(zipDir)
      .join(broadcast(dim), "urlkey")
    assert(joined.count() >= 1)
    assert(joined.select("urlkey").distinct().as[String].collect().toSeq == Seq(key))
  }

  test("top-n pushdown: ORDER BY urlkey LIMIT n reads n blocks from the right end") {
    setup()
    val df = spark.read.format("zipnum").load(zipDir)
    val total = df.count()
    val ascAll = df.orderBy("urlkey").select("urlkey").as[String].collect()
    // asc: first blocks; desc: last blocks — both must match a full sort
    val asc = df.orderBy("urlkey").limit(2).select("urlkey").as[String].collect()
    assert(asc.toSeq == ascAll.take(2).toSeq)
    val desc = df.orderBy(col("urlkey").desc).limit(2).select("urlkey").as[String].collect()
    assert(desc.toSeq == ascAll.reverse.take(2).toSeq)
    assert(total > 2)
    // the scan itself: desc cap takes the LAST blocks
    val idx = graft.sources.ZipNumScan.readIdxStatic(zipDir)
    val descScan = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema,
      Some(1), limitFromEnd = true)
    val planned = descScan.planInputPartitions()
      .flatMap(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks)
    assert(planned.map(_._4).toSeq == Seq(idx.last.seq), "desc limit must keep the tail block")
  }

  test("SQL DDL surface: CREATE TABLE ... USING zipnum, pushdown included") {
    setup()
    spark.sql("DROP TABLE IF EXISTS cdx_idx")
    spark.sql(s"CREATE TABLE cdx_idx USING zipnum OPTIONS (path '$zipDir')")
    try {
      val total = spark.sql("SELECT count(*) FROM cdx_idx").head().getLong(0)
      assert(total == spark.read.format("zipnum").load(zipDir).count())
      // predicate + projection through pure SQL, riding the same pruning
      val rows = spark.sql(
        "SELECT urlkey, ts FROM cdx_idx WHERE urlkey LIKE 'com,example)/path%' ORDER BY ts")
        .as[(String, String)].collect()
      assert(rows.nonEmpty && rows.forall(_._1.startsWith("com,example)/path")))
      val plan = spark.sql(
        "SELECT urlkey FROM cdx_idx WHERE urlkey >= 'org'").queryExecution.executedPlan.toString
      assert(plan.contains("ZipNumScan"), s"expected the V2 scan in:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS cdx_idx")
  }

  test("scan reports blocksRead/compressedBytesRead task metrics") {
    setup()
    val scan = new graft.sources.ZipNumScan(
      zipDir, ZipNumSource.KeyRange(None, None), ZipNumSource.schema)
    assert(scan.supportedCustomMetrics().map(_.name()).toSeq
      == Seq("blocksRead", "compressedBytesRead"))
    val idx = graft.sources.ZipNumScan.readIdxStatic(zipDir)
    val parts = scan.planInputPartitions()
    val factory = scan.createReaderFactory()
    var blocks = 0L
    var bytes = 0L
    parts.foreach { p =>
      val r = factory.createReader(p)
      while (r.next()) r.get()
      val m = r.currentMetricsValues().map(t => t.name() -> t.value()).toMap
      blocks += m("blocksRead"); bytes += m("compressedBytesRead")
      r.close()
    }
    assert(blocks == idx.size, s"read $blocks of ${idx.size} blocks")
    assert(bytes == idx.map(_.length).sum)
  }

  test("zipnum pushdown plans fewer partitions than a full scan") {
    setup()
    val idx = graft.sources.ZipNumScan.readIdxStatic(zipDir)
    val all = new graft.sources.ZipNumScan(zipDir,
      ZipNumSource.KeyRange(None, None), ZipNumSource.schema).planInputPartitions()
    val pruned = new graft.sources.ZipNumScan(zipDir,
      ZipNumSource.rangeFromFilters(Seq(StringStartsWith("urlkey", "org,iana"))),
      ZipNumSource.schema).planInputPartitions()
    val allBlocks = all.map(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks.length).sum
    val prunedBlocks = pruned.map(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks.length).sum
    assert(allBlocks == idx.size)
    assert(prunedBlocks < allBlocks && prunedBlocks > 0,
      s"pruned $prunedBlocks of $allBlocks")
  }

  test("pageByKey's cursor bound prunes blocks below the cursor") {
    // dense cluster: 40 keys x 2-line blocks -> 20 blocks, so a cursor in
    // the back half demonstrably drops whole blocks from the plan
    val dir = "/tmp/graft_test/v2_zipnum_cursor"
    val lines = (0 until 40).map(i =>
      f"com,page)/p$i%03d 2015021500${i % 10} " + s"""{"status":"200"}""")
    ZipNum.write(lines.toDF("line"), dir, shards = 2, linesPerBlock = 2)
    val server = new CdxServer(spark, dir)
    val full = server.prefix("com,").select("urlkey", "ts")
      .as[(String, String)].collect().toSeq
    assert(full.size == 40)
    val (k, t) = full(29) // cursor at row 30 of 40
    val page = server.pageByKey("com,", k, t, 20)
    // result = exactly the rows after the cursor
    assert(page.select("urlkey", "ts").as[(String, String)].collect().toSeq
      == full.filter(r => r._1 > k || (r._1 == k && r._2 > t)))
    // plan level: the >= cursor bound reached the scan as a KeyRange that
    // drops blocks entirely below the cursor
    val range = ZipNumSource.rangeFromFilters(Seq(
      StringStartsWith("urlkey", "com,"), GreaterThanOrEqual("urlkey", k)))
    val allBlocks = new graft.sources.ZipNumScan(dir,
      ZipNumSource.KeyRange(None, None), ZipNumSource.schema)
      .planInputPartitions()
      .map(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks.length).sum
    val cursorBlocks = new graft.sources.ZipNumScan(dir, range, ZipNumSource.schema)
      .planInputPartitions()
      .map(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks.length).sum
    assert(allBlocks == 20)
    assert(cursorBlocks < allBlocks / 2 + 2 && cursorBlocks > 0,
      s"cursor kept $cursorBlocks of $allBlocks blocks")
  }

  test("ts bounds under an exact urlkey prune a hot URL's blocks") {
    // hot URL: 40 captures of ONE key across 20 two-line blocks — the
    // cdx-server exact-url + from=/to= shape must not read all of them
    val dir = "/tmp/graft_test/v2_zipnum_hot"
    val hot = "com,hot)/page"
    val lines = (0 until 40).map(i =>
      f"$hot 201502${i + 10}%02d000000 " + s"""{"status":"200"}""") ++
      Seq("com,zz)/tail 20150101000000 " + s"""{"status":"200"}""")
    ZipNum.write(lines.sorted.toDF("line"), dir, shards = 2, linesPerBlock = 2)
    val df = spark.read.format("zipnum").load(dir)
      .filter(col("urlkey") === hot &&
        col("ts") >= "20150220000000" && col("ts") <= "20150223000000")
    val got = df.select("ts").as[String].collect().toSeq.sorted
    assert(got == (20 to 23).map(d => s"201502${d}000000"))
    // plan level: the combined (urlkey, ts) KeyRange keeps a handful of
    // blocks, not the hot URL's full 20
    import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThanOrEqual}
    val range = ZipNumSource.rangeFromFilters(Seq(
      EqualTo("urlkey", hot),
      GreaterThanOrEqual("ts", "20150220000000"), LessThanOrEqual("ts", "20150223000000")))
    def blocksOf(r: ZipNumSource.KeyRange) =
      new graft.sources.ZipNumScan(dir, r, ZipNumSource.schema)
        .planInputPartitions()
        .map(_.asInstanceOf[graft.sources.ZipNumBlockPartition].blocks.length).sum
    val urlOnly = blocksOf(ZipNumSource.rangeFromFilters(Seq(EqualTo("urlkey", hot))))
    val tsBounded = blocksOf(range)
    assert(urlOnly >= 20, s"exact-url alone spans the hot URL: $urlOnly blocks")
    assert(tsBounded <= 4 && tsBounded > 0,
      s"ts bounds kept $tsBounded of $urlOnly hot-URL blocks")
    // ts filters WITHOUT an exact urlkey must not tighten anything
    val tsOnly = ZipNumSource.rangeFromFilters(Seq(
      GreaterThanOrEqual("ts", "20150220000000")))
    assert(tsOnly.lo.isEmpty && tsOnly.hi.isEmpty)
  }

  test("wacz urlkey pushdown ranges compare in UTF-8 byte order, not UTF-16") {
    // U+FF61 (EF BD A1) < U+1F600 (F0 9F 98 80) in UTF-8 bytes; Java's
    // UTF-16 compareTo inverts them (0xFF61 > surrogate 0xD83D). The
    // skip happens BELOW the scan, so a UTF-16 comparison would drop
    // rows Spark's residual re-check can never restore.
    val hi = "com/😀x" // supplementary: 😀
    val lo = "com/｡a"       // BMP ｡ — UTF-16-greater, UTF-8-smaller
    val gt = graft.sources.WaczSource.urlkeyPredicate(
      Seq(org.apache.spark.sql.sources.GreaterThan("urlkey", lo)))
    assert(gt(hi), "byte order must keep the supplementary key above the BMP bound")
    val le = graft.sources.WaczSource.urlkeyPredicate(
      Seq(org.apache.spark.sql.sources.LessThanOrEqual("urlkey", hi)))
    assert(le(lo), "byte order must keep the BMP key below the supplementary bound")
    // and the Spark-side truth agrees: UTF8String comparison
    import org.apache.spark.unsafe.types.UTF8String
    assert(UTF8String.fromString(hi).compareTo(UTF8String.fromString(lo)) > 0)
    assert(lo.compareTo(hi) > 0, "Java order really is inverted for this pair")
  }
}
