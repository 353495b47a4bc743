package graft

import java.nio.file.{Files, Paths}

import graft.formats.Wacz
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** WACZ container spec: round trip through the engine's own writer,
  * central-directory scan, range fetch, and manifest verify; JDK ZipFile
  * as the independent container oracle; determinism; tamper detection;
  * ZIP64 directory parsing; foreign (DEFLATED) index form. */
class WaczSpec extends SparkSpec {

  private val base = "/tmp/graft_test/wacz"

  private def fixtureDf = {
    val schema = StructType(Seq(
      StructField("shard", StringType), StructField("urlkey", StringType),
      StructField("url", StringType), StructField("ts", StringType),
      StructField("status", IntegerType), StructField("mime", StringType),
      StructField("payload", BinaryType), StructField("title", StringType)))
    def b(s: String) = s.getBytes("UTF-8")
    val rows = Seq(
      Row("seg/w-0.warc.gz", "com,example)/a", "http://example.com/a",
        "20200101000000", Integer.valueOf(200), "text/html", b("alpha"), "A"),
      Row("seg/w-0.warc.gz", "com,example)/b", "http://example.com/b",
        "20200102000000", Integer.valueOf(404), "text/plain", b("beta-body"), null),
      // resource record: no status -> indexed but NOT a page
      Row("seg/w-0.warc.gz", "com,example)/r", "http://example.com/r",
        "20200103000000", null, "application/json", b("{\"x\":1}"), null),
      Row("seg/w-1.warc.gz", "org,example)/c", "http://example.org/c",
        "20200104000000", Integer.valueOf(200), "text/html", b("gamma \"quoted\""), "C"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def writeFixture(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    Files.createDirectories(p)
    Wacz.write(fixtureDf, dir)
  }

  test("round trip: index scan + range fetch reproduce every record") {
    val dir = s"$base/rt"
    writeFixture(dir)
    assert(Files.list(Paths.get(dir)).filter(_.toString.endsWith(".wacz")).count() == 2)

    val idx = Wacz.scanIndex(spark, s"$dir/*.wacz")
      .select(org.apache.spark.sql.functions.col("wacz") +:
        Cdx.lineCols(org.apache.spark.sql.functions.col("line")): _*)
      .collect().sortBy(r => (r.getString(0), r.getString(1)))
    assert(idx.length == 4)
    assert(idx.map(_.getString(0)).distinct.toSeq == Seq("w-0.wacz", "w-1.wacz"))
    // sorted by urlkey within each wacz, json carries the pointer fields
    assert(idx(0).getString(1) == "com,example)/a")
    val j0 = idx(0).getString(3)
    assert(j0.contains("\"url\":\"http://example.com/a\""))
    assert(j0.contains("\"status\":\"200\""))
    assert(j0.contains("\"filename\":\"w-0.warc.gz\""))
    // the resource row indexes without a status field
    assert(!idx(2).getString(3).contains("\"status\""))

    // fetch EVERY pointer back through the ZIP and compare payloads
    import org.apache.spark.sql.functions._
    val ptrs = Wacz.scanIndex(spark, s"$dir/*.wacz")
      .select(col("wacz") +: Cdx.lineCols(col("line")): _*)
      .select(col("wacz"),
        get_json_object(col("json"), "$.filename").as("filename"),
        get_json_object(col("json"), "$.offset").cast("long").as("offset"),
        get_json_object(col("json"), "$.length").cast("long").as("length"))
    val got = Wacz.fetchRecords(spark, ptrs, dir)
      .select("url", "ts", "status", "mime", "payload")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).orNull, r.getString(3),
        new String(r.getAs[Array[Byte]](4), "UTF-8"))).sortBy(_._1)
    assert(got.length == 4)
    assert(got(0) == (("http://example.com/a", "20200101000000", 200,
      "text/html", "alpha")))
    assert(got.map(_._5).toSeq.sorted ==
      Seq("alpha", "beta-body", "gamma \"quoted\"", "{\"x\":1}").sorted)
  }

  test("JDK ZipFile agrees: entries STORED, inventory complete, pages correct") {
    val dir = s"$base/jdk"
    writeFixture(dir)
    val zf = new java.util.zip.ZipFile(s"$dir/w-0.wacz")
    try {
      import scala.jdk.CollectionConverters._
      val entries = zf.entries().asScala.toSeq
      assert(entries.map(_.getName).toSet == Set(
        "archive/w-0.warc.gz", "indexes/index.cdx", "pages/pages.jsonl",
        "datapackage.json", "datapackage-digest.json"))
      entries.foreach(e =>
        assert(e.getMethod == java.util.zip.ZipEntry.STORED, e.getName))
      val pages = new String(
        zf.getInputStream(zf.getEntry("pages/pages.jsonl")).readAllBytes(), "UTF-8")
        .split("\n").toSeq
      assert(pages.head.contains("json-pages-1.0"))
      // responses only (2 in w-0); the resource record is not a page
      assert(pages.tail.length == 2)
      assert(pages.tail.head.contains("\"title\":\"A\""))
      assert(!pages.tail(1).contains("\"title\"")) // null title omitted
      // the inner WARC read through the JDK stream parses via Warc.scan
      // machinery: write it out and scan
      val inner = zf.getInputStream(zf.getEntry("archive/w-0.warc.gz")).readAllBytes()
      val tmp = s"$dir/extracted.warc.gz"
      Files.write(Paths.get(tmp), inner)
      val scanned = graft.formats.Warc.scan(spark, tmp)
        .select("url").collect().map(_.getString(0)).sorted
      assert(scanned.toSeq == Seq("http://example.com/a", "http://example.com/b",
        "http://example.com/r"))
    } finally zf.close()
  }

  test("deterministic: two builds produce byte-identical archives") {
    val d1 = s"$base/det1"
    val d2 = s"$base/det2"
    writeFixture(d1)
    writeFixture(d2)
    Seq("w-0.wacz", "w-1.wacz").foreach { n =>
      val a = Files.readAllBytes(Paths.get(s"$d1/$n"))
      val b = Files.readAllBytes(Paths.get(s"$d2/$n"))
      assert(java.util.Arrays.equals(a, b), s"$n differs between builds")
    }
  }

  test("verify: all ok on a clean archive; tamper flips exactly the touched resource") {
    val dir = s"$base/verify"
    writeFixture(dir)
    val clean = Wacz.verify(spark, s"$dir/*.wacz")
      .select("wacz", "path", "ok").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(clean.length == 8) // 2 wacz x (3 resources + manifest seal)
    assert(clean.forall(_._3), clean.mkString(", "))

    // flip one byte INSIDE the stored WARC entry's data (well past the
    // zip local header): only archive/w-0.warc.gz must fail
    val f = Paths.get(s"$dir/w-0.wacz")
    val bytes = Files.readAllBytes(f)
    // locate the gzip member magic of the inner warc (first 1f 8b after
    // the local header region) and flip a byte 20 further in
    val gz = bytes.indexOfSlice(Seq(0x1f.toByte, 0x8b.toByte, 0x08.toByte))
    assert(gz > 0)
    bytes(gz + 20) = (bytes(gz + 20) ^ 0x5a).toByte
    Files.write(f, bytes)
    val tampered = Wacz.verify(spark, s"$dir/w-0.wacz")
      .select("path", "ok").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(!tampered("archive/w-0.warc.gz"))
    assert(tampered("indexes/index.cdx"))
    assert(tampered("pages/pages.jsonl"))
    assert(tampered("datapackage.json"))
  }

  test("a .warc.zst shard packages a .warc.gz inner member, not stacked extensions") {
    val dir = s"$base/zstshard"
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    Files.createDirectories(p)
    val df = fixtureDf.withColumn("shard",
      org.apache.spark.sql.functions.lit("seg/z-0.warc.zst"))
    Wacz.write(df, dir)
    val zf = new java.util.zip.ZipFile(s"$dir/z-0.wacz")
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names.contains("archive/z-0.warc.gz"),
        s"inner member must strip the container extension first: $names")
      assert(!names.exists(_.contains(".warc.zst.warc.gz")), names.toString)
      val idx = new String(
        zf.getInputStream(zf.getEntry("indexes/index.cdx")).readAllBytes(), "UTF-8")
      assert(idx.contains("\"filename\":\"z-0.warc.gz\""))
    } finally zf.close()
    // and the manifest verifies against the corrected path
    val ok = Wacz.verify(spark, s"$dir/*.wacz").select("ok")
      .collect().map(_.getBoolean(0))
    assert(ok.nonEmpty && ok.forall(identity))
  }

  test("a collection column packages MULTIPLE inner WARCs per archive") {
    val dir = s"$base/collection"
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    Files.createDirectories(p)
    Wacz.write(fixtureDf.withColumn(
      "collection", org.apache.spark.sql.functions.lit("coll-A")), dir)
    assert(Files.list(p).filter(_.toString.endsWith(".wacz")).count() == 1)

    val zf = new java.util.zip.ZipFile(s"$dir/coll-A.wacz")
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names == Set("archive/w-0.warc.gz", "archive/w-1.warc.gz",
        "indexes/index.cdx", "pages/pages.jsonl",
        "datapackage.json", "datapackage-digest.json"), names.toString)
      // the merged index is urlkey-sorted ACROSS members, each line
      // naming the record's OWN inner member
      val idx = new String(
        zf.getInputStream(zf.getEntry("indexes/index.cdx")).readAllBytes(), "UTF-8")
        .split("\n").filter(_.nonEmpty)
      assert(idx.map(_.split(" ")(0)).toSeq == idx.map(_.split(" ")(0)).sorted.toSeq)
      assert(idx.count(_.contains("\"filename\":\"w-0.warc.gz\"")) == 3)
      assert(idx.count(_.contains("\"filename\":\"w-1.warc.gz\"")) == 1)
    } finally zf.close()

    // every pointer replays through ITS member
    import org.apache.spark.sql.functions._
    val ptrs = Wacz.scanIndex(spark, s"$dir/*.wacz")
      .select(col("wacz") +: Cdx.lineCols(col("line")): _*)
      .select(col("wacz"),
        get_json_object(col("json"), "$.filename").as("filename"),
        get_json_object(col("json"), "$.offset").cast("long").as("offset"),
        get_json_object(col("json"), "$.length").cast("long").as("length"))
    val got = Wacz.fetchRecords(spark, ptrs, dir)
      .select("payload").collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).sorted.toSeq
    assert(got == Seq("alpha", "beta-body", "gamma \"quoted\"", "{\"x\":1}").sorted)

    // manifest verifies every inner member + the index + pages + seal
    val ver = Wacz.verify(spark, s"$dir/*.wacz")
      .select("path", "ok").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(ver.size == 5, ver.toString)
    assert(ver.keySet.contains("archive/w-0.warc.gz") &&
      ver.keySet.contains("archive/w-1.warc.gz"))
    assert(ver.values.forall(identity), ver.toString)
  }

  test("selectBlocks is tight and lossless, including boundary-straddling key runs") {
    val fks = IndexedSeq("a", "c", "c", "f")
    // a run of 'c' keys can straddle blocks 0-2 (closed upper bounds)
    assert(Wacz.selectBlocks(fks, "c") == Seq(0, 1, 2))
    assert(Wacz.selectBlocks(fks, "a") == Seq(0))
    assert(Wacz.selectBlocks(fks, "b") == Seq(0))
    // block 2 covers [c, f] CLOSED — it may end with an 'f' key, so the
    // lossless selection includes it alongside the block that starts at f
    assert(Wacz.selectBlocks(fks, "f") == Seq(2, 3))
    assert(Wacz.selectBlocks(fks, "g") == Seq(3)) // last block is open-ended

    // SCALE SHAPE: a point prefix selects O(1) blocks no matter how many
    // the index holds — the pruning that makes a packaged 100 GB archive
    // answer a lookup in two positioned reads
    val many = (0 until 100000).map(i => f"k$i%06d").toIndexedSeq
    val sel = Wacz.selectBlocks(many, "k050000")
    assert(sel.size <= 2, s"point prefix selected ${sel.size} of 100k blocks")
    assert(sel.contains(50000))
  }

  test("selectBlocks compares in UTF-8 byte order — supplementary-char prefixes keep their blocks") {
    // Spark sorts the index in UTF-8 bytes: U+FF61 (EF BD A1) < U+1F600
    // (F0 9F 98 80). Java's UTF-16 compareTo INVERTS them (0xFF61 >
    // 0xD83D), and a U+FFFF sentinel sorts BELOW supplementary chars —
    // either mistake silently drops the straddling block for an
    // emoji/supplementary prefix.
    val fks = IndexedSeq("com/a", "com/｡a", "com/😀x")
    val sel = Wacz.selectBlocks(fks, "com/😀")
    assert(sel == Seq(1, 2), s"got $sel")
  }

  test("lookupPrefix parses the CDXJ-json idx dialect and honors its filename field") {
    val dir = s"$base/jsonidx"
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(s"$dir/jsonidx.wacz")
    def gz(lines: String): Array[Byte] =
      graft.formats.Gzip.compressMember(lines.getBytes("UTF-8"))
    val b1 = gz("com,a)/ 20200101000000 {\"url\":\"http://a/\"}\n" +
      "com,b)/ 20200102000000 {\"url\":\"http://b/\"}\n")
    val b2 = gz("org,c)/ 20200103000000 {\"url\":\"http://c/\"}\n")
    val cdxGz = b1 ++ b2
    val idx = (s"""com,a)/ 20200101000000 {"offset": 0, "length": ${b1.length}, "filename": "index.cdx.gz"}""" +
      "\n" +
      s"""org,c)/ 20200103000000 {"offset": ${b1.length}, "length": ${b2.length}, "filename": "index.cdx.gz"}""" +
      "\n").getBytes("UTF-8")
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    try {
      def stored(name: String, bytes: Array[Byte]): Unit = {
        val e = new java.util.zip.ZipEntry(name)
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        e.setCompressedSize(bytes.length.toLong)
        val c = new java.util.zip.CRC32(); c.update(bytes)
        e.setCrc(c.getValue)
        e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
        out.putNextEntry(e); out.write(bytes); out.closeEntry()
      }
      stored("indexes/index.cdx.gz", cdxGz)
      stored("indexes/index.idx", idx)
    } finally out.close()
    val got = Wacz.lookupPrefix(spark, s"$dir/*.wacz", "org,")
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("org,c)/ 20200103000000 {\"url\":\"http://c/\"}"), got.toString)
    val all = Wacz.lookupPrefix(spark, s"$dir/*.wacz", "com,")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(all.length == 2 && all.forall(_.startsWith("com,")), all.toString)
  }

  test("big-archive index form: blocked cdx.gz + idx; pruned lookup == filtered scan") {
    val dir = s"$base/blocked"
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    Files.createDirectories(p)
    Wacz.write(fixtureDf.withColumn(
      "collection", org.apache.spark.sql.functions.lit("big")), dir,
      indexLinesPerBlock = 2)

    val zf = new java.util.zip.ZipFile(s"$dir/big.wacz")
    try {
      import scala.jdk.CollectionConverters._
      val byName = zf.entries().asScala.map(e => e.getName -> e).toMap
      assert(byName.contains("indexes/index.cdx.gz") &&
        byName.contains("indexes/index.idx"), byName.keySet.toString)
      byName.values.foreach(e =>
        assert(e.getMethod == java.util.zip.ZipEntry.STORED, e.getName))
      // 4 records at 2 lines/block = 2 blocks = 2 idx pointer lines
      val idx = new String(zf.getInputStream(
        zf.getEntry("indexes/index.idx")).readAllBytes(), "UTF-8")
        .split("\n").filter(_.nonEmpty)
      assert(idx.length == 2, idx.toSeq.toString)
      assert(idx.forall(_.split("\t").length == 4), idx.toSeq.toString)
    } finally zf.close()

    // the full scan reads the blocked form transparently
    val full = Wacz.scanIndex(spark, s"$dir/*.wacz")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(full.length == 4)
    // pruned lookup == prefix filter of the full scan (losslessness)
    val pruned = Wacz.lookupPrefix(spark, s"$dir/*.wacz", "com,example)")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(pruned == full.filter(_.startsWith("com,example)")), pruned.toString)
    assert(pruned.length == 3)
    // and the manifest still verifies (5 resources + the seal)
    val ver = Wacz.verify(spark, s"$dir/*.wacz").select("path", "ok")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(ver.size == 6 && ver.values.forall(identity), ver.toString)
  }

  test("a truncated DEFLATED entry fails loudly instead of hanging") {
    val dir = s"$base/truncated"
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(s"$dir/trunc.wacz")
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    try {
      val e = new java.util.zip.ZipEntry("indexes/index.cdx") // DEFLATED
      e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
      out.putNextEntry(e)
      out.write(("com,x)/ 20200101000000 {\"url\":\"http://x.com/\"}\n" * 50).getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
    // zero the tail half of the deflate data (directory sizes stay as
    // declared): inflate stalls or errors mid-output — must THROW
    val bytes = Files.readAllBytes(p)
    val dataStart = 30 + "indexes/index.cdx".length
    def findSig(b: Array[Byte], from: Int): Int = {
      var i = from
      while (i + 4 < b.length) {
        if (b(i) == 0x50 && b(i + 1) == 0x4b && b(i + 2) == 0x01 && b(i + 3) == 0x02)
          return i
        i += 1
      }
      -1
    }
    val cd = findSig(bytes, dataStart)
    val dataEnd = cd - 16 // deflated entry carries a 16-byte data descriptor
    assert(cd > 0 && dataEnd - dataStart > 20, s"cd=$cd dataStart=$dataStart")
    java.util.Arrays.fill(bytes, dataStart + (dataEnd - dataStart) / 2, dataEnd, 0.toByte)
    Files.write(p, bytes)
    val ex = intercept[Exception] {
      Wacz.scanIndex(spark, s"$dir/trunc.wacz").collect()
    }
    assert(ex.getMessage != null)
  }

  test("centralDirectory parses a ZIP64 directory (entry-count overflow)") {
    val p = Paths.get(s"$base/zip64.zip")
    Files.createDirectories(p.getParent)
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    val n = 70000 // > 0xFFFF forces the ZIP64 end-of-central-directory
    try {
      var i = 0
      while (i < n) {
        val e = new java.util.zip.ZipEntry(f"e$i%05d")
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(0); e.setCompressedSize(0); e.setCrc(0)
        e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
        out.putNextEntry(e)
        out.closeEntry()
        i += 1
      }
    } finally out.close()
    val ch = java.nio.channels.FileChannel.open(p)
    try {
      val read: (Long, Array[Byte]) => Unit = (pos, buf) => {
        val bb = java.nio.ByteBuffer.wrap(buf)
        var off = pos
        while (bb.hasRemaining) {
          val r = ch.read(bb, off)
          assert(r > 0); off += r
        }
      }
      val entries = Wacz.centralDirectory(read, Files.size(p))
      assert(entries.length == n)
      assert(entries.head.name == "e00000" && entries.last.name == f"e${n - 1}%05d")
    } finally ch.close()
  }

  test("scanIndex reads a foreign DEFLATED index entry") {
    val dir = s"$base/foreign"
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(s"$dir/foreign.wacz")
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    try {
      val e = new java.util.zip.ZipEntry("indexes/index.cdx") // default DEFLATED
      e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
      out.putNextEntry(e)
      out.write("com,x)/ 20200101000000 {\"url\":\"http://x.com/\"}\n".getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
    val lines = Wacz.scanIndex(spark, s"$dir/*.wacz").collect()
    assert(lines.length == 1)
    assert(lines.head.getString(0) == "foreign.wacz")
    assert(lines.head.getString(1).startsWith("com,x)/ 20200101000000"))
  }

  test("write pre-flight rejects EMPTY normalized basenames (trailing '/', bare extension)") {
    val dir = s"$base/emptyname"
    Files.createDirectories(Paths.get(dir))
    // collection ending in '/' → basename '' → hidden '.wacz'
    val e1 = intercept[IllegalArgumentException] {
      Wacz.write(fixtureDf.withColumn("collection",
        org.apache.spark.sql.functions.lit("seg/")), dir)
    }
    assert(e1.getMessage.contains("NON-EMPTY"), e1.getMessage)
    // shard named exactly '.warc.gz' → inner basename '' → hidden member
    val e2 = intercept[IllegalArgumentException] {
      Wacz.write(fixtureDf
        .withColumn("collection", org.apache.spark.sql.functions.lit("ok-coll"))
        .withColumn("shard", org.apache.spark.sql.functions.lit(".warc.gz")), dir)
    }
    assert(e2.getMessage.contains("non-empty"), e2.getMessage)
    // leading-dot / leading-underscore basenames are equally unreadable:
    // every reader's hidden-file exclusion (and the stale-temp sweep)
    // skips them — the pre-flight must reject, not write
    Seq(".staging", "_tmp").foreach { bad =>
      val e3 = intercept[IllegalArgumentException] {
        Wacz.write(fixtureDf.withColumn("collection",
          org.apache.spark.sql.functions.lit(bad)), dir)
      }
      assert(e3.getMessage.contains("non-hidden"), s"$bad: ${e3.getMessage}")
      val e4 = intercept[IllegalArgumentException] {
        Wacz.write(fixtureDf
          .withColumn("collection", org.apache.spark.sql.functions.lit("ok-coll"))
          .withColumn("shard",
            org.apache.spark.sql.functions.lit(s"$bad.warc.gz")), dir)
      }
      assert(e4.getMessage.contains("non-hidden"), s"$bad inner: ${e4.getMessage}")
    }
    // nothing was written
    assert(Files.list(Paths.get(dir)).filter(_.toString.endsWith(".wacz")).count() == 0)
  }

  test("scanIndex/verify expand a directory match to its .wacz children; dir with none fails loudly") {
    val dir = s"$base/dirglob"
    writeFixture(dir)
    // the glob matches the DIRECTORY itself — readers expand to children
    val viaDir = Wacz.scanIndex(spark, dir).collect().map(_.getString(1)).sorted.toSeq
    val viaGlob = Wacz.scanIndex(spark, s"$dir/*.wacz").collect().map(_.getString(1)).sorted.toSeq
    assert(viaDir == viaGlob && viaDir.length == 4, viaDir.toString)
    assert(Wacz.verify(spark, dir).count() == 8)
    // a directory with NO archives fails loudly, not an empty frame
    val empty = s"$base/dirglob_empty"
    Files.createDirectories(Paths.get(empty))
    val ex = intercept[IllegalArgumentException] {
      Wacz.scanIndex(spark, empty)
    }
    assert(ex.getMessage.contains("no archive files"), ex.getMessage)
  }

  test("verify reports a corrupt DEFLATED resource as ok=false instead of aborting the glob") {
    val dir = s"$base/verify_corrupt"
    val p0 = Paths.get(dir)
    if (Files.exists(p0))
      Files.walk(p0).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    Files.createDirectories(p0)
    // a clean engine-written archive next to a foreign one with a
    // DEFLATED resource whose stream we corrupt mid-data
    writeFixture(dir)
    val p = Paths.get(s"$dir/zforeign.wacz")
    // incompressible body so the deflate stream is long enough that the
    // corruption window below stays strictly inside the entry's data
    val body = new Array[Byte](8192)
    new java.util.Random(42L).nextBytes(body)
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    try {
      val e = new java.util.zip.ZipEntry("archive/x.warc.gz") // DEFLATED
      e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
      out.putNextEntry(e); out.write(body); out.closeEntry()
      val sha = java.security.MessageDigest.getInstance("SHA-256").digest(body)
      val hexSha = sha.map(b => f"$b%02x").mkString
      val dp = (s"""{"resources":[{"path":"archive/x.warc.gz",""" +
        s""""hash":"sha256:$hexSha","bytes":${body.length}}]}""").getBytes("UTF-8")
      val de = new java.util.zip.ZipEntry("datapackage.json")
      de.setMethod(java.util.zip.ZipEntry.STORED)
      de.setSize(dp.length.toLong); de.setCompressedSize(dp.length.toLong)
      val crc = new java.util.zip.CRC32(); crc.update(dp)
      de.setCrc(crc.getValue)
      de.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
      out.putNextEntry(de); out.write(dp); out.closeEntry()
    } finally out.close()
    // zero a run inside the deflate data so inflate errors or stalls
    val bytes = Files.readAllBytes(p)
    val dataStart = 30 + "archive/x.warc.gz".length
    java.util.Arrays.fill(bytes, dataStart + 40, dataStart + 120, 0.toByte)
    Files.write(p, bytes)
    val ver = Wacz.verify(spark, s"$dir/*.wacz")
      .select("wacz", "path", "ok").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    // the corrupt resource is a per-resource failure…
    assert(ver(("zforeign.wacz", "archive/x.warc.gz")) == false, ver.toString)
    // …and the clean archives in the SAME glob still verified green
    assert(ver.count { case ((w, _), ok) => w != "zforeign.wacz" && ok } == 8, ver.toString)
  }
}
