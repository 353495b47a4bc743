package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.GZIPInputStream

import graft.formats.Gzip

import scala.util.Random

/** Property tests for gzip member framing (SURVEY §5.3): member offsets
  * and lengths exactly tile the file, round-trip preserves bytes, and the
  * concatenation is a valid standard multi-member gzip stream. */
class GzipSpec extends SparkSpec {

  test("round-trip: members(concat(compressMember(x_i))) == x_i with exact offsets") {
    val rnd = new Random(42)
    for (_ <- 1 to 50) {
      val chunks = (1 to (1 + rnd.nextInt(8))).map { _ =>
        val n = 1 + rnd.nextInt(5000)
        val b = new Array[Byte](n); rnd.nextBytes(b); b
      }
      val out = new ByteArrayOutputStream()
      val lens = chunks.map(c => Gzip.writeMember(out, c))
      val fileBytes = out.toByteArray
      val members = Gzip.members(new ByteArrayInputStream(fileBytes)).toList
      assert(members.map(_.bytes.toSeq) == chunks.map(_.toSeq))
      assert(members.map(_.compressedLength) == lens)
      assert(members.head.offset == 0)
      members.sliding(2).foreach {
        case List(a, b) => assert(b.offset == a.offset + a.compressedLength)
        case _ =>
      }
      assert(members.last.offset + members.last.compressedLength == fileBytes.length)
    }
  }

  test("zero-length payload member round-trips") {
    val out = new ByteArrayOutputStream()
    Gzip.writeMember(out, Array.emptyByteArray)
    Gzip.writeMember(out, "after-empty".getBytes("UTF-8"))
    val ms = Gzip.members(new ByteArrayInputStream(out.toByteArray)).toList
    assert(ms.map(_.bytes.length) == List(0, 11))
    assert(new String(ms(1).bytes, "UTF-8") == "after-empty")
  }

  test("interop: JDK GZIPInputStream reads the concatenated members") {
    val chunks = Seq("hello world\n", "second member\n", "third\n").map(_.getBytes("UTF-8"))
    val out = new ByteArrayOutputStream()
    chunks.foreach(c => Gzip.writeMember(out, c))
    val in = new GZIPInputStream(new ByteArrayInputStream(out.toByteArray))
    val all = new String(in.readAllBytes(), "UTF-8")
    assert(all == chunks.map(new String(_, "UTF-8")).mkString)
  }

  test("members() parses gzip files written by standard tools (minimal header)") {
    val payload = "standard gzip member".getBytes("UTF-8")
    val std = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(std)
    gz.write(payload); gz.close()
    val m = Gzip.members(new ByteArrayInputStream(std.toByteArray)).toList
    assert(m.map(_.bytes.toSeq) == List(payload.toSeq))
    assert(m.head.compressedLength == std.toByteArray.length)
  }

  test("FNAME/FEXTRA/FHCRC headers: payload and offset tiling stay exact") {
    import java.util.zip.{CRC32, Deflater}
    // hand-craft a member with all three optional header fields set — real
    // crawl .warc.gz files commonly carry FNAME
    def craft(payload: Array[Byte], name: String, extra: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(0x1f); b.write(0x8b); b.write(8); b.write(2 | 4 | 8) // FHCRC|FEXTRA|FNAME
      b.write(Array[Byte](0, 0, 0, 0)); b.write(0); b.write(3)     // MTIME, XFL, OS=unix
      b.write(extra.length & 0xff); b.write((extra.length >> 8) & 0xff)
      b.write(extra)
      b.write(name.getBytes("ISO-8859-1")); b.write(0)
      val hcrc = new CRC32(); hcrc.update(b.toByteArray)
      b.write((hcrc.getValue & 0xff).toInt); b.write(((hcrc.getValue >> 8) & 0xff).toInt)
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) { val n = d.deflate(buf); b.write(buf, 0, n) }
      d.end()
      val crc = new CRC32(); crc.update(payload)
      def le32(v: Long): Unit = (0 to 3).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
      le32(crc.getValue); le32(payload.length.toLong)
      b.toByteArray
    }
    val p1 = "fname member payload".getBytes("UTF-8")
    val p2 = "plain member".getBytes("UTF-8")
    val m1 = craft(p1, "crawl-00001.warc.gz", Array[Byte](1, 2, 3, 4))
    val out = new ByteArrayOutputStream()
    out.write(m1)
    Gzip.writeMember(out, p2)
    val fileBytes = out.toByteArray
    // the JDK validates the crafted FHCRC — proves the fixture is well-formed
    val jdk = new GZIPInputStream(new ByteArrayInputStream(fileBytes))
    assert(new String(jdk.readAllBytes(), "UTF-8") == "fname member payloadplain member")
    val ms = Gzip.members(new ByteArrayInputStream(fileBytes)).toList
    assert(ms.map(_.bytes.toSeq) == List(p1.toSeq, p2.toSeq))
    assert(ms.head.offset == 0 && ms.head.compressedLength == m1.length)
    assert(ms(1).offset == m1.length)
    assert(ms(1).offset + ms(1).compressedLength == fileBytes.length)
  }

  test("permissive entries: garbage between members becomes a CorruptSpan, tiling exact") {
    val pa = "member A".getBytes("UTF-8")
    val pb = "member B".getBytes("UTF-8")
    for (garbage <- Seq(
        Array[Byte](0x55),                  // 1 byte, then a real header
        "not gzip at all".getBytes("UTF-8") // no fake magic inside
      )) {
      val out = new ByteArrayOutputStream()
      val lenA = Gzip.writeMember(out, pa)
      out.write(garbage)
      Gzip.writeMember(out, pb)
      val fileBytes = out.toByteArray
      // strict reader refuses
      intercept[Exception](Gzip.members(new ByteArrayInputStream(fileBytes)).toList)
      // permissive reader recovers B and accounts every byte exactly once
      val es = Gzip.entries(new ByteArrayInputStream(fileBytes), permissive = true).toList
      val members = es.collect { case m: Gzip.Member => m }
      assert(members.map(_.bytes.toSeq) == List(pa.toSeq, pb.toSeq),
        s"garbage=${garbage.toSeq}: $es")
      val spans = es.collect { case s: Gzip.CorruptSpan => s }
      assert(spans.map(_.compressedLength).sum == garbage.length)
      assert(spans.head.offset == lenA)
      es.sliding(2).foreach {
        case List(a, b) => assert(b.offset == a.offset + a.compressedLength)
        case _ =>
      }
      assert(es.last.offset + es.last.compressedLength == fileBytes.length)
    }
    // a FAKE magic in the garbage starts a doomed parse that consumes the
    // real next header before failing — the bounded-replay rewind rescans
    // from the fake's second byte, so the swallowed member IS recovered
    // (the plain warcio resync heuristic loses it; round-3 advice)
    val fake = Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00, 9, 9)
    val out = new ByteArrayOutputStream()
    Gzip.writeMember(out, pa)
    out.write(fake)
    Gzip.writeMember(out, pb)
    val bytes = out.toByteArray
    val es = Gzip.entries(new ByteArrayInputStream(bytes), permissive = true).toList
    assert(es.collect { case m: Gzip.Member => m.bytes.toSeq } == List(pa.toSeq, pb.toSeq),
      s"the member behind a fake magic must be recovered: $es")
    assert(es.collect { case s: Gzip.CorruptSpan => s.compressedLength }.sum == fake.length)
    es.sliding(2).foreach {
      case List(a, b) => assert(b.offset == a.offset + a.compressedLength)
      case _ =>
    }
    assert(es.last.offset + es.last.compressedLength == bytes.length)
  }

  test("permissive entries: corrupt deflate body and truncated tail resync/terminate") {
    val pa = "good head member".getBytes("UTF-8")
    val pb = new Array[Byte](4000) // incompressible: corruption hits deflate data
    new Random(7).nextBytes(pb)
    val pc = "good tail member".getBytes("UTF-8")
    val out = new ByteArrayOutputStream()
    Gzip.writeMember(out, pa)
    val bStart = out.size()
    val bLen = Gzip.writeMember(out, pb)
    assert(bLen > 1000, "fixture must be incompressible")
    Gzip.writeMember(out, pc)
    val bytes = out.toByteArray
    // flip bytes in the middle of B's deflate data
    for (i <- 0 until 8) bytes(bStart + 500 + i) = (bytes(bStart + 500 + i) ^ 0x5a).toByte
    val es = Gzip.entries(new ByteArrayInputStream(bytes), permissive = true).toList
    val recovered = es.collect { case m: Gzip.Member => new String(m.bytes, "UTF-8") }
    assert(recovered.head == "good head member")
    assert(recovered.last == "good tail member", s"entries: $es")
    assert(es.collect { case s: Gzip.CorruptSpan => s }.nonEmpty)
    assert(es.last.offset + es.last.compressedLength == bytes.length)
    // truncated file (cut inside the last member): everything before still
    // comes back, the tail is a span, and the iterator terminates
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 10)
    val es2 = Gzip.entries(new ByteArrayInputStream(cut), permissive = true).toList
    assert(es2.collect { case m: Gzip.Member =>
      new String(m.bytes, "UTF-8") }.head == "good head member")
    assert(es2.last.offset + es2.last.compressedLength == cut.length)
    // strict mode still throws on the same input
    intercept[Exception](Gzip.members(new ByteArrayInputStream(cut)).toList)
  }

  test("CRC mismatch: structurally-valid garbage is rejected, span covers exactly one member") {
    val pa = "crc guarded".getBytes("UTF-8")
    val pb = "next member fine".getBytes("UTF-8")
    val out = new ByteArrayOutputStream()
    val lenA = Gzip.writeMember(out, pa)
    Gzip.writeMember(out, pb)
    val bytes = out.toByteArray
    bytes(lenA.toInt - 8) = (bytes(lenA.toInt - 8) ^ 0xff).toByte // A's stored CRC
    intercept[IllegalStateException](Gzip.members(new ByteArrayInputStream(bytes)).toList)
    val es = Gzip.entries(new ByteArrayInputStream(bytes), permissive = true).toList
    // the failed decode consumed member A exactly, so the resync lands on
    // B's header with no scanning: one span of precisely A's length
    assert(es.collect { case s: Gzip.CorruptSpan => (s.offset, s.compressedLength) }
      == List((0L, lenA)))
    assert(es.collect { case m: Gzip.Member => new String(m.bytes, "UTF-8") }
      == List("next member fine"))
  }
}
