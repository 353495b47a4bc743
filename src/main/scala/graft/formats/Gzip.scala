package graft.formats

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Gzip *member* framing. WARC `.warc.gz` and ZipNum shard files are
  * concatenations of independent gzip members — one WARC record / one CDX
  * block per member — so a reader can seek to a member's byte offset and
  * decompress just that member (SURVEY.md §1.1, §1.4).
  *
  * The JDK's GZIPInputStream transparently reads across member boundaries
  * and hides compressed offsets, so member framing is done here directly:
  * parse the RFC 1952 header, inflate with nowrap, and account the 8-byte
  * CRC32/ISIZE trailer. Pure JDK, no extra dependencies.
  */
object Gzip {

  /** One decompressed member plus its position in the compressed stream. */
  final case class Member(offset: Long, compressedLength: Long, bytes: Array[Byte])

  private val FHCRC = 2
  private val FEXTRA = 4
  private val FNAME = 8
  private val FCOMMENT = 16

  /** InputStream wrapper with a carry buffer for bytes the inflater
    * over-read past a member's end (they belong to the next member). */
  private final class CarryStream(in: InputStream) {
    private var carry: Array[Byte] = Array.emptyByteArray
    private var carryPos = 0

    def pushBack(buf: Array[Byte], from: Int, len: Int): Unit = {
      val remaining = carry.length - carryPos
      val merged = new Array[Byte](len + remaining)
      System.arraycopy(buf, from, merged, 0, len)
      if (remaining > 0) System.arraycopy(carry, carryPos, merged, len, remaining)
      carry = merged
      carryPos = 0
    }

    /** read up to len bytes; -1 at EOF */
    def read(buf: Array[Byte], off: Int, len: Int): Int = {
      val remaining = carry.length - carryPos
      if (remaining > 0) {
        val n = math.min(remaining, len)
        System.arraycopy(carry, carryPos, buf, off, n)
        carryPos += n
        n
      } else in.read(buf, off, len)
    }

    def readByte(): Int = {
      val b = new Array[Byte](1)
      val n = read(b, 0, 1)
      if (n < 0) -1 else b(0) & 0xff
    }

    def readFully(buf: Array[Byte]): Boolean = {
      var got = 0
      while (got < buf.length) {
        val n = read(buf, got, buf.length - got)
        if (n < 0) return false
        got += n
      }
      true
    }
  }

  /** Iterate the gzip members of `in` (a full `.gz` stream). */
  def members(in: InputStream): Iterator[Member] = new Iterator[Member] {
    private val cs = new CarryStream(in)
    private var offset = 0L
    private var nextMember: Member = _
    private var done = false

    private def advance(): Unit = {
      if (done || nextMember != null) return
      val first = cs.readByte()
      if (first < 0) { done = true; return }
      val magic2 = cs.readByte()
      if (first != 0x1f || magic2 != 0x8b)
        throw new IllegalStateException(f"bad gzip magic at offset $offset: $first%02x")
      val fixed = new Array[Byte](8) // CM, FLG, MTIME(4), XFL, OS
      if (!cs.readFully(fixed)) throw new EOFException("truncated gzip header")
      val flags = fixed(1) & 0xff
      var headerLen = 10L
      if ((flags & FEXTRA) != 0) {
        val lenBytes = new Array[Byte](2)
        if (!cs.readFully(lenBytes)) throw new EOFException("truncated FEXTRA")
        val xlen = (lenBytes(0) & 0xff) | ((lenBytes(1) & 0xff) << 8)
        if (!cs.readFully(new Array[Byte](xlen))) throw new EOFException("truncated FEXTRA body")
        headerLen += 2 + xlen
      }
      def skipZeroTerminated(): Unit = {
        var b = cs.readByte()
        headerLen += 1
        while (b > 0) { b = cs.readByte(); headerLen += 1 }
        if (b < 0) throw new EOFException("truncated zero-terminated field")
      }
      if ((flags & FNAME) != 0) skipZeroTerminated()
      if ((flags & FCOMMENT) != 0) skipZeroTerminated()
      if ((flags & FHCRC) != 0) {
        if (!cs.readFully(new Array[Byte](2))) throw new EOFException("truncated FHCRC")
        headerLen += 2
      }
      // inflate the deflate body, tracking compressed bytes consumed
      val inflater = new Inflater(true)
      val out = new ByteArrayOutputStream()
      val inBuf = new Array[Byte](8192)
      val outBuf = new Array[Byte](8192)
      var fedTotal = 0L
      var lastN = 0
      while (!inflater.finished()) {
        if (inflater.needsInput()) {
          val n = cs.read(inBuf, 0, inBuf.length)
          if (n < 0) throw new EOFException("truncated deflate body")
          inflater.setInput(inBuf, 0, n)
          fedTotal += n
          lastN = n
        }
        val n = inflater.inflate(outBuf)
        if (n > 0) out.write(outBuf, 0, n)
      }
      // leftover bytes sit at the tail of the last fed chunk; they are the
      // trailer plus (possibly) the start of the next member
      val leftover = inflater.getRemaining
      inflater.end()
      val deflateLen = fedTotal - leftover
      if (leftover > 0) cs.pushBack(inBuf, lastN - leftover, leftover)
      if (!cs.readFully(new Array[Byte](8))) throw new EOFException("truncated gzip trailer")
      val compLen = headerLen + deflateLen + 8
      nextMember = Member(offset, compLen, out.toByteArray)
      offset += compLen
    }

    override def hasNext: Boolean = { advance(); nextMember != null }
    override def next(): Member = {
      advance()
      if (nextMember == null) throw new NoSuchElementException
      val m = nextMember; nextMember = null; m
    }
  }

  /** Compress `bytes` as one standalone gzip member. */
  def compressMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeMember(out, bytes)
    out.toByteArray
  }

  /** Write one gzip member (fixed 10-byte header, no name/extra fields);
    * returns the member's compressed length. */
  def writeMember(out: OutputStream, bytes: Array[Byte]): Long = {
    val header = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)
    out.write(header)
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](8192)
    var deflateLen = 0L
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      out.write(buf, 0, n)
      deflateLen += n
    }
    deflater.end()
    val crc = new CRC32()
    crc.update(bytes)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write(le32(crc.getValue))
    out.write(le32(bytes.length.toLong & 0xffffffffL))
    10L + deflateLen + 8
  }
}
