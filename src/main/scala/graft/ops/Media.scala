package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Real media codec round trips over public formats, pure JVM — no native
  * codec libraries. These back the `mm_image_stats` / `mm_audio_meta` /
  * `mm_video_frames` queries (queries/Multimodal.scala): the payload BINARY
  * column holds genuine PNG / RIFF-WAVE / GIF89a bytes produced by the
  * JDK's own encoders, and the decode side goes back through the JDK's
  * readers (`javax.imageio`, `javax.sound.sampled`) before any Spark
  * aggregation sees a number. Contrast with the deterministic length-keyed
  * stub kept for a/v metadata in `mm_decode_meta` — here the decoded stats
  * are only reachable by actually parsing the bytes.
  *
  * Everything is deterministic (solid-color frames, square-wave PCM) so
  * the decoded statistics are closed-form functions of the generator
  * parameters and stay DuckDB-oracle-able.
  *
  * Scale: encode/decode are per-row, shuffle-free, and run inside
  * `mapPartitions` so per-partition codec initialization (here: ImageIO
  * reader/writer instances) amortizes exactly where a production
  * extractor's model/codec handle would.
  */
object Media {

  javax.imageio.ImageIO.setUseCache(false) // no disk-backed stream cache in executors

  // ---------------------------------------------------------------- image

  final case class ImageStats(width: Int, height: Int, meanR: Int, meanG: Int, meanB: Int)

  /** a complete, valid PNG: w×h solid color, encoded by the JDK PNG writer */
  def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** a complete, valid PNG whose pixels form a deterministic gradient:
    * pixel (x, y) = ((x·7+1) % 256, (y·11+2) % 256, ((x+y)·13+3) % 256).
    * Unlike [[solidPng]], every pixel differs — so a resize that samples
    * the wrong source pixel produces the wrong answer, which is the whole
    * point of the fixture. PNG is lossless RGB: the decode returns these
    * exact values. */
  def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (((x * 7 + 1) % 256) << 16) | (((y * 11 + 2) % 256) << 8) | ((x + y) * 13 + 3) % 256)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** a complete, valid JPEG: w×h solid color through the JDK JPEG writer
    * at an explicit quality (defaults high — solid blocks survive DCT
    * quantization almost exactly, so decoded means stay within a few
    * counts of the request). JPEG is the dominant web image format; the
    * generic ImageIO decode used by [[decodeImageStats]]/[[resizeNearest]]
    * /[[dHashHex]] reads it with zero extra code — these fixtures exist
    * to PROVE that and to pin the lossy tolerance in MediaSpec. */
  def solidJpeg(w: Int, h: Int, r: Int, g: Int, b: Int, quality: Float = 0.9f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    encodeJpeg(img, quality)
  }

  /** the [[gradientPng]] pixel formula through the JPEG encoder — the
    * lossy twin for near-dup/goldens (decode returns APPROXIMATELY the
    * gradient, never exactly; assertions must use tolerances) */
  def gradientJpeg(w: Int, h: Int, quality: Float = 0.9f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (((x * 7 + 1) % 256) << 16) | (((y * 11 + 2) % 256) << 8) | ((x + y) * 13 + 3) % 256)
        x += 1
      }
      y += 1
    }
    encodeJpeg(img, quality)
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    try writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** JPEG dimensions from the SOF marker, by walking the marker stream —
    * the metadata-only parse (no pixel decode) [[graft.queries.Multimodal]]
    * uses for `mm_decode_meta`, the JPEG analog of its PNG IHDR parse.
    * Handles real files (APP0/DQT/… segments before SOF) and any baseline
    * or progressive SOF (0xC0–0xCF except DHT/DAC/RST). Returns None when
    * the bytes are not a JPEG or the stream ends before a SOF. */
  def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None // no SOI
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None // marker misalignment
      val m = bytes(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { i += 2 } // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI / scan start: no SOF seen
      else {
        val segLen = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (segLen < 2) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: precision(1) height(2) width(2)
          if (i + 8 >= bytes.length) return None
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return Some((w, h))
        }
        i += 2 + segLen
      }
    }
    None
  }

  /** nearest-neighbor resize to a fixed (outW × outH) thumbnail — the
    * decode→downsample step every image-feature pipeline runs before
    * featurization. Source pixel for output (x, y) is
    * (⌊x·srcW/outW⌋, ⌊y·srcH/outH⌋) — for x < outW the index stays
    * < srcW, no clamping needed. Returns the packed RGB grid row-major;
    * callers aggregate or flatten it into a feature vector. */
  def resizeNearest(bytes: Array[Byte], outW: Int, outH: Int): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      var x = 0
      while (x < outW) {
        out(y * outW + x) = img.getRGB(x * sw / outW, y * sh / outH) & 0xffffff
        x += 1
      }
      y += 1
    }
    out
  }

  /** difference hash (dHash), the standard perceptual image fingerprint
    * for near-duplicate image dedup: decode → 9×8 nearest-neighbor
    * thumbnail → one bit per adjacent-luminance comparison (8 bits × 8
    * rows). Rendered as 16 hex chars (2 per row, bit x = 1 when
    * lum(x) > lum(x+1)) so the value stays engine-portable — a 64-bit
    * int form would fight sign/overflow semantics across engines.
    * Luminance is the channel SUM (same ordering as the mean, no
    * rounding choice to disagree on). Near-identical images differ in a
    * few bits; banding the 8 row-bytes pairs candidates exactly like
    * simhashCandidates bands its 16-bit words. */
  def dHashHex(bytes: Array[Byte]): String = {
    val px = resizeNearest(bytes, 9, 8)
    def lum(p: Int) = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    val sb = new StringBuilder(16)
    var y = 0
    while (y < 8) {
      var b = 0
      var x = 0
      while (x < 8) {
        if (lum(px(y * 9 + x)) > lum(px(y * 9 + x + 1))) b |= 1 << x
        x += 1
      }
      sb.append(f"$b%02x")
      y += 1
    }
    sb.toString
  }

  /** decode PNG bytes with ImageIO and aggregate true per-pixel channel
    * means (exact integers for solid-color fixtures) */
  def decodeImageStats(bytes: Array[Byte]): ImageStats = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageStats(w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
  }

  // ----------------------------------------------------------------- EXIF

  final case class ExifMeta(orientation: Int, dateTime: String, make: String, model: String)

  /** the APP1 EXIF identifier: "Exif" + two NUL bytes */
  private val ExifSig: Array[Byte] =
    "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0)

  /** splice an EXIF APP1 segment into a JPEG right after SOI — fixture
    * builder for [[exifMeta]]. The segment is a real TIFF IFD0 (entries
    * ascending by tag: Make 0x010F, Model 0x0110, Orientation 0x0112,
    * DateTime 0x0132) in the given byte order; decoders skip APP1, so
    * the spliced image still pixel-decodes and [[jpegDims]] still walks
    * to its SOF. `dateTime` must be the EXIF form `YYYY:MM:DD HH:MM:SS`. */
  def withExif(
      jpeg: Array[Byte], orientation: Int, dateTime: String,
      make: String, model: String, bigEndian: Boolean): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG (no SOI)")
    require(dateTime.length == 19, s"EXIF DateTime must be 19 chars, got '$dateTime'")
    val mk = make.getBytes("US-ASCII"); val md = model.getBytes("US-ASCII")
    val dt = dateTime.getBytes("US-ASCII")
    val dataStart = 8 + 2 + 4 * 12 + 4 // tiff hdr + count + entries + next-IFD
    // TIFF rule: values of ≤ 4 bytes (count includes the NUL) live
    // INLINE in the value field; only longer ones go via offset
    def inline(b: Array[Byte]) = b.length + 1 <= 4
    val offsetData = Seq(mk, md, dt).filterNot(inline)
    val tiffLen = dataStart + offsetData.map(_.length + 1).sum
    val tiff = java.nio.ByteBuffer.allocate(tiffLen).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.putShort(if (bigEndian) 0x4D4D.toShort else 0x4949.toShort) // MM / II
    tiff.putShort(42).putInt(8) // magic, IFD0 offset
    tiff.putShort(4) // entry count
    var dataOff = dataStart
    def ascii(tag: Int, bytes: Array[Byte]): Unit = {
      tiff.putShort(tag.toShort).putShort(2).putInt(bytes.length + 1)
      if (inline(bytes)) tiff.put(java.util.Arrays.copyOf(bytes, 4)) // NUL-padded, order-free
      else { tiff.putInt(dataOff); dataOff += bytes.length + 1 }
    }
    ascii(0x010F, mk)
    ascii(0x0110, md)
    tiff.putShort(0x0112).putShort(3).putInt(1) // Orientation, SHORT x1
    tiff.putShort(orientation.toShort).putShort(0) // inline value + pad
    ascii(0x0132, dt)
    tiff.putInt(0) // next IFD
    for (b <- offsetData) { tiff.put(b); tiff.put(0.toByte) }
    val exif = ExifSig ++ tiff.array()
    val app1 = java.nio.ByteBuffer.allocate(4 + exif.length)
      .putShort(0xFFE1.toShort).putShort((2 + exif.length).toShort).put(exif).array()
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** parse the APP1/EXIF IFD0 of a JPEG: Orientation, DateTime, Make,
    * Model — the per-image metadata real crawl pipelines key rotation
    * and dedup heuristics on. Handles BOTH TIFF byte orders; absent
    * segment/tags and any malformed offset return None / null fields
    * (junk EXIF must never kill a task). */
  def exifMeta(bytes: Array[Byte]): Option[ExifMeta] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    // marker walk to the EXIF APP1 (same discipline as jpegDims). APP1
    // also carries XMP, and real writers (phone pipelines, Photoshop)
    // can put that one FIRST — a non-EXIF APP1 is skipped like any other
    // segment, the walk continues to a later EXIF one.
    var i = 2
    var app1: Int = -1
    var app1Len = 0
    while (app1 < 0 && i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      val m = bytes(i + 1) & 0xff
      if (m == 0xff) i += 1
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2
      else if (m == 0xd9 || m == 0xda) return None // no EXIF before the scan
      else {
        val segLen = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (segLen < 2 || i + 2 + segLen > bytes.length) return None
        val isExif = m == 0xe1 && segLen - 2 >= 14 &&
          ExifSig.indices.forall(k => bytes(i + 4 + k) == ExifSig(k))
        if (isExif) { app1 = i + 4; app1Len = segLen - 2 }
        else i += 2 + segLen
      }
    }
    if (app1 < 0) return None
    val tiff = app1 + 6
    val end = app1 + app1Len
    def ok(at: Int, n: Int) = at >= tiff && at + n <= end
    val big = (bytes(tiff) & 0xff) == 0x4D
    if (!big && (bytes(tiff) & 0xff) != 0x49) return None
    def u16(at: Int): Int =
      if (big) ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
      else ((bytes(at + 1) & 0xff) << 8) | (bytes(at) & 0xff)
    def u32(at: Int): Long =
      if (big) (u16(at).toLong << 16) | u16(at + 2)
      else (u16(at + 2).toLong << 16) | u16(at)
    if (!ok(tiff + 2, 2) || u16(tiff + 2) != 42) return None
    val ifd = tiff + u32(tiff + 4).toInt
    if (!ok(ifd, 2)) return None
    val n = u16(ifd)
    var orientation = 0
    var dateTime: String = null
    var mk: String = null
    var md: String = null
    def asciiAt(entry: Int): String = {
      val count = u32(entry + 4).toInt
      if (count <= 0) return null
      val at = if (count <= 4) entry + 8 else tiff + u32(entry + 8).toInt
      if (!ok(at, count)) return null
      // count includes the NUL terminator
      new String(bytes, at, count - 1, "US-ASCII")
    }
    var e = 0
    while (e < n && ok(ifd + 2 + e * 12, 12)) {
      val entry = ifd + 2 + e * 12
      u16(entry) match {
        case 0x0112 => orientation = u16(entry + 8) // SHORT, inline
        case 0x0132 => dateTime = asciiAt(entry)
        case 0x010F => mk = asciiAt(entry)
        case 0x0110 => md = asciiAt(entry)
        case _ =>
      }
      e += 1
    }
    Some(ExifMeta(orientation, dateTime, mk, md))
  }

  // ---------------------------------------------------------------- audio

  final case class AudioStats(
      sampleRate: Int, channels: Int, nSamples: Long, meanAmp: Double, rms: Double)

  /** a complete RIFF/WAVE file: 16-bit signed LE mono PCM square wave
    * (+amp, −amp alternating), encoded by the JDK WAVE writer */
  def squareWav(sampleRate: Int, amp: Int, nSamples: Int): Array[Byte] = {
    require(amp <= Short.MaxValue && nSamples % 2 == 0, "even sample count, 16-bit range")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = if (i % 2 == 0) amp else -amp
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** decode WAV bytes with javax.sound.sampled: header → format fields,
    * PCM frames → mean amplitude and RMS (exact for the square wave) */
  def decodeWav(bytes: Array[Byte]): AudioStats = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian, "16-bit LE PCM expected")
    val n = ais.getFrameLength
    val pcm = ais.readAllBytes()
    var (sum, sumSq) = (0.0, 0.0)
    var i = 0
    while (i < pcm.length - 1) {
      val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toDouble
      sum += s; sumSq += s * s
      i += 2
    }
    // per-SAMPLE stats: the loop accumulates every channel's samples, so
    // divide by frames × channels — dividing by frames alone overstated
    // meanAmp by ×channels (and rms by √channels) on any non-mono input
    // (the mono generator masked it)
    val samples = n.toDouble * fmt.getChannels
    AudioStats(fmt.getSampleRate.toInt, fmt.getChannels, n,
      meanAmp = sum / samples, rms = math.sqrt(sumSq / samples))
  }

  // ---------------------------------------------------------- video (MP4)

  final case class Mp4Track(trackId: Int, handler: String, width: Int, height: Int)
  final case class Mp4Meta(
      brand: String, timescale: Long, durationMs: Long, tracks: Seq[Mp4Track])

  /** Minimal VALID MP4 (ISO/IEC 14496-12 box structure) — fixture builder
    * for [[mp4Meta]], the [[withExif]] discipline: closed-form metadata
    * spliced into real container bytes. Boxes: `ftyp` (brand isom),
    * `moov` ( `mvhd` v0 with (timescale, duration) + one `trak` per
    * entry: `tkhd` v0 with (track_id, width, height as 16.16 fixed) and
    * `mdia`>`hdlr` with the handler type ), then an empty `mdat`. */
  def mp4Fixture(
      timescale: Int, duration: Long,
      tracks: Seq[Mp4Track]): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", {
      val b = java.nio.ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    })
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(timescale).putInt(duration.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      b.position(b.position() + 10) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      b.position(b.position() + 24) // pre_defined
      b.putInt(tracks.size + 1) // next_track_ID
      b.array()
    })
    val traks = tracks.map { t =>
      val tkhd = box("tkhd", {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(7) // version 0, flags enabled|in-movie|in-preview
          .putInt(0).putInt(0) // ctime, mtime
          .putInt(t.trackId).putInt(0) // reserved
          .putInt(duration.toInt)
        b.position(b.position() + 8) // reserved
        b.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(b.putInt)
        b.putInt(t.width << 16).putInt(t.height << 16) // 16.16 fixed
        b.array()
      })
      val hdlr = box("hdlr", {
        val name = (t.handler + "Handler").getBytes("US-ASCII")
        val b = java.nio.ByteBuffer.allocate(24 + name.length + 1)
        b.putInt(0).putInt(0) // version/flags, pre_defined
          .put(t.handler.getBytes("US-ASCII")) // handler_type (4 chars)
        b.position(b.position() + 12) // reserved
        b.put(name).put(0.toByte)
        b.array()
      })
      box("trak", tkhd ++ box("mdia", hdlr))
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    ftyp ++ moov ++ box("mdat", Array.emptyByteArray)
  }

  /** MP4 metadata walk — the pure-JVM box parser behind `mm_video_meta`:
    * brand off `ftyp`, (timescale, duration→ms) off `moov`>`mvhd`
    * (versions 0 AND 1), and the track inventory off each `trak`'s
    * `tkhd` (id, 16.16 width/height) + `mdia`>`hdlr` handler type. The
    * [[exifMeta]] discipline throughout: junk, truncation mid-box, a
    * size field pointing past the buffer, or a missing moov all degrade
    * to None / partial fields — never an exception (a crawl's video
    * payloads are full of cut-off downloads). 64-bit `size==1`
    * largesize boxes and run-to-EOF `size==0` boxes are handled. */
  def mp4Meta(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u32(at: Int): Long =
      ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    def u64(at: Int): Long = (u32(at) << 32) | u32(at + 4)
    def str4(at: Int): String = new String(bytes, at, 4, "US-ASCII")
    // walk boxes in [from, end): callback (type, payloadStart, payloadEnd)
    def walk(from: Int, end: Int)(f: (String, Int, Int) => Unit): Unit = {
      var i = from
      var go = true
      while (go && i + 8 <= end) {
        val size0 = u32(i)
        val tpe = str4(i + 4)
        val (payloadStart, boxEnd) =
          if (size0 == 1L && i + 16 <= end) {
            val ls = u64(i + 8)
            (i + 16, if (ls >= 16 && i + ls <= end) (i + ls).toInt else -1)
          } else if (size0 == 0L) (i + 8, end)
          else (i + 8, if (size0 >= 8 && i + size0 <= end) (i + size0).toInt else -1)
        if (boxEnd < 0 || payloadStart > boxEnd) go = false // truncated/junk: stop
        else {
          f(tpe, payloadStart, boxEnd)
          i = boxEnd
        }
      }
    }
    if (bytes.length < 12 || u32(0) < 12 || str4(4) != "ftyp") return None
    val brand = str4(8)
    var timescale = 0L
    var durationUnits = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    walk(0, bytes.length) { (tpe, ps, pe) =>
      if (tpe == "moov") {
        walk(ps, pe) { (t2, q, qe) =>
          if (t2 == "mvhd" && qe - q >= 4) {
            val v = bytes(q) & 0xff
            if (v == 1 && qe - q >= 32) {
              timescale = u32(q + 20); durationUnits = u64(q + 24)
            } else if (v == 0 && qe - q >= 24) {
              timescale = u32(q + 12); durationUnits = u32(q + 16)
            }
          } else if (t2 == "trak") {
            var id = 0; var w = 0; var h = 0; var handler: String = null
            walk(q, qe) { (t3, r, re) =>
              if (t3 == "tkhd" && re - r >= 84) {
                val v = bytes(r) & 0xff
                if (v == 0) {
                  id = u32(r + 12).toInt
                  w = (u32(r + 76) >> 16).toInt; h = (u32(r + 80) >> 16).toInt
                } else if (v == 1 && re - r >= 96) {
                  id = u32(r + 20).toInt
                  w = (u32(r + 88) >> 16).toInt; h = (u32(r + 92) >> 16).toInt
                }
              } else if (t3 == "mdia") {
                walk(r, re) { (t4, s2, se) =>
                  if (t4 == "hdlr" && se - s2 >= 12) handler = str4(s2 + 8)
                }
              }
            }
            if (id > 0) tracks += Mp4Track(id, handler, w, h)
          }
        }
      }
    }
    // a hostile 64-bit mvhd v1 duration can overflow the ×1000 multiply
    // (negative durMs = garbage, not partial) — degrade to 0 instead;
    // u64 may also have returned negative for a >2^63 field
    val durMs =
      if (timescale > 0 && durationUnits >= 0 &&
        durationUnits <= Long.MaxValue / 1000L)
        durationUnits * 1000L / timescale
      else 0L
    Some(Mp4Meta(brand, timescale, durMs, tracks.toSeq))
  }

  // ----------------------------------------------------------- image (WebP)

  final case class WebpMeta(
      format: String, width: Int, height: Int, animated: Boolean, nFrames: Int)

  /** Minimal VALID WebP (RIFF container, the mm_audio_meta RIFF
    * discipline) — fixture builder for [[webpMeta]]: closed-form dims
    * spliced into real container bytes for each of the three bitstream
    * shapes the format defines. `kind` ∈ VP8 (simple lossy: keyframe
    * tag + 9D 01 2A start code + 14-bit LE dims), VP8L (simple
    * lossless: 0x2F signature + bit-packed (w−1, h−1)), VP8X (extended:
    * flags + 24-bit (w−1, h−1) canvas; `nFrames` > 1 adds the ANIM
    * header and one ANMF chunk per frame, each carrying an embedded
    * VP8 keyframe bitstream — the animation layout the spec mandates). */
  def webpFixture(kind: String, w: Int, h: Int, nFrames: Int = 1): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 0x3fff && h <= 0x3fff, "14-bit dims")
    def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer
        .allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array() // the odd-size pad byte stays zero, per RIFF
    }
    def vp8Payload(fw: Int, fh: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(0x30.toByte).put(0.toByte).put(0.toByte) // frame tag: keyframe
        .put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte) // start code
        .putShort((fw & 0x3fff).toShort).putShort((fh & 0x3fff).toShort)
      b.array()
    }
    val body: Array[Byte] = kind match {
      case "VP8" => chunk("VP8 ", vp8Payload(w, h))
      case "VP8L" =>
        val bits = ((w - 1) & 0x3fff) | (((h - 1) & 0x3fff) << 14)
        val b = java.nio.ByteBuffer.allocate(5).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put(0x2f.toByte).putInt(bits)
        chunk("VP8L", b.array())
      case "VP8X" =>
        val animated = nFrames > 1
        def u24(v: Int): Array[Byte] =
          Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
        val vp8x = chunk("VP8X",
          Array[Byte]((if (animated) 0x02 else 0x00).toByte, 0, 0, 0) ++
            u24(w - 1) ++ u24(h - 1))
        if (!animated) vp8x ++ chunk("VP8 ", vp8Payload(w, h))
        else {
          val anim = chunk("ANIM", Array.fill[Byte](6)(0)) // bg color + loop count
          val frames = (0 until nFrames).flatMap { _ =>
            // ANMF: x(3) y(3) w-1(3) h-1(3) duration(3) flags(1) + frame bytes
            chunk("ANMF",
              u24(0) ++ u24(0) ++ u24(w - 1) ++ u24(h - 1) ++ u24(40) ++
                Array[Byte](0) ++ vp8Payload(w, h))
          }.toArray
          vp8x ++ anim ++ frames
        }
      case other => throw new IllegalArgumentException(s"unknown WebP kind $other")
    }
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WEBP".getBytes("US-ASCII")).put(body)
    out.array()
  }

  /** WebP container metadata walk — pure-JVM RIFF parser behind
    * `mm_webp_meta`: format off the first bitstream chunk (VP8 simple
    * lossy / VP8L simple lossless / VP8X extended), dims off that
    * chunk's own encoding (14-bit LE past the keyframe start code;
    * bit-packed (w−1, h−1); 24-bit canvas), the animation flag off
    * VP8X's flags byte, frame count = ANMF chunks seen. The
    * [[exifMeta]] discipline: junk, a chunk size pointing past the
    * buffer, or truncation mid-walk degrade to None / partial fields
    * (dims 0, frames counted so far) — never a throw. */
  def webpMeta(bytes: Array[Byte]): Option[WebpMeta] = {
    def str4(at: Int): String = new String(bytes, at, 4, "US-ASCII")
    def u16le(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    def u24le(at: Int): Int = u16le(at) | ((bytes(at + 2) & 0xff) << 16)
    def u32le(at: Int): Long = u16le(at).toLong | (u16le(at + 2).toLong << 16)
    if (bytes.length < 12 || str4(0) != "RIFF" || str4(8) != "WEBP") return None
    var format: String = null
    var w = 0; var h = 0
    var animated = false
    var anmf = 0
    var i = 12L
    var go = true
    while (go && i + 8 <= bytes.length) {
      val at = i.toInt
      val fourcc = str4(at)
      val size = u32le(at + 4)
      val ps = at + 8
      val pe = i + 8 + size
      if (pe > bytes.length) go = false // truncated chunk: keep partials
      else {
        val avail = size.toInt
        fourcc match {
          case "VP8 " if format == null =>
            format = "VP8"
            if (avail >= 10 && (bytes(ps) & 1) == 0 &&
              (bytes(ps + 3) & 0xff) == 0x9d && (bytes(ps + 4) & 0xff) == 0x01 &&
              (bytes(ps + 5) & 0xff) == 0x2a) {
              w = u16le(ps + 6) & 0x3fff; h = u16le(ps + 8) & 0x3fff
            }
          case "VP8L" if format == null =>
            format = "VP8L"
            if (avail >= 5 && (bytes(ps) & 0xff) == 0x2f) {
              val bits = u32le(ps + 1)
              w = (bits & 0x3fff).toInt + 1; h = ((bits >> 14) & 0x3fff).toInt + 1
            }
          case "VP8X" if format == null =>
            format = "VP8X"
            if (avail >= 10) {
              animated = (bytes(ps) & 0x02) != 0
              w = u24le(ps + 4) + 1; h = u24le(ps + 7) + 1
            }
          case "ANMF" => anmf += 1
          case _ => ()
        }
        i = pe + (size & 1L) // RIFF chunks are 2-byte aligned
      }
    }
    if (format == null) None
    else Some(WebpMeta(format, w, h, animated, if (animated) anmf else 1))
  }

  // ------------------------------------------------------- image (GIF)

  final case class GifMeta(version: String, width: Int, height: Int,
      gctSize: Int, nFrames: Int, looped: Boolean)

  /** Minimal VALID GIF — fixture builder for [[gifMeta]] (the
    * webpFixture discipline: closed-form fields spliced into real
    * container bytes). Header + logical screen descriptor, optional
    * global color table (`gctEntries` 0 or a power of two ≤ 256),
    * optional NETSCAPE2.0 looping application extension (GIF89a's
    * de-facto animation standard), then `nFrames` image descriptors
    * each carrying a 1-byte LZW stub sub-block, and the 0x3B trailer. */
  def gifFixture(version: String, w: Int, h: Int, nFrames: Int,
      gctEntries: Int = 0, looped: Boolean = false): Array[Byte] = {
    require(version == "87a" || version == "89a", s"bad version $version")
    require(gctEntries == 0 ||
      (gctEntries >= 2 && gctEntries <= 256 && Integer.bitCount(gctEntries) == 1),
      s"gctEntries must be 0 or a power of two in [2,256]: $gctEntries")
    val out = new ByteArrayOutputStream()
    def u16le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write(("GIF" + version).getBytes("US-ASCII"))
    u16le(w); u16le(h)
    if (gctEntries > 0) {
      // packed: GCT flag | color resolution 0 | sort 0 | size 2^(n+1)
      out.write(0x80 | (31 - Integer.numberOfLeadingZeros(gctEntries) - 1))
      out.write(0); out.write(0) // bg index, aspect
      (0 until gctEntries).foreach(i => { out.write(i); out.write(i); out.write(i) })
    } else { out.write(0); out.write(0); out.write(0) }
    if (looped) {
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); u16le(0) // sub-block: loop forever
      out.write(0) // sub-block terminator
    }
    (0 until nFrames).foreach { _ =>
      out.write(0x2c)
      u16le(0); u16le(0); u16le(w); u16le(h)
      out.write(0) // no local color table
      out.write(2) // LZW min code size
      out.write(1); out.write(0) // one stub data sub-block
      out.write(0) // terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** GIF container metadata walk (GIF87a/89a spec, public) — pure-JVM
    * block parser behind `mm_gif_meta`, the hand-rolled complement of
    * the ImageIO-backed [[gifFrames]] (MediaSpec pins the two agree on
    * real JDK-encoded animations): version off the header, canvas dims
    * + global-color-table size off the logical screen descriptor, frame
    * count = image descriptors walked (local color tables and LZW data
    * sub-blocks skipped by their own length fields), looping off the
    * NETSCAPE2.0 application extension. The [[exifMeta]] discipline:
    * junk, an unknown block code, or truncation mid-walk degrade to
    * None / partial fields (frames counted so far) — never a throw. */
  def gifMeta(bytes: Array[Byte]): Option[GifMeta] = {
    if (bytes.length < 13) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val version = hdr.substring(3)
    def u16le(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    val w = u16le(6); val h = u16le(8)
    val packed = bytes(10) & 0xff
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    // sub-block chains terminate on a 0-length block; -1 = truncated
    def skipSubBlocks(at0: Int): Int = {
      var at = at0
      while (at < bytes.length && (bytes(at) & 0xff) != 0) at += 1 + (bytes(at) & 0xff)
      if (at < bytes.length) at + 1 else -1
    }
    var i = 13 + 3 * gctSize
    var frames = 0
    var looped = false
    var go = true
    while (go && i < bytes.length && (bytes(i) & 0xff) != 0x3b) {
      (bytes(i) & 0xff) match {
        case 0x2c => // image descriptor
          if (i + 10 > bytes.length) go = false
          else {
            val lp = bytes(i + 9) & 0xff
            val lctSize = if ((lp & 0x80) != 0) 2 << (lp & 7) else 0
            val lzw = i + 10 + 3 * lctSize
            if (lzw + 1 > bytes.length) go = false
            else {
              val next = skipSubBlocks(lzw + 1)
              if (next < 0) go = false
              else { frames += 1; i = next }
            }
          }
        case 0x21 => // extension: label byte + sub-block chain
          if (i + 2 > bytes.length) go = false
          else {
            if ((bytes(i + 1) & 0xff) == 0xff && i + 14 <= bytes.length &&
              (bytes(i + 2) & 0xff) == 11 &&
              new String(bytes, i + 3, 11, "US-ASCII") == "NETSCAPE2.0")
              looped = true
            val next = skipSubBlocks(i + 2)
            if (next < 0) go = false else i = next
          }
        case _ => go = false // junk block code: keep partials
      }
    }
    Some(GifMeta(version, w, h, gctSize, frames, looped))
  }

  // ------------------------------------------------------- image (PNG)

  final case class PngMeta(width: Int, height: Int, bitDepth: Int,
      colorType: Int, interlaced: Boolean, animated: Boolean, nFrames: Int)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bytes, off, len)
    c.getValue
  }

  /** Minimal VALID PNG/APNG — fixture builder for [[pngMeta]] (the
    * gifFixture discipline: closed-form fields spliced into real,
    * CRC-correct container bytes). Signature, IHDR, a 2-entry PLTE when
    * `colorType` is 3 (indexed images require one), the APNG acTL +
    * per-frame fcTL chain when `nFrames` > 1 (frame 0 over IDAT, later
    * frames over fdAT stubs — the apng spec's layout), IEND. The IDAT
    * payload is a stub: the walk reads structure, never inflates. */
  def pngFixture(w: Int, h: Int, bitDepth: Int, colorType: Int,
      interlaced: Boolean = false, nFrames: Int = 1): Array[Byte] = {
    val validBd = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)
      case 3 => Set(1, 2, 4, 8)
      case 2 | 4 | 6 => Set(8, 16)
      case _ => Set.empty[Int]
    }
    require(validBd(bitDepth), s"bit depth $bitDepth invalid for color type $colorType")
    require(nFrames >= 1, s"nFrames $nFrames")
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    def u32be(b: ByteArrayOutputStream, v: Long): Unit = {
      b.write(((v >> 24) & 0xff).toInt); b.write(((v >> 16) & 0xff).toInt)
      b.write(((v >> 8) & 0xff).toInt); b.write((v & 0xff).toInt)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      u32be(out, data.length.toLong)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body)
      u32be(out, crc32(body, 0, body.length))
    }
    val ihdr = new ByteArrayOutputStream()
    u32be(ihdr, w.toLong); u32be(ihdr, h.toLong)
    ihdr.write(bitDepth); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0) // compression, filter: only 0 is defined
    ihdr.write(if (interlaced) 1 else 0)
    chunk("IHDR", ihdr.toByteArray)
    if (colorType == 3) chunk("PLTE", Array[Byte](0, 0, 0, -1, -1, -1))
    if (nFrames > 1) {
      val actl = new ByteArrayOutputStream()
      u32be(actl, nFrames.toLong); u32be(actl, 0L) // num_plays 0 = forever
      chunk("acTL", actl.toByteArray)
    }
    var seq = 0L
    def fctl(): Unit = {
      val b = new ByteArrayOutputStream()
      u32be(b, seq); seq += 1
      u32be(b, w.toLong); u32be(b, h.toLong); u32be(b, 0L); u32be(b, 0L)
      b.write(0); b.write(1) // delay 0/1
      b.write(0); b.write(0) // dispose, blend
      chunk("fcTL", b.toByteArray)
    }
    if (nFrames > 1) fctl()
    chunk("IDAT", Array[Byte](0x78, 0x01, 0x03, 0x00)) // zlib-shaped stub
    (1 until nFrames).foreach { _ =>
      fctl()
      val fdat = new ByteArrayOutputStream()
      u32be(fdat, seq); seq += 1
      fdat.write(Array[Byte](0x78, 0x01, 0x03, 0x00))
      chunk("fdAT", fdat.toByteArray)
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** PNG container metadata walk (PNG spec / APNG extension, public) —
    * pure-JVM chunk parser behind `mm_png_meta`, the hand-rolled
    * complement of the ImageIO-backed PNG decode the mm_image keys use
    * (MediaSpec pins the two agree on real JDK-encoded images): dims /
    * bit depth / color type / interlace off IHDR, animation + declared
    * frame count off the APNG acTL chunk (1 frame when absent). Every
    * chunk's CRC is VERIFIED — hostile crawl bytes with a corrupted
    * chunk stop the walk at the damage, keeping fields parsed so far
    * (the exifMeta degrade-to-partial discipline); junk, a missing or
    * malformed IHDR, or truncation mid-chunk likewise degrade to
    * None / partial, never a throw. */
  def pngMeta(bytes: Array[Byte]): Option[PngMeta] = {
    if (bytes.length < PngSig.length + 25) return None // sig + IHDR chunk
    if (!PngSig.indices.forall(i => bytes(i) == PngSig(i))) return None
    def u32be(at: Int): Long =
      ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    var i = PngSig.length
    var meta: Option[PngMeta] = None
    var animated = false
    var nFrames = 1
    var go = true
    while (go && i + 8 <= bytes.length) {
      val len = u32be(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > bytes.length) go = false // truncated
      else {
        val typ = new String(bytes, i + 4, 4, "US-ASCII")
        if (crc32(bytes, i + 4, 4 + len.toInt) != u32be(i + 8 + len.toInt))
          go = false // corrupted chunk: keep partials, stop the walk
        else typ match {
          case "IHDR" =>
            if (len != 13) go = false
            else {
              val w = u32be(i + 8); val h = u32be(i + 12)
              if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) go = false
              else meta = Some(PngMeta(w.toInt, h.toInt,
                bytes(i + 16) & 0xff, bytes(i + 17) & 0xff,
                interlaced = (bytes(i + 20) & 0xff) == 1,
                animated = false, nFrames = 1))
            }
          case "acTL" =>
            if (len >= 8 && meta.isDefined) {
              animated = true
              nFrames = math.max(1, u32be(i + 8).min(Int.MaxValue).toInt)
            }
          case "IEND" => go = false
          case _ => // ancillary/unknown chunks (PLTE, fcTL, fdAT, tEXt…): skip
        }
        if (go) i += 12 + len.toInt
      }
    }
    meta.map(m => m.copy(animated = animated, nFrames = if (animated) nFrames else 1))
  }

  // ------------------------------------------------------- image (ICO)

  final case class IcoMeta(kind: String, nImages: Int, maxW: Int, maxH: Int,
      has256: Boolean, bpp: Int)

  /** Minimal VALID ICO/CUR — fixture builder for [[icoMeta]]: ICONDIR
    * header + one ICONDIRENTRY per (w, h, bpp) with stub image payloads
    * at correct offsets. Width/height bytes encode 256 as 0 per spec. */
  def icoFixture(kind: String, entries: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(kind == "ICO" || kind == "CUR", s"bad kind $kind")
    require(entries.nonEmpty && entries.forall { case (w, h, _) =>
      w >= 1 && w <= 256 && h >= 1 && h <= 256 }, "dims must be in [1,256]")
    val out = new ByteArrayOutputStream()
    def u16le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32le(v: Int): Unit = { u16le(v & 0xffff); u16le((v >>> 16) & 0xffff) }
    u16le(0); u16le(if (kind == "ICO") 1 else 2); u16le(entries.size)
    val stub = Array[Byte](1, 2, 3, 4) // payload bytes are opaque to the walk
    var off = 6 + 16 * entries.size
    entries.foreach { case (w, h, bpp) =>
      out.write(if (w == 256) 0 else w)
      out.write(if (h == 256) 0 else h)
      out.write(0); out.write(0) // palette count, reserved
      u16le(1); u16le(bpp)
      u32le(stub.length); u32le(off)
      off += stub.length
    }
    entries.foreach(_ => out.write(stub))
    out.toByteArray
  }

  /** ICO/CUR container walk (the classic favicon format — every crawl
    * sees millions of `/favicon.ico` fetches): kind + image count off
    * ICONDIR, per-entry dims (0 byte = 256) and bit depth off the
    * ICONDIRENTRY table; reports the LARGEST entry (what a renderer
    * picks) and whether a 256-px entry exists. The exifMeta discipline:
    * junk / a bad header / truncation mid-table degrade to None or the
    * entries parsed so far, never a throw. */
  def icoMeta(bytes: Array[Byte]): Option[IcoMeta] = {
    if (bytes.length < 6) return None
    def u16le(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    if (u16le(0) != 0) return None
    val kind = u16le(2) match {
      case 1 => "ICO"; case 2 => "CUR"; case _ => return None
    }
    val declared = u16le(4)
    if (declared == 0) return None
    var (n, maxW, maxH, bpp, has256) = (0, 0, 0, 0, false)
    var i = 6
    while (n < declared && i + 16 <= bytes.length) {
      val w = if ((bytes(i) & 0xff) == 0) 256 else bytes(i) & 0xff
      val h = if ((bytes(i + 1) & 0xff) == 0) 256 else bytes(i + 1) & 0xff
      if (w.toLong * h > maxW.toLong * maxH) { maxW = w; maxH = h; bpp = u16le(i + 6) }
      if (w == 256 || h == 256) has256 = true
      n += 1
      i += 16
    }
    if (n == 0) None else Some(IcoMeta(kind, n, maxW, maxH, has256, bpp))
  }

  // -------------------------------------------------------- image (SVG)

  final case class SvgMeta(width: Option[Int], height: Option[Int],
      vbW: Option[Int], vbH: Option[Int], nPaths: Int)

  /** deterministic SVG document — real XML text with the attribute
    * shapes in the wild: width/height present or viewBox-only, and a
    * body of `<path>` elements */
  def svgFixture(w: Int, h: Int, withWH: Boolean, nPaths: Int): Array[Byte] = {
    val wh = if (withWH) s"""width="${w}px" height="$h" """ else ""
    val paths = (0 until nPaths)
      .map(i => s"""<path d="M0 0L$i $i"/>""").mkString("\n  ")
    (s"""<?xml version="1.0" encoding="UTF-8"?>
       |<!-- crawl fixture -->
       |<svg xmlns="http://www.w3.org/2000/svg" $wh viewBox="0 0 $w $h">
       |  $paths
       |</svg>
       |""".stripMargin).getBytes("UTF-8")
  }

  /** SVG metadata off the document TEXT (SVG is XML — the one image
    * format a crawl parses as markup): declared width/height (absent in
    * the viewBox-only idiom — kept as None, not guessed), the viewBox
    * extent, and the `<path>` element count as a complexity proxy. A
    * tolerant tag scan, not a full XML parse — a truncated or
    * junk-ridden document degrades to None/partial like every other
    * mm_* walker. Only integral px values are reported (unit suffixes
    * beyond px and fractional sizes degrade to None — never a guess). */
  def svgMeta(bytes: Array[Byte]): Option[SvgMeta] = {
    val text = new String(bytes, 0, math.min(bytes.length, 64 * 1024), "UTF-8")
    val root = "(?s)<svg\\b[^>]*>".r.findFirstIn(text).getOrElse(return None)
    def attr(name: String): Option[String] =
      (name + "\\s*=\\s*\"([^\"]*)\"").r.findFirstMatchIn(root).map(_.group(1))
    def px(v: String): Option[Int] = {
      val s = v.trim.stripSuffix("px").trim
      if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toInt) else None
    }
    val vb = attr("viewBox").map(_.trim.split("\\s+")).filter(_.length == 4)
    SvgMeta(
      attr("width").flatMap(px), attr("height").flatMap(px),
      vb.flatMap(a => px(a(2))), vb.flatMap(a => px(a(3))),
      "<path\\b".r.findAllIn(text).size) match {
      case SvgMeta(None, None, None, None, 0) => None // nothing recovered
      case m => Some(m)
    }
  }

  // ------------------------------------------------------- video (GIF89a)

  /** a multi-frame animated GIF: nFrames solid-color w×h frames written
    * through the JDK GIF sequence writer — the poor man's video container,
    * but a real one (frame boundaries live in the byte stream, not in a
    * side channel) */
  def animatedGif(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gray = (f * 51) % 256 // web-safe grays survive GIF palette quantization
      val rgb = (gray << 16) | (gray << 8) | gray
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    out.toByteArray
  }

  /** real frame inventory: the GIF reader walks the byte stream counting
    * image descriptors; also decodes one sampled frame to prove the pixel
    * path works (returns its width) */
  def gifFrames(bytes: Array[Byte]): (Int, Int) = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    val firstW = reader.read(0).getWidth
    reader.dispose(); iis.close()
    (n, firstW)
  }
}
