package graft

import graft.ops.Media

/** Real-codec round trips behind mm_image_stats / mm_audio_meta /
  * mm_video_frames: the JDK encoder writes genuine container bytes and the
  * JDK decoder must recover exactly the planted parameters. These pin the
  * closed-form contracts the DuckDB oracles assume. */
class MediaSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("PNG round trip: dimensions and exact channel means survive encode/decode") {
    for ((w, h, r, g, b) <- Seq((8, 8, 0, 0, 0), (31, 9, 255, 128, 1), (24, 16, 17, 119, 221))) {
      val st = Media.decodeImageStats(Media.solidPng(w, h, r, g, b))
      assert(st == Media.ImageStats(w, h, r, g, b))
    }
  }

  test("PNG bytes start with the real signature (it is a file, not a fake)") {
    val bytes = Media.solidPng(8, 8, 1, 2, 3)
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
  }

  test("JPEG round trip: dimensions exact, solid-color channel means within lossy tolerance") {
    // JPEG is lossy — per-field GOLDENS with a tolerance, not the PNG
    // closed forms: dimensions must survive exactly, and a solid block
    // (DC-only after DCT) must decode within a few counts of the request.
    // Channels stay inside [20, 219] (the mm_jpeg_decode fixture range) —
    // gamut-edge colors clip under YCbCr rounding.
    for ((w, h, r, g, b) <- Seq((8, 8, 20, 219, 120), (31, 9, 200, 30, 77), (24, 16, 57, 119, 181))) {
      val st = Media.decodeImageStats(Media.solidJpeg(w, h, r, g, b))
      assert(st.width == w && st.height == h, s"dims must survive: $st")
      val dev = Seq(st.meanR - r, st.meanG - g, st.meanB - b).map(math.abs).max
      assert(dev <= 8, s"solid ($r,$g,$b) decoded to $st — deviation $dev")
    }
  }

  test("JPEG bytes start with SOI and jpegDims walks real marker streams") {
    val bytes = Media.solidJpeg(19, 7, 40, 80, 120)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "SOI missing")
    // a REAL file: APP0/DQT/... segments precede SOF — the walker must
    // skip them by declared length, not expect SOF at a fixed offset
    assert(Media.jpegDims(bytes).contains((19, 7)))
    // the minimal SOI+SOF0 metadata prefix mm_decode_meta plants
    assert(Media.jpegDims(queries.Multimodal.jpegHeader(640, 480)).contains((640, 480)))
    assert(queries.Multimodal.jpegHeader(1, 1).length == queries.Multimodal.JpegHeaderLen)
    // non-JPEG and truncated inputs answer None, never throw
    assert(Media.jpegDims("plain text".getBytes("UTF-8")).isEmpty)
    assert(Media.jpegDims(Media.solidPng(4, 4, 1, 2, 3)).isEmpty)
    assert(Media.jpegDims(java.util.Arrays.copyOf(bytes, 6)).isEmpty)
    assert(Media.jpegDims(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("JPEG feeds the generic decode paths: resize recovers dims, dHash lands near the PNG twin") {
    val (w, h) = (20, 14)
    val jpg = Media.gradientJpeg(w, h)
    // resizeNearest accepts JPEG (decode is format-generic)
    val px = Media.resizeNearest(jpg, 4, 4)
    assert(px.length == 16)
    // dHash of the lossy gradient must land a FEW bits from the lossless
    // PNG of the same pixels — that is the whole point of a perceptual
    // hash (and what dedup_image_phash's ≤3-bit banding exploits on real
    // crawl images); identical would be suspicious, far apart is a bug
    val hp = Media.dHashHex(Media.gradientPng(w, h))
    val hj = Media.dHashHex(jpg)
    def bits(hex: String) = java.lang.Long.parseUnsignedLong(hex, 16)
    val hamming = java.lang.Long.bitCount(bits(hp) ^ bits(hj))
    assert(hamming <= 12, s"png=$hp jpeg=$hj hamming=$hamming")
  }

  test("EXIF round trip: spliced APP1 parses back in both byte orders; image still decodes") {
    val base = Media.solidJpeg(12, 9, 60, 70, 80)
    for (big <- Seq(true, false)) {
      val jpg = Media.withExif(base, orientation = 6,
        dateTime = "2023:04:15 08:30:59", make = "GraftCam-1", model = "Model-2",
        bigEndian = big)
      val meta = Media.exifMeta(jpg)
      assert(meta.contains(Media.ExifMeta(6, "2023:04:15 08:30:59", "GraftCam-1", "Model-2")),
        s"bigEndian=$big got $meta")
      // the splice is format-legal: dims parse AND pixels still decode
      assert(Media.jpegDims(jpg).contains((12, 9)))
      val st = Media.decodeImageStats(jpg)
      assert(st.width == 12 && st.height == 9)
    }
    // no APP1 -> None; junk never throws
    assert(Media.exifMeta(base).isEmpty)
    assert(Media.exifMeta("not a jpeg".getBytes("UTF-8")).isEmpty)
    assert(Media.exifMeta(Media.solidPng(4, 4, 1, 2, 3)).isEmpty)
    // truncated APP1: cut inside the IFD — parse returns None or partial
    // fields, never an exception
    val full = Media.withExif(base, 3, "2020:01:01 00:00:00", "M", "N", bigEndian = true)
    for (cut <- Seq(6, 10, 20, 30)) {
      Media.exifMeta(java.util.Arrays.copyOf(full, cut)) // must not throw
    }
  }

  test("Multimodal.decode parses the JPEG arm's dimensions from the SOF bytes") {
    val payload = queries.Multimodal.jpegHeader(123, 45) ++ "body text".getBytes("UTF-8")
    val meta = queries.Multimodal.decode(queries.Multimodal.MediaRow(3L, "image", payload))
    assert(meta.width == 123 && meta.height == 45 && meta.n_frames == 1 && meta.sample_rate == 0)
    assert(meta.n_bytes == payload.length)
  }

  test("WAV round trip: header fields, frame count, mean 0, RMS == amplitude") {
    for ((amp, n) <- Seq((300, 64), (30000, 848), (1, 2))) {
      val st = Media.decodeWav(Media.squareWav(8000, amp, n))
      assert(st.sampleRate == 8000 && st.channels == 1 && st.nSamples == n)
      assert(st.meanAmp == 0.0, "square wave over an even count sums to zero")
      assert(st.rms == amp.toDouble, "RMS of ±amp is exactly amp")
    }
  }

  test("WAV bytes carry a real RIFF/WAVE header") {
    val bytes = Media.squareWav(8000, 100, 4)
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") == "WAVE")
  }

  test("WAV layout is the canonical 44-byte header + PCM (the oracle's closed form)") {
    // the mm_* DuckDB oracles assume n_bytes = 44 + 2·nSamples for audio
    // payloads — if the JDK writer ever emits extra chunks this fails
    // BEFORE the oracle gate does
    for (n <- Seq(2, 64, 848)) {
      assert(Media.squareWav(8000, 300, n).length == 44 + 2 * n, s"nSamples=$n")
    }
  }

  test("Multimodal.decode routes RIFF/WAVE payloads through the real PCM parser") {
    val n = 128
    val row = queries.Multimodal.MediaRow(7L, "audio", Media.squareWav(8000, 900, n))
    val meta = queries.Multimodal.decode(row)
    assert(meta.sample_rate == 8000, "sample rate must come from the parsed header")
    assert(meta.n_frames == n, "audio frame count must come from the parsed PCM length")
    assert(meta.n_bytes == 44 + 2 * n)
    // duration is derivable from the parsed fields: frames / rate
    assert(math.abs(meta.n_frames.toDouble / meta.sample_rate - n / 8000.0) < 1e-12)
    // and a payload matching no container keeps the deterministic defaults
    val opaque = queries.Multimodal.decode(
      queries.Multimodal.MediaRow(8L, "video", "just some text".getBytes("UTF-8")))
    assert(opaque.sample_rate == 0 && opaque.width == (16 + 14 % 640))
    // RIFF/WAVE magic over a truncated/garbage body must fall back to the
    // defaults, not fail the task (magic bytes promise a container, not a
    // parseable one)
    val fakeWav = "RIFF0000WAVEgarbage".getBytes("US-ASCII")
    val broken = queries.Multimodal.decode(
      queries.Multimodal.MediaRow(9L, "audio", fakeWav))
    assert(broken.sample_rate == 0 && broken.n_bytes == fakeWav.length)
    val truncated = queries.Multimodal.decode(
      queries.Multimodal.MediaRow(10L, "audio", Media.squareWav(8000, 300, 64).take(30)))
    assert(truncated.sample_rate == 0, "truncated WAV must take the defaults")
  }

  test("GIF round trip: the reader recovers the exact frame count from the stream") {
    for (n <- Seq(1, 5, 24)) {
      val (frames, w) = Media.gifFrames(Media.animatedGif(4, 4, n))
      assert(frames == n && w == 4)
    }
  }

  test("GIF bytes carry the GIF89a/87a magic") {
    val bytes = Media.animatedGif(4, 4, 2)
    assert(new String(bytes, 0, 3, "US-ASCII") == "GIF")
  }

  test("gradient PNG round-trips losslessly; NN resize picks exactly the floor-mapped pixels") {
    def expected(x: Int, y: Int): Int =
      (((x * 7 + 1) % 256) << 16) | (((y * 11 + 2) % 256) << 8) | ((x + y) * 13 + 3) % 256
    // lossless round trip: full-size "resize" is the identity grid
    val full = Media.resizeNearest(Media.gradientPng(5, 3), 5, 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert(full(y * 5 + x) == expected(x, y), s"pixel ($x,$y) corrupted by encode/decode")
    // 8×12 → 4×4: out (x,y) must sample source (x·8/4, y·12/4) = (2x, 3y)
    val px = Media.resizeNearest(Media.gradientPng(8, 12), 4, 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(px(y * 4 + x) == expected(2 * x, 3 * y),
        s"out ($x,$y) must be source (${2 * x},${3 * y})")
    // non-divisible dims exercise the floor: 9×10 → 4×4 samples
    // x·9/4 = 0,2,4,6 and y·10/4 = 0,2,5,7
    val odd = Media.resizeNearest(Media.gradientPng(9, 10), 4, 4)
    val sxs = Seq(0, 2, 4, 6); val sys = Seq(0, 2, 5, 7)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(odd(y * 4 + x) == expected(sxs(x), sys(y)),
        s"out ($x,$y) must be source (${sxs(x)},${sys(y)})")
  }

  test("dHashHex: exact copies collide; a one-pixel edit moves at most a few bits") {
    val img = Media.gradientPng(32, 24)
    val h1 = Media.dHashHex(img)
    assert(h1 == Media.dHashHex(img.clone()), "identical bytes must collide")
    assert(h1.matches("[0-9a-f]{16}"), s"16 lowercase hex chars expected: $h1")
    // flip one source pixel to white and re-encode — the near-duplicate
    // image a resized/re-saved copy models
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
    bi.setRGB(5, 5, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", out)
    val h2 = Media.dHashHex(out.toByteArray)
    def rows(h: String) = h.grouped(2).map(Integer.parseInt(_, 16)).toSeq
    val hamming = rows(h1).zip(rows(h2))
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    // one pixel influences at most 2 adjacent comparisons in its sampled
    // thumbnail row (and possibly none if the resize never samples it)
    assert(hamming <= 4, s"one-pixel edit moved $hamming bits")
  }
}
