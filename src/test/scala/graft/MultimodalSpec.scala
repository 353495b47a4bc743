package graft

import graft.queries.Multimodal

/** The multimodal image path decodes REAL bytes: media() prepends a
  * genuine PNG signature+IHDR and the decode step parses dimensions back
  * out of them. These tests pin both directions — our parser on our
  * writer, and the JDK's own ImageIO PNG reader on our writer (so the
  * header is standards-compliant, not merely self-consistent). */
class MultimodalSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("pngDims parses back exactly what pngHeader wrote") {
    for ((w, h) <- Seq((16, 16), (640, 480), (17, 495), (65535, 1))) {
      val bytes = Multimodal.pngHeader(w, h) ++ "trailing payload".getBytes("UTF-8")
      assert(Multimodal.pngDims(bytes).contains((w, h)))
    }
  }

  test("non-PNG payloads return None (fall through to the next container parser)") {
    assert(Multimodal.pngDims("just text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.pngDims(Array[Byte](0x1f, 0x8b.toByte)).isEmpty) // gzip magic
    assert(Multimodal.pngDims(Array.emptyByteArray).isEmpty)
    // signature but truncated before the IHDR dims -> not parseable
    assert(Multimodal.pngDims(Multimodal.pngHeader(5, 5).take(20)).isEmpty)
  }

  test("JDK ImageIO accepts the header as a real PNG and reads the dims") {
    val bytes = Multimodal.pngHeader(123, 45)
    val stream = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(stream)
    assert(readers.hasNext, "ImageIO must recognize the PNG signature")
    val reader = readers.next()
    reader.setInput(stream)
    assert(reader.getWidth(0) == 123)
    assert(reader.getHeight(0) == 45)
    reader.dispose()
  }
}
