package graft

import graft.operators.Multimodal

/** Ground truth for the REAL header decoders: external canonical bytes (a
  * well-known 1×1 RGBA PNG), adversarial segment layouts, and encode/decode
  * inversion — independent of the generators, so a compensating bug in
  * encoder AND decoder cannot pass here.
  */
class MultimodalSpec extends SparkSuite {

  test("decodePng parses the canonical 1x1 transparent PNG") {
    // the widely-published minimal transparent PNG (1×1, 8-bit RGBA)
    val b64 = "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ" +
      "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    val bytes = java.util.Base64.getDecoder.decode(b64)
    assert(Multimodal.decodePng(bytes) === Some((1, 1, 8, 4)))
    assert(Multimodal.decodeJpeg(bytes) === None)
  }

  test("decodeJpeg walks APPn/COM segments to a variably-placed SOF") {
    for (comLen <- Seq(0, 1, 7, 200)) {
      val b = Multimodal.jpegBytes(640, 480, 3, comLen)
      assert(Multimodal.decodeJpeg(b) === Some((640, 480, 8, 3)),
        s"comLen=$comLen")
      assert(Multimodal.decodePng(b) === None)
    }
  }

  test("png round-trip across all generated color types") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4))
      assert(Multimodal.decodePng(Multimodal.pngBytes(300, 200, ct)) ===
        Some((300, 200, 8, ch)))
  }

  test("corrupt payloads fail the parse instead of returning garbage") {
    assert(Multimodal.decodePng(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.decodeJpeg(Array[Byte](1, 2, 3)) === None)
    // PNG signature but no IHDR chunk
    val sigOnly = Multimodal.pngBytes(1, 1, 0).take(8)
    assert(Multimodal.decodePng(sigOnly) === None)
    // JPEG SOI but scan data before any SOF
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x00, 0x00)
      .map(_.toByte)
    assert(Multimodal.decodeJpeg(noSof) === None)
  }

  test("gif and bmp round-trip across generated depths and bit counts") {
    for (d <- 1 to 8)
      assert(Multimodal.decodeGif(Multimodal.gifBytes(300, 200, d)) ===
        Some((300, 200, d, 1)))
    for ((bpp, ch) <- Seq((8, 1), (24, 3), (32, 4)))
      assert(Multimodal.decodeBmp(Multimodal.bmpBytes(300, 200, bpp)) ===
        Some((300, 200, 8, ch)))
    // cross-format confusion must fail, not mis-parse
    val gif = Multimodal.gifBytes(10, 10, 4)
    assert(Multimodal.decodePng(gif) === None)
    assert(Multimodal.decodeBmp(gif) === None)
    assert(Multimodal.decodeGif(Multimodal.bmpBytes(10, 10, 24)) === None)
    assert(Multimodal.decodeBmp(Array[Byte]('B', 'M', 1)) === None)
  }

  test("mm_decode inverts the generated fixtures over the corpus") {
    val got = Multimodal.decode(Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val expFmt = (id % 4) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "bmp"
      }
      assert(r.getString(1) == expFmt, s"doc $id")
      assert(r.getInt(2) == (id % 300 + 1).toInt, s"doc $id width")
      val expDepth = if (id % 4 == 2) ((id / 4) % 8 + 1).toInt else 8
      assert(r.getInt(4) == expDepth, s"doc $id depth")
    }
    assert(got.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("bmp", "gif", "jpeg", "png"))
  }
}
