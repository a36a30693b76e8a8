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

  test("mm_decode inverts the generated fixtures over the corpus") {
    val got = Multimodal.decode(Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val expFmt = if (id % 2 == 0) "png" else "jpeg"
      assert(r.getString(1) == expFmt, s"doc $id")
      assert(r.getInt(2) == (id % 300 + 1).toInt, s"doc $id width")
      assert(r.getInt(4) == 8, s"doc $id depth")
    }
  }
}
