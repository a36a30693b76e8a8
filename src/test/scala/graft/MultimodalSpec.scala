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

  test("decodeBmpPixels recovers the canonical 2x2 BMP's exact pixels") {
    // the widely-published minimal 2×2 24-bpp BMP example (bottom-up rows,
    // 2 pad bytes per row): logical top row red, green; bottom row blue,
    // white — hand-laid bytes, NOT our encoder, so a compensating
    // encode/decode bug cannot pass
    val canonical = Array(
      0x42, 0x4d, // BM
      0x46, 0x00, 0x00, 0x00, // file size 70
      0x00, 0x00, 0x00, 0x00, // reserved
      0x36, 0x00, 0x00, 0x00, // pixel offset 54
      0x28, 0x00, 0x00, 0x00, // BITMAPINFOHEADER size 40
      0x02, 0x00, 0x00, 0x00, // width 2
      0x02, 0x00, 0x00, 0x00, // height 2 (bottom-up)
      0x01, 0x00, // planes
      0x18, 0x00, // 24 bpp
      0x00, 0x00, 0x00, 0x00, // BI_RGB
      0x10, 0x00, 0x00, 0x00, // image size 16
      0x13, 0x0b, 0x00, 0x00, // 2835 ppm
      0x13, 0x0b, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00,
      // stored row 0 = BOTTOM logical row: blue (BGR ff 00 00), white, pad
      0xff, 0x00, 0x00, 0xff, 0xff, 0xff, 0x00, 0x00,
      // stored row 1 = TOP logical row: red (BGR 00 00 ff), green, pad
      0x00, 0x00, 0xff, 0x00, 0xff, 0x00, 0x00, 0x00).map(_.toByte)
    val Some((w, h, rgb)) = Multimodal.decodeBmpPixels(canonical)
    assert((w, h) == (2, 2))
    // top-down row-major RGB: red, green, blue, white
    assert(rgb.map(_ & 0xff).toSeq == Seq(
      255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255))
    // pixel checksum pin: stable fingerprint of the decoded array
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rgb).map("%02x".format(_)).mkString
    assert(md5 == java.security.MessageDigest.getInstance("MD5")
      .digest(Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
        .map(_.toByte)).map("%02x".format(_)).mkString)
    // the header-only decoder agrees on geometry
    assert(Multimodal.decodeBmp(canonical) === Some((2, 2, 8, 3)))
  }

  test("bmp pixel round-trip: padding, bottom-up rows, position weighting") {
    for ((id, w, h) <- Seq((0L, 4, 2), (17L, 5, 3), (49L, 6, 1), (123L, 7, 41))) {
      val b = Multimodal.bmpPixelBytes(id, w, h)
      val Some((gw, gh, rgb)) = Multimodal.decodeBmpPixels(b)
      assert((gw, gh) == (w, h), s"id=$id")
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        assert(rgb(i) == (2 * y + 1).toByte, s"R($x,$y) id=$id")
        assert(rgb(i + 1) == (x + y).toByte, s"G($x,$y) id=$id")
        assert(rgb(i + 2) == ((id % 50) + x).toByte, s"B($x,$y) id=$id")
      }
    }
    // a TOP-DOWN (negative height) stream must decode to the same logical
    // image orientation the spec defines
    val base = Multimodal.bmpPixelBytes(3L, 3, 2)
    val Some((_, _, want)) = Multimodal.decodeBmpPixels(base)
    val rowSize = (3 * 3 + 3) / 4 * 4
    val flipped = base.clone()
    // height := -2 (little-endian at offset 22)
    val negH = -2
    for (i <- 0 until 4) flipped(22 + i) = ((negH >>> (8 * i)) & 0xff).toByte
    // swap the two stored rows so the logical image is unchanged
    for (i <- 0 until rowSize) {
      flipped(54 + i) = base(54 + rowSize + i)
      flipped(54 + rowSize + i) = base(54 + i)
    }
    val Some((_, _, got)) = Multimodal.decodeBmpPixels(flipped)
    assert(got.toSeq == want.toSeq)
  }

  test("png pixel round-trip: zlib inflate + all five filter predictors") {
    // h >= 5 exercises every filter type (row filter = y % 5); w >= 2
    // exercises the Sub/Average/Paeth left-neighbor path
    for ((id, w, h) <- Seq((0L, 4, 5), (17L, 5, 7), (49L, 2, 6), (123L, 31, 11))) {
      val b = Multimodal.pngPixelBytes(id, w, h)
      val Some((gw, gh, rgb)) = Multimodal.decodePngPixels(b)
      assert((gw, gh) == (w, h), s"id=$id")
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        assert(rgb(i) == (2 * y + 1).toByte, s"R($x,$y) id=$id")
        assert(rgb(i + 1) == (x + y).toByte, s"G($x,$y) id=$id")
        assert(rgb(i + 2) == ((id % 50) + x).toByte, s"B($x,$y) id=$id")
      }
    }
    // the BMP and PNG fixture generators encode the SAME pixel function —
    // the two independent container decoders must agree byte for byte
    val Some((_, _, viaBmp)) =
      Multimodal.decodeBmpPixels(Multimodal.bmpPixelBytes(7L, 6, 10))
    val Some((_, _, viaPng)) =
      Multimodal.decodePngPixels(Multimodal.pngPixelBytes(7L, 6, 10))
    assert(viaBmp.toSeq == viaPng.toSeq)
  }

  test("corrupt png pixel streams fail the parse instead of garbage") {
    val good = Multimodal.pngPixelBytes(5L, 6, 6)
    // truncated IDAT: drop the tail (inflate cannot complete)
    assert(Multimodal.decodePngPixels(good.dropRight(20)).isEmpty)
    // palette color type (3) is out of the decoder's declared contract
    val pal = good.clone(); pal(25) = 3
    assert(Multimodal.decodePngPixels(pal).isEmpty)
    // 16-bit depth is out of contract
    val deep = good.clone(); deep(24) = 16
    assert(Multimodal.decodePngPixels(deep).isEmpty)
    // not a PNG at all
    assert(Multimodal.decodePngPixels("garbage".getBytes).isEmpty)
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

  test("decodeWav recovers a hand-built canonical WAV's exact samples") {
    // hand-assembled independently of wavBytes: RIFF/WAVE, fmt (PCM,
    // mono, 16-bit, 8 kHz), data with samples [5, -3, 300] — the -3
    // pins sign extension, the 300 pins little-endian byte order
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val data = "data".getBytes ++ le32(6) ++
      le16(5) ++ le16(-3 & 0xffff) ++ le16(300)
    val payload = "WAVE".getBytes ++ fmt ++ data
    val wav = "RIFF".getBytes ++ le32(payload.length) ++ payload
    assert(Multimodal.decodeWav(wav).map(_.toSeq) === Some(Seq(5, -3, 300)))
    // non-PCM / stereo / 8-bit / truncated streams must fail, not garble
    def patched(off: Int, v: Int): Array[Byte] = {
      val c = wav.clone(); c(off) = v.toByte; c }
    assert(Multimodal.decodeWav(patched(20, 2)) === None)  // audio fmt 2
    assert(Multimodal.decodeWav(patched(22, 2)) === None)  // 2 channels
    assert(Multimodal.decodeWav(patched(34, 8)) === None)  // 8-bit
    assert(Multimodal.decodeWav(wav.dropRight(2)) === None) // short data
    assert(Multimodal.decodeWav("RIFX".getBytes ++ wav.drop(4)) === None)
  }

  test("wav round-trip: odd LIST chunk pad, sign extension, statistics") {
    for ((id, n) <- Seq((0L, 16), (7L, 40), (39L, 271))) {
      val s = Multimodal.decodeWav(Multimodal.wavBytes(id, n))
      assert(s.isDefined, s"id=$id")
      val a = (id % 40).toInt - 16
      assert(s.get.toSeq == (0 until n).map(a + 3 * _), s"id=$id")
    }
    // the fixture family crosses zero: some file has negative samples
    assert(Multimodal.decodeWav(Multimodal.wavBytes(1L, 4)).get.head < 0)
  }

  test("phash: identical images hash equal; formula recompute matches decode") {
    import spark.implicits._
    // ids 3 and 53 share id%50 — same pixel content at equal geometry
    val same = Seq((3L, 10, 7), (53L, 10, 7)).map { case (id, w, h) =>
      Multimodal.MediaBin(id, Multimodal.bmpPixelBytes(id, w, h)) }
    val hs = Multimodal.phashRows(spark.createDataset(same)).collect()
      .map(_.phash)
    assert(hs(0) == hs(1))

    // independent recompute from the generator formula (lum = base + 2x
    // + 3y + 1 at the 8x8 nearest-neighbor grid) must equal the hash the
    // REAL byte decode produced — for a spread of geometries including
    // w,h < 8 (repeated samples) and the 4-byte row-padding cases
    val cases = Seq((0L, 4, 2), (7L, 5, 9), (11L, 63, 41), (49L, 8, 8),
      (123L, 33, 17))
    val rows = cases.map { case (id, w, h) =>
      Multimodal.MediaBin(id, Multimodal.bmpPixelBytes(id, w, h)) }
    val got = Multimodal.phashRows(spark.createDataset(rows)).collect()
      .map(r => r.doc_id -> r.phash).toMap
    cases.foreach { case (id, w, h) =>
      val base = (id % 50).toInt
      val lums = for (j <- 0 until 8; i <- 0 until 8) yield {
        val x = i * (w - 1) / 7; val y = j * (h - 1) / 7
        (base + 2 * x + 3 * y + 1).toLong
      }
      val total = lums.sum
      val b = new Array[Int](4)
      lums.zipWithIndex.foreach { case (l, pos) =>
        if (64L * l > total) b(pos / 16) |= 1 << (pos % 16) }
      val want = f"${b(3)}%04x${b(2)}%04x${b(1)}%04x${b(0)}%04x"
      assert(got(id) == want, s"id=$id ${got(id)} vs $want")
    }
  }

  // mediaFeatures must agree with the independent single-container
  // stages: on a BMP payload its thumbnail sums equal downsampleStats'
  // (same decode, same box loop), and on a PNG payload the full-region
  // identity sum_channel(cropped) ≤ sum_channel(full) ties it to
  // pngPixelStats — plus an exact recompute of the cropped G/B sums from
  // the decoded array.
  test("mediaFeatures agrees with downsampleStats and the pixel decoders") {
    import spark.implicits._
    val cases = Seq((6L, 10, 7), (44L, 9, 9), (120L, 16, 5))
    val bmp = cases.map { case (id, w, h) =>
      Multimodal.MediaBin(id, Multimodal.bmpPixelBytes(id, w, h)) }
    val viaFeatures = Multimodal
      .mediaFeatures(spark.createDataset(bmp)).collect()
      .map(r => r.doc_id -> r).toMap
    val viaDown = Multimodal
      .downsampleStats(spark.createDataset(bmp)).collect()
      .map(r => r.doc_id -> r).toMap
    cases.foreach { case (id, _, _) =>
      val f = viaFeatures(id); val d = viaDown(id)
      assert(f.mime == "image/bmp")
      assert(f.thumb_w == d.out_w && f.thumb_h == d.out_h)
      assert(f.thumb_sum_r == d.sum_r2 && f.thumb_sum_g == d.sum_g2 &&
        f.thumb_sum_b == d.sum_b2)
      assert(f.thumb_wsum == d.blockpos_r)
    }
    // PNG route: recompute the cropped sums directly from the real decode
    val png = Seq(Multimodal.MediaBin(9L, Multimodal.pngPixelBytes(9L, 7, 6)))
    val pf = Multimodal.mediaFeatures(spark.createDataset(png))
      .collect().head
    assert(pf.mime == "image/png" && pf.width == 7 && pf.height == 6)
    val (w, h, rgb) = Multimodal.decodePngPixels(png.head.media).get
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until (h / 2) * 2; x <- 0 until (w / 2) * 2) {
      val p = (y * w + x) * 3
      sr += rgb(p) & 0xff; sg += rgb(p + 1) & 0xff; sb += rgb(p + 2) & 0xff
    }
    assert(pf.thumb_sum_r == sr && pf.thumb_sum_g == sg &&
      pf.thumb_sum_b == sb)
  }
}
