package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and a partition-batched feature-extraction stage.
  *
  * Decode tiers. HEADER decode is REAL for all four containers:
  * [[decodePng]]/[[decodeJpeg]]/[[decodeGif]]/[[decodeBmp]] structurally
  * parse genuine chunk/marker/descriptor streams (geometry, bit depth,
  * channels) — see `mm_decode` and MultimodalSpec's external-ground-truth
  * pins. PIXEL decode is REAL for two containers:
  * [[decodeBmpPixels]] walks uncompressed 24-bpp BMP pixel arrays
  * (bottom-up rows, BGR order, 4-byte padding) — see `mm_pixels` — and
  * [[decodePngPixels]] runs the full compressed path for 8-bit truecolor
  * PNGs (IDAT concat, zlib inflate via `java.util.zip`, all five scanline
  * filter predictors) — see `mm_png_pixels`. The FEATURE stage
  * (`mm_features`, [[mediaFeatures]]) routes through those real decoders
  * since round 8 — container sniffed from magic bytes, full pixel
  * decode, real 2×2 thumbnail statistics; the byte-stride stand-in is
  * gone. Entropy-coded DCT codecs (JPEG) stay out of scope (no codec
  * libs in this environment).
  * What is real and load-bearing for a 100 TB pipeline:
  *  - the schema contract (binary payload + typed metadata columns);
  *  - `mapPartitions` batch shape: the decoder amortizes per-partition init
  *    (model load, codec context) across the partition's rows, which is
  *    exactly how a Pandas-UDF/`mapInPandas` stage behaves on a cluster;
  *  - partition sizing: payloads stay columnar-compressed in parquet until
  *    the scan, and only the projected columns are read.
  */
object Multimodal {

  final case class MediaFeats(doc_id: Long, mime: String, width: Int,
      height: Int, n_px: Long, thumb_w: Int, thumb_h: Int,
      thumb_sum_r: Long, thumb_sum_g: Long, thumb_sum_b: Long,
      thumb_wsum: Long)

  /** Mixed-container media column: even doc_ids carry a REAL
    * uncompressed 24-bpp BMP, odd ones a REAL zlib-compressed 8-bit
    * truecolor PNG — the feature stage must sniff the container and
    * route to the right decoder, exactly like a production ingest stage
    * facing a mixed bucket. Geometry from (doc_id, n_chars) reuses the
    * two pixel queries' generators, so the oracle states every decoded
    * statistic in closed form.
    */
  def syntheticMixedMedia(docs: DataFrame): Dataset[MediaBin] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        if (id % 2 == 0)
          MediaBin(id,
            bmpPixelBytes(id, (id % 60 + 4).toInt, (nc % 40 + 2).toInt))
        else
          MediaBin(id,
            pngPixelBytes(id, (id % 48 + 4).toInt, (nc % 32 + 2).toInt))
      }
  }

  /** REAL partition-batched feature stage (round 8 replaced the byte-
    * stride thumbnail stand-in that lived here since round 1): sniff the
    * container from its magic bytes, decode the FULL pixel array through
    * the matching real decoder ([[decodeBmpPixels]] /
    * [[decodePngPixels]] — zlib inflate, all five filter predictors),
    * and emit decode-derived features: sniffed mime, geometry, and the
    * 2×2 box-downsampled thumbnail's exact channel statistics
    * ([[downsampleStats]] semantics — floor crop, integer sums, and the
    * block-index-weighted R sum that pins the block↔pixel mapping).
    * Unrecognized or malformed payloads fail loudly, the
    * [[decodeHeaders]] contract.
    */
  def mediaFeatures(media: Dataset[MediaBin]): Dataset[MediaFeats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: codec contexts init HERE, once per partition
      rows.map { r =>
        val b = r.media
        val isPng = b.length >= 8 && (b(0) & 0xff) == 0x89 &&
          b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
        val isBmp = !isPng && b.length >= 2 && b(0) == 'B' && b(1) == 'M'
        val decoded =
          if (isPng) decodePngPixels(b)
          else if (isBmp) decodeBmpPixels(b)
          else None
        val (w, h, rgb) = decoded.getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: unrecognized or malformed container"))
        val mime = if (isPng) "image/png" else "image/bmp"
        val w2 = w / 2; val h2 = h / 2
        val br = new Array[Long](w2 * h2)
        var sg = 0L; var sb = 0L
        var y = 0
        while (y < 2 * h2) {
          var x = 0
          while (x < 2 * w2) {
            val p = (y * w + x) * 3
            br((y / 2) * w2 + (x / 2)) += rgb(p) & 0xff
            sg += rgb(p + 1) & 0xff
            sb += rgb(p + 2) & 0xff
            x += 1
          }
          y += 1
        }
        var sr = 0L; var wsum = 0L
        var i = 0
        while (i < w2 * h2) {
          sr += br(i); wsum += i.toLong * br(i); i += 1
        }
        MediaFeats(r.doc_id, mime, w, h, w.toLong * h, w2, h2,
          sr, sg, sb, wsum)
      }
    }
  }

  /** End-to-end: docs → mixed-container media → sniff + decode +
    * thumbnail features.
    */
  def features(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    mediaFeatures(syntheticMixedMedia(docs)).toDF().orderBy(col("doc_id"))
  }

  /** Frame sampling plumbing: every `stride` bytes yields a "frame" row
    * (offset + a deterministic fake feature from the byte at the offset).
    * The real pipeline shape for video/audio: explode the payload into
    * frame rows map-side, then per-frame feature stages downstream.
    */
  def frameSamples(docs: DataFrame, stride: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .select(col("doc_id"), col("media"),
        // _outer: greatest(…, 1) guarantees ≥1 frame per doc — same rows,
        // minus the inferred size>0 filter recomputing the sequence.
        posexplode_outer(sequence(lit(1), greatest(
          expr(s"octet_length(media) div $stride"), lit(1))))
          .as(Seq("frame_idx", "n")))
      .select(col("doc_id"), col("frame_idx"),
        ((col("n") - 1) * stride).as("byte_offset"),
        // fake per-frame feature: code point of the byte at the offset
        expr(s"ascii(cast(substr(media, (n - 1) * $stride + 1, 1) as string))")
          .as("frame_feature"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ------------------------------------------------- real header decode
  /** What `mm_decode` proves REAL (vs the declared feature-stage stub):
    * actual PNG and JPEG structural parsing — signature check, chunk walk,
    * marker-segment walk — over genuine spec-conformant bytes, in the same
    * partition-batched stage a production decoder runs in. Only pixel
    * decode stays out (no codecs in this environment); header geometry is
    * pure byte structure and needs none.
    */
  final case class MediaBin(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, fmt: String, width: Int,
      height: Int, bit_depth: Int, channels: Int)

  private def be32(w: Int): Array[Byte] = Array(
    (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte)
  private def be16(w: Int): Array[Byte] = Array((w >>> 8).toByte, w.toByte)

  /** A spec-conformant PNG: 8-byte signature, IHDR with real CRC32, IEND.
    * (PNG spec: ISO/IEC 15948 §5.3 chunk layout, §11.2.2 IHDR.)
    */
  def pngBytes(width: Int, height: Int, colorType: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      be32(data.length) ++ tb ++ data ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IEND", Array.empty)
  }

  /** A spec-conformant JFIF header stream: SOI, APP0, a COM segment of
    * caller-chosen length (so SOF sits at a VARIABLE offset — the decoder
    * must genuinely walk segments, not slice a fixed position), SOF0, EOI.
    * (JPEG/JFIF: ITU-T T.81 §B.2 marker segment layout.)
    */
  def jpegBytes(width: Int, height: Int, nComponents: Int,
      comLen: Int): Array[Byte] = {
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val com = Array(0xff, 0xfe).map(_.toByte) ++ be16(2 + comLen) ++
      Array.fill(comLen)('x'.toByte)
    val sof = Array(0xff, 0xc0).map(_.toByte) ++ be16(8 + 3 * nComponents) ++
      Array[Byte](8) ++ be16(height) ++ be16(width) ++
      Array[Byte](nComponents.toByte) ++
      (1 to nComponents).flatMap(i =>
        Array(i.toByte, 0x11.toByte, 0.toByte)).toArray
    Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ com ++ sof ++
      Array(0xff, 0xd9).map(_.toByte)
  }

  private def le16(w: Int): Array[Byte] = Array(w.toByte, (w >>> 8).toByte)
  private def le32(w: Int): Array[Byte] = Array(
    w.toByte, (w >>> 8).toByte, (w >>> 16).toByte, (w >>> 24).toByte)

  /** A GIF89a logical-screen header (GIF spec §18): signature, LE16
    * geometry, packed field carrying the color-resolution bits, trailer.
    */
  def gifBytes(width: Int, height: Int, depth: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      Array((((depth - 1) & 7) << 4).toByte, 0.toByte, 0.toByte) ++
      Array(0x3b.toByte)

  /** A BMP with a BITMAPINFOHEADER (Windows BMP v3): 14-byte file header,
    * 40-byte info header, little-endian throughout.
    */
  def bmpBytes(width: Int, height: Int, bpp: Int): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(bpp) ++
      Array.fill(24)(0.toByte)

  /** Deterministic media fixtures over the documents table, doc_id mod 4
    * selecting the container: PNG (color type cycling gray / RGB /
    * gray+alpha / RGBA), JFIF whose COM padding varies the SOF offset per
    * row, GIF (color-resolution depth cycling 1–8), BMP (8/24/32 bpp).
    * Geometry derives from (doc_id, n_chars), so the DuckDB oracle states
    * the expected decode arithmetically and the gate checks
    * decode∘encode = id over real byte structures of all four containers.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaBin] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        val w = (id % 300 + 1).toInt
        val h = (nc % 200 + 1).toInt
        val media = (id % 4) match {
          case 0 => pngBytes(w, h, Array(0, 2, 4, 6)(((id / 4) % 4).toInt))
          case 1 => jpegBytes(w, h, if (id % 3 == 0) 1 else 3,
            comLen = (id % 7 + 4).toInt)
          case 2 => gifBytes(w, h, ((id / 4) % 8 + 1).toInt)
          case _ => bmpBytes(w, h, Array(8, 24, 32)(((id / 4) % 3).toInt))
        }
        MediaBin(id, media)
      }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def beInt(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def beShort(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Parse PNG geometry by walking chunks to IHDR (not slicing offset 16
    * blind — a malformed or extension-prefixed stream must fail, not
    * return garbage). Channels per color type: 0 gray, 2 RGB, 3 palette,
    * 4 gray+alpha, 6 RGBA.
    */
  def decodePng(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 8 || (0 until 8).exists(i => u8(b, i) != PngSig(i)))
      return None
    var pos = 8
    while (pos + 8 <= b.length) {
      val len = beInt(b, pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (typ == "IHDR") {
        if (pos + 8 + 13 > b.length) return None
        val channels = u8(b, pos + 17) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => return None
        }
        return Some((beInt(b, pos + 8), beInt(b, pos + 12),
          u8(b, pos + 16), channels))
      }
      pos += 12 + len // len + type + data + crc
    }
    None
  }

  /** Parse JPEG geometry by walking marker segments to the first SOF
    * (C0–C3, baseline/extended/progressive/lossless) — APPn/COM/DQT/DHT
    * segments are skipped by their declared lengths, so the frame header
    * is found wherever it sits.
    */
  def decodeJpeg(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= b.length) {
      if (u8(b, pos) != 0xff) return None
      val marker = u8(b, pos + 1)
      if (marker >= 0xc0 && marker <= 0xc3) {
        if (pos + 10 > b.length) return None
        return Some((beShort(b, pos + 7), beShort(b, pos + 5),
          u8(b, pos + 4), u8(b, pos + 9)))
      }
      if (marker == 0xd9 || marker == 0xda) return None // EOI / scan data
      pos += 2 + beShort(b, pos + 2)
    }
    None
  }

  private def leShort(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def leInt(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Parse GIF87a/89a geometry from the logical screen descriptor; bit
    * depth from the packed color-resolution bits; palette → 1 channel.
    */
  def decodeGif(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    Some((leShort(b, 6), leShort(b, 8), ((u8(b, 10) >> 4) & 7) + 1, 1))
  }

  /** Parse a BITMAPINFOHEADER BMP: 'BM' magic, info-header size 40,
    * little-endian geometry; 8 bpp palette → 1 channel, 24 → RGB,
    * 32 → RGBA.
    */
  def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 30 || u8(b, 0) != 'B' || u8(b, 1) != 'M') return None
    if (leInt(b, 14) != 40 || leShort(b, 26) != 1) return None
    val channels = leShort(b, 28) match {
      case 8 => 1; case 24 => 3; case 32 => 4; case _ => return None
    }
    Some((leInt(b, 18), leInt(b, 22), 8, channels))
  }

  /** The REAL batched decode stage: per-partition init (here: none needed —
    * the parsers are allocation-free walks), per-row structural parse.
    * Unparseable payloads fail loudly: a silent skip would make a corrupt
    * 100 TB batch look clean.
    */
  def decodeHeaders(media: Dataset[MediaBin]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodePng(r.media).map { case (w, h, d, c) =>
          MediaMeta(r.doc_id, "png", w, h, d, c) }
          .orElse(decodeJpeg(r.media).map { case (w, h, d, c) =>
            MediaMeta(r.doc_id, "jpeg", w, h, d, c) })
          .orElse(decodeGif(r.media).map { case (w, h, d, c) =>
            MediaMeta(r.doc_id, "gif", w, h, d, c) })
          .orElse(decodeBmp(r.media).map { case (w, h, d, c) =>
            MediaMeta(r.doc_id, "bmp", w, h, d, c) })
          .getOrElse(throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not PNG/JPEG/GIF/BMP"))
      }
    }
  }

  /** End-to-end decode query: deterministic media fixtures → structural
    * header parse → (fmt, width, height, bit_depth, channels).
    */
  def decode(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    decodeHeaders(syntheticMedia(docs)).toDF().orderBy(col("doc_id"))
  }

  // ------------------------------------------------- real pixel decode
  /** Pixel-level decode output: exact per-channel sums plus a
    * position-weighted red sum whose value depends on the pixel↔(x, y)
    * mapping — it catches a decoder that mishandles BMP's bottom-up row
    * storage or 4-byte row padding even when the plain channel sums
    * (order-independent) still come out right.
    */
  final case class PixelStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, pos_weighted_r: Long)

  final case class DownsampleStats(doc_id: Long, out_w: Int, out_h: Int,
      sum_r2: Long, sum_g2: Long, sum_b2: Long, blockpos_r: Long,
      corner_b: Long)

  /** A complete 24-bpp bottom-up BMP (BITMAPINFOHEADER, BI_RGB): real
    * pixel array with the spec's layout quirks — BGR byte order, rows
    * stored bottom-up, each row padded to a 4-byte boundary. Pixel values
    * derive linearly from (id, x, y) and stay < 128, so the DuckDB oracle
    * can state every decoded statistic in closed form (no modulo wrap).
    */
  def bmpPixelBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val header = "BM".getBytes("US-ASCII") ++ le32(54 + dataSize) ++
      le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(dataSize) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0)
    val px = new Array[Byte](dataSize)
    val idp = (id % 50).toInt
    var y = 0
    while (y < h) {
      val base = (h - 1 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < w) {
        px(base + x * 3) = (idp + x).toByte // B
        px(base + x * 3 + 1) = (x + y).toByte // G
        px(base + x * 3 + 2) = (2 * y + 1).toByte // R
        x += 1
      }
      y += 1
    }
    header ++ px
  }

  /** REAL pixel decode for uncompressed 24-bpp BMPs: validates the header
    * (BITMAPINFOHEADER, 1 plane, BI_RGB), honors the declared pixel-array
    * offset, negative-height top-down streams, bottom-up row inversion,
    * and per-row padding; returns (width, height, RGB triples in TOP-DOWN
    * row-major order) — the layout every downstream consumer expects.
    */
  def decodeBmpPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 54 || u8(b, 0) != 'B' || u8(b, 1) != 'M') return None
    if (leInt(b, 14) != 40 || leShort(b, 26) != 1 ||
      leShort(b, 28) != 24 || leInt(b, 30) != 0) return None
    val off = leInt(b, 10)
    val w = leInt(b, 18)
    val hRaw = leInt(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) return None
    val rowSize = (w * 3 + 3) / 4 * 4
    if (off < 54 || off.toLong + rowSize.toLong * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = off + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        out(d) = b(src + x * 3 + 2) // R
        out(d + 1) = b(src + x * 3 + 1) // G
        out(d + 2) = b(src + x * 3) // B
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  // ------------------------------------------- PNG pixel codec (zlib IDAT)
  /** A COMPLETE 8-bit truecolor PNG (color type 2, non-interlaced): real
    * scanlines run through the spec's per-row filter pipeline — filter
    * type y % 5 cycles through None/Sub/Up/Average/Paeth (ISO/IEC 15948
    * §9.2), so every predictor is exercised — then zlib-deflated into one
    * IDAT with chunk CRCs. Pixel values derive linearly from (id, x, y)
    * with the SAME generator family as [[bmpPixelBytes]] and stay < 128,
    * so the DuckDB oracle states the decoded statistics in closed form.
    */
  def pngPixelBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      be32(data.length) ++ tb ++ data ++ be32(crc.getValue.toInt)
    }
    val idp = (id % 50).toInt
    val stride = w * 3
    // unfiltered image, top-down row-major RGB
    val img = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = y * stride + x * 3
        img(d) = (2 * y + 1).toByte // R
        img(d + 1) = (x + y).toByte // G
        img(d + 2) = (idp + x).toByte // B
        x += 1
      }
      y += 1
    }
    // per-row filter: out row = filter byte + filtered bytes (mod 256)
    val raw = new Array[Byte](h * (1 + stride))
    y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = img(y * stride + i) & 0xff
        val a = if (i >= 3) img(y * stride + i - 3) & 0xff else 0
        val b = if (y > 0) img((y - 1) * stride + i) & 0xff else 0
        val c = if (i >= 3 && y > 0) img((y - 1) * stride + i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + i) = (cur - pred).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      out.write(buf, 0, n)
    }
    deflater.end()
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** Paeth predictor (ISO/IEC 15948 §9.4): nearest of left/up/up-left to
    * the linear estimate a + b − c, ties left → up → up-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL pixel decode for 8-bit truecolor non-interlaced PNGs: validates
    * the signature and IHDR (depth 8, color type 2, compression/filter/
    * interlace 0), concatenates ALL IDAT chunks in stream order (the spec
    * allows any split), zlib-inflates, and reverses the per-row filter
    * (all five types) — returns (width, height, RGB top-down row-major),
    * the same contract as [[decodeBmpPixels]].
    */
  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 33 || u8(b, 0) != 0x89 || u8(b, 1) != 'P' ||
      u8(b, 2) != 'N' || u8(b, 3) != 'G') return None
    if (!(u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' &&
      u8(b, 15) == 'R')) return None
    val w = beInt(b, 16)
    val h = beInt(b, 20)
    if (w <= 0 || h <= 0 || u8(b, 24) != 8 || u8(b, 25) != 2 ||
      u8(b, 26) != 0 || u8(b, 27) != 0 || u8(b, 28) != 0) return None
    // chunk walk: concat IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    var done = false
    while (!done && p + 8 <= b.length) {
      val len = beInt(b, p)
      val typ = new String(b, p + 4, 4, "US-ASCII")
      if (len < 0 || p + 12 + len > b.length) return None
      if (typ == "IDAT") idat.write(b, p + 8, len)
      if (typ == "IEND") done = true
      p += 12 + len
    }
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (got != raw.length) return None
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = u8(raw, y * (1 + stride))
      if (f > 4) return None
      var i = 0
      while (i < stride) {
        val x = u8(raw, y * (1 + stride) + 1 + i)
        val a = if (i >= 3) u8(out, y * stride + i - 3) else 0
        val b2 = if (y > 0) u8(out, (y - 1) * stride + i) else 0
        val c = if (i >= 3 && y > 0) u8(out, (y - 1) * stride + i - 3) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b2
          case 3 => (a + b2) / 2
          case 4 => paeth(a, b2, c)
        }
        out(y * stride + i) = (x + pred).toByte
        i += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** Per-doc truecolor PNG fixtures with real zlib-compressed pixel
    * arrays; geometry from (doc_id, n_chars) like [[syntheticBmpMedia]]
    * but offset so the two pixel queries cover different shapes.
    */
  def syntheticPngMedia(docs: DataFrame): Dataset[MediaBin] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        MediaBin(id, pngPixelBytes(id, (id % 48 + 4).toInt, (nc % 32 + 2).toInt))
      }
  }

  /** [[pixelStats]] for the PNG path: inflate + unfilter, then the same
    * exact channel statistics.
    */
  def pngPixelStats(media: Dataset[MediaBin]): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = decodePngPixels(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not an 8-bit truecolor PNG"))
        var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
        var i = 0
        val n = w * h
        while (i < n) {
          val r8 = rgb(i * 3) & 0xff
          sr += r8
          sg += rgb(i * 3 + 1) & 0xff
          sb += rgb(i * 3 + 2) & 0xff
          wr += i.toLong * r8
          i += 1
        }
        PixelStats(r.doc_id, w, h, sr, sg, sb, wr)
      }
    }
  }

  /** End-to-end PNG pixel query: deflate-compressed fixtures → real
    * inflate + unfilter → exact channel statistics. The gate asserts the
    * decode INVERTS the encode through the genuine zlib round trip and
    * all five PNG filter predictors.
    */
  def pngPixels(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    pngPixelStats(syntheticPngMedia(docs)).toDF().orderBy(col("doc_id"))
  }

  /** Oracle: closed-form sums of the generator's linear pixel values over
    * the PNG geometry (same derivation as [[sqlPixels]]).
    */
  val sqlPngPixels: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 48 + 4 AS BIGINT) AS w,
      |    CAST(n_chars % 32 + 2 AS BIGINT) AS h
      |  FROM documents
      |)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  w * h * h AS sum_r,
      |  h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS sum_g,
      |  h * (w * (doc_id % 50) + w * (w - 1) // 2) AS sum_b,
      |  w * w * (2 * ((h - 1) * h * (2 * h - 1) // 6) + h * (h - 1) // 2)
      |    + (w * (w - 1) // 2) * h * h AS pos_weighted_r
      |FROM g ORDER BY doc_id""".stripMargin

  /** Per-doc 24-bpp BMP fixtures with real pixel arrays; geometry from
    * (doc_id, n_chars) exactly like [[syntheticMedia]].
    */
  def syntheticBmpMedia(docs: DataFrame): Dataset[MediaBin] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        MediaBin(id, bmpPixelBytes(id, (id % 60 + 4).toInt, (nc % 40 + 2).toInt))
      }
  }

  /** The batched pixel stage: decode every payload's full pixel array and
    * reduce to exact statistics. Same loud-failure contract as
    * [[decodeHeaders]].
    */
  def pixelStats(media: Dataset[MediaBin]): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = decodeBmpPixels(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not an uncompressed 24-bpp BMP"))
        var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
        var i = 0
        val n = w * h
        while (i < n) {
          val r8 = rgb(i * 3) & 0xff
          sr += r8
          sg += rgb(i * 3 + 1) & 0xff
          sb += rgb(i * 3 + 2) & 0xff
          wr += i.toLong * r8 // i = y*w + x in top-down row-major order
          i += 1
        }
        PixelStats(r.doc_id, w, h, sr, sg, sb, wr)
      }
    }
  }

  /** End-to-end pixel query: BMP fixtures → full pixel decode → exact
    * channel statistics.
    */
  def pixels(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    pixelStats(syntheticBmpMedia(docs)).toDF().orderBy(col("doc_id"))
  }

  /** REAL 2×2 box downsample over the decoded BMP pixel array — the
    * "resize" stage of an image-ingest pipeline done for real (unlike the
    * honest byte-stride thumbnail stub in [[mediaFeatures]]): decode,
    * materialize the per-block channel sums (the downsampled image, up to
    * the final /4), and reduce to exact integer checksums. `blockpos_r`
    * pairs every block's R sum with its block-major index, so the oracle
    * asserts the block↔pixel mapping itself, not just totals; `corner_b`
    * reads one specific output pixel. Odd trailing rows/columns are
    * cropped (floor semantics), matching the closed-form oracle.
    *
    * Scale shape: identical to [[pixelStats]] — per-partition batch
    * decode inside ONE mapPartitions pass, constant memory per image
    * (the w2·h2 block accumulators), no shuffle until the final per-doc
    * frame. The 100 TB layout (binary column + typed stats out) is the
    * same as every mm_* operator.
    */
  def downsampleStats(media: Dataset[MediaBin]): Dataset[DownsampleStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = decodeBmpPixels(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not an uncompressed 24-bpp BMP"))
        val w2 = w / 2; val h2 = h / 2
        val br = new Array[Long](w2 * h2)
        val bg = new Array[Long](w2 * h2)
        val bb = new Array[Long](w2 * h2)
        var y = 0
        while (y < 2 * h2) {
          var x = 0
          while (x < 2 * w2) {
            val p = (y * w + x) * 3
            val b = (y / 2) * w2 + (x / 2)
            br(b) += rgb(p) & 0xff     // R
            bg(b) += rgb(p + 1) & 0xff // G
            bb(b) += rgb(p + 2) & 0xff // B
            x += 1
          }
          y += 1
        }
        var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
        var i = 0
        while (i < w2 * h2) {
          sr += br(i); sg += bg(i); sb += bb(i)
          wr += i.toLong * br(i)
          i += 1
        }
        DownsampleStats(r.doc_id, w2, h2, sr, sg, sb, wr,
          bb(w2 * h2 - 1))
      }
    }
  }

  def downsample(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    downsampleStats(syntheticBmpMedia(docs)).toDF().orderBy(col("doc_id"))
  }

  /** Oracle: the 2×2 block structure of the generator stated in closed
    * form. blocksum_R(bx,by) = 16by+8 (R = 2y+1 is x-free), so
    * Σ_blocks idx·blocksum_R = 16w2²S2 + 8w2²S1 + 16·T·S1 + 8·T·h2 with
    * S1 = Σby, S2 = Σby², T = w2(w2−1)/2; the corner block's B sum is
    * 4·(id%50) + 8w2 − 6. Truncated-region channel sums reuse the
    * [[sqlPixels]] derivation at (2w2, 2h2).
    */
  val sqlDownsample: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 50 AS BIGINT) AS idp,
      |    CAST((doc_id % 60 + 4) // 2 AS BIGINT) AS w2,
      |    CAST((n_chars % 40 + 2) // 2 AS BIGINT) AS h2
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, idp, w2, h2, 2 * w2 AS w, 2 * h2 AS h,
      |    w2 * (w2 - 1) // 2 AS tw, h2 * (h2 - 1) // 2 AS s1,
      |    (h2 - 1) * h2 * (2 * h2 - 1) // 6 AS s2
      |  FROM g
      |)
      |SELECT doc_id, CAST(w2 AS INT) AS out_w, CAST(h2 AS INT) AS out_h,
      |  w * h * h AS sum_r2,
      |  h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS sum_g2,
      |  h * (w * idp + w * (w - 1) // 2) AS sum_b2,
      |  16 * w2 * w2 * s2 + 8 * w2 * w2 * s1 + 16 * tw * s1 + 8 * tw * h2
      |    AS blockpos_r,
      |  4 * idp + 8 * w2 - 6 AS corner_b
      |FROM d ORDER BY doc_id""".stripMargin

  /** Oracle: the generator's linear pixel values summed in closed form
    * (B = id%50 + x, G = x + y, R = 2y + 1 over w×h) — integer-exact, so
    * the gate asserts the byte-level pixel decode inverts the byte-level
    * encode including row order and padding (`pos_weighted_r` pairs each
    * R value with its top-down row-major position).
    */
  val sqlPixels: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 60 + 4 AS BIGINT) AS w,
      |    CAST(n_chars % 40 + 2 AS BIGINT) AS h
      |  FROM documents
      |)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  w * h * h AS sum_r,
      |  h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS sum_g,
      |  h * (w * (doc_id % 50) + w * (w - 1) // 2) AS sum_b,
      |  w * w * (2 * ((h - 1) * h * (2 * h - 1) // 6) + h * (h - 1) // 2)
      |    + (w * (w - 1) // 2) * h * h AS pos_weighted_r
      |FROM g ORDER BY doc_id""".stripMargin

  /** Oracle: the encode parameters restated arithmetically — the gate then
    * asserts the byte-level decode inverts the byte-level encode. (The
    * parsers' agreement with EXTERNAL ground truth — a canonical 1×1 RGBA
    * PNG — is pinned in MultimodalSpec.)
    */
  val sqlDecode: String =
    """SELECT doc_id,
      |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |       WHEN 2 THEN 'gif' ELSE 'bmp' END AS fmt,
      |  CAST(doc_id % 300 + 1 AS INT) AS width,
      |  CAST(n_chars % 200 + 1 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 4 = 2 THEN (doc_id // 4) % 8 + 1
      |       ELSE 8 END AS INT) AS bit_depth,
      |  CAST(CASE doc_id % 4
      |       WHEN 0 THEN
      |         CASE (doc_id // 4) % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
      |              WHEN 2 THEN 2 ELSE 4 END
      |       WHEN 1 THEN CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END
      |       WHEN 2 THEN 1
      |       ELSE CASE (doc_id // 4) % 3 WHEN 0 THEN 1 WHEN 1 THEN 3
      |            ELSE 4 END
      |  END AS INT) AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  def sqlFrameSamples(stride: Int): String =
    s"""SELECT doc_id, (n - 1) AS frame_idx, (n - 1) * $stride AS byte_offset,
       |  ascii(substr(text, (n - 1) * $stride + 1, 1)) AS frame_feature
       |FROM (
       |  SELECT doc_id, text,
       |    unnest(range(1, greatest(length(text) // $stride, 1) + 1)) AS n
       |  FROM documents
       |)
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Oracle: closed forms of the generator's linear pixel values
    * (R = 2y+1, G = x+y, B = id%50 + x) box-summed over the floor-cropped
    * even region (x < 2·w2, y < 2·h2), with geometry selected by
    * container parity. thumb_wsum restates the [[sqlDownsample]]
    * derivation: blocksum_R(bx, by) = 16·by + 8, so
    * Σ idx·blocksum_R = 16w2²S2 + 8w2²S1 + 16TS1 + 8Th2 with
    * S1 = Σby, S2 = Σby², T = w2(w2−1)/2.
    */
  def sqlFeatures: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 50 AS BIGINT) AS idp,
      |    CASE WHEN doc_id % 2 = 0 THEN 'image/bmp'
      |         ELSE 'image/png' END AS mime,
      |    CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 60 + 4
      |              ELSE doc_id % 48 + 4 END AS BIGINT) AS w,
      |    CAST(CASE WHEN doc_id % 2 = 0 THEN n_chars % 40 + 2
      |              ELSE n_chars % 32 + 2 END AS BIGINT) AS h
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, mime, w, h, idp, w // 2 AS w2, h // 2 AS h2 FROM g
      |)
      |SELECT doc_id, mime, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  w * h AS n_px, CAST(w2 AS INT) AS thumb_w, CAST(h2 AS INT) AS thumb_h,
      |  8 * w2 * h2 * h2 AS thumb_sum_r,
      |  2 * w2 * h2 * (2 * w2 + 2 * h2 - 2) AS thumb_sum_g,
      |  4 * w2 * h2 * idp + 2 * h2 * w2 * (2 * w2 - 1) AS thumb_sum_b,
      |  16 * w2 * w2 * ((h2 - 1) * h2 * (2 * h2 - 1) // 6)
      |    + 8 * w2 * w2 * (h2 * (h2 - 1) // 2)
      |    + 16 * (w2 * (w2 - 1) // 2) * (h2 * (h2 - 1) // 2)
      |    + 8 * (w2 * (w2 - 1) // 2) * h2 AS thumb_wsum
      |FROM t ORDER BY doc_id""".stripMargin

  // ----------------------------------------------- perceptual image hash
  /** Average-hash (aHash) perceptual fingerprint over the DECODED pixel
    * grid — the multimodal counterpart of the text tier's SimHash: an
    * 8×8 nearest-neighbor downsample of the image, one bit per cell
    * (1 = cell luminance above the 64-sample mean), packed into a 64-bit
    * fingerprint. Identical images hash identically at ANY size ratio
    * that samples the same pixels; near-identical gradients collide —
    * which is the point (perceptual, not cryptographic).
    *
    * Determinism contract: sample coordinates are integer floor divisions
    * (i·(w−1)/7), luminance is the exact integer R+G+B of the sampled
    * pixel, and the threshold is the cross-multiplied integer comparison
    * 64·lum > Σlum — no division, no floats, so the DuckDB oracle restates
    * the hash in closed form over the generator arithmetic while the
    * Spark side derives it from the REAL decoded bytes.
    *
    * Scale shape: decode + hash are map-side ([[pixelStats]] discipline —
    * the only bytes that shuffle are (doc_id, 16-hex hash)); the dedup
    * grouping is ONE hash aggregation on the fingerprint. At 100 TB the
    * fingerprint column is the cluster key and candidate retrieval is a
    * hash-equality probe, not a scan.
    */
  final case class PhashRow(doc_id: Long, width: Int, height: Int,
      b0: Int, b1: Int, b2: Int, b3: Int, phash: String)

  def phashRows(media: Dataset[MediaBin]): Dataset[PhashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = decodeBmpPixels(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not an uncompressed 24-bpp BMP"))
        val lums = new Array[Long](64)
        var total = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val x = i * (w - 1) / 7
            val y = j * (h - 1) / 7
            val p = (y * w + x) * 3
            val lum = (rgb(p) & 0xff).toLong + (rgb(p + 1) & 0xff) +
              (rgb(p + 2) & 0xff)
            lums(j * 8 + i) = lum
            total += lum
            i += 1
          }
          j += 1
        }
        val b = new Array[Int](4)
        var pos = 0
        while (pos < 64) {
          if (64L * lums(pos) > total) b(pos / 16) |= 1 << (pos % 16)
          pos += 1
        }
        PhashRow(r.doc_id, w, h, b(0), b(1), b(2), b(3),
          f"${b(3)}%04x${b(2)}%04x${b(1)}%04x${b(0)}%04x")
      }
    }
  }

  /** Per-doc perceptual fingerprint off the real BMP decode. */
  def phash(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    phashRows(syntheticBmpMedia(docs)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("phash"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual dedup groups: fingerprints shared by >1 document, with
    * the canonical (minimum) doc per group — the image-side analogue of
    * [[Dedup.exact]].
    */
  def phashGroups(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    phashRows(syntheticBmpMedia(docs)).toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("phash"))
  }

  /** Shared oracle CTE: the generator pixels (B = base+x, G = x+y,
    * R = 2y+1) sampled at the hash grid and packed into the same four
    * 16-bit bands. lum = base + 2x + 3y + 1.
    */
  private val sqlPhashCte: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 60 + 4 AS BIGINT) AS w,
      |    CAST(n_chars % 40 + 2 AS BIGINT) AS h,
      |    doc_id % 50 AS base
      |  FROM documents
      |), s AS (
      |  SELECT g.doc_id, g.w, g.h, i.range AS i, j.range AS j,
      |    (i.range * (g.w - 1)) // 7 AS x,
      |    (j.range * (g.h - 1)) // 7 AS y, g.base
      |  FROM g, range(8) i, range(8) j
      |), px AS (
      |  SELECT doc_id, w, h, j * 8 + i AS pos,
      |    base + 2 * x + 3 * y + 1 AS lum
      |  FROM s
      |), m AS (
      |  SELECT doc_id, SUM(lum) AS total FROM px GROUP BY 1
      |), bits AS (
      |  SELECT px.doc_id, px.w, px.h, px.pos,
      |    CASE WHEN 64 * px.lum > m.total THEN 1 ELSE 0 END AS bit
      |  FROM px JOIN m USING (doc_id)
      |), hsh AS (
      |  SELECT doc_id, CAST(MAX(w) AS INT) AS width,
      |    CAST(MAX(h) AS INT) AS height,
      |    printf('%04x%04x%04x%04x',
      |      CAST(SUM(CASE WHEN pos >= 48 THEN bit * (1 << (pos - 48))
      |        ELSE 0 END) AS INTEGER),
      |      CAST(SUM(CASE WHEN pos >= 32 AND pos < 48
      |        THEN bit * (1 << (pos - 32)) ELSE 0 END) AS INTEGER),
      |      CAST(SUM(CASE WHEN pos >= 16 AND pos < 32
      |        THEN bit * (1 << (pos - 16)) ELSE 0 END) AS INTEGER),
      |      CAST(SUM(CASE WHEN pos < 16 THEN bit * (1 << pos)
      |        ELSE 0 END) AS INTEGER)) AS phash
      |  FROM bits GROUP BY doc_id
      |)""".stripMargin

  val sqlPhash: String =
    s"""$sqlPhashCte
       |SELECT doc_id, width, height, phash FROM hsh
       |ORDER BY doc_id""".stripMargin

  val sqlPhashGroups: String =
    s"""$sqlPhashCte
       |SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
       |FROM hsh GROUP BY phash HAVING COUNT(*) > 1
       |ORDER BY phash""".stripMargin

  // ------------------------------------------------ channel histograms
  final case class ChannelBucket(channel: String, bucket: Int, n: Long)

  /** Corpus-level RGB intensity histogram (16 buckets of 16 levels per
    * channel) over the REAL BMP pixel decode — the color-distribution
    * profile an image-corpus card reports (washed-out/clipped channels,
    * synthetic-palette spikes). The decoder emits PER-IMAGE partial
    * histograms (≤ 48 thin rows each, reduced inside the decode loop),
    * so the corpus-scale pixel arrays never leave the map side; the
    * global rollup is a 48-group hash aggregate. `mapPartitions` only
    * amortizes decoder init, like every other decode stage here.
    *
    * Oracle: the generator's pixel planes (R = 2y+1, G = x+y, B =
    * base+x; all < 256 at the fixture geometry, so no byte wrap)
    * re-derived relationally over a range(w)×range(h) grid.
    */
  def rgbHistogram(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val partials = syntheticBmpMedia(docs).mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, rgb) = decodeBmpPixels(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not an uncompressed 24-bpp BMP"))
        val counts = Array.ofDim[Long](3, 16)
        var i = 0
        val n = w * h
        while (i < n) {
          counts(0)((rgb(i * 3) & 0xff) >> 4) += 1
          counts(1)((rgb(i * 3 + 1) & 0xff) >> 4) += 1
          counts(2)((rgb(i * 3 + 2) & 0xff) >> 4) += 1
          i += 1
        }
        val names = Array("r", "g", "b")
        for {
          c <- (0 until 3).iterator
          b2 <- 0 until 16
          if counts(c)(b2) > 0L
        } yield ChannelBucket(names(c), b2, counts(c)(b2))
      }
    }
    partials.toDF()
      .groupBy(col("channel"), col("bucket"))
      .agg(sum(col("n")).as("n_pixels"))
      .orderBy(col("channel"), col("bucket"))
  }

  val sqlRgbHistogram: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 60 + 4 AS BIGINT) AS w,
      |    CAST(n_chars % 40 + 2 AS BIGINT) AS h,
      |    doc_id % 50 AS base
      |  FROM documents
      |), xy AS (
      |  -- range() takes no lateral column args: cross the max geometry
      |  -- (w ≤ 63, h ≤ 41) and filter to each image's own grid
      |  SELECT g.doc_id, g.base, x.range AS x, y.range AS y
      |  FROM g, range(64) x, range(42) y
      |  WHERE x.range < g.w AND y.range < g.h
      |), px AS (
      |  SELECT 'r' AS channel, (2 * y + 1) // 16 AS bucket FROM xy
      |  UNION ALL
      |  SELECT 'g', (x + y) // 16 FROM xy
      |  UNION ALL
      |  SELECT 'b', (base + x) // 16 FROM xy
      |)
      |SELECT channel, CAST(bucket AS INT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_pixels
      |FROM px GROUP BY channel, bucket
      |ORDER BY channel, bucket""".stripMargin

  // --------------------------------------------------- real audio decode
  /** Audio decode output: exact integer statistics over the PCM sample
    * stream. `pos_weighted` pairs each sample with its index, so a
    * decoder that misparses the chunk walk (wrong data offset) or the
    * little-endian int16 layout fails the gate even when the plain sum
    * (order-independent) happens to survive.
    */
  final case class WavStats(doc_id: Long, n_samples: Int, sum_amp: Long,
      pos_weighted: Long, peak: Int)

  /** A complete RIFF/WAVE file (mono PCM, 16-bit, 8 kHz): canonical
    * `fmt ` chunk, an ODD-sized LIST filler chunk before `data` — RIFF
    * pads every odd chunk payload to an even byte boundary, the spec
    * quirk naive readers miss — then signed little-endian samples.
    * Sample i = (id % 40) − 16 + 3·i: linear, crosses zero (so int16
    * sign extension is exercised), and bounded far inside int16 for the
    * fixture sizes, so the DuckDB oracle states every statistic in
    * closed form.
    */
  def wavBytes(id: Long, n: Int): Array[Byte] = {
    val a = (id % 40).toInt - 16
    val fmtCh = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val listCh = "LIST".getBytes("US-ASCII") ++ le32(5) ++
      "INFOx".getBytes("US-ASCII") ++ Array(0.toByte) // odd size + pad
    val samples = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = a + 3 * i
      samples(2 * i) = s.toByte
      samples(2 * i + 1) = (s >> 8).toByte
      i += 1
    }
    val dataCh = "data".getBytes("US-ASCII") ++ le32(2 * n) ++ samples
    val payload = "WAVE".getBytes("US-ASCII") ++ fmtCh ++ listCh ++ dataCh
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
  }

  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length)
      new String(b.slice(i, i + 4), "US-ASCII")
    else ""

  /** REAL RIFF/WAVE decode: validates the RIFF header, WALKS the chunk
    * list honoring declared sizes and the odd-size pad byte, requires a
    * PCM mono 16-bit `fmt ` chunk BEFORE `data`, and reads the samples
    * as signed little-endian 16-bit. Returns None (not garbage) for
    * compressed, multi-channel, or non-16-bit streams.
    */
  def decodeWav(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    val end = math.min(b.length.toLong, 8L + leInt(b, 4)).toInt
    var pos = 12
    var fmtOk = false
    while (pos + 8 <= end) {
      val id = tag(b, pos)
      val sz = leInt(b, pos + 4)
      val body = pos + 8
      if (sz < 0 || body.toLong + sz > end) return None
      id match {
        case "fmt " =>
          if (sz < 16 || leShort(b, body) != 1 || leShort(b, body + 2) != 1 ||
            leShort(b, body + 14) != 16) return None
          fmtOk = true
        case "data" =>
          if (!fmtOk || sz % 2 != 0) return None
          val out = new Array[Int](sz / 2)
          var i = 0
          while (i < out.length) {
            out(i) = ((b(body + 2 * i) & 0xff) |
              (b(body + 2 * i + 1) << 8)).toShort.toInt
            i += 1
          }
          return Some(out)
        case _ => () // unknown chunk: skip by declared size
      }
      pos = body + sz + (sz & 1) // RIFF word alignment
    }
    None
  }

  /** Deterministic WAV fixtures: one file per document, sample count
    * from n_chars — the same (doc_id, n_chars) → geometry convention as
    * the image fixtures.
    */
  def syntheticWavMedia(docs: DataFrame): Dataset[MediaBin] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        MediaBin(id, wavBytes(id, (nc % 256 + 16).toInt))
      }
  }

  /** The batched audio stage: decode every payload's full sample stream
    * and reduce to exact statistics. Same loud-failure contract and
    * same `mapPartitions`-for-decoder-amortization shape as
    * [[pixelStats]] — at 100 TB this is the embarrassingly parallel
    * map stage of an audio feature pipeline; nothing shuffles.
    */
  def wavStats(media: Dataset[MediaBin]): Dataset[WavStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val s = decodeWav(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not a mono 16-bit PCM WAV"))
        var sum = 0L; var wsum = 0L; var peak = Int.MinValue
        var i = 0
        while (i < s.length) {
          sum += s(i)
          wsum += i.toLong * s(i)
          if (s(i) > peak) peak = s(i)
          i += 1
        }
        WavStats(r.doc_id, s.length, sum, wsum, peak)
      }
    }
  }

  /** End-to-end audio query: WAV fixtures → full PCM decode → exact
    * sample statistics.
    */
  def wav(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    wavStats(syntheticWavMedia(docs)).toDF().orderBy(col("doc_id"))
  }

  /** Oracle: the generator's linear samples summed in closed form
    * (s_i = a + 3i with a = id%40 − 16 over n = n_chars%256 + 16
    * samples) — integer-exact, so the gate asserts the byte-level PCM
    * decode inverts the encode including the chunk walk, the odd-chunk
    * pad, and signed little-endian layout.
    */
  val sqlWav: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(n_chars % 256 + 16 AS BIGINT) AS n,
      |    CAST(doc_id % 40 - 16 AS BIGINT) AS a
      |  FROM documents
      |)
      |SELECT doc_id, CAST(n AS INT) AS n_samples,
      |  n * a + 3 * (n * (n - 1) // 2) AS sum_amp,
      |  a * (n * (n - 1) // 2)
      |    + 3 * ((n - 1) * n * (2 * n - 1) // 6) AS pos_weighted,
      |  CAST(a + 3 * (n - 1) AS INT) AS peak
      |FROM g ORDER BY doc_id""".stripMargin

  final case class AmpBucket(bucket: Int, n: Long)

  /** Corpus-level amplitude histogram over the REAL PCM decode (64-level
    * buckets, offset by +16 so the bucket index never goes negative —
    * floor-vs-truncate integer division on negatives differs across
    * engines). Same per-payload partial-histogram reduction as
    * [[rgbHistogram]]: the sample streams never leave the map side; the
    * rollup is a ≤ 14-group aggregate.
    */
  def wavHistogram(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val partials = syntheticWavMedia(docs).mapPartitions { rows =>
      rows.flatMap { r =>
        val s = decodeWav(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: payload is not a mono 16-bit PCM WAV"))
        val counts = new scala.collection.mutable.HashMap[Int, Long]()
        var i = 0
        while (i < s.length) {
          val b = (s(i) + 16) / 64
          counts.update(b, counts.getOrElse(b, 0L) + 1L)
          i += 1
        }
        counts.iterator.map { case (b, n) => AmpBucket(b, n) }
      }
    }
    partials.toDF()
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_samples"))
      .orderBy(col("bucket"))
  }

  val sqlWavHistogram: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(n_chars % 256 + 16 AS BIGINT) AS n,
      |    CAST(doc_id % 40 - 16 AS BIGINT) AS a
      |  FROM documents
      |), smp AS (
      |  SELECT (a + 3 * i.range + 16) // 64 AS bucket
      |  FROM g, range(272) i WHERE i.range < g.n
      |)
      |SELECT CAST(bucket AS INT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_samples
      |FROM smp GROUP BY bucket ORDER BY bucket""".stripMargin
}
