package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and a partition-batched feature-extraction stage.
  *
  * The decode step is a STUB — image/audio codecs are not in this
  * environment — replaced by a deterministic byte-derived fake. What is real
  * and load-bearing for a 100 TB pipeline:
  *  - the schema contract (binary payload + typed metadata columns);
  *  - `mapPartitions` batch shape: the decoder amortizes per-partition init
  *    (model load, codec context) across the partition's rows, which is
  *    exactly how a Pandas-UDF/`mapInPandas` stage behaves on a cluster;
  *  - partition sizing: payloads stay columnar-compressed in parquet until
  *    the scan, and only the projected columns are read.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  final case class MediaFeatures(doc_id: Long, mime: String, byte_len: Int,
      content_hash: String, head_sum: Long, frame_count: Int,
      thumb_hash: String)

  /** Resize stub: every `ResizeStride`-th byte — the deterministic stand-in
    * for a real downscale; the hash of the "thumbnail" is the verifiable
    * output.
    */
  val ResizeStride = 4

  /** Build the media table: text payload → binary column + metadata.
    * (In production this is the raw image/audio bytes column.)
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** Partition-batched "decode" + feature extraction. The per-partition
    * block is where a real decoder would initialize once.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: init codec/model HERE, once per partition
      val digest = MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val hash = digest.digest(r.media).map("%02x".format(_)).mkString
        // STUB decode: deterministic byte-derived stand-ins for
        // (decoded frame count, content checksum, header bytes)
        val headSum = r.media.take(8).map(b => (b & 0xff).toLong).sum
        // STUB resize: stride-subsampled "thumbnail", hashed. Index-stride
        // loop, not zipWithIndex.collect — the tuple form boxes an
        // N-element Array[(Byte, Int)] per row, tens of MB of garbage on a
        // multi-MB payload
        val thumb = Array.range(0, r.media.length, ResizeStride)
          .map(r.media)
        digest.reset()
        val thumbHash = digest.digest(thumb).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.mime, r.media.length, hash, headSum,
          r.media.length / 100 + 1, thumbHash)
      }
    }
  }

  /** End-to-end: docs → media table → typed decode stage. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(docs).as[MediaRow]).toDF()
      .orderBy(col("doc_id"))
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

  def sqlFrameSamples(stride: Int): String =
    s"""SELECT doc_id, (n - 1) AS frame_idx, (n - 1) * $stride AS byte_offset,
       |  ascii(substr(text, (n - 1) * $stride + 1, 1)) AS frame_feature
       |FROM (
       |  SELECT doc_id, text,
       |    unnest(range(1, greatest(length(text) // $stride, 1) + 1)) AS n
       |  FROM documents
       |)
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Oracle mirror: the fixture text is ASCII, so byte-level features equal
    * char-level SQL (octet_length(encode(text)) == length(text), md5 of the
    * UTF-8 bytes == DuckDB md5(VARCHAR)).
    */
  def sqlFeatures: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  octet_length(encode(text)) AS byte_len,
      |  md5(text) AS content_hash,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, 9), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |    (a, b) -> a + b) AS head_sum,
      |  octet_length(encode(text)) // 100 + 1 AS frame_count,
      |  md5(array_to_string(
      |    list_transform(range(1, (length(text) - 1) // 4 + 2),
      |                   i -> substr(text, (i - 1) * 4 + 1, 1)), '')) AS thumb_hash
      |FROM documents ORDER BY doc_id""".stripMargin
}
