package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analog of `mapInPandas`).
  *
  * The container has no codec libraries, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`DecodeStub`) that derives fake
  * image dimensions from the payload bytes; everything around it — the
  * binary schema, the typed-metadata struct, the per-partition batched
  * UDF signature, and the partitioning — is real and is what a codec
  * integration would drop into.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int)

  /** Real header decoders for the two formats parseable without codec
    * libraries — BMP (BITMAPINFOHEADER) and PCM WAV (RIFF) — plus the
    * deterministic stub for everything else (JPEG/MP4 need codecs the
    * container doesn't ship). The dispatch is what a full codec
    * integration would extend, format by format. */
  object Decode {
    private def le16(p: Array[Byte], off: Int): Int =
      (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    private def le32(p: Array[Byte], off: Int): Int =
      (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8) |
        ((p(off + 2) & 0xFF) << 16) | ((p(off + 3) & 0xFF) << 24)
    private def tag(p: Array[Byte], off: Int, s: String): Boolean =
      s.indices.forall(i => p(off + i) == s(i).toByte)

    /** BMP: magic "BM"; width/height are little-endian ints at offsets
      * 18/22 of the BITMAPINFOHEADER (height may be negative for
      * top-down rows — absolute value is the pixel height). */
    def decodeBmp(r: MediaRecord): Option[MediaFeatures] =
      if (r.payload.length >= 26 && tag(r.payload, 0, "BM"))
        Some(MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          width = le32(r.payload, 18), height = math.abs(le32(r.payload, 22)),
          n_frames = 1))
      else None

    /** PCM WAV: RIFF/WAVE magic; channels@22, bits-per-sample@34, data
      * byte count@40 → n_frames = samples per channel. */
    def decodeWav(r: MediaRecord): Option[MediaFeatures] =
      if (r.payload.length >= 44 && tag(r.payload, 0, "RIFF") &&
          tag(r.payload, 8, "WAVE"))
        Some {
          val channels = le16(r.payload, 22)
          val bytesPerSample = le16(r.payload, 34) / 8
          val dataLen = le32(r.payload, 40)
          val samples = if (channels * bytesPerSample > 0)
            dataLen / (channels * bytesPerSample) else 0
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
            width = 0, height = 0, n_frames = samples)
        }
      else None

    def decode(r: MediaRecord): MediaFeatures =
      decodeBmp(r).orElse(decodeWav(r)).getOrElse(DecodeStub.decode(r))
  }

  /** DETERMINISTIC STUB for formats whose codecs the container lacks
    * (JPEG/MP4): derives stable fake dimensions from the byte length so
    * the pipeline is testable end-to-end. */
  object DecodeStub {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length.toLong
      MediaFeatures(r.doc_id, r.media_type, n,
        width = (n % 640).toInt + 16,
        height = (n % 480).toInt + 16,
        n_frames = (n % 30).toInt + 1)
    }
  }

  /** Frame sampling: expand each media record into its sampled frames
    * (1:N, every 5th frame) with deterministic per-frame metadata — the
    * shape of a video→frames feature-extraction stage. The explode happens
    * AFTER the cheap metadata projection, so only (doc_id, n_frames)
    * fans out, never the payload bytes. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (length(col("text")).cast("long") % 30 + 1).as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), expr("(n_frames - 1) div 5"))).as("k"))
      .select(col("doc_id"), (col("k") * 5).as("frame_idx"),
        // a real decoder would emit pixels; the deterministic stand-in
        // derives a per-frame checksum from (doc, frame)
        md5(concat(col("doc_id"), lit(":"), col("k") * 5)).as("frame_key"))
  }

  /** Build a binary media table from documents (payload = UTF-8 bytes of
    * the text standing in for an encoded image), run the batched decode,
    * and aggregate features. `mapPartitions` keeps the decode vectorized
    * per-partition: one iterator in, one iterator out, no per-row setup —
    * the same batch shape `mapInPandas` gives PySpark. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"),
        // media type derived from the source column: a typed metadata field
        concat(lit("image/"), col("source")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
    val features = media.mapPartitions { it =>
      // batch boundary: a real codec would init its native context once here
      it.map(Decode.decode)
    }
    features.toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        sum(col("n_frames")).as("total_frames"))
  }
}
