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

  /** REAL image resize for the codec-free format: nearest-neighbor
    * downsample of an uncompressed 24-bit BMP, pure byte arithmetic
    * (header parse, 4-byte row stride, pixel copy). Formats needing
    * codecs fall back to the metadata-only thumbnail plan
    * ([[thumbnailPlan]]). */
  object Resize {
    private def le16(p: Array[Byte], off: Int): Int =
      (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    private def le32(p: Array[Byte], off: Int): Int =
      (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8) |
        ((p(off + 2) & 0xFF) << 16) | ((p(off + 3) & 0xFF) << 24)
    private def w16(p: Array[Byte], off: Int, v: Int): Unit = {
      p(off) = (v & 0xFF).toByte; p(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    private def w32(p: Array[Byte], off: Int, v: Int): Unit = {
      p(off) = (v & 0xFF).toByte; p(off + 1) = ((v >> 8) & 0xFF).toByte
      p(off + 2) = ((v >> 16) & 0xFF).toByte; p(off + 3) = ((v >> 24) & 0xFF).toByte
    }

    /** Thumbnail dims: fit (w, h) into a maxSide box, never upscaling. */
    def fit(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      val sc = math.min(1.0, maxSide.toDouble / math.max(math.max(w, h), 1))
      (math.max(1, math.floor(w * sc).toInt), math.max(1, math.floor(h * sc).toInt))
    }

    /** Nearest-neighbor resize of an uncompressed 24-bit BMP into the
      * maxSide box; None for anything that isn't one (codec formats take
      * the metadata-only path). Row order (bottom-up vs top-down) is
      * preserved via the height sign. */
    def resizeBmp(payload: Array[Byte], maxSide: Int): Option[Array[Byte]] = {
      if (payload.length < 54 || payload(0) != 'B'.toByte || payload(1) != 'M'.toByte)
        return None
      if (le16(payload, 28) != 24 || le32(payload, 30) != 0) return None
      val off = le32(payload, 10)
      val w = le32(payload, 18)
      val hRaw = le32(payload, 22)
      val h = math.abs(hRaw)
      // bounds-harden against malformed headers: the offset must point
      // past the header and into the payload, and the stride math runs in
      // Long so huge widths can't overflow past the length check — any
      // violation falls back (None), never an ArrayIndexOutOfBounds task
      // failure
      if (w <= 0 || h == 0 || off < 54 || off > payload.length) return None
      val srcStrideL = (w.toLong * 3 + 3) / 4 * 4
      if (off.toLong + srcStrideL * h > payload.length) return None
      val srcStride = srcStrideL.toInt
      val (tw, th) = fit(w, h, maxSide)
      val dstStride = (tw * 3 + 3) / 4 * 4
      val out = new Array[Byte](54 + dstStride * th)
      out(0) = 'B'.toByte; out(1) = 'M'.toByte
      w32(out, 2, out.length)          // file size
      w32(out, 10, 54)                 // pixel-data offset
      w32(out, 14, 40)                 // BITMAPINFOHEADER size
      w32(out, 18, tw)
      w32(out, 22, if (hRaw < 0) -th else th)
      w16(out, 26, 1)                  // planes
      w16(out, 28, 24)                 // bits per pixel
      w32(out, 30, 0)                  // BI_RGB
      w32(out, 34, dstStride * th)     // image size
      var y = 0
      while (y < th) {
        val sy = y.toLong * h / th
        var x = 0
        while (x < tw) {
          val sx = x.toLong * w / tw
          System.arraycopy(payload, off + (sy * srcStride + sx * 3).toInt,
            out, 54 + y * dstStride + x * 3, 3)
          x += 1
        }
        y += 1
      }
      Some(out)
    }
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

  /** m3 resize/thumbnail stage: per record, the TARGET geometry of a
    * 64-px-box thumbnail (no upscaling) and its exact output byte size
    * under the 24-bit BMP layout (54-byte header + 4-byte-aligned rows) —
    * metadata only, the payload never moves. Real BMP payloads resize for
    * real via [[Resize.resizeBmp]] (MultimodalSpec pins exact pixels on a
    * hand-built BMP); codec formats would plug into the same dispatch.
    * Same mapPartitions batch shape as the decode. */
  def thumbnailPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("image/"), col("source")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
    media.mapPartitions { it =>
      it.map { r =>
        val f = Decode.decode(r)
        val (tw, th) = Resize.fit(f.width, f.height, 64)
        val stride = (tw * 3 + 3) / 4 * 4
        (r.doc_id, r.media_type, tw, th, 54L + stride.toLong * th)
      }
    }.toDF("doc_id", "media_type", "thumb_w", "thumb_h", "thumb_bytes")
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
