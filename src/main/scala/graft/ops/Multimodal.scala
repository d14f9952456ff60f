package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- m4: perceptual image near-dup (pHash) -------------------------

  /** Raster side of the pHash grid (16×16 grayscale). */
  val PhashGrid = 16

  /** Fixed-point scale of the integer DCT coefficient matrix: both the
    * engine and the DuckDB oracle use the SAME integer literals (the
    * matrix is interpolated into the oracle SQL), so every DCT sum is
    * exact integer arithmetic — no engine libm/rounding drift. */
  val DctScale = 1024L

  /** Max Hamming distance reported by the banded pair join. */
  val PhashHammingMax = 6

  /** Integer DCT-II row matrix: C(u)(x) = round(cos(π(2x+1)u / 2N) · S)
    * for u < 8, x < [[PhashGrid]] — the top 8 frequencies of the 16-point
    * transform; the 2-D DCT is two applications (separable). */
  lazy val DctCoef: Array[Array[Long]] =
    Array.tabulate(8, PhashGrid)((u, x) =>
      math.round(math.cos(math.Pi * (2 * x + 1) * u / (2.0 * PhashGrid)) * DctScale))

  /** The coefficient matrix as DuckDB struct-list literals — the oracle
    * reproduces the integer DCT from the identical constants. */
  def dctCoefSql: String =
    (for (u <- 0 until 8; x <- 0 until PhashGrid)
      yield s"{'u': $u, 'x': $x, 'c': ${DctCoef(u)(x)}}").mkString("[", ", ", "]")

  /** Deterministic 24-bit BMP raster of a document: pixel p (row-major,
    * top-down) is the gray level given by the first md5 byte of the token
    * at position p mod n — near-identical documents raster to
    * near-identical images, so the pHash stage has real structure to
    * find. Written BOTTOM-UP (positive height) like a stock BMP encoder;
    * [[grayPixels]] reads it back through the real header path, so the
    * BMP round-trip is covered by the oracle equality (the oracle
    * computes pixels directly — encode∘decode must be the identity for
    * the hashes to match). */
  def synthBmp(text: String): Array[Byte] = {
    // Locale.ROOT: the oracle and Spark pipelines lowercase
    // locale-independently; a Turkish default locale would map 'I' to
    // dotless-ı here and break the oracle equality (ADVICE r12)
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = PhashGrid
    val stride = (n * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + stride * n)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    def w16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w32(off: Int, v: Int): Unit = { w16(off, v & 0xFFFF); w16(off + 2, v >>> 16) }
    w32(2, out.length); w32(10, 54); w32(14, 40)
    w32(18, n); w32(22, n)           // positive height: bottom-up rows
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, stride * n)
    var p = 0
    while (p < n * n) {
      val gray = if (toks.isEmpty) 0 else {
        md.reset()
        md.digest(toks(p % toks.length).getBytes("UTF-8"))(0) & 0xFF
      }
      val row = n - 1 - p / n // bottom-up storage of the top-down raster
      val base = 54 + row * stride + (p % n) * 3
      out(base) = gray.toByte; out(base + 1) = gray.toByte; out(base + 2) = gray.toByte
      p += 1
    }
    out
  }

  /** Gray levels (blue channel) of a 24-bit BMP as a row-major TOP-DOWN
    * array, honoring the height sign — the real pixel-access path the
    * pHash stage reads through. None for non-BMP payloads. */
  def grayPixels(payload: Array[Byte]): Option[Array[Int]] = {
    def le16(off: Int): Int = (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8)
    def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
    if (payload.length < 54 || payload(0) != 'B'.toByte || payload(1) != 'M'.toByte)
      return None
    if (le16(28) != 24 || le32(30) != 0) return None
    val off = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || off < 54 || off > payload.length) return None
    val strideL = (w.toLong * 3 + 3) / 4 * 4
    if (off.toLong + strideL * h > payload.length) return None
    val stride = strideL.toInt
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (hRaw > 0) h - 1 - y else y
      var x = 0
      while (x < w) {
        out(y * w + x) = payload(off + srcRow * stride + x * 3) & 0xFF
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** m4: perceptual IMAGE near-dup — the retrieval stage the multimodal
    * family was missing (m1-m3 decode/sample/resize; this finds
    * near-duplicate images): 64-bit DCT perceptual hash (pHash) per
    * image, then banded Hamming candidate pairs exactly like d6/d11's
    * SimHash shape (4×16-bit bands; two fingerprints within
    * [[PhashHammingMax]] bits share a band with high probability —
    * never all-pairs).
    *
    * Hash construction (integer end-to-end, oracle-reproduced from the
    * same literals): 16×16 gray raster → separable integer DCT (two
    * broadcast joins against the 128-row coefficient matrix, map-side
    * combined sums) → 64 low-frequency coefficients; bit k = coefficient
    * above the MEDIAN of the 63 AC coefficients (row_number 32 per doc —
    * deterministic under ties); fingerprint = Σ bit<<k. The pixel path
    * runs through a REAL BMP encode (synthBmp, bottom-up rows) and the
    * REAL header/pixel reader (grayPixels) in one mapPartitions; the
    * oracle computes pixels directly, so hash equality also proves the
    * BMP round-trip is the identity. At 100 TB the per-image raster is
    * the decode output already on hand; everything downstream is
    * fingerprint-grain (8 bytes/image). */
  def phashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // round 19: the fingerprint is computed WHERE THE PIXELS ARE — the
    // decode closure already holds the raster, and the previous column
    // pipeline shipped 256 pixel rows per image through two broadcast-
    // join + shuffle rounds (~3k intermediate rows/image) to compute 64
    // integer sums it could do in place (the guide-§8 rule: decide with
    // small rows — here the proxy is the 32-byte band signature). Same
    // integer arithmetic, same literals, oracle hash-identical.
    val sig = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val px = grayPixels(synthBmp(text)).getOrElse(
            throw new IllegalStateException(s"synthBmp produced an unreadable BMP for doc $id"))
          val b = phashBands(px)
          (id, b(0), b(1), b(2), b(3))
        }
      }.toDF("doc_id", "b0", "b1", "b2", "b3")
    bandedPhashPairs(sig)
  }

  /** 4×16-bit pHash band signature of one [[PhashGrid]]² row-major gray
    * raster — bit-identical to the previous column pipeline (and to the
    * oracle's literal-interpolated SQL): separable integer DCT over
    * [[DctCoef]] (r(u,y) = Σₓ v·C(u,x); h(u,v2) = Σ_y r·C(v2,y); k =
    * 8u+v2), median = the 32nd of the 63 AC coefficients ordered by
    * (h, k) (the row_number rule — deterministic under ties), bit k set
    * iff h(k) > median, band b = Σ_{k div 16 = b} bit << (k mod 16).
    * All Long arithmetic — exact, order-free. */
  private[graft] def phashBands(px: Array[Int]): Array[Long] = {
    val g = PhashGrid
    // phashPairsFromPixels accepts arbitrary hand-built rasters; a short
    // array must fail with the cause, not an index error mid-DCT
    // (ADVICE r19 #4 — the synthBmp IllegalStateException idiom)
    if (px.length != g * g)
      throw new IllegalStateException(
        s"phashBands: raster has ${px.length} pixels, expected ${g * g} " +
          s"($g×$g row-major grays)")
    val r = Array.ofDim[Long](8, g)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < g) {
        var s = 0L; var x = 0
        while (x < g) { s += px(y * g + x).toLong * DctCoef(u)(x); x += 1 }
        r(u)(y) = s; y += 1
      }
      u += 1
    }
    val h = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v2 = 0
      while (v2 < 8) {
        var s = 0L; var y = 0
        while (y < g) { s += r(u)(y) * DctCoef(v2)(y); y += 1 }
        h(u * 8 + v2) = s; v2 += 1
      }
      u += 1
    }
    val med = (1 until 64).map(k => (h(k), k)).sorted.apply(31)._1
    val bands = new Array[Long](4)
    var k = 0
    while (k < 64) {
      if (h(k) > med) bands(k / 16) |= 1L << (k % 16)
      k += 1
    }
    bands
  }

  /** Frame-level pHash pipeline over (doc_id, px: array&lt;int&gt; of
    * [[PhashGrid]]² row-major grays) — specs drive it with hand-built
    * rasters. Same [[phashBands]] closure as the production path, so the
    * spec pins the exact fingerprint arithmetic m4 ships. */
  def phashPairsFromPixels(pixels: DataFrame): DataFrame = {
    val s = pixels.sparkSession
    import s.implicits._
    val sig = pixels.select(col("doc_id"), col("px"))
      .as[(Long, Array[Int])]
      .map { case (id, px) =>
        val b = phashBands(px); (id, b(0), b(1), b(2), b(3))
      }.toDF("doc_id", "b0", "b1", "b2", "b3")
    bandedPhashPairs(sig)
  }

  /** The d6/d11 banded candidate join over a (doc_id, b0..b3) signature
    * frame: checkpoint once, (band, bucket) equality join, first-
    * matching-band emission — never all-pairs. */
  private def bandedPhashPairs(sig0: DataFrame): DataFrame = {
    val sig = sig0.localCheckpoint()
    // d6/d11's banded shape: first-matching-band emission, no post-join
    // distinct
    val banded = sig.select((col("doc_id") +: (0 until 4).map(b => col(s"b$b"))) :+
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"), col(s"b$b").as("bucket"))
        }: _*)).as("bb"): _*)
      .select((col("doc_id") +: (0 until 4).map(b => col(s"b$b"))) :+
        col("bb.band").as("band") :+ col("bb.bucket").as("bucket"): _*)
    val l = banded.as("l")
    val r = banded.as("r")
    def firstBand: Column =
      (0 until 3).foldRight(lit(3): Column) { (b, rest) =>
        when(col(s"l.b$b") === col(s"r.b$b"), b).otherwise(rest)
      }
    val hamming = (0 until 4).map(b =>
      bit_count(col(s"l.b$b").bitwiseXOR(col(s"r.b$b")))).reduce(_ + _)
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
        && col("l.doc_id") < col("r.doc_id"))
      .filter(hamming <= PhashHammingMax && firstBand === col("l.band"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        hamming.cast("long").as("hamming"))
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

  /** Per-doc audio sample statistics (what [[audioStats]] emits). */
  case class AudioStats(doc_id: Long, n_samples: Int, peak: Int,
      sum_abs: Long, n_zero_cross: Long)

  /** Mono 16-bit PCM WAV with a REAL 44-byte RIFF header; samples are the
    * deterministic text mapping s_i = (cp_i mod 192 − 96)·256 over the
    * CODE POINT sequence (letters land positive, spaces/digits negative —
    * real sign structure for the zero-crossing stat). The mod keeps every
    * sample in [−24576, 24320] — inside int16 with NO wrapping, so the
    * oracle's unwrapped arithmetic is identical for every Unicode input,
    * and code points (not UTF-16 units) match DuckDB's substr/length
    * semantics on non-BMP text. This is the audio analog of m4's BMP
    * synthesis: the payload is a genuinely well-formed container. */
  def synthWav(text: String): Array[Byte] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val out = new Array[Byte](44 + n * 2)
    def w16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w32(off: Int, v: Int): Unit = { w16(off, v & 0xFFFF); w16(off + 2, v >>> 16) }
    def tag(off: Int, s: String): Unit =
      s.indices.foreach(i => out(off + i) = s(i).toByte)
    tag(0, "RIFF"); w32(4, 36 + n * 2); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1) /* PCM */ ; w16(22, 1) /* mono */
    w32(24, 16000); w32(28, 32000); w16(32, 2); w16(34, 16)
    tag(36, "data"); w32(40, n * 2)
    var i = 0
    while (i < n) { w16(44 + i * 2, ((cps(i) % 192 - 96) * 256) & 0xFFFF); i += 1 }
    out
  }

  /** REAL sample-grain WAV analysis — the loudness/activity pass an audio
    * data pipeline runs before filtering (peak level, total absolute
    * amplitude, zero-crossing count — the classic voiced/unvoiced
    * signal): parse the RIFF header for channels/bits/data length, then
    * walk the 16-bit little-endian samples in byte arithmetic. ALL
    * outputs are integers, so the DuckDB oracle — which recomputes the
    * identical sums straight from the text the payload was synthesized
    * from — is exact, and equality proves the full WAV encode→parse
    * round-trip is lossless (the o18 discipline, applied to audio).
    * mapPartitions keeps it batched and narrow: no shuffle anywhere. */
  def audioStats(s: SparkSession, dir: String): DataFrame =
    audioStatsFrame(Tables.documents(s, dir))

  /** Frame-level form of [[audioStats]] — any (doc_id, text). */
  def audioStatsFrame(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    documents
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val p = synthWav(text)
          // real parse: magic, channels@22, bits@34, data bytes@40
          require(p.length >= 44 && p(0) == 'R'.toByte && p(8) == 'W'.toByte)
          def le16(off: Int): Int = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
          val n = ((le16(40) | (le16(42) << 16)) /
            (math.max(1, le16(22) * le16(34) / 8)))
          var peak = 0; var sumAbs = 0L; var zc = 0L; var prev = 0
          var i = 0
          while (i < n) {
            val v = (le16(44 + i * 2) << 16) >> 16 // sign-extend
            val a = math.abs(v)
            if (a > peak) peak = a
            sumAbs += a
            if (i > 0 && prev.toLong * v < 0) zc += 1
            prev = v
            i += 1
          }
          AudioStats(id, n, peak, sumAbs, zc)
        }
      }.toDF()
  }
}
