package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{Decode, MediaRecord}
import java.nio.{ByteBuffer, ByteOrder}

/** Real binary-format decode goldens: hand-built BMP and PCM-WAV headers
  * parsed without codec libraries; unknown formats fall to the declared
  * deterministic stub. */
class MultimodalSpec extends SparkSpec {

  private def bmp(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54)      // file size (unused by the parser)
    b.putInt(0)       // reserved
    b.putInt(54)      // pixel-data offset
    b.putInt(40)      // BITMAPINFOHEADER size
    b.putInt(width)   // offset 18
    b.putInt(height)  // offset 22
    b.array()
  }

  private def wav(channels: Int, bitsPerSample: Int, dataBytes: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataBytes); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16)
    b.putShort(1)                          // PCM
    b.putShort(channels.toShort)           // offset 22
    b.putInt(44100)                        // sample rate
    b.putInt(44100 * channels * bitsPerSample / 8)
    b.putShort((channels * bitsPerSample / 8).toShort)
    b.putShort(bitsPerSample.toShort)      // offset 34
    b.put("data".getBytes); b.putInt(dataBytes) // offset 40
    b.array()
  }

  test("BMP header decode yields real width/height (top-down height is absolute)") {
    val f = Decode.decode(MediaRecord(1L, "image/bmp", bmp(320, 240)))
    assert((f.width, f.height, f.n_frames) === (320, 240, 1))
    val topDown = Decode.decode(MediaRecord(2L, "image/bmp", bmp(64, -128)))
    assert((topDown.width, topDown.height) === (64, 128))
  }

  test("WAV header decode yields sample count as n_frames") {
    // stereo 16-bit, 16 data bytes -> 16 / (2ch * 2B) = 4 samples/channel
    val f = Decode.decode(MediaRecord(3L, "audio/wav", wav(2, 16, 16)))
    assert(f.n_frames === 4)
    assert((f.width, f.height) === (0, 0))
  }

  /** A full 24bpp BMP with pixel data: `rows` are stored-order rows of
    * (b,g,r) pixels; stride pads each row to 4 bytes. */
  private def bmpWithPixels(width: Int, height: Int,
      rows: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val stride = (width * 3 + 3) / 4 * 4
    val b = ByteBuffer.allocate(54 + stride * rows.size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + stride * rows.size); b.putInt(0); b.putInt(54)
    b.putInt(40); b.putInt(width); b.putInt(height)
    b.putShort(1); b.putShort(24)     // planes, 24 bpp
    b.putInt(0)                        // BI_RGB
    b.putInt(stride * rows.size); b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
    rows.foreach { row =>
      val start = b.position()
      row.foreach { case (bl, g, r) =>
        b.put(bl.toByte).put(g.toByte).put(r.toByte) }
      b.position(start + stride)
    }
    b.array()
  }

  test("BMP resize: nearest-neighbor downsample with exact pixels and stride") {
    import graft.ops.Multimodal.Resize
    // 2x2 bottom-up: stored row 0 = bottom (pixels A B), row 1 = top (C D)
    val src = bmpWithPixels(2, 2, Seq(
      Seq((10, 11, 12), (20, 21, 22)),
      Seq((30, 31, 32), (40, 41, 42))))
    // downsample into a 1-px box -> 1x1; nearest source pixel is (0,0)
    val out = Resize.resizeBmp(src, 1).get
    val f = Decode.decode(MediaRecord(9L, "image/bmp", out))
    assert((f.width, f.height) === (1, 1))
    assert(out.length === 54 + 4)             // one 4-byte-aligned row
    assert(out.slice(54, 57).toSeq === Seq[Byte](10, 11, 12))
    // box >= image: geometry and every pixel byte survive unchanged
    val same = Resize.resizeBmp(src, 64).get
    val g = Decode.decode(MediaRecord(9L, "image/bmp", same))
    assert((g.width, g.height) === (2, 2))
    assert(same.slice(54, 54 + 6).toSeq === src.slice(54, 54 + 6).toSeq)
    assert(same.slice(62, 62 + 6).toSeq === src.slice(62, 62 + 6).toSeq)
    // non-BMP payloads take the metadata-only path
    assert(Resize.resizeBmp("not a bitmap".getBytes, 64).isEmpty)
    // malformed headers fall back instead of crashing the task: negative /
    // header-overlapping pixel offsets, absurd widths
    val badOff = bmpWithPixels(2, 2, Seq(Seq((1, 2, 3), (4, 5, 6)),
      Seq((7, 8, 9), (10, 11, 12))))
    badOff(10) = 0x9C.toByte; badOff(11) = 0xFF.toByte
    badOff(12) = 0xFF.toByte; badOff(13) = 0xFF.toByte // offset = -100
    assert(Resize.resizeBmp(badOff, 64).isEmpty)
    val overlap = bmpWithPixels(2, 2, Seq(Seq((1, 2, 3), (4, 5, 6)),
      Seq((7, 8, 9), (10, 11, 12))))
    overlap(10) = 10 // offset inside the header
    assert(Resize.resizeBmp(overlap, 64).isEmpty)
    val hugeW = bmpWithPixels(2, 2, Seq(Seq((1, 2, 3), (4, 5, 6)),
      Seq((7, 8, 9), (10, 11, 12))))
    hugeW(18) = 0xFF.toByte; hugeW(19) = 0xFF.toByte
    hugeW(20) = 0xFF.toByte; hugeW(21) = 0x7F.toByte // width = Int.MaxValue
    assert(Resize.resizeBmp(hugeW, 64).isEmpty)
  }

  test("thumbnail fit never upscales and respects the 64-px box") {
    import graft.ops.Multimodal.Resize
    assert(Resize.fit(640, 480, 64) === ((64, 48)))
    assert(Resize.fit(480, 640, 64) === ((48, 64)))
    assert(Resize.fit(32, 16, 64) === ((32, 16))) // no upscaling
    assert(Resize.fit(1000, 10, 64) === ((64, 1)))
  }

  test("unknown formats fall back to the deterministic stub") {
    val payload = "just some text bytes".getBytes
    val viaDispatch = Decode.decode(MediaRecord(4L, "image/unknown", payload))
    val viaStub = Multimodal.DecodeStub.decode(MediaRecord(4L, "image/unknown", payload))
    assert(viaDispatch === viaStub)
  }

  test("synthBmp/grayPixels round-trip is the identity (the property the m4 oracle leans on)") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val bmp = Multimodal.synthBmp(text)
    val px = Multimodal.grayPixels(bmp).get
    assert(px.length === Multimodal.PhashGrid * Multimodal.PhashGrid)
    // reproduce the raster definition directly: gray(p) = first md5 byte
    // of token (p mod n), row-major top-down
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = Array.tabulate(Multimodal.PhashGrid * Multimodal.PhashGrid) { p =>
      md.reset(); md.digest(toks(p % toks.length).getBytes("UTF-8"))(0) & 0xFF
    }
    assert(px.toSeq === expected.toSeq)
    // tokenless text rasters to all-zero, still readable
    assert(Multimodal.grayPixels(Multimodal.synthBmp("!!!")).get.forall(_ === 0))
  }

  test("phash pairs: identical rasters at hamming 0; noise raster pairs with nothing") {
    import spark.implicits._
    val g = Multimodal.PhashGrid
    // a structured raster (gradient + block), an identical copy, and a
    // decorrelated noise raster (LCG) whose DCT signs differ everywhere
    val base = Array.tabulate(g * g)(p => (p % g) * 8 + (p / g) / 2)
    val noise = {
      var s = 12345L
      Array.tabulate(g * g) { _ =>
        s = (s * 6364136223846793005L + 1442695040888963407L)
        ((s >>> 33) % 256).toInt
      }
    }
    val px = Seq(1L -> base, 2L -> base.clone(), 3L -> noise).toDF("doc_id", "px")
    val got = Multimodal.phashPairsFromPixels(px)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 0L)), s"identical rasters must pair at hamming 0: $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      s"the noise raster must not pair within hamming ${Multimodal.PhashHammingMax}: $got")
  }

  test("synthWav emits a well-formed PCM container; audio stats hand-check") {
    // "ab z": samples (97-96, 98-96, 32-96, 122-96)·256 = 256, 512, -16384, 6656
    val p = Multimodal.synthWav("ab z")
    def le16(off: Int): Int = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
    assert(new String(p, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(p, 8, 4, "US-ASCII") === "WAVE")
    assert(le16(20) === 1 && le16(22) === 1) // PCM, mono
    assert(le16(34) === 16 && le32(40) === 8) // 16-bit, 4 samples
    assert(le32(4) === 36 + 8 && p.length === 44 + 8)
    // the REAL header decoder agrees on the frame count
    val feats = Multimodal.Decode.decodeWav(
      Multimodal.MediaRecord(1L, "audio/wav", p))
    assert(feats.exists(_.n_frames === 4))
    // sample stats through the REAL distributed op (frame-level form):
    // peak = |−64·256| = 16384, sum_abs = 256+512+16384+6656 = 23808,
    // zero crossings at 512→−16384 and −16384→6656
    import spark.implicits._
    val got = Multimodal.audioStatsFrame(
        Seq((7L, "ab z"), (8L, ""), (9L, "é")).toDF("doc_id", "text"))
      .as[(Long, Int, Int, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((7L, 4, 16384, 23808L, 2L)))
    assert(got(1) === ((8L, 0, 0, 0L, 0L))) // empty payload: clean zeros
    // non-ASCII: cp 233 maps via %192 with NO int16 wrap — (233%192−96)·256
    assert(got(2) === ((9L, 1, 14080, 14080L, 0L)))
  }
}
