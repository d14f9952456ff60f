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

  test("unknown formats fall back to the deterministic stub") {
    val payload = "just some text bytes".getBytes
    val viaDispatch = Decode.decode(MediaRecord(4L, "image/unknown", payload))
    val viaStub = Multimodal.DecodeStub.decode(MediaRecord(4L, "image/unknown", payload))
    assert(viaDispatch === viaStub)
  }
}
