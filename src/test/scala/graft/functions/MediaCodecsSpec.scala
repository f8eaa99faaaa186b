package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaCodecs.{PpmCodec, WavCodec}

/** Pure-JVM codec tests: header grammar, chunk walking, loud failure on
  * malformed bytes. The Spark-side plumbing over these codecs is covered
  * by OperatorSpec (typed decode path) and q51/q52 (DuckDB oracle).
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def ascii(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("PPM roundtrip reproduces per-channel sums") {
    val img = PpmCodec.decode(PpmCodec.encode("AB"))
    // 'A'=65, 'B'=66: r=65+66, g=(255-65)+(255-66), b=(455%256)+(462%256)
    assert(img.width == 2 && img.height == 1)
    assert(img.sumR == 131)
    assert(img.sumG == 2 * 255 - 131)
    assert(img.sumB == (7 * 65) % 256 + (7 * 66) % 256)
  }

  test("PPM histogram bins every pixel channel; shares the strict parser") {
    // 'A'=65 -> bins r: 65/32=2, g: 190/32=5, b: 199/32=6
    // 'B'=66 -> bins r: 2, g: 189/32=5, b: 206/32=6
    // '~'=126 -> bins r: 3, g: 129/32=4, b: (882%256=114)/32=3
    val h = PpmCodec.decodeHistogram(PpmCodec.encode("AB~"))
    assert(h.length == 24)
    assert(h.sum == 9, "every channel of every pixel lands in one bin")
    assert(h(2) == 2 && h(3) == 1)                    // R
    assert(h(8 + 5) == 2 && h(8 + 4) == 1)            // G
    assert(h(16 + 6) == 2 && h(16 + 3) == 1)          // B
    // the histogram path validates headers exactly like decode
    intercept[IllegalArgumentException] {
      PpmCodec.decodeHistogram(ascii("P6\n2 1\n255\n") ++ Array[Byte](1, 2))
    }
  }

  test("PPM parser handles multi-line comments and arbitrary whitespace") {
    val raster = Array[Byte](1, 2, 3, 4, 5, 6)
    val header = ascii("P6 # trailing\n#another comment\n  2\n#x\n\t1 \n 255 ")
    val img = PpmCodec.decode(header ++ raster)
    assert(img.width == 2 && img.height == 1)
    assert(img.sumR == 1 + 4 && img.sumG == 2 + 5 && img.sumB == 3 + 6)
  }

  test("PPM parser fails loudly on malformed input") {
    val ok = PpmCodec.encode("XYZ")
    // bad magic
    val badMagic = ok.clone(); badMagic(1) = '5'
    assert(intercept[IllegalArgumentException](PpmCodec.decode(badMagic))
      .getMessage.contains("magic"))
    // truncated raster
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode(ok.dropRight(1))).getMessage.contains("truncated"))
    // unsupported maxval
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode(ascii("P6\n1 1\n65535\n") ++ Array[Byte](0, 0, 0)))
      .getMessage.contains("maxval"))
    // header cut off mid-grammar
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode(ascii("P6\n2 "))).getMessage.nonEmpty)
  }

  test("WAV roundtrip reproduces sample stats and walks the LIST chunk") {
    val a = WavCodec.decode(WavCodec.encode("AB"))
    assert(a.sampleRate == 8000 && a.nSamples == 2)
    // samples: 257*65-32768 = -16063, 257*66-32768 = -15806
    assert(a.sumAbs == 16063L + 15806L)
    assert(a.maxSample == -15806)
  }

  test("WAV decoder fails loudly on malformed input") {
    val ok = WavCodec.encode("AB")
    val notRiff = ok.clone(); notRiff(0) = 'X'
    assert(intercept[IllegalArgumentException](WavCodec.decode(notRiff))
      .getMessage.contains("magic"))
    // declared RIFF size must match the payload
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(ok.dropRight(2))).getMessage.contains("size"))
    // stereo rejected: patch channels field (offset 22) and re-fix nothing
    val stereo = ok.clone(); stereo(22) = 2
    assert(intercept[IllegalArgumentException](WavCodec.decode(stereo))
      .getMessage.contains("channels"))
    // no data chunk: truncate after fmt, fix up the RIFF size
    val cut = java.util.Arrays.copyOfRange(ok, 0, 36)
    val bb = java.nio.ByteBuffer.wrap(cut)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, cut.length - 8)
    assert(intercept[IllegalArgumentException](WavCodec.decode(cut))
      .getMessage.contains("data"))
  }

  test("encoders enforce the ASCII corpus contract instead of truncating") {
    // the q51/q52 oracles recompute stats from CODE POINTS while charAt
    // works in UTF-16 units — non-ASCII text must fail at encode time,
    // not silently diverge from the oracle via `& 0xff` truncation
    for (bad <- Seq("café", "中文", "a😀b")) {
      assert(intercept[IllegalArgumentException](PpmCodec.encode(bad))
        .getMessage.contains("ASCII"))
      assert(intercept[IllegalArgumentException](WavCodec.encode(bad))
        .getMessage.contains("ASCII"))
    }
    // plain ASCII still encodes
    assert(PpmCodec.decode(PpmCodec.encode("ok!")).width == 3)
    assert(WavCodec.decode(WavCodec.encode("ok!")).nSamples == 3)
  }
}
