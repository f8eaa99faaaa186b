package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.MediaCodecs.{PpmCodec, WavCodec}

/** Property tests: encode/decode roundtrips must reproduce the
  * text-derived stats for ANY printable-ASCII string (the corpus
  * contract), not just the handful of example cases in MediaCodecsSpec.
  */
object MediaCodecsPropSpec extends Properties("MediaCodecs") {

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.stringOfN(n, Gen.chooseNum(32, 126).map(_.toChar)))

  property("ppm roundtrip = per-channel closed forms") =
    forAll(asciiText) { t =>
      val img = PpmCodec.decode(PpmCodec.encode(t))
      val codes = t.map(_.toInt & 0xff)
      img.width == t.length &&
        img.height == 1 &&
        img.sumR == codes.map(_.toLong).sum &&
        img.sumG == 255L * t.length - codes.map(_.toLong).sum &&
        img.sumB == codes.map(c => ((7 * c) & 0xff).toLong).sum
    }

  property("wav roundtrip = PCM closed forms") =
    forAll(asciiText) { t =>
      val a = WavCodec.decode(WavCodec.encode(t))
      val codes = t.map(_.toInt & 0xff)
      val samples = codes.map(c => 257 * c - 32768)
      a.sampleRate == 8000 &&
        a.nSamples == t.length &&
        a.sumAbs == samples.map(s => math.abs(s.toLong)).sum &&
        a.maxSample == (if (samples.isEmpty) 0 else samples.max)
    }

  property("ppm decoder rejects any truncation of a valid payload") =
    forAll(asciiText.suchThat(_.nonEmpty), Gen.chooseNum(1, 8)) { (t, cut) =>
      val ok = PpmCodec.encode(t)
      scala.util.Try(PpmCodec.decode(ok.dropRight(cut))).isFailure
    }
}
