package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MediaCodecs
import graft.functions.MediaCodecs.{PpmCodec, VideoCodec, WavCodec}

/** The corrupt-attachment QUARANTINE policy (q135 + the multimodal
  * curation sink's decode leg): one malformed container must divert
  * ONE attachment with the decoder's own reason, never kill the job —
  * while the strict codecs keep failing loudly when called directly
  * (policy is the caller's statement, not a codec default).
  */
class QuarantineSpec extends SparkSpec {

  private val text = "hello quarantine world 12345"

  test("strict codecs still fail loudly when called directly") {
    def poisoned(b: Array[Byte]): Array[Byte] = {
      val c = b.clone(); c(0) = 'X'.toByte; c
    }
    assertThrows[IllegalArgumentException](
      PpmCodec.decode(poisoned(PpmCodec.encode(text))))
    assertThrows[IllegalArgumentException](
      WavCodec.decode(poisoned(WavCodec.encode(text))))
    assertThrows[IllegalArgumentException](
      VideoCodec.decodeSampledSums(poisoned(VideoCodec.encode(text))))
  }

  test("quarantining wraps contract violations as Left with the real message") {
    val safe = MediaCodecs.quarantining(PpmCodec.decode)
    val bad = PpmCodec.encode(text); bad(0) = 'X'.toByte
    assert(safe(bad) == Left("PPM: bad magic (want P6) at byte 0"))
    assert(safe(PpmCodec.encode(text)).map(_.width) == Right(text.length))
  }

  test("quarantining covers more corruption classes than the magic flip") {
    // truncation: the PPM raster loses its last byte
    val ppm = PpmCodec.encode(text).dropRight(1)
    val img = MediaCodecs.quarantining(PpmCodec.decode)(ppm)
    assert(img.left.exists(_.contains("raster truncated")))
    // a size-field lie: the RIFF header's declared size stops matching
    val wav = WavCodec.encode(text).dropRight(1)
    val aud = MediaCodecs.quarantining(WavCodec.decode)(wav)
    assert(aud.left.exists(_.contains("RIFF size")))
    // a frame-count lie: GVID declaring 9 frames when trained at 8
    val vid = VideoCodec.encode(text)
    vid(7) = 9.toByte // big-endian count's low byte: 8 -> 9
    val v = MediaCodecs.quarantining(VideoCodec.decodeSampledSums(_))(vid)
    assert(v.left.exists(_.contains("frame count 9 != expected 8")))
  }

  test("quarantining does NOT swallow non-contract failures") {
    val boom = MediaCodecs.quarantining[Int](_ =>
      throw new IllegalStateException("engine bug"))
    assertThrows[IllegalStateException](boom(Array[Byte](1)))
  }

  test("q135: a corrupt attachment never kills the job; healthy modalities still decode") {
    val out = graft.SparkEntry.queries("q135_quarantine_decode")(spark, sf0001)
      .localCheckpoint(true)
    // the corpus genuinely carries corrupt attachments...
    val nq = out.agg(sum(col("n_quarantined"))).head().getLong(0)
    assert(nq > 0, "fixture must contain corrupt attachments")
    // ...and every quarantined attachment carries the decoder's reason
    assert(out.filter(col("img_ok") === false &&
      col("img_reason").isNull).isEmpty)
    assert(out.filter(col("aud_ok") === false &&
      col("aud_reason").isNull).isEmpty)
    assert(out.filter(col("vid_ok") === false &&
      col("vid_reason").isNull).isEmpty)
    // a quarantined attachment never ships stats
    assert(out.filter(col("img_ok") === false &&
      col("img_r_sum").isNotNull).isEmpty)
    // a doc with one corrupt modality still decodes its healthy ones —
    // the per-modality poison classes (img %7=3, aud %7=5, vid %7=6)
    // guarantee mixed rows exist (e.g. doc 33: image healthy, audio
    // poisoned), which is the in-row proof quarantine is per
    // ATTACHMENT, never per doc
    val mixed = out.filter(col("n_quarantined") > 0 &&
      (coalesce(col("img_ok"), lit(false)) ||
        coalesce(col("aud_ok"), lit(false)) ||
        coalesce(col("vid_ok"), lit(false))))
    assert(!mixed.isEmpty,
      "a doc with a corrupt attachment must still process healthy modalities")
    out.unpersist()
  }
}
