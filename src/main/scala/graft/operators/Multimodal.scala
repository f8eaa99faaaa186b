package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.MediaCodecs

/** Multimodal-column plumbing: treat media as opaque bytes + typed metadata,
  * with decode / frame-sample / feature-extract as per-partition transforms.
  *
  * Three oracle-checked queries: q50 does deterministic frame sampling
  * over byte ranges (the explode shape); q51/q52 run REAL pure-JVM
  * decoders ([[graft.functions.MediaCodecs]]: strict P6/PPM header
  * grammar, RIFF/WAVE chunk walking) over payloads minted from the
  * corpus — text -> encode -> bytes -> parse -> stats, with DuckDB
  * recomputing the expected stats from the characters. The typed
  * binary Dataset path lives in [[MediaPipeline]].
  */
object Multimodal {

  /** Typed media record: opaque payload + metadata, as a real dataset row. */
  final case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])

  /** The WIDE multimodal row (q133): text plus each modality as a
    * nullable opaque binary column — the interleaved-document data
    * model a multimodal pretraining corpus ships as one table.
    */
  final case class MultimodalRecord(doc_id: Long, text: String,
      image: Option[Array[Byte]], audio: Option[Array[Byte]],
      video: Option[Array[Byte]])
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
      n_frames: Int, first_byte: Int, checksum: Long)

  /** Stubbed decode/feature-extract: per-partition (mapPartitions batch
    * shape, like a codec that amortizes init per batch). The decode step a
    * real deployment would swap in is deterministic-fake here (no codecs in
    * the container).
    */
  object MediaPipeline {
    def extract(spark: SparkSession, media: DataFrame): DataFrame = {
      import spark.implicits._
      media.as[MediaRecord].mapPartitions { it =>
        // per-partition init (real codecs would open here, once per batch)
        it.map { m =>
          val n = m.payload.length
          var ck = 0L
          var i = 0
          while (i < n) { ck = ck * 31 + (m.payload(i) & 0xff); i += 1 }
          MediaFeatures(m.media_id, m.mime, n, (n + 255) / 256,
            if (n > 0) m.payload(0) & 0xff else -1, ck)
        }
      }.toDF()
    }

    /** documents.text re-cast as fake opaque media payloads. */
    def fakeMedia(spark: SparkSession, dir: String): DataFrame =
      Tables(spark, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("text/plain").as("mime"),
          col("text").cast("binary").as("payload"))

    /** documents.text minted into REAL binary PPM payloads (one pixel per
      * character) — the synthetic corpus's image column.
      */
    def ppmMedia(spark: SparkSession, dir: String): DataFrame = {
      import spark.implicits._
      Tables(spark, dir, "documents").select("doc_id", "text")
        .as[(Long, String)]
        .map { case (id, text) =>
          MediaRecord(id, "image/x-portable-pixmap",
            MediaCodecs.PpmCodec.encode(text))
        }.toDF()
    }

    final case class ImageFeatures(media_id: Long, width: Int, height: Int,
        sum_r: Long, sum_g: Long, sum_b: Long)

    /** Real image decode in the batch shape: parses each PPM payload with
      * the strict header grammar and emits per-channel stats. Same
      * mapPartitions contract as [[extract]] — a heavier codec would
      * open once per partition.
      */
    def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
      import spark.implicits._
      media.as[MediaRecord].mapPartitions { it =>
        it.map { m =>
          val img = MediaCodecs.PpmCodec.decode(m.payload)
          ImageFeatures(m.media_id, img.width, img.height,
            img.sumR, img.sumG, img.sumB)
        }
      }.toDF()
    }

    final case class MediaFrame(media_id: Long, frame_idx: Int,
        frame: Array[Byte], frame_hash: Long)
    final case class ResizedMedia(media_id: Long, mime: String,
        orig_bytes: Int, resized: Array[Byte])

    /** Video-style frame sampling: every `stride`-th fixed-size block of
      * the payload becomes one frame row (decode stubbed as a byte-range
      * slice — a real deployment swaps the slicer for a codec keyframe
      * reader; the EXPLODE SHAPE, per-frame hashing and row schema are
      * the production plumbing). flatMap keeps it streaming — no
      * per-media materialization of all frames.
      */
    def sampleFrames(spark: SparkSession, media: DataFrame,
        frameBytes: Int = 256, stride: Int = 2): DataFrame = {
      import spark.implicits._
      media.as[MediaRecord].flatMap { m =>
        val n = m.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, n)
          val frame = java.util.Arrays.copyOfRange(m.payload, from, until)
          var h = 1125899906842597L
          frame.foreach(b => h = h * 31 + (b & 0xff))
          MediaFrame(m.media_id, f, frame, h)
        }
      }.toDF()
    }

    /** Image-resize-shaped transform: deterministic 1/factor byte
      * decimation stands in for pixel resampling (no codecs in the
      * container). The mapPartitions batch shape is the real part: the
      * `init` callback runs ONCE PER PARTITION (where a real codec/
      * model handle would open), which MediaPipelineSpec asserts via an
      * accumulator — the contract that makes expensive decoder init
      * amortize over rows instead of paying per row.
      */
    def resize(spark: SparkSession, media: DataFrame, factor: Int,
        init: () => Unit = () => ()): DataFrame = {
      import spark.implicits._
      media.as[MediaRecord].mapPartitions { it =>
        init() // once per partition: codec / model handle open
        it.map { m =>
          val out = Array.newBuilder[Byte]
          var i = 0
          while (i < m.payload.length) { out += m.payload(i); i += factor }
          ResizedMedia(m.media_id, m.mime, m.payload.length, out.result())
        }
      }.toDF()
    }
  }

  /** Attachments that arrive CORRUPTED under [[mintWide]]'s poison
    * rule — deliberate, deterministic, and known to the oracle by
    * construction. The rule is PER MODALITY (image corrupt iff
    * doc_id % 7 = 3, audio iff % 7 = 5, video iff % 7 = 6) so docs
    * carrying BOTH a corrupt and a healthy attachment exist — the
    * shape that proves quarantine is per attachment, never per doc.
    * Poisoning flips the first payload byte to 'X', which kills each
    * codec's magic check: the cheapest corruption that is still REAL
    * (the decoder genuinely parses poisoned bytes and throws its own
    * contract error).
    */
  val CorruptMod = 7L
  val CorruptImgRem = 3L
  val CorruptAudRem = 5L
  val CorruptVidRem = 6L

  private def poison(b: Array[Byte]): Array[Byte] = {
    val c = b.clone(); c(0) = 'X'.toByte; c
  }

  /** ONE minting body for the wide multimodal record — q133 (clean),
    * q135 (deliberately corrupted), and the curation-sink fixtures all
    * arrive through it, so the arrival moduli (image %3=0, audio %4=1,
    * video %5=2) and the corruption rule cannot drift between the
    * batch queries and the stream. Minting is per-row mapPartitions
    * (codec init amortized per batch); corruption poisons the ENCODED
    * bytes, so downstream decoders face genuinely malformed containers,
    * not a flag.
    */
  private[graft] def mintWide(s: SparkSession, docs: DataFrame,
      corrupt: Boolean): org.apache.spark.sql.Dataset[MultimodalRecord] = {
    import s.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          def mint(enc: String => Array[Byte], rem: Long): Array[Byte] = {
            val b = enc(text)
            if (corrupt && id % CorruptMod == rem) poison(b) else b
          }
          MultimodalRecord(id, text,
            if (id % 3 == 0)
              Some(mint(MediaCodecs.PpmCodec.encode, CorruptImgRem)) else None,
            if (id % 4 == 1)
              Some(mint(MediaCodecs.WavCodec.encode, CorruptAudRem)) else None,
            if (id % 5 == 2)
              Some(mint(MediaCodecs.VideoCodec.encode, CorruptVidRem)) else None)
        }
      }
  }

  /** The q119 image-feature derivation as oracle CTE text — PPM
    * pixels re-derived from the CHARACTERS through the minting codec's
    * closed form (pixel r = code, g = 255-code, b = 7*code mod 256 —
    * q51's grammar) and binned into the 24-dim channel histogram
    * `f(doc_id, v)`. ONE text shared by q119 (retrieval) and q121
    * (SemDeDup via the persisted image ClusterIndex) so the feature
    * definition cannot drift between the two compositions.
    */
  private[operators] val ImageFeatureCtes: String =
    """codes AS (
      |  SELECT doc_id, list_transform(range(1, len(text) + 1),
      |           i -> unicode(substr(text, i, 1))) AS cs
      |  FROM documents),
      |f AS (SELECT doc_id,
      |        flatten([
      |          list_transform(generate_series(0, 7),
      |            b -> len(list_filter(cs, c -> c // 32 = b))),
      |          list_transform(generate_series(0, 7),
      |            b -> len(list_filter(cs, c -> (255 - c) // 32 = b))),
      |          list_transform(generate_series(0, 7),
      |            b -> len(list_filter(cs, c -> ((7 * c) % 256) // 32 = b)))
      |        ]) AS v
      |      FROM codes)""".stripMargin

  /** The q126 audio-feature derivation as oracle CTE text — PCM
    * samples re-derived from the CHARACTERS through the minting
    * codec's closed form (sample = 257*code − 32768, always negative
    * for 7-bit codes, so |sample| = 32768 − 257*code — q52's grammar)
    * and folded into the 8-frame energy envelope `fa(doc_id, v)`
    * (1-based sample i of n lands in frame ((i−1)*8)//n —
    * [[graft.functions.MediaCodecs.WavCodec.decodeEnvelope]]'s rule).
    * Shared with [[Clustering]]'s q126 so the feature definition
    * cannot drift from the decoder.
    */
  private[operators] val AudioFeatureCtes: String =
    """acodes AS (
      |  SELECT doc_id, len(text) AS n,
      |    list_transform(range(1, len(text) + 1),
      |      i -> unicode(substr(text, i, 1))) AS cs
      |  FROM documents),
      |fa AS (SELECT doc_id,
      |        list_transform(generate_series(0, 7),
      |          fr -> CAST(coalesce(list_sum(list_transform(
      |                  list_filter(range(1, n + 1),
      |                    i -> ((i - 1) * 8) // n = fr),
      |                  i -> 32768 - 257 * cs[i])), 0) AS BIGINT)) AS v
      |      FROM acodes)""".stripMargin

  /** The q129 video-feature derivation as oracle CTE text — the
    * frame-SAMPLED spatiotemporal sums re-derived from the CHARACTERS:
    * frame k covers 0-based chars [k·n//8, (k+1)·n//8) (the minting
    * container's floor rule), only frames {0,2,4,6} are sampled
    * (stride 2 — [[graft.functions.MediaCodecs.VideoCodec
    * .decodeSampledSums]]), and each sampled frame contributes its
    * exact per-channel pixel sums through the PPM closed form
    * (r = code, g = 255−code, b = 7·code mod 256 — q51's grammar):
    * `fv(doc_id, v)`, 12 BIGINTs. Shared with [[Clustering]]'s q129 so
    * the feature definition cannot drift from the decoder.
    */
  private[operators] val VideoFeatureCtes: String = {
    def inFrame =
      "i -> (i - 1) >= (fr * n) // 8 AND (i - 1) < ((fr + 1) * n) // 8"
    def ch(expr: String) =
      s"""CAST(coalesce(list_sum(list_transform(list_filter(range(1, n + 1),
         |        $inFrame),
         |        i -> $expr)), 0) AS BIGINT)""".stripMargin
    s"""vcodes AS (
       |  SELECT doc_id, len(text) AS n,
       |    list_transform(range(1, len(text) + 1),
       |      i -> unicode(substr(text, i, 1))) AS cs
       |  FROM documents),
       |fv AS (SELECT doc_id,
       |    flatten(list_transform([0, 2, 4, 6], fr -> [
       |      ${ch("cs[i]")},
       |      ${ch("255 - cs[i]")},
       |      ${ch("(7 * cs[i]) % 256")}])) AS v
       |  FROM vcodes)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- deterministic frame sampling + per-frame content hash
    QueryDef(
      "q50_media_frames",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(0, cast(floor((n_chars - 1) / 128) as int))"))
              .as("frame_idx"))
          .select(col("doc_id"), col("frame_idx"),
            md5(expr("substring(text, frame_idx * 128 + 1, 128)")).as("frame_md5"))
          .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, frame_idx,
             |  md5(substr(text, frame_idx * 128 + 1, 128)) AS frame_md5
             |FROM (SELECT doc_id, text,
             |        unnest(generate_series(0, CAST(floor((n_chars - 1) / 128) AS INT)))
             |          AS frame_idx
             |      FROM documents) t
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // ---- real PPM decode: text -> P6 bytes -> strict parser -> channel sums
    QueryDef(
      "q51_image_decode",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val img = MediaCodecs.PpmCodec.decode(
                MediaCodecs.PpmCodec.encode(text))
              (id, img.width, img.height, img.sumR, img.sumG, img.sumB)
            }
          }
          .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
          .orderBy("doc_id")
      },
      Some("""WITH codes AS (
             |  SELECT doc_id, len(text) AS n,
             |    list_transform(range(1, len(text) + 1),
             |      i -> unicode(substr(text, i, 1))) AS cs
             |  FROM documents)
             |SELECT doc_id, n AS width, 1 AS height,
             |  CAST(list_sum(cs) AS BIGINT) AS sum_r,
             |  CAST(255 * n - list_sum(cs) AS BIGINT) AS sum_g,
             |  CAST(list_sum(list_transform(cs, c -> (7 * c) % 256)) AS BIGINT)
             |    AS sum_b
             |FROM codes ORDER BY doc_id""".stripMargin)),

    /* Image SIMILARITY retrieval over REAL decoded features — the
     * multimodal estate composed with the similarity estate (image
     * near-dup/retrieval is a first-class pretraining-data curation
     * need: CLIP-style dedup runs exactly this shape with learned
     * embeddings). The feature extractor is the q51 decode path taken
     * further: each PPM payload is PARSED (strict P6 grammar) and its
     * pixels binned into a 24-dim integer channel histogram (8 bins ×
     * R/G/B) inside one mapPartitions pass — decode + feature-extract
     * stay map-side and per-partition-amortized, the production codec
     * contract. Retrieval is q40's exact shape on the integer features:
     * 8 query images broadcast onto the corpus scan, EXACT int64 dot
     * products (no floats — cross-engine bit-exact), top-3 per query by
     * (dot DESC, n_id). The only shuffle carries candidate rows into
     * the per-query rank window. The oracle re-derives the histograms
     * from the CHARACTERS through the codec's closed form (pixel r =
     * code, g = 255−code, b = 7·code mod 256 — q51's minting grammar),
     * so a decoder drift, a binning drift, and a ranking drift all flip
     * the hash.
     */
    QueryDef(
      "q119_image_similarity",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val feats = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              (id, MediaCodecs.PpmCodec.decodeHistogram(
                MediaCodecs.PpmCodec.encode(text)))
            }
          }.toDF("media_id", "v")
        val q = feats.filter(col("media_id") < 8)
          .select(col("media_id").as("q_id"), col("v").as("qv"))
        val dot = aggregate(zip_with(col("qv"), col("v"), (x, y) => x * y),
          lit(0L), (a, x) => a + x)
        val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("n_id"))
        feats.join(broadcast(q), col("media_id") =!= col("q_id"))
          .select(col("q_id"), col("media_id").as("n_id"), dot.as("dot"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("q_id", "rank", "n_id", "dot")
          .orderBy("q_id", "rank")
      },
      Some("WITH " + ImageFeatureCtes + """,
             |qs AS (SELECT doc_id AS q_id, v AS qv FROM f WHERE doc_id < 8),
             |cand AS (SELECT qs.q_id, f.doc_id AS n_id,
             |           CAST(list_sum(list_transform(generate_series(1, 24),
             |             i -> qs.qv[i] * f.v[i])) AS BIGINT) AS dot
             |         FROM qs JOIN f ON f.doc_id <> qs.q_id)
             |SELECT q_id, rank, n_id, dot FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id
             |    ORDER BY dot DESC, n_id) AS rank FROM cand) t
             |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    // ---- real WAV decode: text -> RIFF bytes -> chunk walker -> PCM stats
    QueryDef(
      "q52_audio_decode",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val a = MediaCodecs.WavCodec.decode(
                MediaCodecs.WavCodec.encode(text))
              (id, a.sampleRate, a.nSamples, a.sumAbs, a.maxSample)
            }
          }
          .toDF("doc_id", "sample_rate", "n_samples", "sum_abs", "max_sample")
          .orderBy("doc_id")
      },
      // sample = 257*code - 32768 < 0 for 7-bit codes, so
      // abs(sample) = 32768 - 257*code; the oracle folds that closed form
      Some("""WITH codes AS (
             |  SELECT doc_id, len(text) AS n,
             |    list_transform(range(1, len(text) + 1),
             |      i -> unicode(substr(text, i, 1))) AS cs
             |  FROM documents)
             |SELECT doc_id, 8000 AS sample_rate, n AS n_samples,
             |  CAST(32768 * n - 257 * list_sum(cs) AS BIGINT) AS sum_abs,
             |  CAST(257 * list_max(cs) - 32768 AS INT) AS max_sample
             |FROM codes ORDER BY doc_id""".stripMargin)),

    /* The WIDE typed multimodal record — the brief's data model
     * stated directly: one row per document with each modality as a
     * NULLABLE opaque binary column (image/audio/video under the
     * capstones' arrival moduli — any subset present), decoded in ONE
     * pass that touches ONLY the attachments a row actually carries
     * (the Option.map sparse-decode shape; at 100 TB the decode cost
     * is Σ present-attachment bytes, not rows × modalities). The
     * typed path is real: a Dataset[MultimodalRecord] with
     * Option[Array[Byte]] attachment fields, built and consumed
     * through case-class Encoders, mapPartitions both ways (codec
     * init amortized per batch). Evidence columns are each codec's
     * exact integer stats; the oracle re-derives every one from the
     * characters through the three closed forms — so the minting, the
     * three strict decoders, and the null pattern are all under one
     * hash.
     */
    QueryDef(
      "q133_multimodal_records",
      (s, dir) => {
        import s.implicits._
        val recs = mintWide(s, Tables(s, dir, "documents"), corrupt = false)
        recs.mapPartitions { it =>
          it.map { r =>
            val img = r.image.map(MediaCodecs.PpmCodec.decode)
            val aud = r.audio.map(MediaCodecs.WavCodec.decode)
            val vid = r.video.map(MediaCodecs.VideoCodec.decodeSampledSums(_))
            (r.doc_id, r.image.isDefined, r.audio.isDefined,
              r.video.isDefined, img.map(_.sumR), aud.map(_.sumAbs),
              vid.map(_.sum))
          }
        }.toDF("doc_id", "has_image", "has_audio", "has_video",
            "img_r_sum", "aud_abs_sum", "vid_all_sum")
          .orderBy("doc_id")
      },
      Some("""WITH mcodes AS (
             |  SELECT doc_id, len(text) AS n,
             |    list_transform(range(1, len(text) + 1),
             |      i -> unicode(substr(text, i, 1))) AS cs
             |  FROM documents)
             |SELECT doc_id,
             |  doc_id % 3 = 0 AS has_image,
             |  doc_id % 4 = 1 AS has_audio,
             |  doc_id % 5 = 2 AS has_video,
             |  CASE WHEN doc_id % 3 = 0
             |    THEN CAST(coalesce(list_sum(cs), 0) AS BIGINT) END AS img_r_sum,
             |  CASE WHEN doc_id % 4 = 1
             |    THEN CAST(32768 * n - 257 * coalesce(list_sum(cs), 0) AS BIGINT)
             |    END AS aud_abs_sum,
             |  CASE WHEN doc_id % 5 = 2
             |    THEN CAST(coalesce(list_sum(list_transform([0, 2, 4, 6], fr ->
             |      coalesce(list_sum(list_transform(list_filter(range(1, n + 1),
             |        i -> (i - 1) >= (fr * n) // 8 AND (i - 1) < ((fr + 1) * n) // 8),
             |        i -> 255 + (7 * cs[i]) % 256)), 0))), 0) AS BIGINT)
             |    END AS vid_all_sum
             |FROM mcodes ORDER BY doc_id""".stripMargin)),

    /* The QUARANTINE policy for corrupt attachments — the bad-record
     * stage a 100-TB ingest places in front of every modal estate.
     * q133's wide record arrives with DELIBERATELY corrupted
     * attachments ([[mintWide]]'s PER-MODALITY poison rule: the image
     * corrupt iff doc_id % 7 = 3, the audio iff % 7 = 5, the video iff
     * % 7 = 6 — first byte flipped, killing each codec's magic check,
     * and the per-modality classes mean docs carrying both a corrupt
     * AND a healthy attachment exist), and each present attachment is
     * decoded
     * through [[graft.functions.MediaCodecs.quarantining]]: a corrupt
     * attachment is DIVERTED — per-modality ok flag false, the
     * decoder's OWN failure message as the reason column, stats null —
     * while the doc's OTHER modalities are still processed and the doc
     * keeps flowing (the stated rule: quarantine is per ATTACHMENT,
     * never per doc, never per job). n_quarantined counts the doc's
     * diverted attachments. The oracle knows the corrupt ids by
     * construction and re-derives the healthy stats through the three
     * closed forms, so the poison rule, the Either seam, the reason
     * strings (the decoders' real messages, not re-derived constants),
     * and the sparse null pattern are all under one hash. QuarantineSpec
     * pins the job-survival claim on more corruption classes
     * (truncation, size-field lies) and that the strict codecs still
     * fail loudly when called directly.
     */
    QueryDef(
      "q135_quarantine_decode",
      (s, dir) => {
        import s.implicits._
        val safeImg = MediaCodecs.quarantining(MediaCodecs.PpmCodec.decode)
        val safeAud = MediaCodecs.quarantining(MediaCodecs.WavCodec.decode)
        val safeVid = MediaCodecs.quarantining(
          MediaCodecs.VideoCodec.decodeSampledSums(_))
        mintWide(s, Tables(s, dir, "documents"), corrupt = true)
          .mapPartitions { it =>
            it.map { r =>
              val img = r.image.map(safeImg)
              val aud = r.audio.map(safeAud)
              val vid = r.video.map(safeVid)
              (r.doc_id,
                r.image.isDefined, r.audio.isDefined, r.video.isDefined,
                img.map(_.isRight), aud.map(_.isRight), vid.map(_.isRight),
                img.flatMap(_.left.toOption), aud.flatMap(_.left.toOption),
                vid.flatMap(_.left.toOption),
                img.flatMap(_.toOption).map(_.sumR),
                aud.flatMap(_.toOption).map(_.sumAbs),
                vid.flatMap(_.toOption).map(_.sum),
                Seq(img, aud, vid).flatten.count(_.isLeft))
            }
          }
          .toDF("doc_id", "has_image", "has_audio", "has_video",
            "img_ok", "aud_ok", "vid_ok",
            "img_reason", "aud_reason", "vid_reason",
            "img_r_sum", "aud_abs_sum", "vid_all_sum", "n_quarantined")
          .orderBy("doc_id")
      },
      Some("""WITH mcodes AS (
             |  SELECT doc_id, len(text) AS n,
             |    list_transform(range(1, len(text) + 1),
             |      i -> unicode(substr(text, i, 1))) AS cs
             |  FROM documents)
             |SELECT doc_id,
             |  doc_id % 3 = 0 AS has_image,
             |  doc_id % 4 = 1 AS has_audio,
             |  doc_id % 5 = 2 AS has_video,
             |  CASE WHEN doc_id % 3 = 0 THEN doc_id % 7 <> 3 END AS img_ok,
             |  CASE WHEN doc_id % 4 = 1 THEN doc_id % 7 <> 5 END AS aud_ok,
             |  CASE WHEN doc_id % 5 = 2 THEN doc_id % 7 <> 6 END AS vid_ok,
             |  CASE WHEN doc_id % 3 = 0 AND doc_id % 7 = 3
             |    THEN 'PPM: bad magic (want P6) at byte 0' END AS img_reason,
             |  CASE WHEN doc_id % 4 = 1 AND doc_id % 7 = 5
             |    THEN 'WAV: bad magic (want RIFF)' END AS aud_reason,
             |  CASE WHEN doc_id % 5 = 2 AND doc_id % 7 = 6
             |    THEN 'GVID: bad magic (want GVID)' END AS vid_reason,
             |  CASE WHEN doc_id % 3 = 0 AND doc_id % 7 <> 3
             |    THEN CAST(coalesce(list_sum(cs), 0) AS BIGINT) END AS img_r_sum,
             |  CASE WHEN doc_id % 4 = 1 AND doc_id % 7 <> 5
             |    THEN CAST(32768 * n - 257 * coalesce(list_sum(cs), 0) AS BIGINT)
             |    END AS aud_abs_sum,
             |  CASE WHEN doc_id % 5 = 2 AND doc_id % 7 <> 6
             |    THEN CAST(coalesce(list_sum(list_transform([0, 2, 4, 6], fr ->
             |      coalesce(list_sum(list_transform(list_filter(range(1, n + 1),
             |        i -> (i - 1) >= (fr * n) // 8 AND (i - 1) < ((fr + 1) * n) // 8),
             |        i -> 255 + (7 * cs[i]) % 256)), 0))), 0) AS BIGINT)
             |    END AS vid_all_sum,
             |  CAST((CASE WHEN doc_id % 3 = 0 AND doc_id % 7 = 3 THEN 1 ELSE 0 END)
             |     + (CASE WHEN doc_id % 4 = 1 AND doc_id % 7 = 5 THEN 1 ELSE 0 END)
             |     + (CASE WHEN doc_id % 5 = 2 AND doc_id % 7 = 6 THEN 1 ELSE 0 END)
             |    AS INT) AS n_quarantined
             |FROM mcodes ORDER BY doc_id""".stripMargin))
  )
}
