package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{BandIndex, FpIndex}

/** The continuous curation capstone ([[CurationSink]]): per-batch
  * verdicts must compose the three per-doc stages exactly — span splice
  * against GROWING history (seeded corpus + earlier batches), decontam
  * against the stationary benchmark, LM gate against the FROZEN
  * generation model — with the LM leg checked against an independent
  * driver-side replay (including the frozen-model add-1 path for
  * unseen bigrams, which no oracle-gated in-corpus query exercises).
  */
class CurationSinkSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf0001

  // the generation corpus: q115's s0 boundary (benchmark slice held out)
  private def trainDocs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("bucket", BandIndex.ingestBucket)
      .filter(col("bucket") < 250)
      .select("doc_id", "text")

  /** Independent LM replay: train counts + vocab from the collected
    * generation texts, score a text with add-1 smoothing in plain
    * Scala, derive q111's exact 20th-percentile cutoff.
    */
  private object Replay {
    private val WordRe = "[a-z0-9]+".r
    private def words(t: String): Seq[String] =
      WordRe.findAllIn(t.toLowerCase).toSeq
    private val trainTexts: Seq[String] =
      trainDocs.select("text").as[String].collect().toSeq
    private val c12 = scala.collection.mutable.Map.empty[(String, String), Long]
    private val c1 = scala.collection.mutable.Map.empty[String, Long]
    private val vocabSet = scala.collection.mutable.Set.empty[String]
    trainTexts.foreach { t =>
      val ws = words(t)
      vocabSet ++= ws
      ws.zip(ws.drop(1)).foreach { bg =>
        c12(bg) = c12.getOrElse(bg, 0L) + 1
        c1(bg._1) = c1.getOrElse(bg._1, 0L) + 1
      }
    }
    val v: Long = vocabSet.size.toLong

    /** (n_bigrams, lm_micro_nats, avg_mn) of a text vs the frozen model. */
    def score(t: String): (Long, Long, Long) = {
      val ws = words(t)
      val mns = ws.zip(ws.drop(1)).map { bg =>
        math.round(math.log(
          (c12.getOrElse(bg, 0L) + 1).toDouble /
            (c1.getOrElse(bg._1, 0L) + v).toDouble) * 1e6)
      }
      val n = mns.size.toLong
      if (n == 0) (0L, 0L, 0L)
      else {
        val tot = mns.sum
        // Spark's `div` truncates toward zero — Scala / matches
        (n, tot, tot / n)
      }
    }

    /** q111's exact cutoff: percentile_disc(0.2) = the smallest score
      * whose cumulative rank reaches 20% of the scorable train docs.
      */
    val cutoff: Long = {
      val scores = trainTexts.map(score).filter(_._1 > 0)
        .map { case (n, tot, avg) => avg }.sorted
      scores((math.ceil(0.2 * scores.size) - 1).toInt)
    }
  }

  // benchmark slice text (decontam fixture) + a train doc text (splice
  // fixture), both deterministic picks
  private def benchText: String =
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("bucket", BandIndex.ingestBucket)
      .filter(col("bucket") >= 250 && length(trim(col("text"))) >= 200)
      .orderBy("doc_id").select("text").as[String].head()
  private def trainText: String =
    trainDocs.filter(length(trim(col("text"))) >= 200)
      .orderBy("doc_id").select("text").as[String].head()

  // remix of corpus-common words: high-probability bigrams, but no
  // >= 39-char exact substring of any one train doc is guaranteed —
  // asserted via its n_spans below
  private val remixA =
    "spark table query value data line group batch value spark query " +
      "data table line spark group batch data value query table spark " +
      "line data group value batch table query spark data line value"
  private val gibberish =
    "zzqx9 qqz7w wvvk3 jjy8p zzqx9 hhm2n ppr4t qqz7w xxu6d wvvk3 " +
      "kkc5f jjy8p zzqx9 ppr4t hhm2n"

  test("stream verdicts compose splice, decontam, and the frozen LM gate") {
    val name = "graft_curation_sink_e2e"
    val root = java.nio.file.Files.createTempDirectory("graft-curation")
    // history = the generation corpus's fingerprints (seeded build)
    FpIndex.buildIndex(spark, trainDocs, name, root.resolve("fp"))
    val art = CurationSink.artifactsOf(trainDocs)
    assert(art.cutoffMicroNats == Replay.cutoff,
      "frozen cutoff must equal the independent percentile replay")
    val outDir = root.resolve("log").toString
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = CurationSink.attach(stream.toDF().toDF("doc_id", "text"),
      name, dir, art, outDir, root.resolve("ckpt").toString)
    try {
      stream.addData((9001L, remixA), (9002L, gibberish),
        (9003L, trainText))
      q.processAllAvailable()
      stream.addData((9010L, benchText), (9011L, remixA + " tail words"))
      q.processAllAvailable()
    } finally q.stop()
    val got = CurationSink.verdicts(spark, outDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 5)

    // docA: no history span, scorable remix — the LM leg must equal
    // the independent frozen-model replay exactly
    val a = got(9001L)
    assert(a.getAs[Long]("n_spans") == 0L &&
      a.getAs[String]("clean_text") == remixA.trim)
    val (anb, amn, aavg) = Replay.score(remixA.trim)
    assert(a.getAs[Long]("n_bigrams") == anb &&
      a.getAs[Long]("lm_micro_nats") == amn &&
      a.getAs[Long]("avg_mn") == aavg,
      s"docA LM ${a} vs replay ($anb, $amn, $aavg)")
    assert(a.getAs[Boolean]("kept") == (aavg >= Replay.cutoff &&
      !a.getAs[Boolean]("contaminated")))

    // docB: every bigram unseen by the frozen model — the add-1 path:
    // each scores ln((0+1)/(c1+v)); checked value-exact via the replay
    val b = got(9002L)
    val (bnb, bmn, bavg) = Replay.score(gibberish.trim)
    assert(b.getAs[Long]("n_bigrams") == bnb &&
      b.getAs[Long]("lm_micro_nats") == bmn &&
      b.getAs[Long]("avg_mn") == bavg,
      s"docB LM ${b} vs replay ($bnb, $bmn, $bavg)")
    assert(bavg < Replay.cutoff && !b.getAs[Boolean]("kept"),
      "gibberish must score far below the generation cutoff")

    // docC: a full copy of a history doc — the splice stage must
    // engage against the SEEDED index
    val c = got(9003L)
    assert(c.getAs[Long]("n_spans") >= 1L &&
      c.getAs[Long]("n_chars_removed") > 0L &&
      c.getAs[String]("clean_text") != trainText.trim,
      s"history duplicate must be spliced: $c")

    // docD: benchmark text — decontaminated on the spliced text
    val d = got(9010L)
    assert(d.getAs[Boolean]("contaminated") && !d.getAs[Boolean]("kept"))
    assert(d.getAs[Long]("n_hit").toDouble /
      d.getAs[Long]("n_sh").toDouble >= CurationSink.Theta)

    // docE (batch 2): duplicates docA from batch 1 — the append made
    // batch 1 history, so the cross-BATCH span is spliced
    val e = got(9011L)
    assert(e.getAs[Long]("n_spans") >= 1L &&
      e.getAs[Long]("n_chars_removed") > 100L &&
      e.getAs[String]("clean_text").length < remixA.length,
      s"cross-batch duplicate must be spliced: $e")

    // pointer gate: a fully-committed batch replays as a no-op
    assert(!CurationSink.applyBatch(
      Seq((9001L, remixA)).toDF("doc_id", "text"), 0L, name, dir, art,
      outDir))
  }
}
