package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tagger.{DrugTagger, LookupWaterfall}

/** Stream/batch parity for the streaming waterfall: tagging a text
  * stream against a static broadcast catalog must select the same
  * candidates the batch leg-priority tagger picks.
  */
class TaggerStreamSpec extends SparkSpec {

  private lazy val catalog = {
    import spark.implicits._
    Seq(
      ("paracetamol", "PARACETAMOL", "N02BE01"),
      ("cefalexin", "CEFALEXIN", "J01DB01"),
      ("amoxicillin trihydrate", "AMOXICILLIN TRIHYDRATE", "J01CA04"),
      ("ibuprofen", "IBUPROFEN", "M01AE01"))
      .toDF("key", "generic_name", "atc_code")
  }

  private val texts = Seq(
    (1L, "PARACETAMOL 500MG TAB"),     // exact
    (2L, "AMOXICILLIN 500 MG CAP"),    // token-prefix
    (3L, "CEFALEXIM 250MG"),           // fuzzy (lev 1)
    (4L, "SURGICAL GLOVES SIZE 7"))    // no probes match

  test("streaming waterfall matches the batch leg-priority tagger") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String)]
    stream.addData(texts: _*)
    val q = TaggerStream.tagStream(spark,
        stream.toDF().toDF("id", "text"), catalog)
      .writeStream.format("memory").queryName("tagstream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tagstream")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("key"), r.getAs[String]("atc_code"))).toMap

    val batch = DrugTagger.tagTexts(spark, texts.toDF("id", "text"), catalog,
        LookupWaterfall.Config()) // same scan-fuzzy semantics as the stream
      .filter(col("match_reason") =!= "no_match")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("key"), r.getAs[String]("atc_code"))).toMap

    assert(streamed == batch)
    assert(streamed(1L) == (("paracetamol", "N02BE01")))
    assert(streamed(3L) == (("cefalexin", "J01DB01")))
    assert(!streamed.contains(4L))
  }

  test("stream/batch parity holds over the sf0.01 corpus") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // the 4-row case above pins the legs individually; this runs the
    // SAME waterfall config over 500 real corpus texts against a
    // vocabulary catalog with a holdout (so every leg fires many times,
    // exercising tie-breaks and per-id state folding under volume)
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.01", "documents")
    val corpus = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val vocabCat = docs
      .select(explode(split(col("text"), " ")).as("key"))
      .distinct()
      .filter(!col("key").isin("vector", "spark", "scan", "slow", "small",
        "sort", "stream"))
      .select(col("key"), upper(col("key")).as("generic_name"),
        concat(lit("A"), substring(col("key"), 1, 5)).as("atc_code"))

    val stream = MemoryStream[(Long, String)]
    stream.addData(corpus: _*)
    val q = TaggerStream.tagStream(spark,
        stream.toDF().toDF("id", "text"), vocabCat)
      .writeStream.format("memory").queryName("tagstream_sf")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // reason labels differ by design (the stream emits "matched", the
    // batch tagger leg-specific reasons) — parity is on the SELECTION:
    // which key/atc wins per id
    val streamed = spark.table("tagstream_sf")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("key"), r.getAs[String]("atc_code"))).toMap

    val batch = DrugTagger.tagTexts(spark,
        corpus.toDF("id", "text"), vocabCat, LookupWaterfall.Config())
      .filter(col("match_reason") =!= "no_match")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("key"), r.getAs[String]("atc_code"))).toMap

    assert(streamed.size == batch.size)
    val diffs = (streamed.keySet ++ batch.keySet).toSeq.sorted.flatMap { id =>
      if (streamed.get(id) != batch.get(id))
        Some(s"id=$id stream=${streamed.get(id)} batch=${batch.get(id)}")
      else None
    }
    assert(diffs.isEmpty, s"\n${diffs.take(20).mkString("\n")}")
  }
}
