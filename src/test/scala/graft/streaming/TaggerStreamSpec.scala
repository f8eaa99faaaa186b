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
}
