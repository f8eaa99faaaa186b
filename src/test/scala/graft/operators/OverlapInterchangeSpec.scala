package graft.operators

import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Sources

/** q75 (JSONL interchange) and q76 (source-overlap matrix): the adversarial
  * roundtrip cases the synthetic corpus doesn't contain, the FAILFAST
  * contract, and the overlap matrix's set-algebra invariants.
  */
class OverlapInterchangeSpec extends SparkSpec {

  test("ORC roundtrip (q98 path) preserves nulls, empty strings and unicode") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType)))
    val rows = Seq(
      Row(1L, "plain words", "en"),
      Row(2L, "", "en"), // empty string is NOT null
      Row(3L, "line one\nline two\ttabbed", null),
      Row(4L, "unicode: café 中文 😀 quote\"backslash\\", "mix"),
      Row(5L, null, "de"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-adv").toString
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(schema).orc(dir)
      .collect().sortBy(_.getLong(0))
    back.zip(rows.sortBy(_.getLong(0))).foreach { case (g, w) =>
      assert(g == w, s"ORC roundtrip diverged: $g vs $w")
    }
  }

  test("JSONL roundtrip preserves nulls, empty strings, newlines and unicode") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType)))
    val rows = Seq(
      Row(1L, "plain words", "en"),
      Row(2L, "", "en"), // empty string is NOT null
      Row(3L, "line one\nline two\ttabbed", null), // escaped framing chars
      Row(4L, "unicode: café 中文 😀 quote\"backslash\\", "mix"),
      Row(5L, null, "de"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-adv").toString
    Sources.writeJsonl(df, dir)
    // one record per LINE survives embedded newlines (the framing claim)
    val lineCount = spark.read.textFile(dir).count()
    assert(lineCount == rows.size.toLong)
    val back = Sources.readJsonl(spark, dir, schema)
      .collect().sortBy(_.getLong(0))
    val want = rows.sortBy(_.getLong(0))
    back.zip(want).foreach { case (g, w) =>
      assert(g == w, s"roundtrip diverged: $g vs $w")
    }
  }

  test("JSONL read is FAILFAST: a corrupt line fails the read loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-00000.json"),
      "{\"id\":1,\"text\":\"ok\"}\n{not json at all\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val ex = intercept[SparkException] {
      Sources.readJsonl(spark, dir, schema).collect()
    }
    assert(ex.getMessage != null)
  }

  test("q76 overlap matrix obeys its set algebra and bounded fanout") {
    val got = graft.SparkEntry.queries("q76_source_overlap")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val nSources = graft.core.Tables(spark, sf0001, "documents")
      .select("source").distinct().count()
    assert(got.length <= nSources * (nSources - 1) / 2)
    got.foreach { case (a, b, shared, na, nb, j) =>
      assert(a < b, s"pair order: $a vs $b")
      assert(shared >= 1 && shared <= math.min(na, nb),
        s"shared $shared outside [1, min($na,$nb)] for ($a,$b)")
      assert(j > 0.0 && j <= 1.0, s"jaccard $j for ($a,$b)")
      assert(j == shared.toDouble / (na + nb - shared).toDouble)
    }
    // totals are per-source constants: every pair row quoting source X
    // must agree on X's shingle-set size
    val totals = got.flatMap { case (a, b, _, na, nb, _) =>
      Seq(a -> na, b -> nb)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    totals.foreach { case (s, ns) =>
      assert(ns.size == 1, s"inconsistent totals for $s: $ns")
    }
    // bounded fanout: the join key's multiplicity is the number of
    // sources containing the shingle — never more than the source count
    val perShingle = graft.core.Tables(spark, sf0001, "documents")
      .select(col("source"),
        explode(split(trim(col("text")), "[ \t\n\f\r]+")).as("w"))
      .groupBy("w").agg(countDistinct("source").as("nsrc"))
      .agg(max("nsrc")).head().getLong(0)
    assert(perShingle <= nSources)
  }
}
