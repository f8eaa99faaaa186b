package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Sources

class PipelineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("sources: csv/tsv round-trip with pinned schema + glob concat") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-src").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Sources.writeCsv(df, s"$dir/part1")
    Sources.writeCsv(df.withColumn("id", $"id" + 2), s"$dir/part2")
    val back = Sources.csvGlob(spark, s"$dir/part*/*.csv", schema)
    assert(back.count() == 4)
    assert(back.schema == schema)
  }

  test("latestDatedFile picks the max ISO date") {
    val dir = Files.createTempDirectory("graft-dated")
    Seq("fda_drug_2025-01-03.csv", "fda_drug_2025-11-20.csv",
      "fda_drug_2025-02-14.csv", "other_2026-01-01.csv").foreach { n =>
      Files.writeString(dir.resolve(n), "x")
    }
    val got = Sources.latestDatedFile(dir.toString, "fda_drug", "csv")
    assert(got.exists(_.endsWith("fda_drug_2025-11-20.csv")))
    assert(Sources.latestDatedFile(dir.toString, "nope", "csv").isEmpty)
  }

  test("purgeOldDatedFiles keeps only the latest date per (name, ext) group") {
    val dir = Files.createTempDirectory("graft-purge")
    Seq("fda_drug_2025-01-03.csv", "fda_drug_2025-11-20.csv",
      "fda_drug_2025-02-14_extra.csv", "fda_drug_2025-11-20.parquet",
      "other_2026-01-01.csv", "undated.csv").foreach { n =>
      Files.writeString(dir.resolve(n), "x")
    }
    val res = Sources.purgeOldDatedFiles(dir.toString).requireClean()
    assert(res.deleted == 2) // the two older fda_drug .csv versions
    val left = dir.toFile.listFiles().map(_.getName).toSet
    assert(left == Set("fda_drug_2025-11-20.csv", "fda_drug_2025-11-20.parquet",
      "other_2026-01-01.csv", "undated.csv"))
  }

  test("purgeOldDatedFiles surfaces failed deletes instead of swallowing them") {
    // a stale file whose unlink fails (permissions, locks) must be
    // REPORTED — and requireClean must be loud — not silently skipped.
    // Injected failing rm: permission-denied is unreproducible as root.
    val dir = Files.createTempDirectory("graft-purge-fail")
    Seq("fda_drug_2025-01-03.csv", "fda_drug_2025-02-14.csv",
      "fda_drug_2025-11-20.csv").foreach { n =>
      Files.writeString(dir.resolve(n), "x")
    }
    val res = Sources.purgeOldDatedFiles(dir.toString,
      f => !f.getName.contains("2025-01-03") && f.delete())
    assert(res.deleted == 1) // 2025-02-14 went
    assert(res.failed.map(new java.io.File(_).getName) ==
      Seq("fda_drug_2025-01-03.csv"))
    val ex = intercept[IllegalArgumentException](res.requireClean())
    assert(ex.getMessage.contains("fda_drug_2025-01-03.csv"))
    // the stuck file is still on disk alongside the survivor
    val left = dir.toFile.listFiles().map(_.getName).toSet
    assert(left == Set("fda_drug_2025-01-03.csv", "fda_drug_2025-11-20.csv"))
  }

  test("reorderColumnAfter moves a column right after the target (P3)") {
    import spark.implicits._
    val df = Seq((1, "a", 2.0, true)).toDF("w", "x", "y", "z")
    assert(Sources.reorderColumnAfter(df, "w", "y").columns.toSeq ==
      Seq("w", "y", "x", "z"))
    // already in place / missing columns: no-op
    assert(Sources.reorderColumnAfter(df, "w", "x").columns.toSeq ==
      Seq("w", "x", "y", "z"))
    assert(Sources.reorderColumnAfter(df, "nope", "y").columns.toSeq ==
      Seq("w", "x", "y", "z"))
  }

  test("resolveTextColumn probes candidates in order; loud miss (runners.py:176-182)") {
    import spark.implicits._
    // first candidate hit
    assert(Sources.resolveTextColumn(
      Seq((1L, "x")).toDF("id", "raw_text")) == "raw_text")
    // later candidate hit — and probe ORDER wins over column order
    assert(Sources.resolveTextColumn(
      Seq((1L, "x", "y")).toDF("id", "description", "ITEM_DESCRIPTION"))
      == "ITEM_DESCRIPTION")
    // loud miss names the actual and tried columns
    val miss = intercept[IllegalArgumentException](
      Sources.resolveTextColumn(Seq((1L, "x")).toDF("id", "note")))
    assert(miss.getMessage.contains("No text column found"))
    assert(miss.getMessage.contains("note"))
    assert(miss.getMessage.contains("raw_text"))
  }

  test("requireColumns passes through or fails fast naming the table (prepare.py:57-59)") {
    import spark.implicits._
    val df = Seq((1L, "m", "r")).toDF("Molecule", "Route", "ATC Code")
    assert(Sources.requireColumns(df, "pnf.csv", "Molecule", "Route", "ATC Code")
      .columns.length == 3)
    val e = intercept[IllegalArgumentException](
      Sources.requireColumns(df.drop("Route"), "pnf.csv", "Molecule", "Route"))
    assert(e.getMessage.contains("pnf.csv"))
    assert(e.getMessage.contains("Route"))
    assert(e.getMessage.contains("Molecule")) // present-column listing
  }

  test("registry runs hooks in order and records phase metrics") {
    import spark.implicits._
    val reg = new PipelineRegistry
    var postRan = false
    reg.register(new Pipeline {
      val itemRefCode = "TestPipe"
      def prepareInputs(s: SparkSession): DataFrame =
        Seq((1L, "x"), (2L, "y")).toDF("id", "name")
      def matchRecords(s: SparkSession, prepared: DataFrame): DataFrame =
        prepared.filter($"id" === 1L)
      override def postRun(s: SparkSession, m: DataFrame): Unit = postRan = true
    })
    val (out, metrics) = reg.run(spark, "TestPipe")
    assert(out.count() == 1)
    assert(postRan)
    assert(metrics.map(_.phase) == Seq("pre_run", "prepare", "match", "post_run"))
    assert(metrics.find(_.phase == "match").exists(_.rows == 1L))
    intercept[IllegalArgumentException](reg.run(spark, "Missing"))
    out.unpersist()
  }

  test("registry materializes each phase once (metrics don't re-execute lineage)") {
    import org.apache.spark.sql.functions.{col, udf}
    import spark.implicits._
    // accumulator-counted UDF calls: the phase count used to run the
    // lineage once and the downstream consumer again (2-3x the work at
    // scale); with the persist-before-count fix each phase's UDF fires
    // exactly once per row across count + match + caller's collect
    val prepCalls = spark.sparkContext.longAccumulator("prepCalls")
    val matchCalls = spark.sparkContext.longAccumulator("matchCalls")
    val reg = new PipelineRegistry
    reg.register(new Pipeline {
      val itemRefCode = "OncePipe"
      def prepareInputs(s: SparkSession): DataFrame = {
        val acc = prepCalls // local copy so the closure skips `this`
        val f = udf { (x: Long) => acc.add(1L); x * 10 }
        Seq(1L, 2L, 3L).toDF("id").withColumn("v", f(col("id")))
      }
      def matchRecords(s: SparkSession, prepared: DataFrame): DataFrame = {
        val acc = matchCalls
        val g = udf { (x: Long) => acc.add(1L); x + 1 }
        prepared.withColumn("w", g(col("v")))
      }
    })
    val (out, _) = reg.run(spark, "OncePipe")
    assert(out.collect().length == 3) // the caller's "sink" read
    out.unpersist()
    assert(prepCalls.value == 3L,
      s"prepare lineage ran ${prepCalls.value / 3.0}x")
    assert(matchCalls.value == 3L,
      s"match lineage ran ${matchCalls.value / 3.0}x")
  }

  test("pass-through match phase keeps the shared cache alive") {
    import org.apache.spark.sql.functions.{col, udf}
    import spark.implicits._
    // when matchRecords returns `prepared` unchanged the two frames share
    // one logical plan; unpersisting prepared would evict matched's cache
    // too and the caller's sink would re-run the whole prepare lineage
    val prepCalls = spark.sparkContext.longAccumulator("passThroughCalls")
    val reg = new PipelineRegistry
    reg.register(new Pipeline {
      val itemRefCode = "PassThrough"
      def prepareInputs(s: SparkSession): DataFrame = {
        val acc = prepCalls
        val f = udf { (x: Long) => acc.add(1L); x * 10 }
        Seq(1L, 2L, 3L).toDF("id").withColumn("v", f(col("id")))
      }
      def matchRecords(s: SparkSession, prepared: DataFrame): DataFrame =
        prepared
    })
    val (out, _) = reg.run(spark, "PassThrough")
    assert(out.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "pass-through output lost its cache")
    assert(out.collect().length == 3)
    out.unpersist()
    assert(prepCalls.value == 3L,
      s"prepare lineage ran ${prepCalls.value / 3.0}x after pass-through")
  }

  test("partitioned parquet sink overwrites only the partitions it writes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dynpart").toString + "/t"
    Sources.writePartitionedParquet(
      Seq((1L, "a", "d1"), (2L, "b", "d2"), (3L, "c", "d3"))
        .toDF("id", "v", "day"), dir, "day")
    // re-run covering only d1/d2: d3's data must survive (dynamic mode);
    // static overwrite would have deleted it
    Sources.writePartitionedParquet(
      Seq((10L, "a2", "d1"), (20L, "b2", "d2"))
        .toDF("id", "v", "day"), dir, "day")
    val back = spark.read.parquet(dir)
      .select("id", "day").as[(Long, String)].collect().toSet
    assert(back == Set((10L, "d1"), (20L, "d2"), (3L, "d3")))
    // partition pruning reaches the file listing: one partition dir read
    val pruned = spark.read.parquet(dir).filter($"day" === "d3")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("append metrics sink accumulates rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-metrics").toString + "/m"
    val m1 = Seq(("r1", 10L)).toDF("run", "rows")
    Sources.appendMetrics(m1, dir)
    Sources.appendMetrics(m1.withColumn("rows", $"rows" + 1), dir)
    assert(spark.read.parquet(dir).count() == 2)
  }
}
