package graft.tools

import graft.tagger.Scoring

/** Microbenchmark for the candidate-rank row function — the body of the
  * one Scala UDF in q26's hot selection stage ([[graft.tagger
  * .ScoredTagger]] rankUdf). Measures steady-state ns/row over a mix of
  * the three genericsMatch outcomes (exact / substring / combo) plus a
  * reject, which is the population the real stage sees.
  *
  * Combined with the stage-level numbers from [[StageProfile]] and the
  * candidate-row count, this bounds how much of the headline query a
  * native Catalyst Expression could possibly win back — the data the
  * SURVEY §4 "promote hot UDFs to Expression" decision was waiting for.
  *
  * Usage: runMain graft.tools.RankBench [n]
  */
object RankBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val cands = Array(
      Scoring.Candidate("PARACETAMOL", "N02BE01", "TABLET",
        referenceText = "PARACETAMOL"),
      Scoring.Candidate("SODIUM PLUS", "A12CA01", "TABLET",
        referenceText = "SODIUM PLUS"),
      Scoring.Candidate("BANANA + DATA", "X01AB02", "SYRUP",
        referenceText = "BANANA + DATA"),
      Scoring.Candidate("UNRELATED", "Z99ZZ99", "VIAL",
        referenceText = "UNRELATED"))
    val generics = Set("PARACETAMOL", "SODIUM", "BANANA", "DATA")
    val forms = Set("TABLET")
    val stripped = List("paracetamol", "sodium")
    def pass(): Long = {
      var acc = 0L
      var i = 0
      while (i < n) {
        val c = cands(i & 3)
        val r = Scoring.candidateRank(c, forms, generics,
          isSingleDrug = true, isCombination = false, isIvSolution = false,
          strippedGenerics = stripped)
        acc += r.map(_.mp.toLong).getOrElse(-1L)
        i += 1
      }
      acc
    }
    // warm-up for C2, then 3 timed passes; report the best (the UDF runs
    // inside long-lived executor JVMs, so steady-state is the number that
    // matters)
    pass(); pass()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val acc = pass()
      val dt = System.nanoTime() - t0
      (dt, acc)
    }
    val best = times.map(_._1).min
    println(f"[rankbench] n=$n best_ns_per_row=${best.toDouble / n}%.1f (checksum ${times.head._2})")

    // ---- in-plan cost: the same function under a real Scala UDF over a
    // DataFrame with q26's argument shapes (string/array/map columns), so
    // the Catalyst<->Scala conversion overhead — usually the dominant UDF
    // cost, and invisible to the tight loop above — is included. The
    // baseline pass hashes the same columns WITHOUT the UDF; the delta
    // per row is what a native Expression could actually win back.
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]") // single core: per-row cost, undiluted
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = 500000
    val df = spark.range(m).select(
      (col("id") % 4).cast("int").as("pick"),
      array(lit("PARACETAMOL"), lit("SODIUM"), lit("BANANA"), lit("DATA")).as("gens"),
      array(lit("TABLET")).as("forms"),
      array(lit("paracetamol"), lit("sodium")).as("stripped"))
      .localCheckpoint(true)
    val inPlanUdf = udf((pick: Int, gens: Seq[String], forms: Seq[String],
        stripped: Seq[String]) =>
      Scoring.candidateRank(cands(pick & 3), forms.toSet, gens.toSet,
        isSingleDrug = true, isCombination = false, isIvSolution = false,
        strippedGenerics = stripped.toList).map(_.mp).getOrElse(-1))
      .asNondeterministic()
    def time(c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // project first (nondeterministic exprs may not sit inside an
        // aggregate), then count the projected column
        df.select(c.as("r")).agg(count(col("r"))).head()
        System.nanoTime() - t0
      }
      runs.min.toDouble
    }
    time(col("pick")) // warm both paths
    time(inPlanUdf(col("pick"), col("gens"), col("forms"), col("stripped")))
    val base = time(when(size(col("gens")) + size(col("forms")) +
      size(col("stripped")) + col("pick") > 0, 1))
    val withUdf = time(
      inPlanUdf(col("pick"), col("gens"), col("forms"), col("stripped")))
    println(f"[rankbench] in_plan m=$m base_ms=${base / 1e6}%.0f udf_ms=${withUdf / 1e6}%.0f udf_ns_per_row=${(withUdf - base) / m}%.1f")
    spark.stop()
  }
}
