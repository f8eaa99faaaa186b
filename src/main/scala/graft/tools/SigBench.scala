package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Ws

/** Micro-bench answering round 9's q80 promote-or-close question: inside
  * q80's dominant stage (scan → tokenize/explode → md5 → integer parse →
  * 64 conditional partial sums, one fused codegen pipeline — 59% of the
  * query's executor time per profile_q80.json), how much do the 64
  * per-bit sum columns themselves cost vs the tokenize+hash front half?
  *
  * Method: run the SAME front half under k ∈ {0, 8, 64} conditional-sum
  * columns (k=0 is a bare count over the parsed hash ints — the floor of
  * the pipeline without any vote accumulation; k=64 is q80's real
  * shape). The k=64 − k=0 delta is the ceiling on what ANY packed-long /
  * bit_count aggregate rewrite could recover, because such a rewrite
  * still pays the whole front half.
  *
  * Usage: runMain graft.tools.SigBench <sfDir> [runs]
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // q80's exact front half (Dedup.scala q80_simhash_pairs): distinct
    // tokens, md5, four 32-bit integer groups parsed once
    def tokInts: DataFrame = graft.core.CpuSpread.byKey(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(split(trim(lower(col("text"))), Ws.Plus))).as("tok"))
      .withColumn("h", md5(col("tok")))
      .select(col("doc_id") +: (0 until 4).map(g =>
        conv(substring(col("h"), g * 8 + 1, 8), 16, 10)
          .cast("long").as(s"g$g")): _*)

    def sums(k: Int): DataFrame = {
      val cols =
        if (k == 0) Seq(count(lit(1)).as("n"))
        else (0 until k).map { b =>
          val g = col(s"g${b / 16}")
          val bit = shiftright(g, (15 - (b % 16)) * 2 % 32).bitwiseAND(lit(1L))
          sum(when(bit === 1L, 1L).otherwise(-1L)).as(s"v$b")
        }
      tokInts.groupBy("doc_id").agg(cols.head, cols.tail: _*)
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.agg(bit_xor(xxhash64(struct(col("doc_id"))))).head()
      (System.nanoTime() - t0) / 1e9
    }

    Seq(0, 8, 64).foreach { k =>
      time(sums(k)) // warm-up
      val ts = (1 to runs).map(_ => { System.gc(); time(sums(k)) })
      println(f"[sigbench] k=$k%-3d min=${ts.min}%6.2f s  median=${ts.sorted.apply(ts.size / 2)}%6.2f s  runs=$ts")
    }
    spark.stop()
  }
}
