package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Production-depth BPE training timing — the evidence that merge cost
  * is FLAT in depth once learning moves to the in-memory incremental
  * trainer ([[graft.operators.Bpe.trainDeep]]).
  *
  * Two vocabularies, both derived from the corpus:
  *  - `word`: the q109 whitespace vocabulary. The synthetic corpus
  *    draws from ~31 distinct words, so the merge space EXHAUSTS at
  *    ~90 merges — correct trainer behavior (exhaustion is the q109
  *    early-stop contract), but too shallow to demonstrate depth.
  *  - `tri`: word-trigram units (adjacent word triples joined by '_'),
  *    thousands of distinct units at realistic symbol lengths — deep
  *    enough to sustain the full 500-merge chain the depth claim is
  *    about. Same trainer, same corpus, bigger inducible merge space.
  *
  * Reports, as one JSON line per vocabulary: the corpus/vocab pass
  * wall, the 500-merge loop wall, per-100-merge segment walls (the
  * flatness claim — segments must not grow with depth), and for
  * contrast the distributed per-merge loop at depth 25 extrapolated to
  * 500 (the driver-round-trip shape trainDeep replaces; running IT to
  * 500 is exactly the cost this tool exists to prove away).
  * Usage: `runMain graft.tools.BpeDeepBench [sfDir]`.
  */
object BpeDeepBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def wall[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // one untimed warm-up of the scan path
    Bpe.trainDeep(spark, dir, 1)

    // the q122 trigram-unit vocabulary (shared constructor in Bpe)
    def triVocab(): Seq[(String, Long)] = Bpe.triVocab(spark, dir)

    def report(tag: String, v: Seq[(String, Long)], tVocab: Double): Unit = {
      val depths = Seq(100, 200, 300, 400, 500)
      val walls = depths.map { k =>
        val (_, t) = wall(Bpe.trainInMemory(v, k))
        k -> t
      }
      val segs = walls.zip((0, 0.0) +: walls).map { case ((k, t), (_, tp)) =>
        k -> (t - tp)
      }
      val (steps500, t500) = wall(Bpe.trainInMemory(v, 500))
      val segJson = segs.map { case (k, t) =>
        f""""m${k - 100}_$k":$t%.3f"""
      }.mkString(",")
      println(
        f"""{"tool":"bpe_deep","vocab":"$tag","dir":"$dir",""" +
          f""""vocab_words":${v.size},"merges":${steps500.size},""" +
          f""""vocab_pass_sec":$tVocab%.3f,"train500_sec":$t500%.3f,""" +
          f""""seg_sec":{$segJson}}""")
    }

    val (vw, tw) = wall(Bpe.collectVocab(spark, dir))
    report("word", vw, tw)
    val (vt, tt) = wall(triVocab())
    report("tri", vt, tt)

    // the distributed loop's per-merge constant, measured at depth 25
    val (d25, tDist25) = wall(Bpe.learnSteps(spark, dir, 25))
    val perMerge = tDist25 / math.max(d25.size, 1)
    println(
      f"""{"tool":"bpe_deep","vocab":"word","dist25_sec":$tDist25%.3f,""" +
        f""""dist_per_merge_sec":$perMerge%.3f,""" +
        f""""dist500_extrapolated_sec":${perMerge * 500}%.1f}""")
    spark.stop()
  }
}
