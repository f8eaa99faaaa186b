package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

import graft.SparkEntry

/** Diagnostic repeat-runner: executes one query K times in a row and
  * prints per-run wall time alongside the JVM's cumulative GC time delta
  * and the session's persistent-RDD count — separates "the query got
  * slower" from "the JVM was collecting garbage" and from "checkpoint
  * blocks are piling up". Written while chasing the streaky bench
  * variance where whole measurement windows (not single runs) degrade
  * 2-3x with no code change.
  *
  * Usage: runMain graft.tools.Repeat <sfDir> <queryName> [k]
  *
  * Findings from the round-7 investigation of the headline query's
  * historical 2-4x swings (BENCH_r06 recorded a 36 s outlier against a
  * ~10 s median): slow runs show ALL tasks of one stage uniformly
  * 10-20x slower with near-zero task GC time, normal code-cache
  * occupancy, and no persistent-RDD growth — i.e. not a plan change,
  * not a leak, not JIT eviction, but whole-JVM execution slowdown
  * windows (external CPU contention on a shared host, e.g. concurrent
  * builds). Bench's median-of-3 + reported spread is the right
  * mitigation; single-run or min-of-2 numbers from this box are not
  * trustworthy for regression detection.
  */
object Repeat {
  private def materialize(df: DataFrame): Unit =
    df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).head()

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** Used KB in the JIT code heaps — when the non-profiled nmethod heap
    * fills, HotSpot stops compiling and hot codegen stages run
    * interpreted (the uniform all-tasks-10x-slower signature).
    */
  private def codeCacheUsedKb(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed / 1024).sum
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // per-stage wall durations + per-task runtimes, to localize spikes
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for {s <- info.submissionTime; c <- info.completionTime}
          yield c - s).getOrElse(-1L)
        stages.add((info.stageId, ms))
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          tasks.add((te.stageId, te.taskInfo.duration, m.executorRunTime,
            m.jvmGCTime))
      }
    })
    var lastGc = gcMillis()
    val walls = Seq.newBuilder[Double]
    (1 to k).foreach { i =>
      stages.clear(); tasks.clear()
      val t0 = System.nanoTime()
      materialize(fn(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      val gcNow = gcMillis()
      Thread.sleep(300) // let listener events drain
      import scala.jdk.CollectionConverters._
      val byStage = tasks.asScala.toSeq.groupBy(_._1)
      val top = stages.asScala.toSeq.sortBy(-_._2).take(2).map { case (sid, ms) =>
        val ts = byStage.getOrElse(sid, Seq.empty)
        val durs = ts.map(_._2).sorted
        val med = if (durs.nonEmpty) durs(durs.size / 2) else -1L
        val mx = if (durs.nonEmpty) durs.last else -1L
        val mxRun = if (ts.nonEmpty) ts.map(_._3).max else -1L
        val mxGc = if (ts.nonEmpty) ts.map(_._4).max else -1L
        s"s$sid=${ms}ms(n=${ts.size},medTask=${med},maxTask=${mx},maxRun=${mxRun},maxTaskGc=${mxGc})"
      }.mkString(" ")
      println(f"[repeat] run=$i%-3d wall=$wall%7.2f s  gc_delta=${gcNow - lastGc}%6d ms  codecache=${codeCacheUsedKb() / 1024}%4d MB  $top")
      lastGc = gcNow
      walls += wall
    }
    // SPARK_GRAFT_REPEAT_OUT=<file>: append one JSON line per SESSION so
    // multi-session envelopes (the only trustworthy kind on this host —
    // see scaladoc) can be assembled machine-readably into the artifacts
    sys.env.get("SPARK_GRAFT_REPEAT_OUT").foreach { out =>
      val w = walls.result().sorted
      val line =
        s"""{"query":"$name","k":$k,"sf":"$dir","min":${w.head},"median":${w(w.size / 2)},"max":${w.last},"spread_ratio":${w.last / w.head},"walls":${w.mkString("[", ",", "]")}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      println(s"[repeat] appended summary to $out")
    }
    spark.stop()
  }
}
