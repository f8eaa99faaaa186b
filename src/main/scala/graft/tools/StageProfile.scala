package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

import graft.SparkEntry

/** Cost-attribution profiler: runs one query warm, then once more under a
  * stage listener, and groups executor time by the stage's CALL SITE.
  *
  * Why call sites attribute cleanly here: the pipelines pin their
  * expensive internal passes with eager `localCheckpoint(true)` calls
  * (the shape-UDF pass `ScoredTagger.scala`, the waterfall legs
  * `LookupWaterfall.scala`, …), and each checkpoint materializes its own
  * stages DURING DataFrame construction with the checkpoint's source
  * line in the stage name — so "time in the shape UDF" vs "time in the
  * candidate joins" vs "time in the final window + projection" falls out
  * of the stage table without touching the query code. The
  * construction/materialize wall split is reported alongside: stages
  * after construction belong to the final (post-checkpoint) plan — the
  * join/window/projection tail.
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <queryName> [outJson]
  */
object StageProfile {
  private def materialize(df: DataFrame): Unit =
    df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).head()

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val out = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE OFF for this tool only: adaptive execution re-submits query
      // stages from its own thread pool, which stamps every SQL stage
      // with a CompletableFuture call site and destroys the attribution
      // this tool exists for. Bench/Verify keep AQE on; the absolute
      // numbers here are for SHARES, not headline timings.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    // two untimed warm-ups: same steady-state contract as Bench
    (1 to 2).foreach { _ =>
      spark.catalog.clearCache()
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => }
      System.gc()
    }

    // stageId -> (attribution site, wallMs); per-stage executor sums.
    // Attribution prefers the JOB's call site (propagated in job-start
    // local properties), falling back to the stage name: localCheckpoint
    // and broadcast-exchange stages execute on helper threads whose
    // STAGE names say CompletableFuture, but the job call site still
    // points at the source line that forced them.
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val stageSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val runMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val cpuMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    // (inputBytes, shuffleReadBytes, shuffleWriteBytes) — the signature
    // that maps an anonymous codegen stage back to its plan phase: the
    // scan stage has input>0, a join/agg map side writes shuffle, a
    // reduce side reads it
    val ioBytes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        // each QueryExecution (including every eager localCheckpoint's)
        // announces itself with the ACTION's call site as description —
        // the one attribution signal that survives helper-thread submission
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc.put(s.executionId, s.description)
        case _ =>
      }
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.flatMap(q => Option(q.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execDesc.get(id.toLong)))
          .orElse(p.flatMap(q => Option(q.getProperty("callSite.short"))))
        site.foreach(s => js.stageIds.foreach(id => stageSite.put(id, s)))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for { s <- info.submissionTime; c <- info.completionTime }
          yield c - s).getOrElse(-1L)
        // first graft frame of the submission stack: pinpoints which
        // source line built the RDD even when the stage NAME only says
        // which action consumed it
        val graftFrame = info.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("graft.tools."))
          .map(_.trim).getOrElse("")
        stages.put(info.stageId, (s"${info.name} | $graftFrame", ms))
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          runMs.merge(te.stageId, m.executorRunTime, Long.box(_) + _)
          cpuMs.merge(te.stageId, m.executorCpuTime / 1000000L, Long.box(_) + _)
          ioBytes.merge(te.stageId,
            (m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      }
    })

    spark.catalog.clearCache()
    System.gc()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir) // construction: dedup + checkpointed passes
    val tConstruct = (System.nanoTime() - t0) / 1e9
    val constructStages = stages.keySet().size // stages seen so far (approx; drained below)
    materialize(df) // the post-checkpoint plan: joins/window/projection
    val tTotal = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // drain listener events

    import scala.jdk.CollectionConverters._
    // group stages by call site (the trailing "at File.scala:line" of the
    // stage name); sum executor run time per site
    val rows = stages.asScala.toSeq.map { case (sid, (sname, wallMs)) =>
      val site = Option(stageSite.get(sid))
        .getOrElse(sname.split(" at ").lastOption.getOrElse(sname).trim)
      (sid, site, wallMs, runMs.getOrDefault(sid, 0L), cpuMs.getOrDefault(sid, 0L))
    }
    if (sys.env.contains("SPARK_GRAFT_PROFILE_DEBUG")) {
      rows.sortBy(_._1).foreach { case (sid, site, wall, run, cpu) =>
        val (in, sr, sw) = ioBytes.getOrDefault(sid, (0L, 0L, 0L))
        println(f"[profile-debug] stage=$sid%-4d run=${run}%7d ms  in=${in / 1048576}%5d MB  sRead=${sr / 1048576}%5d MB  sWrite=${sw / 1048576}%5d MB  site=$site  name=${stages.get(sid)._1}")
      }
      execDesc.asScala.toSeq.sortBy(_._1).foreach { case (id, d) =>
        println(s"[profile-debug] exec=$id desc=$d")
      }
    }
    val bySite = rows.groupBy(_._2).map { case (site, ss) =>
      (site, ss.size, ss.map(_._3).sum, ss.map(_._4).sum, ss.map(_._5).sum)
    }.toSeq.sortBy(-_._4)
    val totalRun = rows.map(_._4).sum.max(1L)

    println(f"[profile] $name construct=$tConstruct%.2f s total=$tTotal%.2f s (materialize=${tTotal - tConstruct}%.2f s) stages=${rows.size} (construction saw ~$constructStages)")
    println(f"[profile] ${"call site"}%-42s ${"stages"}%6s ${"wall ms"}%9s ${"exec ms"}%9s ${"cpu ms"}%9s ${"exec %"}%7s")
    bySite.foreach { case (site, n, wall, run, cpu) =>
      println(f"[profile] $site%-42s $n%6d $wall%9d $run%9d $cpu%9d ${100.0 * run / totalRun}%6.1f%%")
    }
    out.foreach { path =>
      val items = bySite.map { case (site, n, wall, run, cpu) =>
        s"""{"site":"$site","stages":$n,"wall_ms":$wall,"exec_ms":$run,"cpu_ms":$cpu,"exec_pct":${100.0 * run / totalRun}}"""
      }.mkString("[", ",", "]")
      val json =
        s"""{"query":"$name","sf":"$sfDir","construct_sec":$tConstruct,"total_sec":$tTotal,"sites":$items}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json + "\n")
      println(s"[profile] wrote $path")
    }
    spark.stop()
  }
}
