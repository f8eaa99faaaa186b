package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named SparkEntry query stage-by-stage + dump its plan.
  * Usage: runMain graft.tools.Profile <sfDir> <queryName>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("==== PLAN ====")
    df.explain("formatted")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"==== run $i: ${n} rows in ${(System.nanoTime() - t0) / 1e9}%s sec")
    }
    spark.stop()
  }
}
