package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Parquet scans carry their own schema; Catalyst pushes filters/projections
  * into the scan, so every query should `.select` only what it needs and let
  * pushdown do the rest (verified via `.explain("formatted")` in specs).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS), which Spark 4 refuses by default;
      // read it as a ns-long and convert (sub-microsecond bits are zero in
      // the driver-generated data, so this is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-composed queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
