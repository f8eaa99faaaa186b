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
      // events.ts has shipped as TIMESTAMP(NANOS) in some driver testdata
      // generations (Spark 4 refuses nanos by default: read as a ns-long
      // and convert — sub-microsecond bits are zero, so lossless) and as
      // TIMESTAMP(MICROS) in others (arrives as NTZ under Spark 4's
      // inferTimestampNTZ default). Normalize either to a session-zone
      // TIMESTAMP (session is pinned UTC in every entry point) so every
      // downstream operator and spec sees one stable type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-composed queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
