package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted Lloyd cluster assignment — the [[BandIndex]] /
  * [[PostingsIndex]] / [[BloomIndex]] / [[FpIndex]] "build once, probe
  * forever" pattern applied to the clustering layer.
  *
  * q104 re-learns the k-means cells in-query on every run;
  * profile_q104.json put that Lloyd chain at 66% of the query. In a
  * deployment the assignment is a curated artifact: learned once per
  * embedding-corpus generation, then served to every downstream
  * consumer (SemDeDup pruning, balanced sampling, per-cell budgets).
  * This object persists exactly that — (vec_id, cid, v, nrm), the
  * assignment JOINED with the full-precision vectors — as a parquet
  * table bucketed by `cid`, which is the within-cell pair join's key:
  * q113's self-join reads BOTH sides from the bucketed scan with no
  * exchange ([[ClusterIndexSpec]] pins the plan).
  *
  * Freshness and restart follow the house contract verbatim, except
  * the `_GRAFT_FP` fingerprint covers `embeddings.parquet` (this
  * index's source), not `documents.parquet`. Fingerprint written last,
  * so a half-built index reads as stale, never as valid.
  */
object ClusterIndex {

  /** Deployment-tunable ([[IndexCommit.numBuckets]]). */
  def NumBuckets: Int = IndexCommit.numBuckets

  def indexRoot: String = IndexCommit.indexRoot

  def tableNameFor(dir: String): String =
    IndexCommit.tableName("graft_cluster_asg_", dir)

  private def indexPath(dir: String): Path =
    Paths.get(indexRoot, tableNameFor(dir))

  /** Freshness = `embeddings.parquet` metadata (this index's source,
    * not `documents.parquet`) + the Lloyd parameters the assignment was
    * learned under — a param change makes the old index read as stale,
    * never as valid (the PostingsIndex ":sidecar-v3" discipline).
    */
  def fingerprint(dir: String): String =
    IndexCommit.sourceFingerprint(dir, "embeddings.parquet") +
      ":" + Clustering.paramsTag

  private def register(spark: SparkSession, name: String, path: Path): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(
      s"""CREATE TABLE `$name`
         |  (vec_id BIGINT, cid BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE)
         |USING PARQUET
         |CLUSTERED BY (cid) SORTED BY (cid, vec_id) INTO $NumBuckets BUCKETS
         |LOCATION '${path.toString}'""".stripMargin)
  }

  /** Ensure the assignment index for `dir` exists, is fresh, and is in
    * this session's catalog; returns the table name. Warm cost: a
    * catalog lookup + an O(#files) fingerprint. Cold cost: one Lloyd
    * run — paid once per embedding-corpus generation, NOT per query.
    */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val name = tableNameFor(dir)
    val path = indexPath(dir)
    val fp = fingerprint(dir)
    val fpFile = path.resolve("_GRAFT_FP")
    val validOnDisk = Files.exists(fpFile) &&
      Files.readString(fpFile).trim == fp
    if (spark.catalog.tableExists(name) && validOnDisk) name
    else if (validOnDisk) { register(spark, name, path); name }
    else {
      // build into a temp sibling + atomic publish ([[IndexCommit]]) so
      // a concurrent process never observes a half-built index
      IndexCommit.commitBuild(spark, name, path) { (tn, tp) =>
        Clustering.assignmentWithVectors(spark, dir)
          .repartition(NumBuckets, col("cid"))
          .write.format("parquet")
          .bucketBy(NumBuckets, "cid")
          .sortBy("cid", "vec_id")
          .option("path", tp.toString)
          .saveAsTable(tn)
        Files.writeString(tp.resolve("_GRAFT_FP"), fp)
      }
      register(spark, name, path)
      name
    }
  }
}
