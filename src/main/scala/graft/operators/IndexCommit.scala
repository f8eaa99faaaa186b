package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Cross-process commit protocol for the persisted index family
  * ([[BandIndex]] / [[PostingsIndex]] / [[BloomIndex]] / [[FpIndex]] /
  * [[ClusterIndex]]).
  *
  * `ensure()` is synchronized within one JVM, but two PROCESSES sharing
  * SPARK_GRAFT_INDEX_DIR could interleave a delete/saveAsTable/sidecar
  * sequence run directly against the final directory and corrupt each
  * other's in-progress build. This helper removes that window: the
  * build lands in a process-unique TEMP SIBLING (table + every sidecar
  * + the `_GRAFT_FP` freshness marker), and the only mutation of the
  * final path is one atomic rename — a reader can observe the old
  * complete index, no index, or the new complete index, never a half-
  * built one. If a concurrent builder wins the rename race, the loser
  * just discards its temp: builds are idempotent (same input → same
  * index), so the winner's artifact is the same artifact.
  *
  * At 100 TB this role is played by a table format's atomic snapshot
  * commit; the rename is the same contract at this harness's scale.
  */
object IndexCommit {

  /** Run `build(tmpName, tmpPath)` — which must write the bucketed
    * table AS `tmpName` at `tmpPath` plus all sidecars INCLUDING
    * `_GRAFT_FP` — then atomically publish `tmpPath` as `path`. The
    * caller re-registers its real table name afterwards.
    */
  def commitBuild(spark: SparkSession, name: String, path: Path)
      (build: (String, Path) => Unit): Unit = {
    val tmpPath = Paths.get(
      path.toString + ".build-" + ProcessHandle.current().pid())
    val tmpName = name + "_building"
    deleteTree(tmpPath)
    spark.sql(s"DROP TABLE IF EXISTS `$tmpName`")
    build(tmpName, tmpPath)
    // the temp table is EXTERNAL (option("path")), so dropping the
    // catalog entry leaves the files for the rename
    spark.sql(s"DROP TABLE IF EXISTS `$tmpName`")
    deleteTree(path)
    try Files.move(tmpPath, path, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // a concurrent builder published first; its idempotent build is
      // byte-equivalent, so losing the race is success with extra steps
      case _: java.nio.file.FileAlreadyExistsException => deleteTree(tmpPath)
      case _: java.nio.file.FileSystemException => deleteTree(tmpPath)
    }
  }

  private[operators] def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(p.toFile)
    }
}
