package graft.operators

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.Lake

/** Cross-process commit protocol + shared filesystem plumbing for the
  * persisted index family ([[BandIndex]] / [[PostingsIndex]] /
  * [[BloomIndex]] / [[FpIndex]] / [[ClusterIndex]]).
  *
  * `ensure()` is synchronized within one JVM, but two PROCESSES sharing
  * SPARK_GRAFT_INDEX_DIR could interleave a delete/saveAsTable/sidecar
  * sequence run directly against the final directory and corrupt each
  * other's in-progress build. This helper removes that window: the
  * build lands in a process-unique TEMP SIBLING (table + every sidecar
  * + the `_GRAFT_FP` freshness marker), and the only mutation of the
  * final path is one delete + atomic rename — a reader OPENING the
  * index observes the old complete index, no index, or the new
  * complete index, never a half-built one. (A scan already in flight
  * against the old files can still lose them to the delete — closing
  * that needs snapshot isolation, which at 100 TB a table format's
  * atomic snapshot commit provides; the rename is the same
  * open-time contract at this harness's scale.) If a concurrent
  * builder wins the rename race, the loser just discards its temp:
  * builds are idempotent (same input → same index), so the winner's
  * artifact is the same artifact.
  *
  * All marker and publish I/O goes through [[graft.core.Lake]]
  * (Hadoop `FileSystem`), so the same protocol runs against `file://`,
  * HDFS, and object stores — see Lake's per-store portability
  * contract (on stores without atomic rename, correctness rests on
  * the marker-written-LAST rule, which this protocol already keeps).
  * The scratch JANITOR ([[purgeStaleScratch]]) deliberately stays on
  * `java.io` primitives: scratch trees are host-local by construction
  * (their liveness test is a local `ProcessHandle` check), so a
  * remote-filesystem janitor would be meaningless.
  */
object IndexCommit {

  /** Shared index root for every persisted index type. */
  def indexRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "/tmp/graft-band-index")

  /** Deployment-tunable bucket count shared by every persisted index
    * ([[BandIndex]]/[[PostingsIndex]]/[[BloomIndex]]/[[FpIndex]]/
    * [[ClusterIndex]]). Default 32 = local[32]'s shuffle-partition
    * count, so batch-side shuffles land exactly in the index layout; a
    * 1000-executor deployment sets `SPARK_GRAFT_INDEX_BUCKETS` to its
    * own parallelism — the primary scaling knob for index fan-in. The
    * value participates in every index's `_GRAFT_FP` fingerprint (via
    * [[sourceFingerprint]]), so changing it makes existing indexes read
    * as STALE — one rebuild under the new layout — never as a
    * bucket-spec mismatch on append or a silently mis-bucketed probe.
    * The system property is the in-process test seam; the env var is
    * the deployment surface.
    */
  def numBuckets: Int =
    sys.props.get("graft.index.buckets")
      .orElse(sys.env.get("SPARK_GRAFT_INDEX_BUCKETS"))
      .map(_.trim.toInt).getOrElse(32)

  private[operators] def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** One table name per (index type prefix, corpus directory). */
  private[operators] def tableName(prefix: String, dir: String): String =
    prefix + md5hex(Paths.get(dir).toAbsolutePath.normalize.toString).take(12)

  /** File-metadata fingerprint of `dir/file` (file or directory of part
    * files): name/length/mtime per file — an O(#files) listing, no data
    * scan, invalidates on any rewrite because mtimes move. Callers
    * append a PARAMS TAG (algorithm constants / layout version) so an
    * index built under old parameters reads as stale, never as valid —
    * the PostingsIndex ":sidecar-v3" discipline. The bucket count is
    * tagged HERE, once for every index type: every fingerprint
    * derives from this function, so a [[numBuckets]] change stales
    * every index uniformly.
    */
  private[operators] def sourceFingerprint(dir: String, file: String): String = {
    val entries = Lake.fileEntries(s"$dir/$file")
      .map { case (n, len, mtime) => s"$n:$len:$mtime" }
    md5hex(entries.mkString("\n")) + s":bk$numBuckets"
  }

  /** The `_GRAFT_FP` freshness marker of the artifact at `path`, if
    * complete (marker written LAST — a missing marker means "no
    * artifact", whatever files exist).
    */
  private[graft] def readFp(path: Path): Option[String] = {
    val f = s"${path.toString}/_GRAFT_FP"
    if (Lake.exists(f)) Some(Lake.readString(f).trim) else None
  }

  /** True iff the artifact at `path` carries anything beyond its own
    * marker. Under the marker-after-publish protocol a concurrent
    * same-generation rebuild's deleteTree can land between a winner's
    * rename and its marker write, leaving a MARKER-ONLY directory —
    * which must read as "no artifact", never as valid (the
    * marker-matches-alone check would silently serve an empty index).
    */
  private[graft] def hasData(path: Path): Boolean =
    Lake.listNames(path.toString).exists(_ != "_GRAFT_FP")

  /** True iff the artifact at `path` is complete AND was built from
    * exactly the `fp` generation: marker matches AND data exists
    * beside it (see [[hasData]] — a marker-only directory is a torn
    * race remnant, not an artifact).
    */
  private[graft] def fpValid(path: Path, fp: String): Boolean =
    readFp(path).contains(fp.trim) && hasData(path)

  /** Write the freshness marker — the build's LAST write. */
  private[graft] def writeFp(path: Path, fp: String): Unit =
    Lake.writeString(s"${path.toString}/_GRAFT_FP", fp)

  /** Run `build(tmpName, tmpPath)` — which must write the bucketed
    * table AS `tmpName` at `tmpPath` plus all data sidecars — then
    * publish `tmpPath` as `path` and write the `_GRAFT_FP` marker (for
    * builds that carry one) at the DESTINATION, strictly LAST. The
    * caller re-registers its real table name afterwards.
    *
    * The marker is deliberately NOT part of the renamed tree: on a
    * store whose directory rename is emulated as copy+delete (S3/GCS
    * connectors), the copy may move files in any order — a marker
    * riding inside the tree could land before the data, making a TORN
    * copy read as a valid artifact. Written at the destination after
    * the publish, marker-last holds on EVERY store: a torn or
    * crashed publish leaves no marker and reads as "no artifact",
    * rebuilt, never served ([[graft.core.LakeSpec]] proves it against a
    * hostile non-atomic-rename filesystem). The cost is a short
    * published-but-unmarked window in which a concurrent `ensure`
    * reads "stale" and starts a redundant rebuild of the same
    * generation. That rebuild's deleteTree can itself race the
    * winner's marker write (rename done, marker pending) and strand a
    * MARKER-ONLY directory; the protocol stays safe because validity
    * requires marker AND data ([[fpValid]]/[[hasData]] — a
    * marker-only remnant reads as stale and is rebuilt, never
    * served), the winner re-verifies its data AFTER the marker write
    * and self-invalidates if it lost the race, and the loser's benign
    * check demands a marker-AND-data survivor. Builds are idempotent,
    * so whoever completes last wins with the same bytes (the
    * documented object-store caveat). Residual gap, inherited from
    * the pre-round protocol: a builder CRASHING mid-deleteTree can
    * leave old marker + partial old data (marker+data both present),
    * which only a table format's atomic snapshot commit closes.
    */
  def commitBuild(spark: SparkSession, name: String, path: Path,
      fp: Option[String])(build: (String, Path) => Unit): Unit = {
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
    if (Lake.publishDir(tmpPath.toString, path.toString)) {
      fp.foreach(writeFp(path, _)) // marker LAST, at the destination
      // re-verify: a concurrent same-generation rebuild's deleteTree
      // can land between our rename and our marker write, leaving a
      // marker-only remnant — self-invalidate rather than let a later
      // partial state masquerade (readers already reject marker-only
      // via fpValid, but our caller is about to register the table)
      if (fp.isDefined && !hasData(path)) {
        deleteTree(path)
        throw new java.io.IOException(
          s"publish of $tmpPath as $path was deleted by a concurrent " +
            "rebuild before the marker write completed; rerun rebuilds")
      }
    } else {
      // only a CONCURRENT PUBLISH is benign (the winner's idempotent
      // build is byte-equivalent — discard the temp). "Target has a
      // _GRAFT_FP" alone is NOT proof of that: a partial deleteTree
      // (permissions, open handles) can leave the OLD index with its
      // OLD fingerprint intact, and swallowing that would silently
      // serve the stale index. Benign requires the surviving marker
      // to carry the SAME fingerprint this build was publishing —
      // only a concurrent builder of the same generation writes that
      // (bounded wait: the winner's marker lands just after its
      // rename).
      val benign = fp.exists(f =>
        Lake.awaitMarker(s"${path.toString}/_GRAFT_FP", f) &&
          hasData(path))
      deleteTree(tmpPath)
      if (!benign) throw new java.io.IOException(
        s"publish of $tmpPath as $path failed and the surviving target " +
          "is not a concurrent build of the same generation")
    }
  }

  private[operators] def deleteTree(p: Path): Unit =
    Lake.deleteTree(p.toString)

  /** Reclaim ABANDONED pid-scoped trees under an index root:
    * the `_maint_<pid>`/`_cmaint_<pid>` scratch indexes the maintenance
    * loops build (q112/q116/q118) and the `.build-<pid>` temp siblings
    * a crashed [[commitBuild]] can leave behind. Without this, every
    * maintenance-loop PROCESS leaks one scratch tree forever — the S12
    * old-file purge discipline applied to the index estate. A tree is
    * abandoned iff its owner pid is not alive on this host (scratch
    * roots are host-local by construction, so ProcessHandle liveness is
    * authoritative); the current process's trees and any LIVE process's
    * trees are never touched, preserving the pid-scoping concurrency
    * contract. Foreign scratch tables were never in this JVM's catalog,
    * so deleting the files alone is complete. Returns trees removed.
    *
    * `root` defaults to the shared [[indexRoot]]; the postings family
    * keeps its own root ([[PostingsIndex.indexRoot]]), so janitor call
    * sites sweep BOTH — see [[purgeAllScratchRoots]].
    */
  def purgeStaleScratch(root: String = indexRoot): Int = {
    val scratchRe = "^.*_c?maint_([0-9]+)$".r
    val buildRe = "^.*\\.build-([0-9]+)$".r
    // bare `_maint`/`_cmaint` with no pid: the pre-pid-scoping scratch
    // names. No CURRENT code path creates them, but an old binary still
    // running on this host during a mixed-version rollout uses exactly
    // that name — so reclamation is gated on the tree being cold (mtime
    // older than [[LegacyIdleMs]]): an in-use scratch is rewritten every
    // maintenance cycle, an orphan only ever ages. Coldness is judged
    // on the MAXIMUM mtime across the whole tree, not the root
    // directory's: POSIX only bumps a directory's mtime when direct
    // children are added or removed, so a live writer rewriting files
    // inside nested subdirectories (partitioned parquet output) need
    // never touch the root's timestamp — root-mtime gating could
    // reclaim an in-use scratch mid-write.
    val legacyRe = "^.*_c?maint$".r
    val self = ProcessHandle.current().pid()
    val now = System.currentTimeMillis()
    def abandoned(pid: String): Boolean =
      // an unparseable "pid" (hand-made dir) is left alone, like any
      // other name the patterns don't own
      pid.toLongOption.exists { p =>
        if (p == self) false
        else {
          val h = ProcessHandle.of(p)
          !(h.isPresent && h.get().isAlive)
        }
      }
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty)
      .count { f =>
        val stale = f.getName match {
          case scratchRe(pid) => abandoned(pid)
          case buildRe(pid)   => abandoned(pid)
          case legacyRe()     => now - treeMaxMtime(f) > LegacyIdleMs
          case _              => false
        }
        if (stale) deleteTree(f.toPath)
        stale
      }
  }

  /** The newest mtime anywhere in the tree rooted at `f` — the signal
    * that a tree is still being written, wherever in it the writer is
    * working. O(#files), same cost class as [[sourceFingerprint]]'s
    * listing; legacy trees are rare (mixed-version rollouts only).
    */
  private[operators] def treeMaxMtime(f: java.io.File): Long = {
    val kids = Option(f.listFiles()).getOrElse(Array.empty)
    kids.foldLeft(f.lastModified())((m, k) => math.max(m, treeMaxMtime(k)))
  }

  /** How cold a bare legacy `_maint`/`_cmaint` tree must be before the
    * janitor reclaims it (system property is the test seam). Chosen far
    * above any maintenance cycle's write cadence.
    */
  private[graft] def LegacyIdleMs: Long =
    sys.props.get("graft.index.legacy.idle.ms").map(_.toLong)
      .getOrElse(6L * 3600 * 1000)

  /** Sweep every known index root — the shared [[indexRoot]] and the
    * postings family's own root. The janitor entry call sites
    * (BuildIndexes, the q92/q112/q116/q118 maintenance loops) use this
    * so no root's scratch estate is left to leak.
    */
  def purgeAllScratchRoots(): Int = {
    val roots = Seq(indexRoot, PostingsIndex.indexRoot).distinct
    roots.map(purgeStaleScratch).sum
  }
}
