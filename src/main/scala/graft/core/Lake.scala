package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

/** Filesystem plumbing for the persisted estate (index publishes, lake
  * stage snapshots, sink version pointers), routed through Hadoop's
  * `FileSystem`/`FileContext` API instead of `java.nio.file` so the
  * same code runs against `file://`, HDFS, and object stores — the
  * artifacts these protocols manage live NEXT TO the data, and at
  * 100 TB the data is not on a local disk.
  *
  * Portability contract, per store:
  *  - **file:// (this harness) and HDFS**: `rename` is atomic; the
  *    temp-sibling + rename publish and the overwrite-rename pointer
  *    swap give readers the old artifact, no artifact, or the new
  *    artifact, never a torn one.
  *  - **S3/GCS-style object stores**: there is NO atomic directory
  *    rename — the connector emulates it as copy+delete, so the rename
  *    step loses its atomicity. The protocols here remain CORRECT on
  *    such stores because validity never rests on the rename alone:
  *    the freshness marker (`_GRAFT_FP` / `_GRAFT_DONE`) is NEVER part
  *    of the renamed tree — publishers write it at the DESTINATION,
  *    strictly after the publish — so marker-last holds even when the
  *    "rename" is a connector-internal copy that moves files in
  *    arbitrary order, and readers treat a missing or mismatched
  *    marker as "no artifact": a torn copy is indistinguishable from
  *    an unfinished build and is rebuilt, never served (LakeSpec
  *    proves this against a hostile rename-as-unordered-torn-copy
  *    filesystem). What object stores lose is only rename SPEED (copy
  *    cost ∝ artifact size) and last-writer-wins on concurrent
  *    publishes of the same generation (benign: builds are
  *    idempotent, same input → same artifact; the marker-after-publish
  *    window adds at most a redundant same-generation rebuild). A
  *    production deployment at that layer should swap the directory
  *    publish for a table format's atomic snapshot commit; the marker
  *    discipline here is the same contract expressed with files.
  *
  * Root addressing: the estate's roots (SPARK_GRAFT_INDEX_DIR, the
  * postings root, SPARK_GRAFT_STAGE_DIR, sink out-dirs) are composed
  * into artifact paths as SCHEMELESS default-filesystem paths (the
  * intermediate `java.nio.Path` values are opaque joiners, never used
  * for I/O). Pointing the estate at HDFS or an object store is a
  * deployment setting — `fs.defaultFS` in the Hadoop configuration —
  * not a per-path URI: an explicitly-schemed root ("hdfs://nn/x",
  * "s3a://bucket/x") would be mangled by the join ("//" collapses)
  * and is rejected territory until the composition switches to plain
  * string join (mechanical — every I/O call here is already
  * string-typed). The scratch JANITOR's roots are host-local by
  * contract (its liveness test is a local ProcessHandle check) and
  * stay on java.io deliberately.
  *
  * Checksum note: Hadoop's local filesystem is checksummed by default
  * (every write grows a `.crc` sibling); markers and pointers are tiny
  * control files whose integrity the content check itself covers, so
  * checksum writing is disabled where the scheme supports it — and
  * crucially a dangling `.crc` from a pre-rename writer could otherwise
  * fail reads of a renamed marker.
  */
object Lake {

  private lazy val conf = new Configuration()

  private def fs(p: HPath): FileSystem = {
    val f = p.getFileSystem(conf)
    // best-effort: LocalFileSystem honors this; HDFS/S3 manage their
    // own integrity and ignore or reject it
    try { f.setWriteChecksum(false); f.setVerifyChecksum(false) }
    catch { case _: UnsupportedOperationException => }
    f
  }

  def exists(path: String): Boolean = {
    val p = new HPath(path)
    fs(p).exists(p)
  }

  def readString(path: String): String = {
    val p = new HPath(path)
    val in = fs(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Create-or-overwrite `path` with `s` (not atomic — callers that
    * need atomic visibility write a temp sibling and [[overwriteRename]]
    * it into place).
    */
  def writeString(path: String, s: String): Unit = {
    val p = new HPath(path)
    val out = fs(p).create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readBytes(path: String): Array[Byte] = {
    val p = new HPath(path)
    val in = fs(p).open(p)
    try in.readAllBytes() finally in.close()
  }

  def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val p = new HPath(path)
    val out = fs(p).create(p, true)
    try out.write(bytes) finally out.close()
  }

  def mkdirs(path: String): Unit = {
    val p = new HPath(path)
    fs(p).mkdirs(p); ()
  }

  def deleteTree(path: String): Unit = {
    val p = new HPath(path)
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Bounded wait for a marker file to carry the expected content —
    * the LOSER's side of a publish race under the marker-after-publish
    * protocol: the winner writes its marker right AFTER the rename
    * (marker-last, at the destination), so a loser that just observed
    * the rename failure may be reading a beat before the winner's
    * marker lands. ~1 s worst case; false means the survivor really
    * is not this generation.
    */
  def awaitMarker(path: String, expect: String, attempts: Int = 40,
      sleepMs: Long = 25): Boolean = {
    var i = 0
    while (i < attempts) {
      // a concurrent stale-rebuild's deleteTree can remove the marker
      // between exists() and the read — an I/O error here is just a
      // failed attempt (the race this probe exists for), not a crash
      val ok =
        try exists(path) && readString(path).trim == expect.trim
        catch { case _: java.io.IOException => false }
      if (ok) return true
      i += 1
      if (i < attempts) Thread.sleep(sleepMs)
    }
    false
  }

  /** Publish `src` as `dst` without overwrite — the temp-sibling
    * publish's final step. Returns false when the destination exists
    * or appears concurrently (the publish race; the caller decides
    * benignity by comparing the survivor's marker). Atomic on
    * file://'s and HDFS's rename; see the object-store caveat above.
    */
  def publishDir(src: String, dst: String): Boolean = {
    val s = new HPath(src)
    try fs(s).rename(s, new HPath(dst))
    catch { case _: java.io.IOException => false }
  }

  /** Atomically replace `dst` with `src` (both files) — the version
    * pointer swap. `FileContext` is used because the `FileSystem` API
    * has no portable overwrite-rename.
    *
    * Degraded-store contract (spec-pinned in LakeSpec against the
    * hostile `torn://` store): on a filesystem whose rename is
    * copy+delete, the swap is NOT atomic — a crash window can leave
    * the pointer ABSENT (hiding the committed prefix until the stream
    * replays and recommits, an idempotent rewrite) or keep the OLD
    * pointer, but it can never surface the NEW commit early: nothing
    * ever serves uncommitted results as committed. On file:// and
    * HDFS the FileContext rename is atomic and the window does not
    * exist.
    */
  def overwriteRename(src: String, dst: String): Unit = {
    val s = new HPath(src)
    // a schemeless path (the common case here) must resolve through the
    // configured default filesystem, not a null-scheme URI lookup
    val ctx =
      if (s.toUri.getScheme == null) FileContext.getFileContext(conf)
      else FileContext.getFileContext(s.toUri, conf)
    ctx.rename(s, new HPath(dst), Options.Rename.OVERWRITE)
  }

  /** Child names of `dir` (empty when absent) — the `v=N` listing. */
  def listNames(dir: String): Seq[String] = {
    val p = new HPath(dir)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName).toIndexedSeq
  }

  /** (name, length, mtime) rows for every regular file under `path`,
    * depth-first by name — [[graft.operators.IndexCommit
    * .sourceFingerprint]]'s listing, O(#files), no data scan.
    */
  def fileEntries(path: String): Seq[(String, Long, Long)] = {
    val f = fs(new HPath(path))
    def walk(p: HPath): Seq[(String, Long, Long)] = {
      val st = f.getFileStatus(p)
      if (st.isDirectory)
        f.listStatus(p).sortBy(_.getPath.getName).toIndexedSeq.flatMap(
          s => walk(s.getPath))
      else Seq((p.getName, st.getLen, st.getModificationTime))
    }
    if (!f.exists(new HPath(path))) Seq.empty else walk(new HPath(path))
  }
}
