package graft.streaming

import graft.core.Lake

/** The versioned-pointer exactly-once protocol every foreachBatch sink
  * in this package speaks, factored to ONE implementation: results for
  * batch N land under `outDir/v=N`, then a `_LATEST` pointer file is
  * atomically swapped to N — a replayed batch (id ≤ pointer) is a
  * no-op, a crash between the write and the swap replays into an
  * identical overwrite, and readers see exactly the committed prefix.
  * I/O goes through [[graft.core.Lake]] (Hadoop `FileSystem`), so the
  * decision logs can live beside the data on HDFS/object stores — see
  * Lake's per-store portability contract.
  *
  * CHECKPOINT-EPOCH GUARD: the replay rule "batchId ≤ pointer ⇒
  * already served" assumes batch ids are monotonic per outDir — true
  * for one checkpoint lineage, FALSE across a checkpoint reset
  * (foreachBatch ids restart at 0), where the naive guard would
  * silently swallow every new batch as already-served. Each attach()
  * therefore derives an epoch token persisted INSIDE its checkpoint
  * directory ([[epochOf]] — wiping the checkpoint wipes the token) and
  * the guard compares it to the epoch recorded in the outDir: a
  * mismatch means "new stream lineage against an outDir owning another
  * lineage's history" and FAILS FAST with instructions, rather than
  * no-opping results into the void. Direct applyBatch calls (tests,
  * backfills) may pass epoch=None to run the plain monotonic rule.
  */
object VersionedPointer {

  private def pointer(dir: String) = s"$dir/_LATEST"
  private def epochFile(dir: String) = s"$dir/_EPOCH"

  /** The committed high-water batch id, if any batch ever committed. */
  def latest(dir: String): Option[Long] =
    if (Lake.exists(pointer(dir))) Some(Lake.readString(pointer(dir)).trim.toLong)
    else None

  /** The stable identity of one checkpoint lineage: a token minted on
    * first use and persisted in the checkpoint directory itself, so it
    * survives restarts WITH the checkpoint and dies WITH the
    * checkpoint.
    */
  def epochOf(checkpointDir: String): String = {
    val f = epochFile(checkpointDir)
    if (Lake.exists(f)) Lake.readString(f).trim
    else {
      Lake.mkdirs(checkpointDir)
      val tok = java.util.UUID.randomUUID().toString
      // first-write-wins under concurrent attach: both writers then
      // re-read, so they agree on whichever token landed
      if (!Lake.exists(f)) Lake.writeString(f, tok)
      Lake.readString(f).trim
    }
  }

  /** True iff `batchId` is already committed in `outDir` (the replay
    * no-op). With an epoch: an outDir bound to a DIFFERENT checkpoint
    * lineage throws instead of guessing — see the class doc.
    */
  def alreadyServed(outDir: String, batchId: Long,
      epoch: Option[String]): Boolean = {
    epoch.foreach { e =>
      val f = epochFile(outDir)
      if (Lake.exists(f)) {
        val owner = Lake.readString(f).trim
        if (owner != e) throw new IllegalStateException(
          s"output dir $outDir holds batches committed by checkpoint " +
            s"lineage $owner, but this stream's checkpoint carries " +
            s"lineage $e — the stream was restarted with a fresh/wiped " +
            "checkpoint, so its batch ids restart at 0 and the replay " +
            "guard cannot distinguish new batches from replays. Point " +
            "the stream at a fresh output dir (or restore the original " +
            "checkpoint) instead of silently dropping results.")
      }
    }
    latest(outDir).exists(_ >= batchId)
  }

  /** Commit `batchId`: bind the epoch on first commit, then swap the
    * pointer (tmp sibling + atomic overwrite-rename). The caller has
    * already written the batch's results under `outDir/v=batchId`.
    */
  def commit(outDir: String, batchId: Long,
      epoch: Option[String] = None): Unit = {
    epoch.foreach { e =>
      val f = epochFile(outDir)
      if (!Lake.exists(f)) Lake.writeString(f, e)
    }
    val tmp = s"$outDir/_LATEST.tmp.$batchId"
    Lake.writeString(tmp, batchId.toString)
    Lake.overwriteRename(tmp, pointer(outDir))
  }

  /** All committed `v=N` result directories of `dir`, ascending —
    * crash leftovers past the pointer excluded.
    */
  def committedDirs(dir: String): Seq[String] =
    latest(dir) match {
      case Some(v) =>
        Lake.listNames(dir)
          .filter(_.startsWith("v="))
          .map(_.stripPrefix("v=").toLong)
          .filter(_ <= v).sorted
          .map(i => s"$dir/v=$i")
      case None => Seq.empty
    }

  /** Committed SIBLING logs under `dir/sub` — `dir/sub/v=N` for every
    * committed batch id N that wrote one (the quarantine-log listing,
    * shared by the modal sinks and the multimodal curation sink).
    * Composed as paths, never by string-rewriting the verdict paths —
    * an outDir that itself contains "/v=" must not be mangled.
    */
  def committedSubDirs(dir: String, sub: String): Seq[String] =
    latest(dir) match {
      case Some(v) =>
        (0L to v).map(i => s"$dir/$sub/v=$i").filter(Lake.exists)
      case None => Seq.empty
    }
}
