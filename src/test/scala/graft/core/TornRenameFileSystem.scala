package graft.core

import java.io.IOException

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}

/** A HOSTILE object-store stand-in for LakeSpec: a Hadoop FileSystem
  * (scheme `torn`) whose directory rename is NOT atomic — it is
  * emulated as copy-then-delete, like the S3/GCS connectors — and
  * whose copy order is ADVERSARIAL (underscore-prefixed control files
  * first), with a crash-injection hook that kills the copy after N
  * files. This is the filesystem the Lake scaladoc's object-store
  * contract is written against: the marker-after-publish protocol must
  * keep a torn publish reading as "no artifact" here, because the
  * rename can no longer be trusted to move the tree as one unit or in
  * any helpful order.
  *
  * Registered via `fs.torn.impl` in the test classpath's
  * core-site.xml; storage is the local disk (paths `torn:/tmp/...`
  * map straight to `/tmp/...`), so tests can inspect the torn state
  * with ordinary I/O.
  */
class TornRenameFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "torn"

  override def getUri: java.net.URI = java.net.URI.create("torn:///")

  /** Copy+delete rename: every file under `src` copied one by one —
    * `_`-prefixed names FIRST (the adversarial order for any protocol
    * that lets its marker ride inside the renamed tree) — then the
    * source deleted. Throws mid-copy when armed
    * ([[TornRenameFileSystem.arm]]), leaving a genuinely torn
    * destination.
    */
  override def rename(src: HPath, dst: HPath): Boolean = {
    val from = pathToFile(src)
    val to = pathToFile(dst)
    if (!from.exists()) return false
    if (to.exists()) return false
    def walk(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.sortBy(_.getName).flatMap(k =>
        if (k.isDirectory) walk(k) else Seq(k)).toSeq
    }
    val files =
      if (from.isFile) Seq(from)
      else walk(from).sortBy(f => (if (f.getName.startsWith("_")) 0 else 1,
        f.getPath))
    var copied = 0
    files.foreach { f =>
      TornRenameFileSystem.maybeCrash(to.getPath, copied)
      val rel = from.toPath.relativize(f.toPath)
      val target = to.toPath.resolve(rel)
      java.nio.file.Files.createDirectories(
        Option(target.getParent).getOrElse(to.toPath))
      java.nio.file.Files.copy(f.toPath, target)
      copied += 1
    }
    // empty directories (e.g. a dir-only tree) still need the root
    if (!to.exists()) java.nio.file.Files.createDirectories(to.toPath)
    def nuke(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(nuke)
      f.delete(); ()
    }
    nuke(from)
    true
  }
}

/** The `AbstractFileSystem` face of [[TornRenameFileSystem]] — what
  * `FileContext` (the version-pointer swap, [[Lake.overwriteRename]])
  * resolves for the `torn` scheme; delegates every operation to the
  * hostile FileSystem, so the pointer swap's rename degrades to the
  * same adversarial copy+delete. Registered via
  * `fs.AbstractFileSystem.torn.impl`.
  */
class TornAbstractFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new TornRenameFileSystem, conf, "torn", false)

object TornRenameFileSystem {
  /** When armed for a destination-path substring, the copy loop throws
    * after `afterFiles` files have landed — the torn-publish crash.
    */
  @volatile private var armedFor: Option[String] = None
  @volatile private var afterFiles: Int = 0
  @volatile var crashes: Int = 0

  def arm(dstSubstring: String, afterNFiles: Int): Unit = {
    armedFor = Some(dstSubstring); afterFiles = afterNFiles; crashes = 0
  }

  def disarm(): Unit = armedFor = None

  private def maybeCrash(dstPath: String, copied: Int): Unit =
    armedFor.foreach { sub =>
      if (dstPath.contains(sub) && copied >= afterFiles) {
        crashes += 1
        throw new IOException(
          s"torn copy crashed after $copied files into $dstPath")
      }
    }
}
