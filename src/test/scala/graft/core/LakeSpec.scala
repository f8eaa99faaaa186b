package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IndexCommit

/** The Lake object-store contract as EVIDENCE, not scaladoc: the
  * publish + marker protocol run against [[TornRenameFileSystem]] — a
  * filesystem whose rename is a non-atomic copy+delete in adversarial
  * order with crash injection (the S3/GCS shape). The load-bearing
  * claim: a torn publish reads as NO ARTIFACT (marker written at the
  * destination strictly after the publish, never inside the renamed
  * tree) and is rebuilt, never served.
  */
class LakeSpec extends SparkSpec {

  private def tornDir(prefix: String): String =
    "torn:" + Files.createTempDirectory(prefix).toString

  test("commitBuild on a copy+delete-rename store: torn publish reads as stale, rebuilt") {
    val root = tornDir("graft-lake-torn")
    val dst = Paths.get(root.stripPrefix("torn:"), "artifact")
    val dstTorn = Paths.get("torn:" + dst.toString)
    val fp = "generation-1:bk32"
    val name = "graft_lake_spec_torn_" + ProcessHandle.current().pid()
    def build(tn: String, tp: java.nio.file.Path): Unit = {
      Lake.mkdirs(tp.toString)
      Lake.writeString(s"${tp.toString}/part-0", "data-a")
      Lake.writeString(s"${tp.toString}/part-1", "data-b")
      Lake.writeString(s"${tp.toString}/part-2", "data-c")
    }
    try {
      // 1. a CRASHED publish: the copy dies after one file
      TornRenameFileSystem.arm("artifact", afterNFiles = 1)
      val e = intercept[java.io.IOException](
        IndexCommit.commitBuild(spark, name, dstTorn, Some(fp))(build))
      assert(e.getMessage.contains("publish"))
      assert(TornRenameFileSystem.crashes > 0, "the torn rename must fire")
      // the destination is genuinely TORN (some data landed)...
      assert(Files.exists(dst), "torn copy must leave a partial tree")
      assert(Option(dst.toFile.listFiles()).exists(_.nonEmpty))
      // ...but it reads as NO ARTIFACT: the marker was never inside
      // the renamed tree, so no copy order can make a torn publish
      // read as valid
      assert(!Files.exists(dst.resolve("_GRAFT_FP")))
      assert(!IndexCommit.fpValid(dstTorn, fp),
        "a torn publish must read as stale, never as valid")

      // 2. the rebuild: same protocol, uninjured — publish lands, the
      // marker is written LAST at the destination, the artifact is
      // valid and complete
      TornRenameFileSystem.disarm()
      IndexCommit.commitBuild(spark, name, dstTorn, Some(fp))(build)
      assert(IndexCommit.fpValid(dstTorn, fp))
      assert(Lake.readString(s"torn:${dst.toString}/part-2") == "data-c",
        "the rebuilt artifact must be complete")
    } finally {
      TornRenameFileSystem.disarm()
      Lake.deleteTree(root)
    }
  }

  test("a marker-only remnant (concurrent-rebuild race) reads as stale and is rebuilt") {
    // the marker-after-publish window: a concurrent same-generation
    // rebuild's deleteTree can land between a winner's rename and its
    // marker write, stranding a directory that holds ONLY the marker —
    // validity requires marker AND data, so the remnant must read as
    // stale (never served as an empty index) and the next build must
    // repair it through the normal protocol
    val root = Files.createTempDirectory("graft-lake-remnant")
    val dst = root.resolve("artifact")
    val fp = "generation-2:bk32"
    val name = "graft_lake_spec_remnant_" + ProcessHandle.current().pid()
    try {
      Lake.mkdirs(dst.toString)
      IndexCommit.writeFp(dst, fp)
      assert(IndexCommit.readFp(dst).contains(fp),
        "the remnant genuinely carries a matching marker")
      assert(!IndexCommit.fpValid(dst, fp),
        "a marker-only remnant must read as stale, never as valid")
      IndexCommit.commitBuild(spark, name, dst, Some(fp)) { (_, tp) =>
        Lake.mkdirs(tp.toString)
        Lake.writeString(s"${tp.toString}/part-0", "data")
      }
      assert(IndexCommit.fpValid(dst, fp),
        "the rebuild must land a complete (marker AND data) artifact")
    } finally Lake.deleteTree(root.toString)
  }

  test("pointer swap on the copy+delete store: a torn swap never reads as the new commit; replay repairs it") {
    import graft.streaming.VersionedPointer
    val out = tornDir("graft-lake-ptr")
    try {
      // the shim works end-to-end: a clean commit lands
      VersionedPointer.commit(out, 0L, None)
      assert(VersionedPointer.latest(out).contains(0L))
      // a TORN swap: the copy+delete rename dies before the new
      // pointer content lands
      TornRenameFileSystem.arm("_LATEST", afterNFiles = 0)
      intercept[Exception](VersionedPointer.commit(out, 1L, None))
      assert(TornRenameFileSystem.crashes > 0)
      // the degraded-store contract, stated: the swap is no longer
      // atomic, so the crash window may HIDE the committed prefix
      // (pointer absent) or keep the old pointer — but it can NEVER
      // read as the new commit, so nothing ever serves uncommitted
      // results as committed
      val seen = VersionedPointer.latest(out)
      assert(seen.isEmpty || seen.contains(0L),
        s"a torn swap must never surface the new commit (saw $seen)")
      // ...and the replay guard lets the batch recommit (idempotent
      // rewrite), repairing visibility
      assert(!VersionedPointer.alreadyServed(out, 1L, None))
      TornRenameFileSystem.disarm()
      VersionedPointer.commit(out, 1L, None)
      assert(VersionedPointer.latest(out).contains(1L))
    } finally {
      TornRenameFileSystem.disarm()
      Lake.deleteTree(out)
    }
  }

  test("lake-mode capstone on the hostile store: a torn stage publish crashes the run, the rerun rebuilds byte-identically") {
    // the clean reference: q115 with in-engine barriers (no lake mode)
    val fn = graft.SparkEntry.queries("q115_full_curation")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toString).sorted
    val want = rows(fn(spark, sf0001))
    val stage = tornDir("graft-lake-stage")
    System.setProperty("graft.stage.dir", stage)
    try {
      // run 1: the s4 stage's publish tears mid-copy — the run fails
      // loudly (the crash simulation), leaving a partial s4 snapshot
      // with NO marker
      TornRenameFileSystem.arm("/s4", afterNFiles = 1)
      val e = intercept[java.io.IOException](fn(spark, sf0001))
      assert(e.getMessage.contains("stage snapshot publish"))
      val s4 = Paths.get(stage.stripPrefix("torn:"), "s4")
      assert(Files.exists(s4), "the torn stage tree must exist")
      assert(!Files.exists(s4.resolve("_GRAFT_DONE")),
        "a torn stage snapshot must carry no marker")
      // earlier stages completed and are marked
      assert(Files.exists(
        Paths.get(stage.stripPrefix("torn:"), "s1", "_GRAFT_DONE")))

      // run 2: the torn stage reads as absent and is REBUILT (never
      // served); completed stages resume from their snapshots; the
      // output is byte-identical to the clean in-engine run
      TornRenameFileSystem.disarm()
      assert(rows(fn(spark, sf0001)) == want,
        "the resumed run over the torn store must equal the clean run")
      assert(Files.exists(s4.resolve("_GRAFT_DONE")),
        "the rebuilt stage must be marked at the destination")

      // run 3: the CONCURRENT-REBUILD remnant — marker intact, data
      // gone (the deleteTree-vs-late-marker race). Freshness requires
      // marker AND data, so the stage rebuilds instead of wedging on a
      // dataless read, and the output stays byte-identical
      Lake.deleteTree(s4.resolve("data").toString)
      assert(Files.exists(s4.resolve("_GRAFT_DONE")))
      assert(rows(fn(spark, sf0001)) == want,
        "a marker-only stage snapshot must rebuild, never wedge")
    } finally {
      TornRenameFileSystem.disarm()
      System.clearProperty("graft.stage.dir")
      Lake.deleteTree(stage)
    }
  }
}
