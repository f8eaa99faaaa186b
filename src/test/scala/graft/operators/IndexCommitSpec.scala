package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** [[IndexCommit.purgeStaleScratch]]: the maintenance loops
  * (q112/q116/q118) build pid-scoped scratch trees under the shared
  * index root, and crashed [[IndexCommit.commitBuild]]s can leave
  * `.build-<pid>` temp siblings — both leak one tree per dead process
  * without the purge. The contract under test: ABANDONED trees (owner
  * pid not alive on this host) are reclaimed; the current process's
  * trees, live processes' trees, and non-scratch index directories are
  * never touched.
  */
class IndexCommitSpec extends SparkSpec {

  test("purgeStaleScratch reclaims dead pids' trees, spares live + foreign") {
    val root = Paths.get(IndexCommit.indexRoot)
    Files.createDirectories(root)
    val self = ProcessHandle.current().pid()
    // a pid that is certainly not alive: far beyond pid_max defaults,
    // and double-checked against ProcessHandle before the test asserts
    val dead = Iterator.iterate(3999999999L)(_ - 7)
      .find(p => !ProcessHandle.of(p).isPresent).get
    val deadMaint = root.resolve(s"graft_fp_index_ictest_maint_$dead")
    val deadCmaint = root.resolve(s"graft_fp_index_ictest_cmaint_$dead")
    val deadBuild = root.resolve(s"graft_fp_index_ictest.build-$dead")
    val mine = root.resolve(s"graft_fp_index_ictest_maint_$self")
    val plain = root.resolve("graft_fp_index_ictest_plainindex")
    // the pre-pid-scoping scratch name: orphaned by construction (no
    // current code path creates it), reclaimed unconditionally
    val legacy = root.resolve("graft_band_index_ictest_maint")
    // an unparseable pid (overflow digits) must be SPARED, not crash
    val weird = root.resolve("graft_fp_index_ictest_maint_99999999999999999999")
    val all = Seq(deadMaint, deadCmaint, deadBuild, mine, plain, legacy, weird)
    all.foreach { p =>
      Files.createDirectories(p)
      Files.writeString(p.resolve("marker"), "x")
    }
    try {
      val removed = IndexCommit.purgeStaleScratch()
      assert(removed >= 3, s"expected >= 3 reclaimed, got $removed")
      assert(!Files.exists(deadMaint), "dead pid's _maint_ must be reclaimed")
      assert(!Files.exists(deadCmaint), "dead pid's _cmaint_ must be reclaimed")
      assert(!Files.exists(deadBuild), "dead pid's .build- sibling must go")
      assert(Files.exists(mine), "the CURRENT process's scratch must survive")
      assert(Files.exists(plain), "a non-scratch index dir must survive")
      assert(!Files.exists(legacy), "bare pre-pid _maint names are orphans")
      assert(Files.exists(weird), "an unparseable pid suffix must be spared")
      // idempotent: a second pass finds nothing of ours to remove
      all.foreach(p => assert(Files.exists(p) ==
        (p == mine || p == plain || p == weird)))
    } finally all.foreach(IndexCommit.deleteTree)
  }
}
