package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench writer's in-place min-merge ([[Bench.minMerge]] /
  * [[Bench.parsePrev]]): the committed `bench_out.json` is a per-query
  * min across sessions, and for three rounds a fresh single-session run
  * clobbered it in the worktree. The writer now merges itself, so the
  * overwrite hazard is structural-impossible. Pinned here: better
  * history wins, worse history loses, spreads widen, unrun queries
  * carry forward, the engine-changed rule discards history, failures
  * are never masked, and the artifact round-trips through the parser.
  */
class BenchMergeSpec extends AnyFunSuite {

  private val prevQ = Map("q1" -> 1.0, "q2" -> 5.0, "q3" -> 2.0, "q9" -> 7.0)
  private val prevS = Map(
    "q1" -> (0.9, 1.4), "q2" -> (4.8, 5.6), "q3" -> (1.9, 2.2),
    "q9" -> (6.5, 8.0))

  test("min-merge keeps better history, takes better new, widens spread") {
    // q1: history 1.0 beats this session's 1.5; q2: session 3.0 beats 5.0
    val ran = Seq(("q1", 1.5, 1.45, 1.8), ("q2", 3.0, 2.9, 3.3))
    val merged = Bench.minMerge(ran, prevQ, prevS, Set.empty[String])
    val m = merged.map(t => t._1 -> t).toMap
    assert(m("q1")._2 == 1.0, "history min must win")
    assert(m("q2")._2 == 3.0, "a faster fresh session must win")
    assert(m("q1")._3 == 0.9 && m("q1")._4 == 1.8, "spread widens both ways")
    assert(m("q3")._2 == 2.0 && m("q9")._2 == 7.0, "unrun queries carried")
    assert(m("q3")._3 == 1.9 && m("q3")._4 == 2.2, "carried spread intact")
    assert(merged.size == 4 && merged.map(_._1) == merged.map(_._1).sorted)
  }

  test("engine-changed rule discards history; failures surface") {
    val ran = Seq(("q1", 1.5, 1.45, 1.8), ("q2", -1.0, -1.0, -1.0))
    val m = Bench.minMerge(ran, prevQ, prevS, Set("q1", "q9"))
      .map(t => t._1 -> t).toMap
    assert(m("q1")._2 == 1.5, "replaced query must take the fresh number")
    assert(m("q1")._3 == 1.45 && m("q1")._4 == 1.8,
      "replaced query's spread restarts")
    assert(m("q2")._2 == -1.0,
      "a failed run must never be masked by historical success")
    assert(!m.contains("q9"), "a replaced-but-unrun query is dropped")
    assert(m.contains("q3"), "other history still carries")
  }

  test("parsePrev round-trips the writer's own format") {
    val json = """{"metric":"total","value":6.0,"unit":"sec","queries":{"q1_a":1.25,"q2_b":4.75,"q3_c":-1.0},"spread":{"q1_a":[1.1,1.4],"q2_b":[4.5,5.0],"q3_c":[-1.0,-1.0]},"order":"sorted","sf":"/x","out":"bench_out.json"}"""
    val (qs, sp) = Bench.parsePrev(json)
    assert(qs == Map("q1_a" -> 1.25, "q2_b" -> 4.75, "q3_c" -> -1.0))
    assert(sp("q1_a") == (1.1, 1.4) && sp("q2_b") == (4.5, 5.0))
  }

  test("parsePrev treats garbage as no history, never throws") {
    assert(Bench.parsePrev("") == (Map.empty, Map.empty))
    assert(Bench.parsePrev("{\"queries\":") == (Map.empty, Map.empty))
    assert(Bench.parsePrev("not json at all") == (Map.empty, Map.empty))
  }

  test("historyFor gates min-merge on the artifact's sf provenance") {
    val json = """{"metric":"total","value":6.0,"unit":"sec","queries":{"q1_a":1.25},"spread":{"q1_a":[1.1,1.4]},"order":"reverse","sf":"/root/testdata/sf0.1","out":"bench_out.json"}"""
    // same corpus → history flows, whatever the run ORDER was (the
    // ORDER diagnostic reruns the same queries on the same data; its
    // mins are genuine floors and merging them is the point)
    val (qs, _) = Bench.historyFor(json, "/root/testdata/sf0.1")
    assert(qs == Map("q1_a" -> 1.25))
    // a different scale factor at the same out path must NOT merge —
    // the historical min would be a different workload's number
    assert(Bench.historyFor(json, "/root/testdata/sf0.01") ==
      (Map.empty, Map.empty))
    // pre-provenance artifacts (no "sf" field) are no-history too
    val noSf = """{"queries":{"q1_a":1.25},"spread":{"q1_a":[1.1,1.4]}}"""
    assert(Bench.historyFor(noSf, "/root/testdata/sf0.1") ==
      (Map.empty, Map.empty))
  }
}
