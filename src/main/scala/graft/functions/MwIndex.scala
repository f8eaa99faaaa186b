package graft.functions

import scala.collection.mutable

/** Multiword-generic dictionary index: the tagger's multiword set is
  * catalog-derived (`tagger.py:272-291`) and reaches 10^4-10^5 entries on
  * real catalogs, while the reference re-scans the WHOLE sorted list with
  * a substring check per text (`tokenizer.py:1005/1172` — O(M·|text|) per
  * row). At 100 TB that scan dominates the probe/shape stage, so the
  * index answers "which patterns occur in this text" with one
  * Aho-Corasick pass (O(|text| + matches)) and membership with a hash
  * set — BYTE-IDENTICAL results to the scan (callers re-verify contains
  * against their progressively-mutated text exactly like the reference
  * loop; see [[TokenLib.normalizeTokens]]'s created-occurrence fallback).
  *
  * Serialization: the pattern array rides the task closure (shipped once
  * per stage via the task-binary broadcast); the automaton itself is
  * rebuilt lazily per executor (@transient lazy), never serialized.
  */
final class MwIndex(patterns0: Iterable[String]) extends Serializable {

  /** distinct patterns, reference iteration order: longest first, length
    * ties alphabetical (the reference inherits Python set order on ties).
    */
  val sorted: Array[String] =
    patterns0.toArray.distinct.sortBy(m => (-m.length, m))

  def isEmpty: Boolean = sorted.isEmpty

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](sorted.length * 2)
    sorted.foreach(s.add)
    s
  }

  def containsPattern(s: String): Boolean = set.contains(s)

  // ---- Aho-Corasick over the pattern set -------------------------------
  // nodes: transition maps; fail: failure links; hit: pattern id ending at
  // the node (-1 = none); dict: nearest fail-ancestor that ends a pattern
  @transient private lazy val automaton: (Array[java.util.HashMap[Char, Integer]],
      Array[Int], Array[Int], Array[Int]) = {
    val next = mutable.ArrayBuffer(new java.util.HashMap[Char, Integer]())
    val hit = mutable.ArrayBuffer(-1)
    var i = 0
    while (i < sorted.length) {
      var v = 0
      val p = sorted(i)
      var j = 0
      while (j < p.length) {
        val c = p.charAt(j)
        val t = next(v).get(c)
        if (t == null) {
          next += new java.util.HashMap[Char, Integer]()
          hit += -1
          next(v).put(c, next.length - 1)
          v = next.length - 1
        } else v = t
        j += 1
      }
      hit(v) = i
      i += 1
    }
    val n = next.length
    val fail = new Array[Int](n)
    val dict = Array.fill(n)(-1)
    val queue = mutable.Queue.empty[Int]
    next(0).forEach((_, t) => { fail(t) = 0; queue.enqueue(t) })
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      dict(v) = if (hit(fail(v)) >= 0) fail(v) else dict(fail(v))
      next(v).forEach { (c, t) =>
        var f = fail(v)
        while (f != 0 && next(f).get(c) == null) f = fail(f)
        val ft = next(f).get(c)
        fail(t) = if (ft != null && ft != t) ft else 0
        queue.enqueue(t)
      }
    }
    (next.toArray, fail, hit.toArray, dict)
  }

  /** Patterns occurring in `textUpper` as substrings, in the reference's
    * longest-first iteration order.
    */
  def candidatesIn(textUpper: String): List[String] = {
    if (sorted.isEmpty || textUpper == null || textUpper.isEmpty) return Nil
    val (next, fail, hit, dict) = automaton
    val found = new java.util.BitSet(sorted.length)
    var v = 0
    var i = 0
    while (i < textUpper.length) {
      val c = textUpper.charAt(i)
      var t = next(v).get(c)
      while (t == null && v != 0) { v = fail(v); t = next(v).get(c) }
      v = if (t == null) 0 else t
      if (hit(v) >= 0) found.set(hit(v))
      var d = dict(v)
      while (d >= 0) { found.set(hit(d)); d = dict(d) }
      i += 1
    }
    if (found.isEmpty) Nil
    else {
      val out = List.newBuilder[String]
      var idx = 0
      // sorted-order subset: iterate ascending pattern ids (ids follow
      // the sorted array), so the result preserves longest-first order
      idx = found.nextSetBit(0)
      while (idx >= 0) {
        out += sorted(idx)
        idx = found.nextSetBit(idx + 1)
      }
      out.result()
    }
  }
}

object MwIndex {
  /** the static MULTIWORD_GENERICS constants, no plurals (TokenLib's
    * historical default).
    */
  lazy val default: MwIndex = new MwIndex(Constants.multiwordGenerics)

  def of(patterns: Iterable[String]): MwIndex = new MwIndex(patterns)
}
