package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Aho-Corasick index must agree EXACTLY with the reference's naive
  * longest-first contains scan — candidate set, order, and membership.
  */
class MwIndexSpec extends AnyFunSuite {

  private def naive(patterns: Seq[String], text: String): List[String] =
    patterns.distinct.sortBy(m => (-m.length, m))
      .filter(text.contains(_)).toList

  private val patterns = List(
    "ASCORBIC ACID", "FOLIC ACID", "AMINO ACID", "ACID", "AMINO",
    "ISOSORBIDE DINITRATE", "SODIUM CHLORIDE", "DTP VACCINE",
    "DTP + HIB VACCINE", "VITAMIN B", "VITAMIN B COMPLEX", "A", "AB",
    "LOSARTAN POTASSIUM", "AMLODIPINE BESILATE")

  private val texts = List(
    "ASCORBIC ACID 500MG TABLET",
    "FOLIC ACID + AMINO ACID SOLUTION",
    "ISOSORBIDE DINITRATE 5MG SL",
    "SODIUM CHLORIDE 0.9% 1L",
    "DTP + HIB VACCINE 0.5ML",
    "VITAMIN B COMPLEX CAPSULE",
    "NO MATCH HERE", "", "XABX AMINOACID",
    "LOSARTAN POTASSIUM AND AMLODIPINE BESILATE COMBO",
    "overlapping AMINO AMINO ACID ACID")

  test("candidatesIn equals the naive longest-first contains scan") {
    val idx = MwIndex.of(patterns)
    for (t <- texts) {
      val up = t.toUpperCase
      assert(idx.candidatesIn(up) == naive(patterns, up), s"text: $t")
    }
  }

  test("membership and empty-pattern behavior") {
    val idx = MwIndex.of(patterns)
    assert(idx.containsPattern("AMINO ACID"))
    assert(!idx.containsPattern("AMINO ACIDS"))
    assert(MwIndex.of(Nil).candidatesIn("ANYTHING") == Nil)
  }

  test("the full constants dictionary agrees with the naive scan") {
    val all = Constants.multiwordGenerics.toList
    val idx = MwIndex.of(all)
    val probeTexts = all.take(40).map(p => s"PRE $p 500MG TAB") ++
      List("MAGNESIUM SULFATE + CALCIUM GLUCONATE IN WATER")
    for (t <- probeTexts)
      assert(idx.candidatesIn(t) == naive(all, t), s"text: $t")
  }

  test("serialization round-trip rebuilds the automaton") {
    val idx = MwIndex.of(patterns)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(idx); oos.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[MwIndex]
    assert(back.candidatesIn("FOLIC ACID + AMINO ACID SOLUTION") ==
      naive(patterns, "FOLIC ACID + AMINO ACID SOLUTION"))
    assert(back.containsPattern("DTP VACCINE"))
  }
}
