package graft.tagger

import org.scalatest.funsuite.AnyFunSuite

import Scoring._

/** Goldens from running the reference scoring.py on identical inputs. */
class ScoringSpec extends AnyFunSuite {

  test("isCombinationAtc reference parity") {
    val expected = Map("N02BE01" -> false, "N02BE51" -> true,
      "C09BA02" -> true, "J01CR02" -> true, "A02BD05" -> true,
      "N02AJ13" -> true, "B05BA10" -> false, "M01AE51" -> false,
      "" -> false, "R05X" -> false)
    expected.foreach { case (atc, e) =>
      assert(isCombinationAtc(atc) == e, atc)
    }
  }

  test("sortAtcCodes: singles first, then length, then lexical") {
    assert(sortAtcCodes(Seq("N02BE51", "N02BE01", "C09BA02", "A10BD05")) ==
      List("N02BE01", "A10BD05", "C09BA02", "N02BE51"))
  }

  test("genericsMatch reference parity") {
    def gm(in: Set[String], cand: String) = genericsMatch(in, cand)
    assert(gm(Set("PARACETAMOL"), "PARACETAMOL") == (true, "exact"))
    assert(gm(Set("PARACETAMOL"), "ACETAMINOPHEN") == (true, "exact"))
    assert(gm(Set("CEPHALEXIN"), "CEFALEXIN") == (true, "exact"))
    assert(gm(Set("IBUPROFEN", "PARACETAMOL"), "IBUPROFEN + PARACETAMOL") ==
      (true, "combo_match"))
    assert(gm(Set("IBUPROFEN"), "IBUPROFEN + PARACETAMOL") == (true, "combo_match"))
    assert(gm(Set("AMOXICILLIN"), "AMOXICILLIN TRIHYDRATE") == (true, "substring"))
    assert(gm(Set("VITAMIN B"), "VITAMIN B, COMPLEX") == (true, "substring"))
    assert(gm(Set("VITAMIN, FAT-SOLUBLE"), "VITAMIN, FAT-SOLUBLE") ==
      (true, "exact_with_subtype"))
    assert(gm(Set("VITAMIN, FAT-SOLUBLE"), "VITAMIN, WATER-SOLUBLE") ==
      (false, "no_match"))
    assert(gm(Set("SALBUTAMOL"), "ALBUTEROL") == (true, "exact"))
    assert(gm(Set("XYZ"), "PARACETAMOL") == (false, "no_match"))
    assert(gm(Set.empty, "PARACETAMOL") == (false, "missing_generic"))
    assert(gm(Set("DEXTROSE"), "GLUCOSE") == (true, "exact"))
  }

  test("selectBestCandidate scenarios match the reference") {
    def C(g: String, a: String, f: String = "", ref: String = "") =
      Candidate(g, a, f, "", "", ref)
    def atcOf(r: Option[Candidate]) = r.map(_.atcCode)
    // single drug prefers single ATC
    assert(atcOf(selectBestCandidate(
      List(C("PARACETAMOL", "N02BE51"), C("PARACETAMOL", "N02BE01")),
      Set.empty, Set("PARACETAMOL"), true, false, false, Nil)) ==
      Some("N02BE01"))
    // combination input requires combo candidate
    assert(atcOf(selectBestCandidate(
      List(C("IBUPROFEN", "M01AE01"), C("IBUPROFEN + PARACETAMOL", "M01AE51")),
      Set.empty, Set("IBUPROFEN", "PARACETAMOL"), false, true, false, Nil)) ==
      Some("M01AE51"))
    // form preference beats lexical ATC
    assert(atcOf(selectBestCandidate(
      List(C("AMOXICILLIN", "J01CA04", "SYRUP"),
        C("AMOXICILLIN", "J01CA04B", "TABLET")),
      Set("TABLET"), Set("AMOXICILLIN"), true, false, false, Nil)) ==
      Some("J01CA04B"))
    // release-detail tiebreak
    assert(atcOf(selectBestCandidate(
      List(C("NIFEDIPINE", "C08CA05", "TABLET", "NIFEDIPINE TABLET"),
        C("NIFEDIPINE", "C08CA05X", "TABLET", "NIFEDIPINE MR TABLET")),
      Set("TABLET"), Set("NIFEDIPINE"), true, false, false, Nil,
      Map("release_details" -> "MR"))) == Some("C08CA05X"))
    // IV solutions prefer the active ingredient over the vehicle
    assert(atcOf(selectBestCandidate(
      List(C("SODIUM CHLORIDE", "B05XA03"), C("DEXTROSE", "B05BA03")),
      Set.empty, Set("DEXTROSE", "SODIUM CHLORIDE"), false, false, true,
      List("DEXTROSE", "SODIUM CHLORIDE"))) == Some("B05BA03"))
    // longer/more specific generic wins
    assert(atcOf(selectBestCandidate(
      List(C("IODINE", "D08AG03"), C("IODAMIDE", "V08AA03")),
      Set.empty, Set("IODAMIDE"), true, false, false, Nil)) ==
      Some("V08AA03"))
    // nothing valid -> None
    assert(selectBestCandidate(
      List(C("WARFARIN", "B01AA03")),
      Set.empty, Set("PARACETAMOL"), true, false, false, Nil).isEmpty)
  }
}
