package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Goldens from running the reference `extract_base_and_salts` /
  * `strip_after_as` on the same inputs.
  */
class SaltExtractSpec extends AnyFunSuite {

  private def run(s: String) = SaltExtract.extractBaseAndSalts(s)

  test("as-boundary separation") {
    assert(run("AMLODIPINE AS BESILATE") == ("AMLODIPINE", List("BESILATE")))
    assert(run("Amoxicillin (as trihydrate)") == ("AMOXICILLIN", List("TRIHYDRATE")))
    assert(run("HYDROCORTISONE as sodium succinate") ==
      ("HYDROCORTISONE", List("SODIUM", "SUCCINATE")))
    assert(run("CEFUROXIME as axetil 500 mg") == ("CEFUROXIME", List("AXETIL")))
    assert(run("CALCIUM as carbonate") == ("CALCIUM", List("CARBONATE")))
    assert(run("IRON as ferrous sulfate 60 mg tab") ==
      ("IRON", List("FERROUS", "SULFATE")))
  }

  test("no boundary: trailing-salt trim and cation bases") {
    assert(run("PARACETAMOL 500 mg tablet") == ("PARACETAMOL", Nil))
    assert(run("FERROUS SULFATE") == ("FERROUS", List("SULFATE")))
    assert(run("SODIUM CHLORIDE 0.9% solution") == ("SODIUM", List("CHLORIDE")))
  }

  test("combos, non-salt tails, and edge shapes") {
    assert(run("AMOXICILLIN + CLAVULANIC ACID as potassium salt") ==
      ("AMOXICILLIN + CLAVULANIC", List("POTASSIUM")))
    assert(run("insulin as isophane human") == ("INSULIN", Nil))
    assert(run("as sulfate") == ("SULFATE", Nil))
    assert(run("B1B6B12 tablet") == ("B1B6B12", Nil))
    assert(run("DEXTROSE 5% in water") == ("DEXTROSE", Nil))
  }

  test("stripAfterAs on normalized text") {
    assert(SaltExtract.stripAfterAs(
      TextNorm.normalizeText("AMLODIPINE AS BESILATE 10 mg")) == "amlodipine")
  }

  test("serializeSaltList dedups preserving order") {
    assert(SaltExtract.serializeSaltList(
      Seq("sulfate", "SULFATE", "sodium")) == "SULFATE + SODIUM")
  }
}
