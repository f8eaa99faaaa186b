package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Assertions seeded from the reference's own tests
  * (`tests/test_annex_f_normalization_stigmine.py`,
  * `tests/test_generic_normalization.py`) and `text_utils.py` docstrings.
  */
class TextNormSpec extends AnyFunSuite {

  test("gm collapses to g only as a standalone unit token") {
    assert(TextNorm.normalizeText("PARACETAMOL 1 GM TABLET") == "paracetamol 1 g tablet")
    assert(TextNorm.normalizeText("5 gms") == "5 g")
    // never inside molecule names (STIGMINE guard)
    assert(TextNorm.normalizeText("NEOSTIGMINE") == "neostigmine")
    assert(TextNorm.normalizeText("PYRIDOSTIGMINE 60 MG") == "pyridostigmine 60 mg")
  }

  test("iv expands to intravenous as a standalone word only") {
    assert(TextNorm.normalizeText("CEFTRIAXONE IV 1G") == "ceftriaxone intravenous 1g")
    assert(TextNorm.normalizeText("IVERMECTIN") == "ivermectin")
  }

  test("microgram variants collapse to mcg") {
    assert(TextNorm.normalizeText("DIGOXIN 250 MICROGRAM") == "digoxin 250 mcg")
    assert(TextNorm.normalizeText("digoxin 250 μg") == "digoxin 250 mcg")
  }

  test("cc becomes ml standalone-only") {
    assert(TextNorm.normalizeText("SYRUP 60 CC") == "syrup 60 ml")
    assert(TextNorm.normalizeText("SUCCINYLCHOLINE") == "succinylcholine")
  }

  test("typo fixes") {
    assert(TextNorm.normalizeText("POLYMIXIN B") == "polymyxin b")
    assert(TextNorm.normalizeText("METFORMIN HYDROCHLORDE") == "metformin hydrochloride")
  }

  test("accents fold, punctuation strips, keep %/+.- chars") {
    assert(TextNorm.normalizeText("Résumé") == "resume")
    assert(TextNorm.normalizeText("A+B (0.9%) [x]") == "a+b 0.9%  x".replaceAll("\\s+", " "))
  }

  test("normalizeBasic keeps only alphanumerics") {
    assert(TextNorm.normalizeBasic("CBC w/ Platelet!!") == "cbc w platelet")
  }

  test("baseName strips trailing qualifiers") {
    assert(TextNorm.baseName("AMOXICILLIN, ANHYDROUS") == "amoxicillin")
    assert(TextNorm.baseName("ELECTROLYTES incl. SODIUM") == "electrolytes")
  }

  test("cleanAtc strips NBSP") {
    assert(TextNorm.cleanAtc(" N02BE01 ") == "N02BE01")
  }

  test("slugId") {
    assert(TextNorm.slugId("Sodium Chloride 0.9%") == "sodium_chloride_0_9")
  }

  test("safeToFloat accepts comma decimals") {
    assert(TextNorm.safeToFloat("2,5").contains(2.5))
    assert(TextNorm.safeToFloat("abc").isEmpty)
  }
}
