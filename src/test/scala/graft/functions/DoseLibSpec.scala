package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import DoseLib._

/** Seeded from reference docstring examples (`tokenizer.py:758-768`,
  * `809-818`; `dose.py:40-48`, docstrings) + seeded-random property checks.
  */
class DoseLibSpec extends AnyFunSuite {

  test("normalizeDoseRatio canonical examples") {
    assert(normalizeDoseRatio("500MG/5ML") == ("100MG/ML", true))
    // the reference docstring claims ("10MG/ML", True) but its regex
    // requires a numeric denominator — actual behavior is no-op/False;
    // we match the code, not the docstring
    assert(normalizeDoseRatio("10MG/ML") == ("10MG/ML", false))
    assert(normalizeDoseRatio("1G/100ML") == ("10MG/ML", true))
    assert(normalizeDoseRatio("500MG") == ("500MG", false))
  }

  test("normalizeWeightToMg canonical examples") {
    assert(normalizeWeightToMg("1G") == ("1000MG", true))
    assert(normalizeWeightToMg("500MCG") == ("0.5MG", true))
    assert(normalizeWeightToMg("500MG") == ("500MG", false))
  }

  test("pack unmasking 10 x 500 mg -> 500mg") {
    assert(unmaskPackStrength("10 x 500 mg vial") == "500mg vial")
    assert(unmaskPackStrength("10×500mg") == "500mg")
  }

  test("parseDoseStruct cascade: ratio wins over amount") {
    assert(parseDoseStruct("paracetamol 250 mg/5 ml syrup")
      .contains(RatioDose(250.0, "mg", 5.0, "ml")))
    assert(parseDoseStruct("amoxicillin 500 mg capsule")
      .contains(AmountDose(500.0, "mg")))
    assert(parseDoseStruct("sodium chloride 0.9%")
      .contains(PercentDose(0.9)))
    assert(parseDoseStruct("plain tablet").isEmpty)
  }

  test("parseDoseStruct normalizes litre denominators to mL") {
    assert(parseDoseStruct("1 g/100 l")
      .contains(RatioDose(1.0, "g", 100000.0, "ml")))
  }

  test("parseDoseComponents structured extraction") {
    val r = parseDoseComponents("5% DEXTROSE 250 mL")
    assert(r.percentages == List(5.0))
    assert(r.totalVolumeMl.contains(250.0))
    val syr = parseDoseComponents("10 mg/5 mL SYRUP")
    assert(syr.doses.head.concentrationMgPerMl.contains(2.0))
    assert(syr.doses.head.unitType == "concentration")
  }

  test("calculateIvAmounts: 5% of 250 mL = 12.5 g = 12500 mg at 50 mg/mL") {
    val iv = calculateIvAmounts(List(5.0), Some(0.9), Some(250.0))
    assert(iv.drugAmountG.contains(12.5))
    assert(iv.drugAmountMg.contains(12500.0))
    assert(iv.concentrationMgPerMl.contains(50.0))
    assert(iv.diluentAmountG.contains(2.25))
  }

  test("toMg round-trips (property, seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val x = 0.001 + rnd.nextDouble() * 100000.0
      assert(doseEq(toMg(x, "g").get, 1000.0 * x))
      assert(doseEq(toMg(x, "mcg").get, x / 1000.0))
      assert(toMg(x, "mg").contains(x))
      assert(toMg(x, "iu").isEmpty)
    }
  }

  test("doseEq: 1g == 1000mg exactly, 450 != 500") {
    assert(doseEq(toMg(1.0, "g").get, 1000.0))
    assert(!doseEq(450.0, 500.0))
  }

  test("safeRatioMgPerMl") {
    assert(safeRatioMgPerMl(500.0, "mg", 5.0).contains(100.0))
    assert(safeRatioMgPerMl(500.0, "mg", 0.0).isEmpty)
  }
}
