package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Goldens from running the reference `normalize_vaccine_name` on the
  * same inputs — including its order-sensitive and fallback quirks.
  */
class VaccineLibSpec extends AnyFunSuite {

  private def run(s: String) = VaccineLib.normalizeVaccineName(s)

  test("canonical + valency") {
    assert(run("PNEUMOCOCCAL CONJUGATE VACCINE 13-VALENT") ==
      (Some("PNEUMOCOCCAL VACCINE"), Some("13-valent")))
  }

  test("acronym-only falls back to generic VACCINE with residual detail") {
    assert(run("DTP VACCINE") == (Some("VACCINE"), Some("DTP")))
  }

  test("order-sensitive canonical resolution (MMR hits RUBELLA entry)") {
    assert(run("MEASLES MUMPS RUBELLA VACCINE LIVE ATTENUATED") ==
      (Some("RUBELLA VACCINE"), Some("Live attenuated")))
  }

  test("multiple detail flags join with semicolons") {
    assert(run("HEPATITIS B VACCINE RECOMBINANT PEDIATRIC") ==
      (Some("HEPATITIS B VACCINE"), Some("Recombinant; Pediatric")))
  }

  test("reference quirks preserved: TOXOID without pattern is None") {
    assert(run("TETANUS TOXOID") == (None, None))
    // fallback keeps the double space from the reference's replace
    assert(run("POLIOMYELITIS VACCINE INACTIVATED") ==
      (Some("VACCINE"), Some("POLIOMYELITIS  INACTIVATED")))
  }

  test("canonical with no details; non-vaccines are None") {
    assert(run("RABIES VACCINE") == (Some("RABIES VACCINE"), None))
    assert(run("PARACETAMOL TABLET") == (None, None))
  }

  test("patterns with embedded commas parse correctly (quoted CSV fields)") {
    assert(run("DIPHTHERIA, TETANUS, PERTUSSIS VACCINE") ==
      (Some("DTP VACCINE"), None))
  }

  test("acronym components bridge") {
    assert(VaccineLib.componentsKey("DTP").isDefined)
    assert(VaccineLib.componentsKey("NOPE").isEmpty)
    assert(VaccineLib.acronymToComponents.size > 50)
  }
}
