package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Goldens from running the reference `normalize_vaccine_name` on the
  * same inputs — including its order-sensitive and fallback quirks.
  */
class VaccineLibSpec extends AnyFunSuite {

  test("match_vaccine_text bidirectional goldens") {
    // generated from the reference match_vaccine_text
    // (unified_constants.py:1678-1707)
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/match_vaccine_goldens.tsv"), "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    var failures = List.empty[String]
    for (line <- lines.tail) {
      val c = line.split("\t", -1)
      val (acr, comps) = VaccineLib.matchVaccineText(c(0))
      val gotA = acr.getOrElse("\\N")
      val gotC = comps.map(_.mkString("|")).getOrElse("\\N")
      if (gotA != c(1) || gotC != c(2))
        failures ::= s"[${c(0)}] expected (${c(1)}, ${c(2)}) got ($gotA, $gotC)"
    }
    assert(failures.isEmpty, "\n" + failures.reverse.mkString("\n"))
  }

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
