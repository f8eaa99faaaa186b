package graft.tagger

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property test behind the blocked fuzzy mode's correctness claim
  * (LookupWaterfall cfg.fuzzyMode = "blocked"): its candidate generator
  * is COMPLETE — lev(a, b) <= d implies the <=d-deletion neighborhoods
  * of a and b intersect — so the SymSpell equi-join followed by exact
  * levenshtein verification returns IDENTICAL results to the nested
  * scan mode. The scaladoc argues this by alignment; this pins it by
  * property over random token-like strings for d in {1, 2}, plus the
  * soundness direction (neighborhood intersection never fires below
  * the real distance bound through the verify step's lens: any pair
  * with intersecting neighborhoods has lev <= 2d, the documented
  * candidate envelope the exact verify then filters).
  */
object DeleteVariantsPropSpec extends Properties("deleteVariants") {

  private val token: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf("abcde".toSeq)))

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1)
        else 1 + math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1)))
    dp(a.length)(b.length)
  }

  // the tiny alphabet forces frequent small distances, so the
  // completeness branch is exercised constantly, not vacuously
  property("complete: lev <= d => deletion neighborhoods intersect") =
    forAll(token, token, Gen.oneOf(1, 2)) { (a, b, d) =>
      lev(a, b) > d ||
        LookupWaterfall.deleteVariants(a, d)
          .exists(LookupWaterfall.deleteVariants(b, d).toSet)
    }

  property("sound envelope: intersecting neighborhoods => lev <= 2d") =
    forAll(token, token, Gen.oneOf(1, 2)) { (a, b, d) =>
      val intersects = LookupWaterfall.deleteVariants(a, d)
        .exists(LookupWaterfall.deleteVariants(b, d).toSet)
      !intersects || lev(a, b) <= 2 * d
    }
}
