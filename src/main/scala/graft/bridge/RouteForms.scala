package graft.bridge

import graft.functions.Constants

/** Part-4 route/form compatibility, ported 1:1 from the reference's
  * Part-4 closures (`runners.py:1195-1341`) and golden-tested against
  * them (forms_compatible_goldens.tsv / route_matches_goldens.tsv).
  *
  * Key semantics that differ from the generic [[graft.functions.SaltLib]]
  * helpers (which mirror the Parts-2/3 scoring layer):
  *   - a MISSING form or route on either side is COMPATIBLE (the ESOA
  *     data is sparse; strictness comes from the dose key);
  *   - no canonicalization — raw upper/trim comparisons, exactly like
  *     the reference;
  *   - routes expand through synonym groups (PARENTERAL ≡ IV/IM/SC …)
  *     before overlap checks.
  */
object RouteForms {

  private def clean(s: String): String =
    if (s == null) "" else s.toUpperCase.trim

  /** `route_matches` (`runners.py:1298-1341`): missing either side =
    * compatible; equal = compatible; otherwise both routes must fall in
    * overlapping route groups (a route in NO group never group-matches).
    */
  def routeMatches(candRoute: String, esoaRoute: String): Boolean = {
    val c = clean(candRoute)
    val e = clean(esoaRoute)
    if (c.isEmpty || e.isEmpty) return true
    if (c == e) return true
    def groupsOf(r: String): Set[String] =
      Constants.routeGroups.iterator.collect {
        case (base, syns) if syns.contains(r) || r == base => syns + base
      }.flatten.toSet
    val cg = groupsOf(c)
    val eg = groupsOf(e)
    cg.nonEmpty && eg.nonEmpty && (cg & eg).nonEmpty
  }

  /** `forms_compatible` (`runners.py:1195-1296`): missing either form =
    * compatible; equality / FORM_EQUIVALENTS; else compare valid-route
    * sets from FORM_TO_ROUTES (with the ordered partial-key fallback and
    * per-row route constraining), expanded through route synonyms; with
    * no route info on one side, fall back to the permissive
    * compatible-pairs groups.
    */
  def formsCompatible(candForm: String, esoaForm: String,
      candRoute: String = null, esoaRoute: String = null): Boolean = {
    val cf = clean(candForm)
    val ef = clean(esoaForm)
    if (cf.isEmpty || ef.isEmpty) return true
    if (cf == ef) return true

    if (Constants.formEquivalents.get(cf).exists(_.contains(ef))) return true
    if (Constants.formEquivalents.get(ef).exists(_.contains(cf))) return true

    var candRoutes = Constants.formToRoutes.getOrElse(cf, Set.empty[String])
    var esoaRoutes = Constants.formToRoutes.getOrElse(ef, Set.empty[String])
    // partial-key fallback: FIRST substring-matching key in the
    // reference's dict order (formToRoutesOrdered)
    if (candRoutes.isEmpty)
      Constants.formToRoutesOrdered
        .find { case (k, _) => cf.contains(k) || k.contains(cf) }
        .foreach { case (_, v) => candRoutes = candRoutes ++ v }
    if (esoaRoutes.isEmpty)
      Constants.formToRoutesOrdered
        .find { case (k, _) => ef.contains(k) || k.contains(ef) }
        .foreach { case (_, v) => esoaRoutes = esoaRoutes ++ v }

    // constrain by the row's own route BEFORE synonym expansion — an
    // empty intersection deliberately drops to the compatible-pairs
    // fallback, as in the reference
    val cr = clean(candRoute)
    if (cr.nonEmpty)
      candRoutes = if (candRoutes.nonEmpty) candRoutes & Set(cr) else Set(cr)
    val er = clean(esoaRoute)
    if (er.nonEmpty)
      esoaRoutes = if (esoaRoutes.nonEmpty) esoaRoutes & Set(er) else Set(er)

    if (candRoutes.nonEmpty && esoaRoutes.nonEmpty) {
      val expC = candRoutes.flatMap(r =>
        Constants.routeSynonyms.getOrElse(r, Set.empty) + r)
      val expE = esoaRoutes.flatMap(r =>
        Constants.routeSynonyms.getOrElse(r, Set.empty) + r)
      return (expC & expE).nonEmpty
    }

    Constants.compatibleFormPairs.exists(g => g.contains(cf) && g.contains(ef))
  }
}
