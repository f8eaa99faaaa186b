package graft.functions

/** Salt/synonym/form/route normalization (SURVEY §2.8 F15, F17, F20),
  * pure Scala over the [[Constants]] tables.
  */
object SaltLib {

  /** F15 `strip_salt_suffix` (`tokenizer.py:1395-1435`): longest-suffix
    * salt strip with the pure-salt-compound guard and the "X AS Y" form.
    * Returns (base, Some(salt)) or (upper, None).
    */
  def stripSaltSuffix(generic: String): (String, Option[String]) = {
    val up = generic.toUpperCase
    if (Constants.pureSaltCompounds.contains(up)) return (up, None)
    for (suffix <- Constants.saltTokensLongestFirst) {
      if (up.endsWith(" " + suffix)) {
        var base = up.dropRight(suffix.length + 1).trim
        if (base.endsWith(" AS")) base = base.dropRight(3).trim
        return (base, Some(suffix))
      }
    }
    val asIdx = up.indexOf(" AS ")
    if (asIdx >= 0) {
      val salt = up.substring(asIdx + 4).trim
      if (Constants.saltTokens.contains(salt))
        return (up.substring(0, asIdx).trim, Some(salt))
    }
    (up, None)
  }

  /** F17 `_singularize` (`lookup.py:52-68`): IES->Y, -ES after s/x/z/h,
    * plain -S (never -SS).
    */
  def singularize(word: String): String = {
    val up = word.toUpperCase
    if (up.endsWith("IES")) up.dropRight(3) + "Y"
    else if (up.endsWith("ES") && up.length > 3) {
      if ("SXZH".indexOf(up.charAt(up.length - 3)) >= 0) up.dropRight(2)
      else up.dropRight(1)
    } else if (up.endsWith("S") && !up.endsWith("SS")) up.dropRight(1)
    else up
  }

  /** F17 `apply_synonym` (`lookup.py:71-94`): explicit synonym first, then
    * first-word singularization (checked against synonyms again).
    */
  def applySynonym(generic: String,
      synonyms: Map[String, String] = Constants.synonymMap): String = {
    val up = generic.toUpperCase
    synonyms.get(up) match {
      case Some(s) => s
      case None =>
        val words = up.split(" ").toList
        words match {
          case first :: rest if first.endsWith("S") && !first.endsWith("SS") =>
            val singularName = (singularize(first) :: rest).mkString(" ")
            synonyms.getOrElse(singularName, singularName)
          case _ => up
        }
    }
  }

  /** F20 form canonicalization (`form_route_mapping.py:35-41`). */
  def canonForm(form: String): String = {
    if (form == null || form.isEmpty) return ""
    val up = form.toUpperCase.trim
    Constants.formCanon.getOrElse(up, up)
  }

  /** G4 `explode_kit_forms` (`form_route_mapping.py:86-101`): kit forms
    * split on ';' into canon-normalized components ("KIT; TABLET" ->
    * KIT, TABLET); non-kits yield their single canon form.
    */
  def explodeKitForms(form: String): List[String] = {
    if (form == null || form.isEmpty) return Nil
    val up = form.toUpperCase.trim
    if (up.contains(";"))
      up.split(";").toList.map(_.trim).filter(_.nonEmpty).map(canonForm)
    else List(canonForm(up))
  }

  /** F20 route canonicalization (`form_route_mapping.py:44-50`). */
  def canonRoute(route: String): String = {
    if (route == null || route.isEmpty) return ""
    val up = route.toUpperCase.trim
    Constants.routeCanon.getOrElse(up, up)
  }

  /** F20 `infer_route_from_form` (`form_route_mapping.py:53-101`): direct
    * lookup, then comma-base with release-modifier retention.
    */
  def inferRouteFromForm(form: String): Option[String] = {
    if (form == null || form.isEmpty) return None
    val f = canonForm(form)
    Constants.formToRoute.get(f).orElse {
      val comma = f.indexOf(',')
      if (comma < 0) None
      else {
        val base = f.substring(0, comma).trim
        val modifier = f.substring(comma + 1).trim
        val withRelease =
          if (modifier.contains("RELEASE"))
            Constants.formToRoute.get(s"$base, $modifier")
          else None
        withRelease.orElse(Constants.formToRoute.get(base))
      }
    }
  }

  /** Valid routes for a form (`FORM_TO_ROUTES`), canon-normalized. */
  def validRoutesForForm(form: String): Set[String] =
    Constants.formToRoutes.getOrElse(canonForm(form), Set.empty)

  /** Route-aware form compatibility (`runners.py:1195-1296` condensed):
    * equal canon forms, same equivalence group, or overlapping valid-route
    * sets when both forms are known.
    */
  def formsCompatible(a: String, b: String): Boolean = {
    if (a == null || b == null) return false
    val (ca, cb) = (canonForm(a), canonForm(b))
    if (ca.isEmpty || cb.isEmpty) return false
    if (ca == cb) return true
    (Constants.formEquivalenceGroup.get(ca), Constants.formEquivalenceGroup.get(cb)) match {
      case (Some(ga), Some(gb)) if ga == gb => return true
      case _ =>
    }
    Constants.formEquivalents.get(ca).exists(_.contains(cb)) ||
      Constants.formEquivalents.get(cb).exists(_.contains(ca)) || {
        val (ra, rb) = (validRoutesForForm(ca), validRoutesForForm(cb))
        ra.nonEmpty && rb.nonEmpty && (ra & rb).nonEmpty
      }
  }
}
