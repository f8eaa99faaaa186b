package graft.prep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Constants, DetailsLib, DoseLib, SaltExtract, TextNorm}

/** PNF preparation (SURVEY §2.2 P8 + §2.7 G1): the wide derived projection
  * of `prepare.py:50-133` — base/salt decomposition, slug ids, PNF route-
  * token mapping, ATC cleanup, the 7 detail columns, dose-struct parsing
  * over generic+spec text, strength/ratio helpers, and the route explode
  * (one row per allowed route).
  *
  * The reference fans this over a process pool (`concurrency.py:63-121`);
  * here it is one narrow projection of UDFs over pure textlib functions —
  * partition-parallel with no shuffle until the explode.
  */
object PnfPrepare {

  /** `map_route_token` (`routes_forms.py:23-49`): PNF route descriptor ->
    * canonical route token list.
    */
  val routeTokenTable: Map[String, List[String]] = Map(
    "Oral:" -> List("oral"),
    "Oral/Tube feed:" -> List("oral"),
    "Inj.:" -> List("intravenous", "intramuscular", "subcutaneous"),
    "IV:" -> List("intravenous"),
    "IV/SC:" -> List("intravenous", "subcutaneous"),
    "SC:" -> List("subcutaneous"),
    "Subdermal:" -> List("subcutaneous"),
    "Inhalation:" -> List("inhalation"),
    "Topical:" -> List("topical"),
    "Patch:" -> List("transdermal"),
    "Ophthalmic:" -> List("ophthalmic"),
    "Intraocular:" -> List("ophthalmic"),
    "Otic:" -> List("otic"),
    "Nasal:" -> List("nasal"),
    "Rectal:" -> List("rectal"),
    "Vaginal:" -> List("vaginal"),
    "Sublingual:" -> List("sublingual"),
    "Oral antiseptic:" -> List("oral"),
    "Oral/Inj.:" -> List("oral", "intravenous", "intramuscular", "subcutaneous"))

  def mapRouteToken(r: String): List[String] =
    if (r == null) Nil else routeTokenTable.getOrElse(r.trim, Nil)

  private def orderedRows(res: String): List[List[String]] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(res), "UTF-8")
    try src.getLines().drop(1).map(_.split(",", -1).toList).toList
    finally src.close()
  }

  /** FORM_WORDS in table order (first match wins, `routes_forms.py:51-57`). */
  lazy val formWords: List[String] =
    orderedRows("/graft/pnf_form_words.csv").map(_(1))

  /** ROUTE_ALIASES in table order (`routes_forms.py`). */
  lazy val routeAliases: List[(String, String)] =
    orderedRows("/graft/pnf_route_aliases.csv").map(r => (r(1), r(2)))

  lazy val formToRouteLower: Map[String, String] =
    orderedRows("/graft/pnf_form_to_route.csv").map(r => r(0) -> r(1)).toMap

  /** `parse_form_from_text` (`routes_forms.py:51-57`). */
  def parseFormFromText(sNorm: String): Option[String] = {
    if (sNorm == null) return None
    formWords.find(fw =>
      java.util.regex.Pattern.compile(
        "\\b" + java.util.regex.Pattern.quote(fw) + "\\b")
        .matcher(sNorm).find())
  }

  /** `extract_route_and_form` (`routes_forms.py:59-78`): route + form +
    * evidence string, with form->route imputation.
    */
  def extractRouteAndForm(sNorm: String): (Option[String], Option[String], String) = {
    if (sNorm == null) return (None, None, "")
    val evidence = scala.collection.mutable.ListBuffer.empty[String]
    val form = parseFormFromText(sNorm)
    form.foreach(f => evidence += s"form:$f")
    var route = routeAliases.collectFirst {
      case (alias, r) if java.util.regex.Pattern.compile(
        "\\b" + java.util.regex.Pattern.quote(alias) + "\\b")
        .matcher(sNorm).find() =>
        evidence += s"route:$alias->$r"; r
    }
    if (route.isEmpty)
      form.flatMap(formToRouteLower.get).foreach { r =>
        route = Some(r)
        evidence += s"impute_route:${form.get}->$r"
      }
    (route, form, evidence.mkString(";"))
  }

  /** `prepare` PNF half (`prepare.py:50-133`): input needs Molecule,
    * Route, ATC Code (+ optional spec-text column); output is the 24-col
    * pnf_prepared schema with one row per allowed route.
    */
  def preparePnf(spark: SparkSession, pnf: DataFrame,
      specCol: Option[String] = None): DataFrame = {
    val required = Seq("Molecule", "Route", "ATC Code")
    required.foreach(c => require(pnf.columns.contains(c),
      s"pnf is missing required column: $c"))

    val baseSalts = udf((m: String) => {
      val (base, salts) = SaltExtract.extractBaseAndSalts(
        Option(m).getOrElse(""))
      (base, SaltExtract.serializeSaltList(salts))
    })
    val slug = udf((s: String) => TextNorm.slugId(s))
    val routes = udf((r: String) => mapRouteToken(r))
    val atcClean = udf((s: String) => TextNorm.cleanAtc(Option(s).getOrElse("")))
    val details = graft.functions.GraftFunctions.extractDrugDetails
    val normText = udf((s: String) => TextNorm.normalizeText(s))
    val doseStruct = udf((s: String) => DoseLib.parseDoseStruct(s) match {
      case Some(DoseLib.AmountDose(v, u)) =>
        ("amount", Some(v), Some(u), None: Option[Double], None: Option[String], None: Option[Double])
      case Some(DoseLib.RatioDose(v, u, pv, pu)) =>
        ("ratio", Some(v), Some(u), Some(pv), Some(pu), None)
      case Some(DoseLib.PercentDose(p)) =>
        ("percent", None, None, None, None, Some(p))
      case None => (null, None, None, None, None, None)
    })
    val formOf = udf((s: String) => parseFormFromText(s))
    val strengthMg = udf((v: java.lang.Double, u: String) =>
      if (v == null || u == null) None else DoseLib.toMg(v, u))
    val ratioMgMl = udf((kind: String, v: java.lang.Double, u: String,
        pv: java.lang.Double) =>
      if (kind != "ratio" || v == null || u == null || pv == null) None
      else DoseLib.safeRatioMgPerMl(v, u, pv))

    val molecule = coalesce(col("Molecule").cast("string"), lit(""))
    val withSpec = specCol match {
      case Some(c) if pnf.columns.contains(c) =>
        pnf.withColumn("_tech", coalesce(col(c).cast("string"), lit("")))
      case _ => pnf.withColumn("_tech", lit(""))
    }

    withSpec
      .withColumn("raw_molecule", molecule)
      .withColumn("generic_name", upper(trim(molecule)))
      .withColumn("_bs", baseSalts(molecule))
      .withColumn("generic_normalized",
        when(length(col("_bs._1")) > 0, col("_bs._1"))
          .otherwise(upper(trim(molecule))))
      .withColumn("salt_form", col("_bs._2"))
      .withColumn("generic_id", slug(col("generic_normalized")))
      .withColumn("synonyms", lit(""))
      .withColumn("routes", routes(col("Route").cast("string")))
      .withColumn("atc_code", atcClean(col("ATC Code").cast("string")))
      .withColumn("_d", details(molecule))
      .withColumn("_parse_src",
        normText(trim(concat_ws(" ", col("generic_normalized"), col("_tech")))))
      .withColumn("_dose", doseStruct(col("_parse_src")))
      .withColumn("form", formOf(col("_parse_src")))
      .withColumn("strength_mg", strengthMg(col("_dose._2"), col("_dose._3")))
      .withColumn("ratio_mg_per_ml", ratioMgMl(col("_dose._1"),
        col("_dose._2"), col("_dose._3"), col("_dose._4")))
      .withColumn("route", explode_outer(col("routes")))
      .filter(length(col("generic_name")) > 0)
      .select(
        col("generic_id"), col("generic_name"), col("generic_normalized"),
        col("raw_molecule"), col("salt_form"), col("synonyms"), col("atc_code"),
        col("route"), col("form"),
        col("_dose._1").as("dose_kind"), col("_dose._2").as("strength"),
        col("_dose._3").as("unit"), col("_dose._4").as("per_val"),
        col("_dose._5").as("per_unit"), col("_dose._6").as("pct"),
        col("strength_mg"), col("ratio_mg_per_ml"),
        col("_d.saltDetails").as("salt_details"),
        col("_d.indicationDetails").as("indication_details"),
        col("_d.aliasDetails").as("alias_details"),
        col("_d.typeDetails").as("type_details"),
        col("_d.releaseDetails").as("release_details"),
        col("_d.formDetails").as("form_details"))
  }
}
