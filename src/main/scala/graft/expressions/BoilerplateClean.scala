package graft.expressions

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for line-level boilerplate extraction
  * over markup-bearing text — the one curation stage every real
  * pretraining pipeline runs BEFORE near-dup/decontam/quality (the
  * jusText / trafilatura rule shape: Pomikálek 2011, "Removing
  * boilerplate and duplicate content from web corpora"). The reference
  * engine ingests already-clean text (its pipelines start from CSV
  * exports — `pipeline.py` has no markup stage), so this operator is
  * part of the beyond-reference LLM-pipeline estate.
  *
  * One call per document, map-side, zero fanout: split to lines on
  * '\n', per line strip tags / measure / verdict, reassemble kept
  * lines. The whole rule set is CLOSED-FORM — integer cross-multiplied
  * thresholds, no floats — so a DuckDB oracle replays it exactly
  * (q120's CTE chain is generated from the SAME constants below via
  * [[graft.operators.TextAnalysis.boilerplateCtes]]).
  *
  * Per-line algebra (all lengths in Unicode code points, matching
  * DuckDB `len` and Spark `length`):
  *   - `stripped` = line with every complete `<...>` tag removed
  *     (`<[^>]*>` — an unclosed `<` survives as text on both engines),
  *     then trimmed of ASCII SPACES ONLY (the semantics both engines'
  *     `trim` share; tabs and `\r` survive and count).
  *   - `sl`       = length(stripped)
  *   - `link_len` = Σ length(anchor text) over `<a...>...</a>` matches
  *     on the RAW line (`<a[^>]*>([^<]*)</a>` — nested markup inside an
  *     anchor ends the capture at the first `<`, identically in Java
  *     and RE2).
  *   - tokens     = stripped split on `[ \t]+`; stopword hits are
  *     case-insensitive exact matches against [[BoilerplateClean.Stopwords]].
  * Verdict, first match wins (thresholds are public constants; the
  * oracle interpolates the same values):
  *   1. `sl < MinLen`                               → 'short'
  *   2. `LinkDen·link_len > LinkNum·sl`             → 'link'
  *      (link density above LinkNum/LinkDen)
  *   3. `sl < NearLong ∧ StopDen·n_stop < tok_cnt`  → 'stop'
  *      (short-ish line with stopword ratio below 1/StopDen —
  *      navigation/code/enumeration shape)
  *   4. otherwise                                   → 'keep'
  * Output struct: clean_text (kept lines' STRIPPED text joined by
  * '\n'; empty string when nothing survives) + the per-doc evidence
  * counts (n_lines, n_kept, n_short, n_link, n_stop).
  *
  * At 100 TB this is the shape you want: a per-row codegen'd
  * expression inside the ingest scan's WholeStageCodegen span — no
  * explode, no shuffle, no UDF serialization — so boilerplate removal
  * rides the first pass over the raw corpus for free.
  */
case class BoilerplateClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"boilerplate_clean requires a string argument, got ${child.dataType}")

  override def dataType: DataType = BoilerplateClean.OutType
  override def prettyName: String = "boilerplate_clean"

  override def nullSafeEval(input: Any): Any =
    BoilerplateClean.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.BoilerplateClean.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BoilerplateClean =
    copy(child = newChild)
}

object BoilerplateClean {

  val OutType: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_short", IntegerType, nullable = false),
    StructField("n_link", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  /** minimum stripped length (code points) for a content line. */
  val MinLen = 25
  /** link-density threshold LinkNum/LinkDen: drop when
    * LinkDen·link_len > LinkNum·sl (i.e. density > 0.3).
    */
  val LinkNum = 3
  val LinkDen = 10
  /** lines at/above this stripped length keep regardless of stopwords
    * (long prose is content even when function-word-poor).
    */
  val NearLong = 120
  /** stopword-ratio floor 1/StopDen for near-long lines: drop when
    * StopDen·n_stop < tok_cnt (ratio < 0.05).
    */
  val StopDen = 20

  /** The fixed function-word set (lowercase exact match). Public so the
    * oracle generator interpolates the identical list.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")
  private val StopSet = new java.util.HashSet[String](java.util.Arrays.asList(Stopwords: _*))

  private val TagRe = Pattern.compile("<[^>]*>")
  private val AnchorRe = Pattern.compile("<a[^>]*>([^<]*)</a>")
  private val TokRe = Pattern.compile("[ \t]+")

  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** ASCII-space-only trim — the exact semantics of Spark's `trim` and
    * DuckDB's `trim` defaults (neither touches tabs or \r).
    */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Static entry point shared by interpreted + generated code paths. */
  def compute(input: UTF8String): InternalRow = {
    val lines = input.toString.split("\n", -1)
    var nKept, nShort, nLink, nStop = 0
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val stripped = trimSpaces(TagRe.matcher(line).replaceAll(""))
      val sl = cp(stripped)
      if (sl < MinLen) nShort += 1
      else {
        var linkLen = 0
        val am = AnchorRe.matcher(line)
        while (am.find()) linkLen += cp(am.group(1))
        if (LinkDen * linkLen > LinkNum * sl) nLink += 1
        else {
          val toks = TokRe.split(stripped, -1)
          var stop = 0
          var t = 0
          while (t < toks.length) {
            if (StopSet.contains(toks(t).toLowerCase(Locale.ROOT))) stop += 1
            t += 1
          }
          if (sl < NearLong && StopDen * stop < toks.length) nStop += 1
          else {
            if (nKept > 0) out.append('\n')
            out.append(stripped)
            nKept += 1
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), lines.length,
      nKept, nShort, nLink, nStop))
  }
}
