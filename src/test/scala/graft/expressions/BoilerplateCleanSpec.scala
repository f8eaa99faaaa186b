package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.GraftFunctions

/** [[BoilerplateClean]] — the line-level boilerplate extractor. The
  * DuckDB oracle (q120) pins cross-engine value parity at corpus scale;
  * this spec pins the rule semantics the oracle exercises only
  * statistically: each verdict class on handcrafted lines, the exact
  * trim/length/anchor conventions the cross-engine contract depends on,
  * and the plan shape (map-side, inside WholeStageCodegen).
  */
class BoilerplateCleanSpec extends SparkSpec {

  private def run(doc: String): (String, Int, Int, Int, Int, Int) = {
    val r = BoilerplateClean.compute(UTF8String.fromString(doc))
      .asInstanceOf[InternalRow]
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getInt(5))
  }

  test("verdict classes: short, link, stop, keep") {
    val title = "<html><head><title>Doc 7</title></head>"        // -> short
    val nav = "<a href=\"/h\">Home page</a> | <a href=\"/a\">About this site</a> | <a href=\"/c\">Contact</a>" // -> link
    val code = "x9 := hash_join(scan_3, probe); emit(out_row); flush_buffers()" // -> stop (no stopwords, < 120)
    val prose = "Some long enough prose with the usual words and a few of them" // -> keep
    val (clean, nLines, nKept, nShort, nLink, nStop) =
      run(Seq(title, nav, code, prose).mkString("\n"))
    assert(nLines == 4 && nKept == 1 && nShort == 1 && nLink == 1 && nStop == 1)
    assert(clean == prose)
  }

  test("a long stopword-free line keeps (NearLong overrides the stop rule)") {
    val long = "alpha beta gamma delta epsilon zeta " * 4  // 144 chars, no stopwords
    val (_, _, nKept, _, _, nStop) = run(long.trim)
    assert(nKept == 1 && nStop == 0)
  }

  test("link density uses anchor text over stripped length") {
    // anchor text 30 chars, surrounding prose pushes density under 0.3:
    // stripped ~ 30 + 75 = 105, 10*30 = 300 <= 3*105 = 315 -> not link
    val mixed = "This sentence is about the topic of interest and it keeps going on " +
      "<a href=\"/r\">a thirty character anchor text</a> ok"
    val (_, _, nKept, _, nLink, _) = run(mixed)
    assert(nLink == 0 && nKept == 1)
  }

  test("unclosed tag survives as text; anchor capture stops at nested tag") {
    // '<a href=' with no '>' is NOT a tag: it stays in the stripped text
    val (clean, _, nKept, _, _, _) =
      run("before <a href=broken and then enough prose to pass the length and the a of in rules")
    assert(nKept == 1 && clean.contains("<a href=broken"))
    // nested markup inside an anchor ends the [^<]* capture: link_len
    // counts only 'multi ' (6), not the bold part
    val nested = "<a href=\"/x\">multi <b>bold</b></a> plus the rest of a sentence with the usual words in it"
    val (_, _, k2, _, l2, _) = run(nested)
    assert(l2 == 0 && k2 == 1, "6-char capture over ~60 stripped must not be link-dense")
  }

  test("trim is ASCII-space-only; tabs and CR count toward length") {
    // 24 chars + surrounding spaces -> trimmed to 24 -> short
    assert(run("   twenty-four characters   ")._4 == 1)
    // a tab is NOT trimmed: 24 + 1 = 25 -> passes MinLen (the resulting
    // verdict is 'stop', not 'short' — the point here is the length)
    val (_, _, _, nShort, _, _) = run("\ttwenty-four characters!!")
    assert(nShort == 0, "leading tab must count toward stripped length")
  }

  test("lengths are code points, not UTF-16 units") {
    // 13 astral chars (2 UTF-16 units each) + 12 ASCII = 25 code points
    val astral = "😀" * 13 + "abcdefghijkl"
    val (_, _, _, nShort, _, _) = run(astral)
    assert(nShort == 0, "25 code points must pass MinLen=25")
    val under = "😀" * 12 + "abcdefghijkl"  // 24 code points
    assert(run(under)._4 == 1, "24 code points is short even at 36 UTF-16 units")
  }

  test("empty doc and all-dropped doc emit empty clean_text, not null") {
    assert(run("") == ("", 1, 0, 1, 0, 0))
    val (clean, nLines, nKept, _, _, _) = run("<b>x</b>\n<i>y</i>")
    assert(clean == "" && nLines == 2 && nKept == 0)
  }

  test("null propagates through the expression") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq(Some("line one has the a of and in to is on for with padding"), None)
      .toDF("s").selectExpr("graft_boilerplate_clean(s) AS c")
      .collect().map(r => Option(r.get(0)))
    assert(got.count(_.isEmpty) == 1 && got.count(_.isDefined) == 1)
  }

  test("q120 plan: expression inside WholeStageCodegen, sort is the only exchange") {
    GraftFunctions.register(spark)
    // the map stage alone (no sort — a sorted plan is AQE-wrapped,
    // which hides children from collect): one codegen span over the scan
    val mapStage = graft.core.Tables(spark, sf0001, "documents")
      .withColumn("markup",
        org.apache.spark.sql.functions.expr(
          graft.operators.TextAnalysis.BoilerplateFixtureSql))
      .selectExpr("graft_boilerplate_clean(markup) AS c")
    val codegen = mapStage.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty,
      "boilerplate_clean must stay inside WholeStageCodegen")
    val df = graft.SparkEntry.queries("q120_boilerplate_extract")(spark, sf0001)
    val exchanges = "Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges <= 1, "expected at most the output-sort exchange")
  }

  test("all verdict classes occur on the sf0.001 fixture corpus") {
    GraftFunctions.register(spark)
    val df = graft.SparkEntry.queries("q120_boilerplate_extract")(spark, sf0001)
    val agg = df.groupBy().sum("n_kept", "n_short", "n_link", "n_stop").head()
    (0 to 3).foreach(i => assert(agg.getLong(i) > 0,
      s"verdict class $i must be represented in the fixture corpus"))
  }
}
