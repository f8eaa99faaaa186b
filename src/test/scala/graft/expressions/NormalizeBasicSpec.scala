package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, TextNorm}

/** The native expression must agree byte-for-byte with the pure function
  * and the UDF, on both the codegen and interpreted paths.
  */
class NormalizeBasicSpec extends SparkSpec {

  test("native expression output matches pure function + UDF over documents") {
    GraftFunctions.register(spark)
    graft.core.Tables.registerAll(spark, sf0001)
    val rows = spark.sql(
      """SELECT text, graft_normalize_basic_native(text) AS native,
        |       graft_normalize_basic(text) AS viaUdf
        |FROM documents""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = TextNorm.normalizeBasic(r.getAs[String]("text"))
      assert(r.getAs[String]("native") == expected)
      assert(r.getAs[String]("viaUdf") == expected)
    }
  }

  test("null propagates (interpreted path via local relation folding)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Some("A--B"), None).toDF("s")
      .selectExpr("graft_normalize_basic_native(s) AS n")
    val got = df.collect().map(r => Option(r.getAs[String]("n")))
    assert(got.toSet == Set(Some("a b"), None))
  }

  test("stays inside WholeStageCodegen on a parquet-backed plan") {
    GraftFunctions.register(spark)
    graft.core.Tables.registerAll(spark, sf0001)
    val df = spark.sql(
      "SELECT graft_normalize_basic_native(text) AS n FROM documents")
    // '*(n)' prefixes in the plan mark WholeStageCodegen stages; assert on
    // the operator class to be rendering-proof
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty)
    assert(df.count() > 0)
  }
}
