package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextNorm

/** Native Catalyst expression for the F2 basic normalization (lowercase,
  * alnum-only, collapsed whitespace) — the engine's hottest scalar
  * function (it keys every catalog lookup).
  *
  * Versus a Scala UDF this avoids the UDF's catalyst<->Scala row
  * conversion and null-wrapper plumbing and stays inside whole-stage
  * codegen: the generated code calls the static helper directly on the
  * UTF8String value (the same pattern Spark's own string expressions
  * use). Promotion policy per SURVEY §2.10: UDF first, native Expression
  * where the profile demands — this is the worked example.
  */
case class NormalizeBasic(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_basic requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_basic"

  override def nullSafeEval(input: Any): Any =
    NormalizeBasic.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NormalizeBasic.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeBasic =
    copy(child = newChild)
}

object NormalizeBasic {
  /** static entry point shared by interpreted + generated code paths. */
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(TextNorm.normalizeBasic(s.toString))
}
