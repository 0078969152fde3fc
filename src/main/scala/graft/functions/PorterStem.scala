package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Porter-stem a string — the `english`
  * analyzer's stemming stage ([[graft.operators.Porter]], the published
  * 1980 algorithm), applied per token inside the analyzer's `transform`
  * over the stop-filtered token array.
  *
  * Why native: stemming runs inside every postings build, MATCH term
  * analysis and band derivation on an `english`-analyzed index — scan-
  * side, corpus-sized work. A Scala UDF would box every token and break
  * whole-stage codegen exactly there; this expression stays codegen'd
  * (one static call per token, same shape as Spark's own regexp
  * functions calling into their helpers).
  *
  * Semantics: NULL in → NULL out; the stemmer itself passes through
  * anything that is not a lowercase-ASCII word of length ≥ 3 (the
  * analyzer lowercases first), so no input can fail.
  */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"porter_stem expects a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PorterStem.stemUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PorterStem.stemUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
}

object PorterStem {
  /** Static entry point for the generated code (and the eval path):
    * UTF8String round trip around the pure stemmer. */
  def stemUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.operators.Porter.stem(s.toString))

  /** Column-level entry point (sessions must be built with
    * GraftExtensions). */
  def porterStem(c: Column): Column = call_function("porter_stem", c)
}
