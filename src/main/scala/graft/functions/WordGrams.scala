package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: sliding word n-grams over a token array —
  * `word_grams(array<string>, n) → array<string>` (round 18, guide §4:
  * eliminate non-codegen expressions in the hot path).
  *
  * Semantics are identical to the declarative spelling it replaces in
  * [[graft.operators.TextDedup.gramsArrN]] / `withShingles`:
  * `CASE WHEN size(tk) >= n THEN transform(sequence(1, size(tk)-(n-1)),
  * i -> array_join(slice(tk, i, n), ' ')) ELSE array() END` — gram i is
  * tokens i..i+n−1 joined by one space; fewer than n tokens (or a NULL
  * array) yields the EMPTY array, exactly like the CASE's ELSE branch
  * (under ANSI, size(NULL) is NULL so the WHEN is not taken). A NULL
  * token element is skipped inside its grams like array_join skips it —
  * unreachable from [[graft.operators.Analyzer.tokens]], whose splits
  * never produce null elements, but pinned by WordGramsSpec anyway.
  *
  * Why an expression: `transform` and its lambda run OUTSIDE whole-stage
  * codegen (Spark plans higher-order functions as interpreted Projects),
  * and each gram paid an interpreted `slice` (array allocation) plus
  * `array_join` per element — measured as the dominant CPU of the
  * decontamination gram pass at the 10× profiling SF (~0.7 µs/gram,
  * stage CPU tripling under 32-way concurrency from allocation
  * pressure). This operator builds each gram with one
  * `UTF8String.concatWs` straight off the token bytes inside the
  * projection, keeping the stage in whole-stage codegen.
  *
  * Registered through `GraftExtensions` like [[MinHashSlices]].
  */
case class WordGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val tokOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (!tokOk) TypeCheckResult.TypeCheckFailure(
      s"word_grams expects array<string> tokens, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "word_grams expects a literal int gram size")
    else if (nValue < 2) TypeCheckResult.TypeCheckFailure(
      s"gram size must be >= 2, got $nValue")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val nValue: Int = right.eval() match {
    case i: Int => i
    case _ => -1 // non-int / null literal: rejected by the type check
  }

  override def eval(input: InternalRow): Any =
    WordGrams.compute(left.eval(input).asInstanceOf[ArrayData], nValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.WordGrams.compute(
            ${l.isNull} ? null : ${l.value}, $nValue);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGrams =
    copy(left = newLeft, right = newRight)
}

object WordGrams {
  /** Column-level entry point (resolves through the session's function
    * registry — sessions must be built with GraftExtensions). */
  def wordGrams(tokens: Column, n: Int): Column =
    call_function("word_grams", tokens,
      org.apache.spark.sql.functions.lit(n))

  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(new Array[AnyRef](0))

  /** Sliding n-grams, one `concatWs` per gram. Empty/NULL/short input →
    * the empty array (the CASE-ELSE contract). Called from generated
    * code — must stay static-shaped and allocation-light. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    if (toks == null) return Empty
    val num = toks.numElements()
    if (num < n) return Empty
    val elems = new Array[UTF8String](num)
    var i = 0
    while (i < num) {
      elems(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](num - n + 1)
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= num - n) {
      var j = 0
      while (j < n) { window(j) = elems(i + j); j += 1 }
      // concatWs skips null inputs — array_join's exact null rule
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
