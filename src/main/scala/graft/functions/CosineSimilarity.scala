package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two FLOAT or DOUBLE
  * vectors, computed in double precision in ONE fused pass (dot, |a|²,
  * |b|² accumulated together), with full whole-stage-codegen support.
  *
  * Why not compose built-ins? The declarative form
  * `aggregate(zip_with(a,b,*),0.0,+) / (sqrt(…)*sqrt(…))` walks the arrays
  * five times and allocates a zipped intermediate array per row per pair —
  * at ANN scale (queries × corpus pairs) that's the hot loop. This
  * expression is the standard Catalyst upgrade path (SURVEY.md §4.2):
  * same semantics, one pass, zero allocation, codegen-inlined.
  *
  * Semantics: element-order summation (bit-identical to the DuckDB
  * oracle's list_sum over list_transform); zero-norm input → NULL; a NULL
  * array element → NULL (matching how the declarative aggregate
  * propagates nulls).
  *
  * Registered through `GraftExtensions` (SparkSessionExtensions
  * .injectFunction) — the public extension mechanism — and exposed as a
  * Column via `call_function`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case org.apache.spark.sql.types.NullType => Some(FloatType) // NULL literal → null result
    case _ => None
  }

  // resolved once, not per row (interpreted eval is per-row otherwise)
  @transient private lazy val leftElem: DataType = elemType(left).get
  @transient private lazy val rightElem: DataType = elemType(right).get

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float>/array<double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  @inline private def get(x: ArrayData, i: Int, t: DataType): Double =
    if (t == FloatType) x.getFloat(i).toDouble else x.getDouble(i)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (leftElem, rightElem)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = get(x, i, lt)
      val yi = get(y, i, rt)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val broke = ctx.freshName("broke")
      val getL = if (leftElem == FloatType) "getFloat" else "getDouble"
      val getR = if (rightElem == FloatType) "getFloat" else "getDouble"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $broke = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $broke = true; break; }
         |  double $xi = (double) $a.$getL($i);
         |  double $yi = (double) $b.$getR($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($broke || $denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point (resolves through the session's function
    * registry — sessions must be built with GraftExtensions).
    */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
