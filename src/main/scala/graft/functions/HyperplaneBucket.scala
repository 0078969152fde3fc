package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: the random-hyperplane LSH bucket of a
  * FLOAT/DOUBLE vector — `hyperplane_bucket(emb, planes) → INT`, where
  * `planes` is a FOLDABLE `array<array<double>>` of ±1 hyperplanes and
  * bit i of the bucket is set iff `dot(emb, planes[i]) > 0`.
  *
  * Why an expression: the composable form is, PER PLANE,
  * `aggregate(zip_with(emb, planeLits, x*p), 0.0, +) > 0` — SQL
  * higher-order functions evaluate interpreted and allocate a zipped
  * intermediate array per plane per row, which made the 8-plane bucket
  * projection the dominant CPU of the `sim_ann_hyperplane_lsh` pipeline
  * (~0.5 ms/row interpreted vs ~1 µs here). Semantics are bit-identical
  * to that form and to the DuckDB oracle's unrolled CASE sum: per plane,
  * the dot accumulates in ELEMENT ORDER in double precision, and the
  * sign test is a strict `> 0`. A NULL input vector yields NULL (callers
  * that need the declarative form's 0-bucket coalesce it — see
  * `Advanced.sparkBucket`).
  *
  * Registered through [[GraftExtensions]] like [[CosineSimilarity]].
  */
case class HyperplaneBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case org.apache.spark.sql.types.NullType => Some(FloatType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), right.dataType, right.foldable) match {
      case (Some(_), ArrayType(ArrayType(DoubleType, _), _), true) =>
        TypeCheckResult.TypeCheckSuccess
      case (Some(_), ArrayType(ArrayType(DoubleType, _), _), false) =>
        TypeCheckResult.TypeCheckFailure(
          "hyperplane_bucket planes must be a literal (foldable) array")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket expects (array<float|double>, array<array<double>>), got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  @transient private lazy val isFloat: Boolean =
    elemType(left).contains(FloatType)

  /** The planes, folded ONCE from the literal child (never per row).
    * Shape-validated here — the type check can't see a NULL literal, a
    * NULL inner plane, or jagged plane lengths, and `compute`'s hot loop
    * indexes `planes(i)(d)` assuming a uniform rectangle; failing the
    * fold with a named error beats an NPE at planning time or an
    * ArrayIndexOutOfBounds mid-scan. */
  @transient private lazy val planes: Array[Array[Double]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    require(arr != null, "hyperplane_bucket: planes literal must not be NULL")
    val out = Array.tabulate(arr.numElements()) { i =>
      val p = arr.getArray(i)
      require(p != null, s"hyperplane_bucket: plane $i is NULL")
      p.toDoubleArray()
    }
    require(out.isEmpty || out.forall(_.length == out(0).length),
      s"hyperplane_bucket: jagged plane lengths ${out.map(_.length).mkString(",")} — " +
        "all planes must share the vector dimension")
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HyperplaneBucket.compute(a.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"""
         |${ev.value} = graft.functions.HyperplaneBucket.compute(
         |  $a, $planesRef, $isFloat);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneBucket =
    copy(left = newLeft, right = newRight)
}

object HyperplaneBucket {
  /** Column-level entry point; `planes` become a foldable literal child. */
  def hyperplaneBucket(emb: Column, planes: Array[Array[Int]]): Column =
    call_function("hyperplane_bucket", emb,
      array(planes.toIndexedSeq.map(p =>
        array(p.toIndexedSeq.map(v => lit(v.toDouble)): _*)): _*))

  /** Hot loop, called from generated code: ONE pass over the vector
    * accumulating every plane's element-order double dot (identical FP
    * result to the declarative zip_with fold), then the sign tests.
    * Edge semantics match the declarative/oracle form exactly:
    *  - a NULL element nulls every plane dot there → bucket 0;
    *  - a length mismatch makes zip_with null-pad (and the oracle's
    *    out-of-range subscript NULL) → bucket 0;
    *  - a NaN dot (NaN element, or ±Inf cancelling) compares GREATER
    *    than 0 under Spark/DuckDB total ordering → the bit is SET.
    * Must stay static-shaped and allocation-light. */
  def compute(arr: ArrayData, planes: Array[Array[Double]],
      isFloat: Boolean): Int = {
    if (planes.length == 0) return 0
    val dim = planes(0).length
    val n = arr.numElements()
    if (n != dim) return 0
    val sums = new Array[Double](planes.length)
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return 0
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      var i = 0
      while (i < planes.length) {
        sums(i) += x * planes(i)(d)
        i += 1
      }
      d += 1
    }
    var bucket = 0
    var i = 0
    while (i < planes.length) {
      val s = sums(i)
      if (java.lang.Double.isNaN(s) || s > 0) bucket |= (1 << i)
      i += 1
    }
    bucket
  }
}
