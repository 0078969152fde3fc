package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Native Catalyst expressions for int8 scalar quantization (SQ8) of
  * packed-float32 vectors against a FROZEN per-dimension code book —
  * the 4× list-compression rung of IVF serving (FAISS's
  * IndexIVFScalarQuantizer shape, Johnson et al. 2017: bounds train
  * once, quantization is a stateless per-row map afterwards).
  *
  * The code book (per-dimension min/max) is an expression CONSTANT, not
  * a column: an index's bounds are trained from the deterministic
  * xxhash-ordered training sample (`Index.trainingSample` — the sample
  * REBUILD also retrains centroids from; create-time seed centroids use
  * the k lowest-pk vectors instead, so the two sample sets coincide only
  * at rebuild) and live in the index metadata, so every derive/serve
  * site quantizes against literally the same grid. Bounds from a
  * ≤256·k sample can saturate on out-of-sample dimensions — the
  * documented SQ8 trade; REBUILD retrains after drift. Code: `round(255·(v−mn)/(mx−mn))` clamped to [0,255]
  * (out-of-sample values saturate — the standard SQ8 posture); a
  * constant dimension (mx == mn) codes to 0 and reconstructs to mn.
  *
  * Why native: like [[Float32Unpack]], the byte-level repack has no
  * `functions._` spelling, and these run inside ANN scans and commit
  * index builds — a boxed UDF would fall out of whole-stage codegen
  * exactly where the volume is.
  *
  * Semantics: NULL in → NULL out; a payload whose float count differs
  * from the code book's dimension count → NULL (malformed blobs
  * quarantine as nulls — the Float32Unpack posture), never a partial
  * vector.
  */
case class Int8Quantize(child: Expression, mins: IndexedSeq[Float],
    maxs: IndexedSeq[Float]) extends UnaryExpression {
  require(mins.length == maxs.length && mins.nonEmpty,
    "int8_quantize: mins/maxs must be equal-length and non-empty")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize expects a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length != mins.length * 4) return null
    val out = new Array[Byte](mins.length)
    var i = 0
    while (i < out.length) {
      val v = java.lang.Float.intBitsToFloat(
        (b(4 * i) & 0xff) | ((b(4 * i + 1) & 0xff) << 8) |
          ((b(4 * i + 2) & 0xff) << 16) | ((b(4 * i + 3) & 0xff) << 24))
      out(i) = Int8Codec.code(v, mins(i), maxs(i))
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("mins", mins.toArray, "float[]")
    val mx = ctx.addReferenceObj("maxs", maxs.toArray, "float[]")
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |if ($b.length != $mn.length * 4) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[$mn.length];
         |  for (int $i = 0; $i < $out.length; $i++) {
         |    float $v = java.lang.Float.intBitsToFloat(
         |      ($b[4 * $i] & 0xff) | (($b[4 * $i + 1] & 0xff) << 8) |
         |      (($b[4 * $i + 2] & 0xff) << 16) | (($b[4 * $i + 3] & 0xff) << 24));
         |    $out[$i] = graft.functions.Int8Codec.code($v, $mn[$i], $mx[$i]);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** The inverse map: int8 codes → reconstructed `array<float>` on the
  * same frozen grid (`mn + code·(mx−mn)/255`). NULL / wrong-length
  * payloads → NULL, like the quantizer. */
case class Int8Dequantize(child: Expression, mins: IndexedSeq[Float],
    maxs: IndexedSeq[Float]) extends UnaryExpression {
  require(mins.length == maxs.length && mins.nonEmpty,
    "int8_dequantize: mins/maxs must be equal-length and non-empty")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_dequantize expects a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length != mins.length) return null
    val out = new Array[Float](mins.length)
    var i = 0
    while (i < out.length) {
      out(i) = Int8Codec.recon(b(i), mins(i), maxs(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("mins", mins.toArray, "float[]")
    val mx = ctx.addReferenceObj("maxs", maxs.toArray, "float[]")
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |if ($b.length != $mn.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[$mn.length];
         |  for (int $i = 0; $i < $out.length; $i++) {
         |    $out[$i] = graft.functions.Int8Codec.recon($b[$i], $mn[$i], $mx[$i]);
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Dequantize =
    copy(child = newChild)
}

object Int8Codec {
  /** One dimension's SQ8 code — shared by interpreted eval and codegen
    * (the generated code calls this directly, so the two paths can
    * never drift). */
  def code(v: Float, mn: Float, mx: Float): Byte = {
    if (mx <= mn) return 0
    val c = Math.round(255.0f * (v - mn) / (mx - mn))
    (if (c < 0) 0 else if (c > 255) 255 else c).toByte
  }

  /** One dimension's reconstruction (codes read back UNSIGNED). */
  def recon(b: Byte, mn: Float, mx: Float): Float =
    if (mx <= mn) mn else mn + (b & 0xff) * (mx - mn) / 255.0f

  /** Column entry points: the code book rides as packed-float32 BINARY
    * LITERALS (the [[Float32Unpack.pack]] layout) that the
    * GraftExtensions builder folds back into expression constants. */
  def int8Quantize(b: Column, mins: Seq[Float], maxs: Seq[Float]): Column =
    call_function("int8_quantize", b,
      lit(Float32Unpack.pack(mins)), lit(Float32Unpack.pack(maxs)))

  def int8Dequantize(b: Column, mins: Seq[Float], maxs: Seq[Float]): Column =
    call_function("int8_dequantize", b,
      lit(Float32Unpack.pack(mins)), lit(Float32Unpack.pack(maxs)))

  /** Unpack a packed-float32 bounds literal back to floats (builder
    * side of the Column entry points). */
  private[functions] def unpackBounds(e: Expression, what: String): IndexedSeq[Float] = {
    require(e.foldable && e.dataType == BinaryType,
      s"$what: the code-book bounds must be binary literals")
    val b = e.eval(null).asInstanceOf[Array[Byte]]
    require(b != null && b.length % 4 == 0 && b.length > 0,
      s"$what: malformed code-book literal")
    (0 until b.length / 4).map { i =>
      java.lang.Float.intBitsToFloat(
        (b(4 * i) & 0xff) | ((b(4 * i + 1) & 0xff) << 8) |
          ((b(4 * i + 2) & 0xff) << 16) | ((b(4 * i + 3) & 0xff) << 24))
    }
  }
}
