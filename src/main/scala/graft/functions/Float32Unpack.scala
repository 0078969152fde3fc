package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Native Catalyst expression: decode a BINARY column of packed
  * little-endian float32s into `array<float>` — the bridge between the
  * multimodal/storage convention (embeddings travel and persist as opaque
  * fixed-width byte blobs, the closest thing the reference's type system
  * has to a vector: its `*-BYTES` types, `/root/reference/src/
  * alba_types.rs:285-294`) and the engine's vector operators
  * (`cosine_sim`, IVF assignment, quantization).
  *
  * Why native: the byte→float reinterpretation has no `functions._`
  * composition at all (no bit-cast builtin), and a Scala UDF would box
  * every element and fall out of whole-stage codegen exactly where this
  * runs — inside ANN scans over the full corpus.
  *
  * Semantics: NULL in → NULL out; a payload whose length is not a
  * multiple of 4 → NULL (malformed blobs quarantine as nulls rather than
  * failing the partition — the same fail-safe posture as the multimodal
  * decode lane), never a partial vector.
  */
case class Float32Unpack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"float32_unpack expects a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length % 4 != 0) return null
    val out = new Array[Float](b.length / 4)
    var i = 0
    while (i < out.length) {
      out(i) = java.lang.Float.intBitsToFloat(
        (b(4 * i) & 0xff) | ((b(4 * i + 1) & 0xff) << 8) |
          ((b(4 * i + 2) & 0xff) << 16) | ((b(4 * i + 3) & 0xff) << 24))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |if ($b.length % 4 != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[$b.length / 4];
         |  for (int $i = 0; $i < $out.length; $i++) {
         |    $out[$i] = java.lang.Float.intBitsToFloat(
         |      ($b[4 * $i] & 0xff) | (($b[4 * $i + 1] & 0xff) << 8) |
         |      (($b[4 * $i + 2] & 0xff) << 16) | (($b[4 * $i + 3] & 0xff) << 24));
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Float32Unpack =
    copy(child = newChild)
}

object Float32Unpack {
  /** Column-level entry point (sessions must be built with
    * GraftExtensions). */
  def float32Unpack(b: Column): Column = call_function("float32_unpack", b)

  /** The inverse, for tests and ingest fixtures: pack floats to the
    * little-endian layout `float32_unpack` reads. */
  def pack(fs: Seq[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(fs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fs.foreach(bb.putFloat)
    bb.array()
  }
}
