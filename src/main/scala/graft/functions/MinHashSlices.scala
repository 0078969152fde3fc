package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 8-slice minhash signature of a shingle
  * set in ONE pass — `minhash_slices(array<string>) → array<string>(8)`.
  *
  * Semantics are bit-identical to the declarative pipeline it replaces
  * (`TextDedup.withSignatures`): per shingle, the 64 lowercase-hex chars
  * of `md5(s) ‖ md5(s ‖ '#')` are cut into eight 8-hex (32-bit) slices,
  * and the signature is the per-slice minimum over the set. Empty or NULL
  * shingle arrays yield NULL (the explode+groupBy form produced no row —
  * callers filter nulls, same outcome); a NULL element yields NULL.
  *
  * Why an expression: the composable form is
  * `explode(sg) → md5 → substring ×8 → groupBy(doc_id).agg(min ×8)` — a
  * generate, a hash-aggregation (per-partition hashmap of every doc in
  * flight), and an exchange carrying one row per document. This operator
  * computes the signature inside the scan's projection: the doc×shingle
  * intermediate never materializes, no aggregation state, no exchange —
  * at 100 TB that deletes the widest stage of the minhash pipeline. The
  * hot loop (MD5) runs through a static helper invoked from generated
  * code, keeping the surrounding projection in whole-stage codegen.
  *
  * Registered through `GraftExtensions` like [[CosineSimilarity]].
  */
case class MinHashSlices(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_slices expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSlices.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val result = ctx.freshName("mhResult")
      s"""
         |ArrayData $result = graft.functions.MinHashSlices.compute($a);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSlices =
    copy(child = newChild)
}

object MinHashSlices {
  /** Column-level entry point (resolves through the session's function
    * registry — sessions must be built with GraftExtensions).
    */
  def minhashSlices(sg: Column): Column = call_function("minhash_slices", sg)

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One-pass signature: 8 per-slice minimums of `md5(s)‖md5(s‖'#')` hex.
    * Null on empty/NULL input or a NULL element (callers drop those docs,
    * matching the explode form that produced no row for them). Called from
    * generated code — must stay static-shaped and allocation-light.
    */
  def compute(arr: ArrayData): ArrayData = {
    if (arr == null) return null
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    // per-slice minimums tracked as UNSIGNED 32-bit values read straight
    // from the digest bytes: an 8-hex lowercase slice compares identically
    // as a string and as its unsigned int value, so the hot loop does zero
    // string work — hex is materialized once at the end
    val mins = Array.fill(8)(0x1FFFFFFFFL) // sentinel above any uint32
    val salt = '#'.toByte
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val bytes = arr.getUTF8String(i).getBytes
      md.reset(); md.update(bytes)
      val d1 = md.digest()
      md.reset(); md.update(bytes); md.update(salt)
      val d2 = md.digest()
      var s = 0
      while (s < 4) {
        val o = 4 * s
        val v1 = ((d1(o) & 0xffL) << 24) | ((d1(o + 1) & 0xffL) << 16) |
          ((d1(o + 2) & 0xffL) << 8) | (d1(o + 3) & 0xffL)
        if (v1 < mins(s)) mins(s) = v1
        val v2 = ((d2(o) & 0xffL) << 24) | ((d2(o + 1) & 0xffL) << 16) |
          ((d2(o + 2) & 0xffL) << 8) | (d2(o + 3) & 0xffL)
        if (v2 < mins(s + 4)) mins(s + 4) = v2
        s += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](8)
    var s = 0
    while (s < 8) {
      val hex = new Array[Byte](8)
      var j = 0
      while (j < 8) {
        hex(j) = HexDigits(((mins(s) >> (28 - 4 * j)) & 0xf).toInt).toByte
        j += 1
      }
      out(s) = UTF8String.fromBytes(hex)
      s += 1
    }
    new GenericArrayData(out)
  }
}
