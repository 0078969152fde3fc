package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The int8 SQ8 codec expressions under direct test (seeded): the
  * round-trip error bound (≤ half a quantization step per in-bounds
  * dimension — the scalar-quantization contract the index's recall
  * floor rests on), saturation for out-of-bounds values, the constant-
  * dimension degenerate case, malformed-input quarantine, and
  * interpreted-eval ≡ codegen agreement (the df path runs generated
  * code; Expression.eval runs the interpreter — both call the same
  * Int8Codec.code/recon, and this spec proves the wiring). */
class Int8CodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(6022140)

  private def viaDf(payloads: Seq[Array[Byte]], mins: Seq[Float],
      maxs: Seq[Float]): Seq[Option[Seq[Float]]] = {
    import spark.implicits._
    payloads.toDF("b")
      .select(Int8Codec.int8Dequantize(
        Int8Codec.int8Quantize(col("b"), mins, maxs), mins, maxs).as("r"))
      .collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getSeq[Float](0).toIndexedSeq))
      .toSeq
  }

  test("round-trip error is within half a quantization step; saturation clamps") {
    val dims = 16
    for (trial <- 1 to 3) {
      val mins = IndexedSeq.fill(dims)(rng.nextFloat() * -2f)
      val maxs = mins.map(mn => mn + 0.5f + rng.nextFloat() * 3f)
      val vecs = (0 until 20).map(_ => (0 until dims).map { d =>
        // mostly in-bounds, some deliberately OUTSIDE the code book
        if (rng.nextInt(10) == 0) maxs(d) + 1f
        else if (rng.nextInt(10) == 0) mins(d) - 1f
        else mins(d) + rng.nextFloat() * (maxs(d) - mins(d))
      })
      val recon = viaDf(vecs.map(Float32Unpack.pack), mins, maxs)
      vecs.zip(recon).foreach { case (v, Some(r)) =>
        (0 until dims).foreach { d =>
          val step = (maxs(d) - mins(d)) / 255.0f
          val clamped = math.max(mins(d), math.min(maxs(d), v(d)))
          assert(math.abs(r(d) - clamped) <= step / 2 + 1e-5,
            s"trial $trial dim $d: ${v(d)} -> ${r(d)} (step $step)")
        }
      case (_, None) => fail("in-shape payload must not null out")
      }
    }
  }

  test("constant dimension codes to 0 and reconstructs to its bound") {
    val mins = IndexedSeq(1.5f, -1f)
    val maxs = IndexedSeq(1.5f, 1f) // dim 0 constant
    val out = viaDf(Seq(Float32Unpack.pack(IndexedSeq(99f, 0.25f))), mins, maxs)
    assert(out.head.exists(r => r(0) == 1.5f),
      s"constant dim must reconstruct to mn, got $out")
  }

  test("malformed payloads quarantine as NULL; eval agrees with codegen") {
    val mins = IndexedSeq(0f, 0f); val maxs = IndexedSeq(1f, 1f)
    // wrong float count (3 dims vs a 2-dim code book) and a NULL
    import spark.implicits._
    val rows = Seq(Some(Float32Unpack.pack(IndexedSeq(0.5f, 0.5f, 0.5f))),
      Option.empty[Array[Byte]])
    val out = rows.toDF("b")
      .select(Int8Codec.int8Quantize(col("b"), mins, maxs).as("q"))
      .collect().map(_.isNullAt(0)).toSeq
    assert(out == Seq(true, true), s"got $out")
    // interpreted eval path ≡ the df (codegen) path on a good payload
    val good = Float32Unpack.pack(IndexedSeq(0.25f, 0.75f))
    val expr = Int8Quantize(
      org.apache.spark.sql.catalyst.expressions.Literal(good), mins, maxs)
    val interp = expr.eval(null).asInstanceOf[Array[Byte]]
    val viaDfQ = Seq(good).toDF("b")
      .select(Int8Codec.int8Quantize(col("b"), mins, maxs)).collect()
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(interp, viaDfQ),
      "interpreted eval must equal the codegen result byte-for-byte")
  }
}
