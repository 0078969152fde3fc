package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** float32_unpack: packed little-endian float32 BINARY → array<float> —
  * the bridge from the storage/wire convention (embeddings as opaque
  * fixed-width byte blobs, the reference's `*-BYTES` types) to the
  * engine's vector operators.
  */
class Float32UnpackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pack/unpack round-trips through the codegen path") {
    import spark.implicits._
    val vecs = Seq(
      Seq(1.5f, -2.25f, 0.0f, Float.MinPositiveValue),
      Seq(math.Pi.toFloat, -0.1f))
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i, Float32Unpack.pack(v)) }.toDF("id", "blob")
      .select(col("id"), Float32Unpack.float32Unpack(col("blob")).as("v"))
    val got = df.orderBy("id").collect().map(_.getSeq[Float](1).toSeq)
    assert(got.toSeq == vecs)
  }

  test("interpreted eval matches codegen") {
    val bytes = Float32Unpack.pack(Seq(3.5f, -8.125f))
    val e = Float32Unpack(org.apache.spark.sql.catalyst.expressions.Literal(bytes))
    val arr = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.toFloatArray().toSeq == Seq(3.5f, -8.125f))
  }

  test("malformed and NULL payloads quarantine as NULL, never fail the row") {
    import spark.implicits._
    val df = Seq(
      (1, Array[Byte](1, 2, 3)), // not a multiple of 4
      (2, null.asInstanceOf[Array[Byte]]),
      (3, Float32Unpack.pack(Seq(7f)))).toDF("id", "blob")
      .select(col("id"), Float32Unpack.float32Unpack(col("blob")).as("v"))
    val got = df.orderBy("id").collect().map(r => Option(r.get(1)))
    assert(got(0).isEmpty && got(1).isEmpty && got(2).isDefined)
  }

  test("registered as a SQL function; non-binary input is an analysis error") {
    import spark.implicits._
    Seq((1, Float32Unpack.pack(Seq(2f)))).toDF("id", "blob")
      .createOrReplaceTempView("f32_t")
    val got = spark.sql("SELECT float32_unpack(blob) AS v FROM f32_t")
      .collect().head.getSeq[Float](0)
    assert(got == Seq(2f))
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT float32_unpack(id) FROM f32_t").collect())
  }

  test("composes with cosine_sim: the binary-embedding ANN scan shape") {
    import spark.implicits._
    val a = Float32Unpack.pack(Seq(1f, 0f))
    val b = Float32Unpack.pack(Seq(0.6f, 0.8f))
    val got = Seq((a, b)).toDF("x", "y")
      .select(round(CosineSimilarity.cosineSim(
        Float32Unpack.float32Unpack(col("x")),
        Float32Unpack.float32Unpack(col("y"))), 6).as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(got - 0.6) < 1e-6)
  }
}
