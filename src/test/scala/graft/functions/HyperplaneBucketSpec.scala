package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native fused hyperplane-LSH bucket must be value-identical to the
  * declarative per-plane form it replaced (the DuckDB oracle's CASE-sum
  * twin) — same element-order double dots, same strict sign test — and
  * codegen must agree with interpreted eval.
  */
class HyperplaneBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native bucket == declarative per-plane bucket on the embeddings fixture") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(col("vec_id"),
      graft.operators.Advanced.sparkBucket("embedding").as("native"),
      graft.operators.Advanced.sparkBucketDeclarative("embedding").as("decl"))
    val diff = both.filter(col("native") =!= col("decl")).count()
    assert(diff == 0, s"$diff rows bucket differently")
    // sanity: buckets actually spread (a constant output would also 'agree')
    assert(both.select(col("native")).distinct().count() > 16)
  }

  test("adversarial vectors: sign boundaries, zero vectors, double arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(64)((rng.nextDouble() - 0.5) * math.pow(10, i % 5)))) :+
      (900L, Array.fill(64)(0.0))
    val df = rows.toDF("id", "emb")
    val both = df.select(
      graft.operators.Advanced.sparkBucket("emb").as("native"),
      graft.operators.Advanced.sparkBucketDeclarative("emb").as("decl"))
    assert(both.filter(col("native") =!= col("decl")).count() == 0)
  }

  test("codegen and interpreted agree; null vector coalesces to bucket 0") {
    import spark.implicits._
    val df = Seq.tabulate(50)(i => Tuple1(Array.fill(64)(math.sin(i * 7.0 + 1)))).toDF("emb")
    val viaCodegen = df.select(graft.operators.Advanced.sparkBucket("emb")).collect()
    val expr = HyperplaneBucket(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.fill(64)(0.5), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(Array.fill(64)(1.0), Array.fill(64)(-1.0)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    // interpreted eval: positive dot on plane 0, negative on plane 1 → bucket 1
    assert(expr.eval(null) == 1)
    assert(viaCodegen.length == 50)
    val nulled = Seq((1L, null.asInstanceOf[Array[Double]]))
      .toDF("id", "emb")
      .select(graft.operators.Advanced.sparkBucket("emb")).collect()
    assert(nulled.head.getInt(0) == 0, "NULL vector must bucket to 0 like the declarative form")
  }
}
