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

  test("codegen agrees with interpreted compute(), row by row") {
    import spark.implicits._
    // parquet round-trip forces a real scan → whole-stage codegen path
    // (a LocalRelation could be constant-folded past doGenCode)
    val tmp = java.nio.file.Files.createTempDirectory("graft-hpb").toString
    Seq.tabulate(50)(i => (i.toLong, Array.fill(64)(math.sin(i * 7.0 + 1))))
      .toDF("id", "emb").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val viaCodegen = df.select(col("id"),
      graft.operators.Advanced.sparkBucket("emb")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaDecl = df.select(col("id"),
      graft.operators.Advanced.sparkBucketDeclarative("emb")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaCodegen == viaDecl && viaCodegen.size == 50)
    assert(viaCodegen.values.toSet.size > 1, "buckets must spread")
    val nulled = Seq((1L, null.asInstanceOf[Array[Double]]))
      .toDF("id", "emb")
      .select(graft.operators.Advanced.sparkBucket("emb")).collect()
    assert(nulled.head.getInt(0) == 0, "NULL vector must bucket to 0 like the declarative form")
  }

  test("edge inputs match the declarative/oracle semantics: null element, NaN, wrong length") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array.fill[java.lang.Double](64)(0.5)), // clean baseline
      (2L, { val a = Array.fill[java.lang.Double](64)(0.5); a(3) = null; a }),
      (3L, Array.fill[java.lang.Double](64)(Double.NaN)),
      (4L, Array.fill[java.lang.Double](32)(0.5)), // too short
      (5L, Array.fill[java.lang.Double](100)(0.5))) // too long
    val df = rows.toDF("id", "emb")
    val both = df.select(col("id"),
      graft.operators.Advanced.sparkBucket("emb").as("native"),
      graft.operators.Advanced.sparkBucketDeclarative("emb").as("decl"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    for ((id, n, d) <- both)
      assert(n == d, s"id=$id: native bucket $n != declarative $d")
    // and the specific contracts the edge rules encode
    val byId = both.map(t => t._1 -> t._2).toMap
    assert(byId(2L) == 0, "null element → every dot NULL → bucket 0")
    assert(byId(4L) == 0 && byId(5L) == 0, "length mismatch → bucket 0")
  }

  test("malformed planes literals fail with a named error, never NPE/AIOOBE") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(3)(0.5))).toDF("id", "emb")
    def chain(t: Throwable): List[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(e => Option(e.getMessage).getOrElse("") + " " + e.getClass.getName).toList
    // jagged inner lengths would AIOOBE in compute's hot loop unvalidated
    val jagged = intercept[Throwable] {
      df.select(expr(
        "hyperplane_bucket(emb, array(array(1.0d,1.0d,1.0d), array(1.0d)))")).collect()
    }
    assert(chain(jagged).exists(_.contains("jagged")), chain(jagged).mkString(" | "))
    // a NULL inner plane would NPE in toDoubleArray unvalidated
    val nullPlane = intercept[Throwable] {
      df.select(expr(
        "hyperplane_bucket(emb, array(array(1.0d,1.0d,1.0d), cast(null as array<double>)))"))
        .collect()
    }
    assert(chain(nullPlane).exists(_.contains("plane")), chain(nullPlane).mkString(" | "))
    // a NULL outer literal: BinaryExpression's interpreted eval returns
    // NULL per row, while codegen folds the reference object and hits the
    // guard — either outcome is fine, a bare NPE is not
    val outer = scala.util.Try(
      df.select(expr(
        "hyperplane_bucket(emb, cast(null as array<array<double>>))")).collect())
    outer match {
      case scala.util.Success(rows) => assert(rows.forall(_.isNullAt(0)))
      case scala.util.Failure(t) =>
        assert(chain(t).exists(_.contains("planes literal")), chain(t).mkString(" | "))
    }
  }
}
