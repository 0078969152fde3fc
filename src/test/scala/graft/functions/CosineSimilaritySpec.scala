package graft.functions

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def declarativeCos = {
    def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))
  }

  test("native expression is bit-identical to the declarative form") {
    val e = Tables.load(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea")).filter(col("ida") < 30)
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb")).filter(col("idb") >= 30)
    val pairs = a.crossJoin(broadcast(b.limit(30)))
    val diff = pairs.select(
        CosineSimilarity.cosineSim(col("ea"), col("eb")).as("native"),
        declarativeCos(col("ea"), col("eb")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0, "native and declarative cosine disagree")
  }

  test("SQL registration works (cosine_sim from spark.sql via extensions)") {
    Tables.load(spark, dir, "embeddings").limit(5).createOrReplaceTempView("emb_t")
    val n = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) AS cs FROM emb_t a JOIN emb_t b")
      .filter(col("cs").between(-1.000001, 1.000001)).count()
    assert(n == 25)
  }

  test("expression participates in whole-stage codegen") {
    val e = Tables.load(spark, dir, "embeddings")
    val df = e.select(CosineSimilarity.cosineSim(col("embedding"), col("embedding")).as("c"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen subtree"), s"fell back to interpreted:\n$p")
    // and evaluates: self-similarity is 1
    assert(df.filter(abs(col("c") - 1.0) > 1e-9).count() == 0)
  }

  test("null and zero-vector handling") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
    val out = df.select(CosineSimilarity.cosineSim(col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0)) // zero norm → NULL, not a div-by-zero error
  }
}
