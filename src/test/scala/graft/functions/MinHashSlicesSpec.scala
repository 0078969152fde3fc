package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass minhash signature must be VALUE-IDENTICAL to the
  * declarative explode + md5 + per-slice-min pipeline it mirrors (which
  * is itself DuckDB-oracle-verified through dd_minhash_lsh) — plus the
  * null/empty/type edges of the expression surface.
  */
class MinHashSlicesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("matches the declarative explode+agg signature on every fixture doc") {
    val sg = graft.operators.TextDedup.withShingles(
      graft.Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("sg"))
    val native = sg
      .select(col("doc_id"), MinHashSlices.minhashSlices(col("sg")).as("mh"))
      .filter(col("mh").isNotNull)
      .select(col("doc_id") +:
        (0 until 8).map(i => element_at(col("mh"), i + 1).as(s"s$i")): _*)
    val declarative = {
      val ex = sg.select(col("doc_id"), explode(col("sg")).as("s"))
        .withColumn("h", concat(md5(col("s")), md5(concat(col("s"), lit("#")))))
      val mins = (0 until 8).map(i => min(substring(col("h"), 1 + 8 * i, 8)).as(s"s$i"))
      ex.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    }
    val n = native.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val d = declarative.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(n.nonEmpty && n == d)
  }

  test("empty array, NULL input, and NULL element all yield NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b c", "b c d")),
      (2L, Seq.empty[String]),
      (3L, null)).toDF("id", "sg")
    val out = df.select(col("id"), MinHashSlices.minhashSlices(col("sg")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
    val withNullElem = Seq(Tuple1(Seq[String]("x", null))).toDF("sg")
      .select(MinHashSlices.minhashSlices(col("sg")))
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("registered as a SQL function; wrong input type is an analysis error") {
    import spark.implicits._
    Seq(Tuple1(Seq("a b c"))).toDF("sg").createOrReplaceTempView("mh_in")
    val viaSql = spark.sql("SELECT minhash_slices(sg) AS mh FROM mh_in")
      .collect().head.getSeq[String](0)
    assert(viaSql.length == 8 && viaSql.forall(_.matches("[0-9a-f]{8}")))
    val err = intercept[Exception](
      Seq(Tuple1(1)).toDF("x").select(expr("minhash_slices(x)")).collect())
    assert(err.getMessage.contains("minhash_slices") ||
      err.getMessage.toLowerCase.contains("type"))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("alpha beta gamma", "beta gamma delta"))).toDF("sg")
    val viaCodegen = df.select(MinHashSlices.minhashSlices(col("sg"))).collect()
      .head.getSeq[String](0)
    // interpreted: evaluate the expression directly, bypassing codegen
    val expr = MinHashSlices(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("alpha beta gamma", "beta gamma delta"),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(viaCodegen == interpreted)
  }
}
