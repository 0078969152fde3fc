package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom per-group top-k operator: result equivalence against the
  * window formulation, edge cases (k larger than the group, ties under a
  * total order, global top-k), and the physical contract — two heap execs
  * around exactly one exchange, with no Sort or Window anywhere.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def windowForm(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= k).drop("rn")
  }

  private def customForm(k: Int) =
    TopK.perGroup(
      graft.Tables.load(spark, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k)

  test("matches the window formulation on the fixture for several k") {
    Seq(1, 3, 10).foreach { k =>
      val want = windowForm(k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val got = customForm(k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"k=$k mismatch")
    }
  }

  test("k larger than every group returns all rows") {
    val n = graft.Tables.load(spark, dir, "orders").count()
    assert(customForm(1000000).count() == n)
  }

  test("synthetic ties resolve by the tie-break key, duplicates kept distinctly") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 1.0),
      ("b", 5L, 9.0)
    ).toDF("g", "id", "v")
    val got = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // group a: three v=5.0 ties → ids 1,2 win by tie-break; group b: all of it
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 5L)))
  }

  test("empty group list = global top-k (AllTuples distribution)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 101).toDouble))
      .toDF("id", "v").repartition(8)
    val got = TopK.perGroup(df, Seq.empty, Seq("v" -> false, "id" -> true), 5)
      .collect().map(_.getLong(0)).toSet
    val want = (1 to 100).map(i => (i.toLong, (i * 37 % 101).toDouble))
      .sortBy { case (id, v) => (-v, id) }.take(5).map(_._1).toSet
    assert(got == want)
  }

  test("random input matches a local reference top-k per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map(i =>
      (s"g${rnd.nextInt(17)}", i.toLong, rnd.nextInt(50).toDouble))
    val df = rows.toDF("g", "id", "v").repartition(16)
    val got = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, id, v) => (-v, id) }.take(4).map(r => (g, r._2))
    }.toSet
    assert(got == want)
  }

  test("null group keys and null sort values follow SQL window semantics") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (Some("a"), 1L, Some(3.0)), (Some("a"), 2L, None),
      (None, 3L, Some(7.0)), (None, 4L, Some(1.0)), (None, 5L, None)
    ).toDF("g", "id", "v").repartition(4)
    val got = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    // NULL is its own group (like GROUP BY); desc puts null values last
    // (RowOrdering's NULLS LAST default for DESC, same as the window form)
    assert(got == want && got.contains((None, 3L)))
  }

  test("physical plan: two heap execs, one exchange, no Sort/Window") {
    val p = customForm(3).queryExecution.executedPlan.toString()
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert("TopKPerGroup ".r.findAllIn(p).length == 2, s"expected 2 execs:\n$p")
    assert("Exchange".r.findAllIn(p).length == 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("Window") && !p.contains("Sort "), s"no sort/window allowed:\n$p")
  }

  test("float group keys normalize: -0.0/0.0 and NaN each form ONE group") {
    import spark.implicits._
    // force the rows into separate input partitions so an unnormalized
    // grouping would also split across the exchange, not just the map
    val df = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L), (Double.NaN, 4L), (1.5, 5L))
      .toDF("g", "id").repartition(5)
    val top = TopK.perGroup(df, Seq("g"), Seq("id" -> true), 1)
      .collect().map(_.getLong(1)).toSet
    // one winner per NORMALIZED group: {0.0,-0.0} → id 1, {NaN,NaN} → id 3, {1.5} → id 5
    assert(top == Set(1L, 3L, 5L), s"float group keys split: kept $top")
  }

  test("ambiguous or unknown column names are errors, never a silent first-match bind") {
    import spark.implicits._
    val dup = Seq((1, 2, 3L)).toDF("v", "V", "id") // case-colliding output
    val e = intercept[IllegalArgumentException](
      TopK.perGroup(dup, Seq("v"), Seq("id" -> true), 1))
    assert(e.getMessage.contains("ambiguous"))
    intercept[IllegalArgumentException](
      TopK.perGroup(dup, Seq("id"), Seq("nope" -> true), 1))
  }

  test("partial-buffer overflow degrades to passthrough with identical results") {
    // cap the partial buffer below the distinct-group count: overflow rows
    // bypass the map-side reduction and must still reduce correctly in the
    // final pass (graceful-degradation contract from the operator docs)
    val base = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val capped = TopK.perGroup(base, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3, maxPartialBuffer = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = windowForm(3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == want, "passthrough mode changed the result")
  }
}
