package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-items trio: exact counts below map capacity, Misra-Gries
  * error bounds above it, merge semantics, deterministic tie-breaks, and
  * NULL/type handling.
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import FreqSketch.{freqAgg, freqMerge, freqTopK}

  private def topk(rows: Array[Row]): Seq[(String, Long)] =
    rows.head.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))

  test("below map capacity the counts are exact and fully ranked") {
    import spark.implicits._
    // 40 distinct values, deterministic skewed counts: value i appears
    // (41 - i) times → top-3 is v01:40, v02:39, v03:38. 40 < 0.75*256,
    // so the sketch never purges (exact regime).
    val data = (1 to 40).flatMap(i => Seq.fill(41 - i)(f"v$i%02d"))
    val df = new scala.util.Random(3).shuffle(data).toDF("s").repartition(8)
    val got = topk(df.agg(freqTopK(freqAgg(col("s")), 3).as("t")).collect())
    assert(got == Seq(("v01", 40L), ("v02", 39L), ("v03", 38L)), got.toString)
  }

  test("ties break by item ascending — the oracle's ordering") {
    import spark.implicits._
    val df = Seq("b", "a", "c", "a", "c", "b", "z").toDF("s")
    val got = topk(df.agg(freqTopK(freqAgg(col("s")), 4).as("t")).collect())
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 2L), ("z", 1L)), got.toString)
  }

  test("n >> capacity: heavy hitter survives with Misra-Gries error bound") {
    import spark.implicits._
    // 50k rows: one value at 10% frequency among ~20k distinct tail
    // values, map size 256 → error ≤ n/maxMapSize ≈ 196 per merge path;
    // the 5000-count hitter must surface on top with estimate within
    // [true, true + n/256 * merge-depth slack].
    val rows = (0 until 45000).map(i => s"tail${i % 20000}") ++
      Seq.fill(5000)("HITTER")
    val df = new scala.util.Random(11).shuffle(rows).toDF("s").repartition(16)
    val got = topk(df.agg(freqTopK(freqAgg(col("s")), 1).as("t")).collect())
    assert(got.head._1 == "HITTER", s"heavy hitter lost: $got")
    val est = got.head._2
    assert(est >= 5000 && est <= 5000 + 50000 / 256 * 17,
      s"estimate $est outside Misra-Gries band")
  }

  test("freq_merge unions counts; NULL on either side is the empty stream") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("s").agg(freqAgg(col("s")).as("sk"))
    val b = Seq("x", "z").toDF("s").agg(freqAgg(col("s")).as("sk"))
    val merged = topk(a.crossJoin(b.select(col("sk").as("sk2")))
      .select(freqTopK(freqMerge(col("sk"), col("sk2")), 3).as("t")).collect())
    assert(merged == Seq(("x", 3L), ("y", 1L), ("z", 1L)), merged.toString)
    val row = a.select(
      freqTopK(freqMerge(col("sk"), lit(null).cast("binary")), 1).as("t1"),
      freqTopK(freqMerge(lit(null).cast("binary"), col("sk")), 1).as("t2"),
      freqTopK(freqMerge(lit(null).cast("binary"), lit(null).cast("binary")), 1)
        .as("t3")).collect().head
    assert(row.getSeq[Row](0).head.getString(0) == "x")
    assert(row.getSeq[Row](1).head.getString(0) == "x")
    assert(row.isNullAt(2), "merge of two NULLs is NULL")
  }

  test("NULL inputs skipped; all-NULL group yields NULL; integrals stringify") {
    import spark.implicits._
    val got = topk(Seq(Some(7L), None, Some(7L), Some(3L)).toDF("v")
      .agg(freqTopK(freqAgg(col("v")), 1).as("t")).collect())
    assert(got == Seq(("7", 2L)), got.toString)
    val empty = Seq(Option.empty[Long]).toDF("v")
      .agg(freqAgg(col("v")).as("sk")).collect().head
    assert(empty.isNullAt(0), "all-NULL group must yield a NULL sketch")
  }

  test("validation: types, k, maxMapSize, arity are clean errors") {
    import spark.implicits._
    Seq(1.5).toDF("v").createOrReplaceTempView("freq_bad")
    val e1 = intercept[Exception](
      spark.sql("SELECT freq_sketch_agg(v) FROM freq_bad").collect())
    assert(e1.getMessage.contains("string or integral"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT freq_sketch_agg(CAST(v AS LONG), 100) FROM freq_bad")
        .collect())
    assert(e2.getMessage.contains("power of 2"), e2.getMessage)
    val e3 = intercept[Exception](
      spark.sql("SELECT freq_top_k(freq_sketch_agg(CAST(v AS LONG)), 0) " +
        "FROM freq_bad").collect())
    assert(e3.getMessage.contains(">= 1"), e3.getMessage)
    for (q <- Seq("freq_sketch_agg(CAST(v AS LONG), 8, 9)",
        "freq_merge(CAST(NULL AS BINARY))", "freq_top_k(CAST(NULL AS BINARY))")) {
      val e = intercept[Exception](
        spark.sql(s"SELECT $q FROM freq_bad").collect())
      assert(e.getMessage.contains("expects") || e.getMessage.contains("arguments"),
        s"$q: ${e.getMessage}")
    }
    // NULL k propagates NULL, never an arbitrary default
    val nullK = Seq("a").toDF("s").agg(freqAgg(col("s")).as("sk"))
      .select(call_function("freq_top_k", col("sk"),
        lit(null).cast("int")).as("t")).collect().head
    assert(nullK.isNullAt(0), "NULL k must yield NULL")
    // k accepts any foldable integral width (TINYINT/SMALLINT literals
    // are reasonable calls), matching kll_quantile's lenient rank
    val shortK = Seq("a", "a", "b").toDF("s").agg(freqAgg(col("s")).as("sk"))
      .select(call_function("freq_top_k", col("sk"),
        lit(1.toShort)).as("t")).collect().head
    assert(!shortK.isNullAt(0) && shortK.getSeq[Any](0).length == 1)
  }
}
