package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketch trio: exactness below capacity, rank-error bounds
  * above it, merge semantics, and NULL handling.
  */
class KllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import KllSketch.{kllAgg, kllMerge, kllQuantile}

  test("n <= k retains every value: the median is the exact order statistic") {
    import spark.implicits._
    // 101 odd values 0..100 shuffled deterministically: exact median 50
    val vals = new scala.util.Random(7).shuffle((0 to 100).toList)
    val df = vals.toDF("v").repartition(8) // sketch merges across partitions
    val med = df.agg(kllQuantile(kllAgg(col("v")), 0.5).as("m"))
      .collect().head.getDouble(0)
    assert(med == 50.0, s"exact below capacity, got $med")
    // q=0 / q=1 are the true extremes (inclusive criterion)
    val row = df.agg(
      kllQuantile(kllAgg(col("v")), 0.0).as("lo"),
      kllQuantile(kllAgg(col("v")), 1.0).as("hi")).collect().head
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 100.0)
  }

  test("n >> k: estimate's true rank within the published error band") {
    import spark.implicits._
    // 50k uniform values: k=200 gives ~1.65% normalized rank error (99%
    // conf.); pin a 4% band for slack. Value = rank here (0..49999).
    val n = 50000
    val df = (0 until n).map(_.toLong).toDF("v").repartition(16)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = df.agg(kllQuantile(kllAgg(col("v")), q).as("e"))
        .collect().head.getDouble(0)
      val rank = est / n
      assert(math.abs(rank - q) <= 0.04,
        s"q=$q estimate $est → rank $rank outside ±4%")
    }
  }

  test("kll_merge unions; NULL on either side is the empty set") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("v").agg(kllAgg(col("v")).as("sk"))
    val b = Seq(100, 101, 102).toDF("v").agg(kllAgg(col("v")).as("sk"))
    val merged = a.crossJoin(b.select(col("sk").as("sk2")))
      .select(kllQuantile(kllMerge(col("sk"), col("sk2")), 1.0).as("hi"),
        kllQuantile(kllMerge(col("sk"), col("sk2")), 0.0).as("lo"))
      .collect().head
    assert(merged.getDouble(0) == 102.0 && merged.getDouble(1) == 1.0)
    // NULL tolerance: merge with a NULL sketch keeps the other side
    val withNull = a.select(
      kllQuantile(kllMerge(col("sk"), lit(null).cast("binary")), 0.5).as("m"),
      kllQuantile(kllMerge(lit(null).cast("binary"), col("sk")), 0.5).as("m2"),
      kllQuantile(kllMerge(lit(null).cast("binary"),
        lit(null).cast("binary")), 0.5).as("m3")).collect().head
    assert(withNull.getDouble(0) == 2.0 && withNull.getDouble(1) == 2.0 &&
      withNull.isNullAt(2))
  }

  test("all-NULL group yields a NULL sketch and a NULL estimate") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long)](("g", null), ("g", null))
      .toDF("g", "v")
    val row = df.groupBy(col("g"))
      .agg(kllAgg(col("v")).as("sk"))
      .select(col("sk"), kllQuantile(col("sk"), 0.5).as("m"))
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("non-numeric input and out-of-range rank are clean errors") {
    import spark.implicits._
    val df = Seq("a").toDF("s")
    val e = intercept[Exception](
      df.agg(kllAgg(col("s"))).collect())
    assert(e.getMessage.contains("numeric"), e.getMessage)
    val nums = Seq(1, 2).toDF("v")
    val e2 = intercept[Exception](
      nums.agg(kllQuantile(kllAgg(col("v")), 1.5)).collect())
    assert(e2.getMessage.contains("outside"), e2.getMessage)
  }

  test("SQL registration: the trio is callable from spark.sql") {
    import spark.implicits._
    Seq(5, 10, 15).toDF("v").createOrReplaceTempView("kll_vals")
    val m = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(v), 0.5d) AS m FROM kll_vals")
      .collect().head.getDouble(0)
    assert(m == 10.0)
    // a bare SQL literal 0.5 parses as DECIMAL(1,1), not DOUBLE — the
    // rank must accept any foldable numeric, not DoubleType alone
    val mDec = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(v), 0.5) AS m FROM kll_vals")
      .collect().head.getDouble(0)
    assert(mDec == 10.0)
  }

  test("a NULL rank propagates NULL, never the sketch minimum") {
    import spark.implicits._
    val row = Seq(1, 2, 3).toDF("v")
      .agg(kllAgg(col("v")).as("sk"))
      .select(call_function("kll_quantile", col("sk"),
        lit(null).cast("double")).as("q"))
      .collect().head
    assert(row.isNullAt(0), s"NULL rank must yield NULL, got ${row.get(0)}")
  }

  test("SQL k argument is honored; wrong arities are clean errors") {
    import spark.implicits._
    // n=5000 > k: at k=8 the sketch compacts hard (retains ~tens of
    // values); at k=2048 it retains far more. Serialized size scales with
    // retained count — a dropped k argument would make the two equal.
    (0 until 5000).map(_.toLong).toDF("v").createOrReplaceTempView("kll_k")
    def skLen(k: Int): Int = spark.sql(
      s"SELECT length(kll_sketch_agg(v, $k)) FROM kll_k")
      .collect().head.getInt(0)
    assert(skLen(2048) > skLen(8) * 4,
      s"k must reach the sketch: len(k=2048)=${skLen(2048)}, len(k=8)=${skLen(8)}")
    val badK = intercept[Exception](spark.sql(
      "SELECT kll_sketch_agg(v, 4) FROM kll_k").collect())
    assert(badK.getMessage.contains("[8, 65535]"), badK.getMessage)
    for (q <- Seq("kll_sketch_agg(v, 10, 11)", "kll_merge(kll_sketch_agg(v))",
        "kll_quantile(kll_sketch_agg(v))")) {
      val e = intercept[Exception](spark.sql(s"SELECT $q FROM kll_k").collect())
      assert(e.getMessage.contains("expects") || e.getMessage.contains("arguments"),
        s"$q: ${e.getMessage}")
    }
  }
}
