package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta sketch family: exactness below 2^lgK, error bands above it, the
  * three set operations against exact set algebra, NULL conventions, and
  * type gating.
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import ThetaSketch.{thetaAgg, thetaDiff, thetaEstimate, thetaIntersect, thetaUnion}

  test("below 2^lgK the sketch is exact; set ops match exact set algebra") {
    import spark.implicits._
    // A = 0..2999, B = 2000..4999 → |A|=3000, |B|=3000, |A∪B|=5000,
    // |A∩B|=1000, |A\B|=2000 — all below the 4096 nominal? No: the UNION
    // result (5000) exceeds 2^12, so run at lgK=13 where every set stays
    // exact (theta = 1.0 end to end).
    val a = (0 until 3000).map(_.toLong).toDF("v").repartition(8)
      .agg(call_function("theta_sketch_agg", col("v"), lit(13)).as("sk"))
    val b = (2000 until 5000).map(_.toLong).toDF("v").repartition(8)
      .agg(call_function("theta_sketch_agg", col("v"), lit(13)).as("sk"))
    val row = a.crossJoin(b.select(col("sk").as("sk2")))
      .select(
        thetaEstimate(col("sk")).as("na"),
        thetaEstimate(thetaUnion(col("sk"), col("sk2"))).as("nu"),
        thetaEstimate(thetaIntersect(col("sk"), col("sk2"))).as("ni"),
        thetaEstimate(thetaDiff(col("sk"), col("sk2"))).as("nd"))
      .collect().head
    assert(row.getDouble(0) == 3000.0, s"|A| exact: ${row.getDouble(0)}")
    assert(row.getDouble(1) == 5000.0, s"|A∪B| exact: ${row.getDouble(1)}")
    assert(row.getDouble(2) == 1000.0, s"|A∩B| exact: ${row.getDouble(2)}")
    assert(row.getDouble(3) == 2000.0, s"|A\\B| exact: ${row.getDouble(3)}")
  }

  test("n >> 2^lgK: estimates land in the published rsd band") {
    import spark.implicits._
    // 200k distinct at the default lgK=12: rsd ≈ 1/sqrt(4096) ≈ 1.6%;
    // pin ±5% (≈3 sigma) for a deterministic-but-honest band.
    val n = 200000
    val est = (0 until n).map(_.toLong).toDF("v").repartition(16)
      .agg(thetaEstimate(thetaAgg(col("v"))).as("e"))
      .collect().head.getDouble(0)
    assert(math.abs(est - n) <= n * 0.05, s"estimate $est outside ±5% of $n")
  }

  test("intersection of DISJOINT sketches estimates zero") {
    import spark.implicits._
    val a = (0 until 1000).map(_.toLong).toDF("v").agg(thetaAgg(col("v")).as("sk"))
    val b = (5000 until 6000).map(_.toLong).toDF("v").agg(thetaAgg(col("v")).as("sk"))
    val ni = a.crossJoin(b.select(col("sk").as("sk2")))
      .select(thetaEstimate(thetaIntersect(col("sk"), col("sk2"))).as("ni"))
      .collect().head.getDouble(0)
    assert(ni == 0.0, s"disjoint intersection must be 0, got $ni")
  }

  test("NULL conventions: union tolerant, intersect/estimate propagate, diff subtracts empty") {
    import spark.implicits._
    val a = Seq(1L, 2L, 3L).toDF("v").agg(thetaAgg(col("v")).as("sk"))
    val nullSk = lit(null).cast("binary")
    val row = a.select(
      thetaEstimate(thetaUnion(col("sk"), nullSk)).as("u1"),
      thetaEstimate(thetaUnion(nullSk, col("sk"))).as("u2"),
      thetaEstimate(thetaUnion(nullSk, nullSk)).as("u3"),
      thetaEstimate(thetaIntersect(col("sk"), nullSk)).as("i1"),
      thetaEstimate(thetaDiff(col("sk"), nullSk)).as("d1"),
      thetaEstimate(thetaDiff(nullSk, col("sk"))).as("d2"),
      thetaEstimate(nullSk).as("e1")).collect().head
    assert(row.getDouble(0) == 3.0 && row.getDouble(1) == 3.0)
    assert(row.isNullAt(2), "union of two NULLs is NULL")
    assert(row.isNullAt(3), "intersect with NULL propagates NULL")
    assert(row.getDouble(4) == 3.0, "diff minus NULL subtracts the empty set")
    assert(row.isNullAt(5), "NULL diff left propagates")
    assert(row.isNullAt(6), "estimate of NULL is NULL")
    // an all-NULL group yields a NULL sketch, like min/max
    val empty = Seq.empty[Option[Long]].toDF("v")
      .union(Seq(Option.empty[Long]).toDF("v"))
      .agg(thetaAgg(col("v")).as("sk")).collect().head
    assert(empty.isNullAt(0), "all-NULL group must yield a NULL sketch")
  }

  test("string and binary inputs hash identically-valued rows together") {
    import spark.implicits._
    val est = Seq("a", "b", "a", "c", "b").toDF("s")
      .agg(thetaEstimate(thetaAgg(col("s"))).as("e"))
      .collect().head.getDouble(0)
    assert(est == 3.0, s"3 distinct strings, got $est")
    // a string and its UTF-8 bytes are the SAME set member (the agg
    // updates through the byte form) — unioning the two sketches must
    // not double-count
    val sSk = Seq("x", "y").toDF("s").agg(thetaAgg(col("s")).as("sk"))
    val bSk = Seq("x", "y").toDF("s")
      .select(encode(col("s"), "UTF-8").as("b")).agg(thetaAgg(col("b")).as("sk"))
    val u = sSk.crossJoin(bSk.select(col("sk").as("sk2")))
      .select(thetaEstimate(thetaUnion(col("sk"), col("sk2"))).as("e"))
      .collect().head.getDouble(0)
    assert(u == 2.0, s"string and utf-8 binary must hash alike, got $u")
  }

  test("type gating and argument validation are clean errors") {
    import spark.implicits._
    Seq(1.5, 2.5).toDF("v").createOrReplaceTempView("theta_bad")
    val e1 = intercept[Exception](
      spark.sql("SELECT theta_sketch_agg(v) FROM theta_bad").collect())
    assert(e1.getMessage.contains("integral, string, or binary"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT theta_sketch_agg(CAST(v AS LONG), 30) FROM theta_bad")
        .collect())
    assert(e2.getMessage.contains("[4, 26]"), e2.getMessage)
    for (q <- Seq("theta_union(CAST(NULL AS BINARY))",
        "theta_intersect(CAST(NULL AS BINARY))",
        "theta_estimate(CAST(NULL AS BINARY), 1)")) {
      val e = intercept[Exception](
        spark.sql(s"SELECT $q FROM theta_bad").collect())
      assert(e.getMessage.contains("expects") || e.getMessage.contains("arguments"),
        s"$q: ${e.getMessage}")
    }
  }

  test("SQL lgK argument reaches the sketch: accuracy scales with it") {
    import spark.implicits._
    (0 until 100000).map(_.toLong).toDF("v").createOrReplaceTempView("theta_k")
    // lgK=4 (16 entries) on 100k distinct drifts far more than lgK=16
    // (65536 entries, still exact-adjacent); a dropped lgK would make
    // the two estimates identical.
    val coarse = spark.sql(
      "SELECT theta_estimate(theta_sketch_agg(v, 4)) FROM theta_k")
      .collect().head.getDouble(0)
    val fine = spark.sql(
      "SELECT theta_estimate(theta_sketch_agg(v, 16)) FROM theta_k")
      .collect().head.getDouble(0)
    assert(math.abs(fine - 100000) < math.abs(coarse - 100000) ||
      math.abs(fine - 100000) <= 100000 * 0.01,
      s"lgK must reach the sketch: coarse=$coarse fine=$fine")
    assert(math.abs(fine - 100000) <= 100000 * 0.02,
      s"lgK=16 on 100k distinct should be near-exact, got $fine")
  }
}
