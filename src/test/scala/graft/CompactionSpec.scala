package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ingest-compaction contract (Tables.compacted): the fixture's
  * single-row-group file is re-laid-out ONCE into a pk-range-clustered
  * multi-file table, because a parquet row group is the unit of scan
  * parallelism — without this every lineitem scan + partial agg runs on one
  * core regardless of cluster size. Rows must be preserved exactly; layout
  * must actually parallelize; point scans must still push filters.
  */
class CompactionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("compacted load preserves rows exactly (set equality incl. duplicates)") {
    val viaLoad = Tables.load(spark, sfDir, "lineitem")
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    assert(viaLoad.count() == raw.count())
    // exceptAll both ways: duplicates count, order doesn't
    assert(viaLoad.exceptAll(raw).isEmpty && raw.exceptAll(viaLoad).isEmpty)
  }

  test("compacted layout splits the scan across multiple input partitions") {
    val parts = Tables.load(spark, sfDir, "lineitem").rdd.getNumPartitions
    assert(parts > 1, s"lineitem scan still single-partition ($parts) — " +
      "compaction did not parallelize the row-group layout")
  }

  test("tiny dims stay single-file (no empty-file fan-out)") {
    assert(Tables.load(spark, sfDir, "region").rdd.getNumPartitions == 1)
  }

  test("pk range-clustering keeps file-level stats tight: files have disjoint pk ranges") {
    import org.apache.spark.sql.functions._
    // lineitem is the one sf0.001 table large enough (6k rows) to span
    // multiple files under the 2000-rows/partition ingest target.
    val withFile = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), input_file_name().as("f"))
      .groupBy(col("f"))
      .agg(min(col("l_orderkey").cast("long")).as("lo"),
        max(col("l_orderkey").cast("long")).as("hi"))
      .orderBy(col("lo"))
      .collect()
    assert(withFile.length > 1)
    withFile.sliding(2).foreach { case Array(a, b) =>
      // range clustering: consecutive files' pk ranges may touch at the
      // boundary key (duplicate l_orderkey rows split across files) but
      // never interleave.
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"pk ranges overlap across files: $a vs $b — range clustering lost")
    }
  }

  test("point lookup still reaches the scan as a pushed filter") {
    import org.apache.spark.sql.functions._
    val plan = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
      s"filter not pushed to parquet scan:\n$plan")
  }
}
