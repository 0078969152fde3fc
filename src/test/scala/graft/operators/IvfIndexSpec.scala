package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: the Lloyd cell assignment lives as a bucketed
  * parquet table (`Similarity.ivfCells`), and a probe on literal cluster
  * ids is a bucket-pruned file scan — no assignment recompute, no full
  * scan. At 100 TB this is the difference between a query touching
  * nprobe/k of the corpus files and touching all of them.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("a literal-cluster probe scans only matching buckets (SelectedBucketsCount pinned)") {
    // the probe carries its downstream consumer (here a per-cell count, in
    // the serving query the scoring join+window): Spark's auto-bucketed-
    // scan rule reverts a FILTER-ONLY plan over a bucketed table to a
    // plain file scan — with a consumer, the scan stays bucketed and the
    // literal IN filter statically prunes to the matching buckets
    val cells = Similarity.ivfCells(spark, dir)
    val probe = cells.filter(col("cluster").isin(0L, 3L))
      .groupBy(col("cluster")).count()
    val plan = probe.queryExecution.executedPlan.toString()
    val m = """SelectedBucketsCount: (\d+) out of (\d+)""".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no bucket pruning in probe plan:\n$plan"))
    assert(m.group(2).toInt == 8, "index must be bucketed 8 ways (one per cell)")
    assert(m.group(1).toInt <= 2, s"probe of 2 cells must scan <= 2 buckets, got ${m.group(1)}")
  }

  test("the persisted-index search equals the recomputed-assignment search row for row") {
    val fromIndex = SparkEntry.queries("sim_ann_ivf_persisted")(spark, dir).collect()
    val recomputed = SparkEntry.queries("sim_ann_ivf_kmeans")(spark, dir).collect()
    assert(fromIndex.length == recomputed.length && fromIndex.nonEmpty)
    assert(fromIndex.map(_.toString).toSeq == recomputed.map(_.toString).toSeq,
      "an index may change where rows come from, never what they are")
    // and the full query's plan is bucket-pruned end to end
    val plan = SparkEntry.queries("sim_ann_ivf_persisted")(spark, dir)
      .queryExecution.executedPlan.toString()
    val m = """SelectedBucketsCount: (\d+) out of 8""".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"persisted probe must scan the bucketed index:\n$plan"))
    assert(m.group(1).toInt <= 5, "5 queries probe at most 5 cells' buckets")
  }

  test("the index is built once and reused (second call reads the same staged table)") {
    val a = Similarity.ivfCells(spark, dir)
    val b = Similarity.ivfCells(spark, dir)
    assert(a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed),
      "repeat calls must re-attach to the same persisted table")
    // deterministic content: assignment ties were rounded+ordered at build
    assert(a.count() == graft.Tables.load(spark, dir, "embeddings").count())
  }
}
