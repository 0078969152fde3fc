package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted LSH band index (`TextDedup.lshBandIndex`) — the text-side
  * twin of the persisted IVF cell table: near-dup candidate lookups scan
  * only the buckets holding the query docs' literal band keys, never
  * re-shingle the corpus, never self-join.
  */
class LshIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("a band-key lookup is bucket-pruned (SelectedBucketsCount pinned)") {
    val idx = TextDedup.lshBandIndex(spark, dir)
    val someKeys = idx.select(col("bk")).limit(3).collect().map(_.getString(0))
    val probe = idx.filter(col("bk").isin(someKeys.toIndexedSeq: _*))
      .groupBy(col("bk")).count() // consumer keeps the bucketed scan (see IvfIndexSpec)
    val plan = probe.queryExecution.executedPlan.toString()
    val m = """SelectedBucketsCount: (\d+) out of (\d+)""".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no bucket pruning in lookup plan:\n$plan"))
    assert(m.group(2).toInt == 64)
    assert(m.group(1).toInt <= 3, s"3 keys must scan <= 3 buckets, got ${m.group(1)}")
  }

  test("index-served candidates equal the recomputed LSH collision set for the query docs") {
    val served = SparkEntry.queries("dd_lsh_index_lookup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // recompute directly from the full self-join pairs (dd_minhash_lsh is
    // oracle-verified): candidates for q = pairs where q is either side
    val pairs = SparkEntry.queries("dd_minhash_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a)
    }.filter(_._1 < 5).toSet
    assert(served == expected,
      "an index may change where rows come from, never what they are")
    // the lookup plan reads the persisted index, bucket-pruned
    val plan = SparkEntry.queries("dd_lsh_index_lookup")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("SelectedBucketsCount"),
      s"lookup must scan the bucketed index:\n$plan")
  }
}
