package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-side full-text lane: the persisted term-bucketed postings index
  * serves BM25 searches bit-equal to the full-scan baseline, scanning only
  * the query terms' buckets (plus the stats sentinel key).
  */
class FullTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("a term lookup is bucket-pruned (SelectedBucketsCount pinned)") {
    val idx = FullText.termIndex(spark, dir)
    val probe = idx
      .filter(col("term").isin("dup", FullText.StatsTerm))
      .groupBy(col("term")).count() // consumer keeps the bucketed scan
    val plan = probe.queryExecution.executedPlan.toString()
    val m = """SelectedBucketsCount: (\d+) out of (\d+)""".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no bucket pruning in lookup plan:\n$plan"))
    assert(m.group(2).toInt == 64)
    assert(m.group(1).toInt <= 2, s"2 keys must scan <= 2 buckets, got ${m.group(1)}")
  }

  test("index-served BM25 equals the full-scan baseline, and the plan reads the index") {
    val base = SparkEntry.queries("ft_bm25_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val served = SparkEntry.queries("ft_bm25_index_lookup")(spark, dir)
    val got = served.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == base, "an index may change where rows come from, never what they are")
    val plan = served.queryExecution.executedPlan.toString()
    assert(plan.contains("SelectedBucketsCount"),
      s"lookup must scan the bucketed index:\n$plan")
  }

  test("BM25 ranking is idf-sensible: rare-term docs outrank common-term docs") {
    // 'dup' is the corpus's rarest query term (df ≈ 5% of docs vs ~77%
    // for the others), so its idf dominates the score — the top hit must
    // be a 'dup' document.
    val top = SparkEntry.queries("ft_bm25_topk")(spark, dir).limit(1).collect()(0)
    val topDoc = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === top.getLong(0)).select("text").collect()(0).getString(0)
    assert(topDoc.split(" ").contains("dup"),
      s"top BM25 hit must contain the rarest query term, got: $topDoc")
  }

  test("postings are row-local and complete: tf sums to dl-restricted token counts") {
    val d = graft.Tables.load(spark, dir, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id"), col("text"))
    val post = FullText.postingsOf(d)
    // Σ tf per doc == dl (every token lands in exactly one posting)
    val bad = post.groupBy("doc_id")
      .agg(sum("tf").as("s"), first("dl").as("dl"))
      .filter(col("s") =!= col("dl")).count()
    assert(bad == 0, "tf must partition the doc's tokens")
  }
}
