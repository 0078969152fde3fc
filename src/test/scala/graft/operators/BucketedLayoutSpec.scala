package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production layout claimed throughout the operator docs — bucketed
  * tables co-locating join/agg keys — proven on a real write+read:
  * two tables bucketed by the same key join with ZERO shuffle exchanges,
  * and a groupBy on the bucket key aggregates without one. At 100 TB this
  * is the difference between a key-shuffle of the corpus per join and
  * none; locally it's the same plan property, asserted on the physical
  * plan. (bucketBy requires saveAsTable; external-table paths keep the
  * data in a temp dir, not the repo.)
  */
class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val setup: Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed")
    val docs = Tables.load(spark, dir, "documents")
    docs.select(col("doc_id"), col("text"), col("lang"))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", tmp.resolve("docs_bkt").toString)
      .mode("overwrite").saveAsTable("docs_bkt")
    // embeddings keyed by vec_id — aliased to doc_id for the co-located join
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", tmp.resolve("emb_bkt").toString)
      .mode("overwrite").saveAsTable("emb_bkt")
  }

  test("equi-join of two same-bucketed tables has no shuffle exchange") {
    setup
    // force the sort-merge path: at fixture scale the planner would pick a
    // broadcast join, which has no exchange regardless of bucketing — the
    // assertion is only meaningful when the join actually merges buckets
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("docs_bkt")
        .join(spark.table("emb_bkt"), "doc_id")
        .select(col("doc_id"), col("lang"), col("label"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("two source dirs bucket-register independently in one session") {
    // the registered catalog name must carry the source identity: a second
    // fixture dir with different content for the same table name must not
    // silently resolve to the first registration
    val tmp = java.nio.file.Files.createTempDirectory("graft-bkt-2dirs")
    val stage = tmp.resolve("stage")
    Tables.load(spark, dir, "region").limit(2)
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    import scala.jdk.CollectionConverters._
    val part = java.nio.file.Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, tmp.resolve("region.parquet"))
    val full = Tables.bucketed(spark, dir, "region", "r_regionkey", buckets = 4)
    val trimmed = Tables.bucketed(spark, tmp.toString, "region", "r_regionkey", buckets = 4)
    assert(full.count() == 5 && trimmed.count() == 2,
      "second source dir resolved to the first dir's bucketed registration")
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    setup
    val counts = spark.table("docs_bkt").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val plan = counts.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-key aggregation still shuffles:\n$plan")
    assert(counts.count() == spark.table("docs_bkt").count())
  }
}
