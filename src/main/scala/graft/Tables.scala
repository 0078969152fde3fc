package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access layer.
  *
  * The reference (TytoDB) stores each container as one fixed-width binary
  * file (`/root/reference/src/container.rs:12-24`); we re-base containers on
  * columnar Parquet directories read through Spark's vectorized reader
  * (SURVEY.md §1.3). At 100 TB each "container" is a partitioned Parquet
  * dataset; here the driver fixtures are single files per table.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table. Filters/projections applied downstream reach
    * the scan via Catalyst pushdown — nothing is materialized here.
    *
    * DataFrames are memoized per (session, path): the plan node is
    * immutable and reusable, so repeated queries skip parquet footer
    * reads + schema inference (a fixed ~100 ms per query in local mode;
    * on a cluster the same role is played by the metastore/catalog cache).
    */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** Load with the scan split across all cores. Small fixture files arrive
    * as ONE input partition (below maxPartitionBytes), which serializes
    * compute-heavy per-row pipelines (hashing, vector math). The explicit
    * round-robin split costs one tiny shuffle and buys full parallelism —
    * at warehouse scale the many-files layout does this for free, so this
    * helper is only used by CPU-bound operators, never plain scans.
    */
  def loadParallel(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, s"$dir/$name.parquet#par"),
      spark.read.parquet(s"$dir/$name.parquet")
        .repartition(spark.sparkContext.defaultParallelism))

  /** events.ts is parquet timestamp[ns]; Spark reads NANOS natively only as
    * long when `spark.sql.legacy.parquet.nanosAsLong` is set. We normalize
    * to a microsecond TimestampType column named `ts` (matching what DuckDB
    * does when it truncates ns → µs) so oracle comparisons line up.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case TimestampType => raw
      case LongType => // nanosAsLong mode: convert ns → µs timestamp.
        // Integer `div`, not `/`: double division loses precision above
        // 2^53 and epoch-ns values are ~1.7e18.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
