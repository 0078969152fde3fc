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
      spark.read.parquet(compacted(spark, dir, name)))

  /** One-time ingest compaction of a fixture file into the engine's own
    * storage layout: range-clustered on the first column (the pk convention
    * the catalog's commit path already sorts by — `Catalog.scala`), one
    * row-group-sized file per partition.
    *
    * Why this exists: the driver's fixtures are SINGLE-row-group files, and
    * a parquet row group is the unit of scan parallelism — every query over
    * `lineitem` would run its scan + partial aggregation on one core no
    * matter how many are available. A 100 TB deployment never has that
    * layout (data lands as one file per writer partition, and table formats
    * compact it further — Delta OPTIMIZE / Iceberg rewrite_data_files do
    * exactly this job); a resident engine owns its layout, so we normalize
    * once at ingest, not per query. Range-clustering by pk keeps per-file
    * min/max stats tight, so point/range scans (`s2_*`) skip whole files —
    * the same skip-scan role the reference's chunk index plays
    * (`/root/reference/src/container.rs`, SURVEY §2.7).
    *
    * Partition count scales with ROW count, not bytes: the compute-heavy
    * tables (documents' text, embeddings' vectors) are small on disk but
    * expensive per row. 2000 rows/partition (capped at core count) keeps
    * fact scans at full parallelism while dims collapse to a few files —
    * measured locally, a task launch costs ~2 ms of driver time, so a
    * 20k-row dim split 32 ways spends more on scheduling than scanning
    * (one broadcast build = 64 ms of pure launch cost). On a cluster
    * maxPartitionBytes governs instead — this knob is the local stand-in,
    * not a scale parameter.
    *
    * The compacted copy lives under java.io.tmpdir keyed by source path +
    * (size, mtime), so a regenerated fixture invalidates it; writes go to a
    * temp dir renamed into place so concurrent JVMs (driver verify + bench)
    * never read a half-written table.
    */
  /** Ingest partition target, by COMPUTE cost rather than bytes: documents
    * (per-row text hashing/shingling) and embeddings (per-row vector math)
    * do orders of magnitude more work per row than the relational tables,
    * so they get small partitions (→ full core-count parallelism) while
    * relational scans use coarse ones (task launch ≈ 2 ms of driver time —
    * finer splits cost more to schedule than to scan). The cluster
    * analogue is a per-table maxPartitionBytes tuned to row weight.
    */
  private def rowsPerPartition(name: String): Long = name match {
    case "documents" | "embeddings" => 200L
    case _ => 2000L
  }

  private def compacted(spark: SparkSession, dir: String, name: String): String = {
    val src = new java.io.File(s"$dir/$name.parquet")
    if (!src.isFile) return src.getPath // already a directory layout: as-is
    // the rows-per-partition target AND the width constant are part of
    // the cache key: a layout-knob change must invalidate previously
    // compacted copies (the pre-w32 cap was the BUILDING session's core
    // count — a stale 4-file copy on a warm cache would silently keep
    // starving 32-core scans without this discriminator)
    val rpp = rowsPerPartition(name)
    buildOnce(src, "graft-compact", name, s"rpp$rpp-w32") { tmp =>
      val raw = spark.read.parquet(src.getPath)
      // LAYOUT CONSTANT, not the building session's core count: the
      // compacted copy is shared cross-JVM, and capping at
      // defaultParallelism let a 4-core test JVM persist a 4-file layout
      // that then starved every 32-core session's compute-bound scans
      // (the md5-explode stage ran 4 tasks on 32 cores). 32 files is the
      // bench width; sessions with fewer cores just pack files per split.
      val n = math.min(32L, math.max(1L, raw.count() / rpp)).toInt
      import org.apache.spark.sql.functions.col
      raw.repartitionByRange(n, col(raw.columns.head))
        .sortWithinPartitions(raw.columns.head)
        .write.mode("overwrite").parquet(tmp.getPath)
    }
  }

  /** Build-once staging cache under java.io.tmpdir (shared by the ingest
    * compaction and the interchange-format staging): the target directory
    * is keyed by the source file's identity (path, size, mtime) plus a
    * discriminator, so a regenerated fixture invalidates it. `write`
    * produces into a unique tmp dir (pid + nanotime — concurrent JVMs
    * never share one, so a half-written attempt can never be renamed in),
    * which is renamed into place; the loser of a cross-JVM race discards
    * its copy. Locking is striped per target directory, so distinct
    * tables/formats stage concurrently while two in-process sessions
    * racing on the SAME target serialize (per-session memos can't).
    */
  private[graft] def buildOnce(src: java.io.File, cacheRoot: String,
      name: String, discriminator: String = "")(write: java.io.File => Unit): String = {
    val key = java.lang.Long.toHexString(java.util.Objects.hash(
      src.getAbsolutePath, src.length, src.lastModified, discriminator).toLong)
    val base = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), cacheRoot), s"$name-$key")
    buildLocks.computeIfAbsent(base.getPath, _ => new Object).synchronized {
      if (!base.isDirectory) {
        base.getParentFile.mkdirs()
        val tmp = new java.io.File(base.getParent,
          s".${base.getName}.${ProcessHandle.current.pid}-${System.nanoTime}.tmp")
        write(tmp)
        if (!tmp.renameTo(base)) { // lost the race: another JVM built it first
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(tmp.toPath).iterator().asScala.toSeq
            .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
      base.getPath
    }
  }

  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Secondary bucketed projection of a fixture table — the warehouse
    * pattern of maintaining more than one physical layout per logical
    * table (Vertica projections; Delta/Iceberg clustered rewrites): the
    * PRIMARY copy stays pk-range-clustered (tight file min/max → point and
    * range scans skip files, `compacted` above), and join-heavy facts get
    * an additional copy hash-bucketed + sorted on the join key, so
    * fact⋈fact equi-joins and pre-aggregations on that key plan with ZERO
    * exchange (bucketed sort-merge join / bucket-local partial agg).
    *
    * At 100 TB this is exactly the layout decision that removes the
    * biggest shuffle in TPC-H-shaped plans (orders⋈lineitem on orderkey):
    * both facts bucketed by orderkey into the same bucket count makes the
    * join a per-bucket merge with no network at all, and a groupBy on the
    * bucket key needs no exchange. Locally the same plan property holds
    * (asserted by BucketedLayoutSpec/PlanAuditSpec) with 32 buckets; a
    * cluster would use O(thousands).
    *
    * Mechanics: bucketed data is staged once cross-JVM via `buildOnce`
    * (bucketBy requires saveAsTable, so the build writes through a
    * transient catalog entry whose external path is then renamed into the
    * cache); each session re-attaches by registering an external table
    * with the same CLUSTERED/SORTED BY metadata over the cached files
    * (bucket ids live in the file names, so registration is pure DDL).
    */
  def bucketed(spark: SparkSession, dir: String, name: String, key: String,
      buckets: Int = 32): DataFrame = {
    val src = new java.io.File(s"$dir/$name.parquet")
    if (!src.isFile) return load(spark, dir, name) // directory layout: as-is
    bucketedDerived(spark, src, name, key, buckets)(spark.read.parquet(src.getPath))
  }

  /** Persist an arbitrary DERIVED DataFrame as a bucketed table, staged
    * once per (source-file identity, name) — the materialized-index
    * pattern: a computed table (e.g. an IVF cell assignment) written
    * hash-bucketed + sorted by its probe key, so later point probes are
    * bucket-pruned file scans (`SelectedBucketsCount k out of n`) instead
    * of full scans + recomputation. `build` is only evaluated on the
    * first call for a given source identity (cross-JVM, like `bucketed`).
    */
  def bucketedDerived(spark: SparkSession, src: java.io.File, name: String,
      key: String, buckets: Int)(build: => DataFrame): DataFrame = {
    val path = buildOnce(src, "graft-bucketed", name, s"bk$buckets-$key") { tmp =>
      val tbl = s"graft_build_${name}_${System.nanoTime()}"
      // pre-repartition on the bucket key so each write task owns exactly
      // one bucket → one file per bucket → the scan can also report the
      // sortBy order (multi-file buckets lose the sorted-scan property)
      build.repartition(buckets, org.apache.spark.sql.functions.col(key))
        .write.bucketBy(buckets, key).sortBy(key)
        .option("path", tmp.getPath).mode("overwrite").saveAsTable(tbl)
      spark.sql(s"DROP TABLE $tbl") // external table: metadata only, data stays
    }
    // the registered name carries the staged directory's identity key (the
    // buildOnce hash of path+size+mtime), so two different source dirs in
    // ONE session register distinct tables instead of the second silently
    // reading the first's data
    val reg = s"graft_bkt_${new java.io.File(path).getName.replace('-', '_')}_bk${buckets}_$key"
    cache.getOrElseUpdate((spark, s"bucketed:$path"), {
      if (!spark.catalog.tableExists(reg)) {
        val ddl = spark.read.parquet(path).schema.toDDL
        spark.sql(s"""CREATE TABLE $reg ($ddl) USING PARQUET
                     |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
                     |LOCATION '$path'""".stripMargin)
      }
      spark.table(reg)
    })
  }

  /** Denormalized nation⋈region dimension — the classic star-schema move
    * of materializing a snowflaked dim chain into ONE flat dim at ingest.
    * Both tables are FIXED-SIZE (25 and 5 rows at every scale factor —
    * they don't grow with the data), so the join is a constant-cost,
    * one-time layout decision; every query that filters nations by region
    * then reads a single 25-row dim and pays ONE broadcast build instead
    * of a two-deep sequential build chain (each broadcast build is a
    * scheduler wave: ~50 ms locally, a dispatch round-trip on a cluster).
    */
  def nationRegion(spark: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/nation.parquet")
    if (!src.isFile) { // directory-layout fixtures: join in-plan
      val n = load(spark, dir, "nation"); val r = load(spark, dir, "region")
      return n.join(r, n("n_regionkey") === r("r_regionkey"))
    }
    val path = buildOnce(src, "graft-denorm", "nation_region") { tmp =>
      val n = spark.read.parquet(src.getPath)
      val r = spark.read.parquet(s"$dir/region.parquet")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    }
    cache.getOrElseUpdate((spark, s"denorm:$path"), spark.read.parquet(path))
  }

  /** Orders flattened with the customer's market segment at ingest,
    * hash-bucketed + sorted by o_orderkey like the other fact
    * projections — the fact-side counterpart of [[customerGeo]]: a
    * low-cardinality dim attribute (c_mktsegment dictionary-encodes to
    * almost nothing) lands ON the orders row, so a segment-filtered
    * orders⋈lineitem plan is a single zero-exchange bucketed merge join
    * with NO broadcast build wave at query time. The flatten itself is a
    * one-time ingest-side equi-join (shuffle or map-side, the planner's
    * call) — the standard ETL denormalization every star schema ships.
    */
  def ordersMkt(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val src = new java.io.File(s"$dir/orders.parquet")
    def joined = {
      val o = load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val c = load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
          col("c_mktsegment"))
    }
    if (!src.isFile) return joined // directory layout: join in-plan
    bucketedDerived(spark, src, "orders_mkt", "o_orderkey", 32)(joined)
  }

  /** Customer flattened through the nation⋈region chain — the full
    * star-schema denormalization, one step further than [[nationRegion]]:
    * geography (n_name, r_name) lands ON the customer row at ingest, so a
    * region-filtered customer dim is a single scan + ONE broadcast build,
    * with no dim chain at query time. The join is a one-time linear-cost
    * ingest decision (customer ⋈ broadcast 25-row dim); at 100 TB it's
    * the same ingest-time map-side join, and the columns it adds are two
    * low-cardinality strings that dictionary-encode to almost nothing.
    */
  def customerGeo(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val src = new java.io.File(s"$dir/customer.parquet")
    def joined(c: DataFrame) = c.join(
      broadcast(nationRegion(spark, dir)), c("c_nationkey") === col("n_nationkey"))
    if (!src.isFile) return joined(load(spark, dir, "customer"))
    val path = buildOnce(src, "graft-denorm", "customer_geo") { tmp =>
      joined(spark.read.parquet(src.getPath))
        .write.mode("overwrite").parquet(tmp.getPath)
    }
    cache.getOrElseUpdate((spark, s"denorm:$path"), spark.read.parquet(path))
  }

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
