package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration we would ship to a real cluster.
  *
  * Local testing runs `local[N]`, but every knob is chosen for the
  * 1000-executor / 100 TB case and merely scaled down:
  *  - AQE on: runtime coalescing + skew-join splitting replaces manual
  *    partition tuning when input sizes vary 1000x.
  *  - shuffle.partitions matches core count locally; on a cluster this is
  *    superseded by AQE's coalescing from an initial high value.
  *  - broadcast threshold: TPC-H-style dims (region/nation/supplier/part at
  *    fixture scale) stay broadcastable; big-side joins shuffle on keys.
  */
object GraftSession {
  def create(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
             appName: String = "graft"): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      // Pre-AQE shuffle fan-out. With size-based coalescing ON, this only
      // sets the map-side bucket count — AQE re-sizes reducers to the 16m
      // advisory — so locally the knob is pure per-stage overhead: 8 beats
      // 32 by ~10% on the sf0.1 bench (fewer shuffle buckets + dispatch
      // per wave) with identical final parallelism. On a cluster the same
      // config is RAISED via coalescePartitions.initialPartitionNum and
      // AQE still lands on advisory-sized reducers; nothing here encodes
      // fixture scale.
      .config("spark.sql.shuffle.partitions", math.min(cores.toIntOption.getOrElse(8), 8))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // size-based coalescing (not parallelism-first): post-shuffle
      // partitions target advisoryPartitionSizeInBytes, so a small stage
      // collapses to few tasks instead of fanning out to one task per
      // core. Spark's docs recommend this exactly when the cluster is
      // sized by maxPartitionBytes rather than raw core count — at 100 TB
      // the advisory size governs either way.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Scan fan-out floor follows the shuffle width (8), not core count:
      // by default Spark pads SMALL inputs to defaultParallelism splits
      // (32 here), so a 25 MB table scans as 32 sub-millisecond tasks
      // whose launch overhead dominates the stage. Size-based splitting
      // (maxPartitionBytes) governs any input big enough to matter — at
      // 100 TB every scan has thousands of splits regardless — so this
      // only stops the smallest inputs from fanning one task per core
      // (same philosophy as parallelismFirst=false above; measured ~10%
      // off the sf0.1 bench, identical plans).
      .config("spark.sql.files.minPartitionNum", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // InferFiltersFromGenerate adds `size(e)>0 AND isnotnull(e)` under
      // every explode(e). When e is a stored column that filter prunes
      // cheaply at the scan; every explode in THIS engine is over a
      // COMPUTED array (shingles, LSH bands, token lists), so the inferred
      // filter re-evaluates the full array expression 2-3x — and filter
      // pushdown drags it below the parallelizing exchange, serializing it
      // onto the raw input partitioning (measured 8.9s -> 0.3s on the
      // sf0.1 shingle explode). Excluding the rule is strictly better here.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // COUNT(*)/MIN/MAX over an unfiltered scan answer from parquet
      // footer statistics instead of reading row groups — the same
      // metadata-only shortcut DuckDB takes; at 100 TB this turns a full
      // table count into a footer sweep.
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      // Shuffle/spill scratch on the memory-backed filesystem when one is
      // mounted — the local-mode analogue of a memory-medium emptyDir for
      // shuffle locality on k8s. Spill safety is unchanged (a 100 TB
      // shuffle targets NVMe via the same knob); locally it removes ~25 ms
      // of shuffle-file I/O per exchange.
      .config("spark.local.dir", {
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-spark-local"
        else sys.props("java.io.tmpdir")
      })
    // Operator escape hatch (and local A/B harness): GRAFT_EXTRA_CONF holds
    // `k=v;k=v` confs applied on top of the defaults. Applied at BUILDER
    // time so static core configs (spark.broadcast.*, spark.io.*, …) work
    // too, not only runtime SQL confs.
    val withExtra = sys.env.get("GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";").filter(_.nonEmpty)).foldLeft(builder) { (b, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k, v)
          case _ => sys.error(s"GRAFT_EXTRA_CONF segment '$kv' is not key=value")
        }
      }
    val spark = withExtra.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
