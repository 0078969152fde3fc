package graft

/** Diagnostic main: splits a bench query's wall time into DataFrame
  * construction (Catalyst analysis) vs execution, printing each timed run.
  *
  * Usage: runMain graft.ProfileQuery <queryName> [sfDir]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), appName = "graft-profile")
    // A/B SQL confs come from GRAFT_EXTRA_CONF, applied by GraftSession.
    // Synthetic floors: `_floor` = empty 32-task job (pure scheduler cost),
    // `_scan:<table>` = raw parquet count (scan cost without query logic).
    sys.env.get("GRAFT_LOG_LEVEL").foreach(spark.sparkContext.setLogLevel)
    val fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name.startsWith("_floor")) { (s, _) =>
        val n = name.split(":").lift(1).map(_.toInt).getOrElse(32)
        s.range(0, n, 1, n).toDF()
      }
      else if (name.startsWith("_scan:"))
        (s, dir) => Tables.load(s, dir, name.stripPrefix("_scan:"))
      else SparkEntry.queries(name)
    // Count scheduler activity per run: jobs and stages are the fixed-cost
    // units of local-mode latency (each stage wave ≈ tens of ms).
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    fn(spark, sfDir).count() // warm-up
    if (sys.env.contains("GRAFT_EXPLAIN")) {
      import spark.implicits._
      fn(spark, sfDir).groupBy().count().explain("formatted")
    }
    val runs = sys.env.get("GRAFT_RUNS").map(_.toInt).getOrElse(3)
    for (i <- 1 to runs) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      // split count() into its planning and execution halves
      val counted = df.groupBy().count()
      counted.queryExecution.executedPlan // force analysis+optimize+planning
      val t15 = System.nanoTime()
      counted.collect()
      val t2 = System.nanoTime()
      Thread.sleep(100) // let listener events drain
      println(f"[profile] $name run$i build=${(t1 - t0) / 1e9}%.3fs " +
        f"plan=${(t15 - t1) / 1e9}%.3fs run=${(t2 - t15) / 1e9}%.3fs " +
        s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    spark.stop()
  }
}
