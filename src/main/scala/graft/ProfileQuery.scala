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
    // A/B runtime-settable SQL confs: GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(s"GRAFT_EXTRA_CONF segment '$kv' is not key=value")
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"[profile] $name run$i build=${(t1 - t0) / 1e9}%.3fs exec=${(t2 - t1) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
