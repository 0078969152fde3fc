package graft
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(cores = "32", appName = "graft-split")
    val fn = SparkEntry.queries(args(0))
    (1 to 2).foreach(_ => fn(spark, sfDir).count())
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val c = df.groupBy().count()
      c.queryExecution.executedPlan
      val t1 = System.nanoTime()
      c.collect()
      val t2 = System.nanoTime()
      println(f"[split] run$i buildplan=${(t1-t0)/1e9}%.3f exec=${(t2-t1)/1e9}%.3f")
    }
    spark.stop()
  }
}
