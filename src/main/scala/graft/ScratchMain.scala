package graft

/** Throwaway diagnostic main for plan inspection during tuning sessions —
  * not part of the library surface. Usage: runMain graft.ScratchMain <query>.
  */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dd_minhash_lsh")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.create(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), appName = "scratch")
    val df = SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    Seq("minhash_slices", "md5", "conv").foreach { pat =>
      println(s"[scratch] $pat occurrences: ${pat.r.findAllIn(plan).length}")
    }
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
