package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Uses GraftSession.create so the driver's verify run executes under the
  * exact optimizer set (InferFiltersFromGenerate exclusion, AQE size-based
  * coalescing) that Bench and the test suite use — one session recipe
  * everywhere (VerifySessionSpec pins this).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names, for fast local
    // iteration on a single oracle row (the driver always passes 2 args)
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    def selected(name: String) = only.forall(_.contains(name))
    val spark = GraftSession.create(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the bench subset, so tools/duckbench.py can time exactly the
    // queries graft.Bench (and the judge) time. Written only on FULL runs:
    // a filtered run's outDir holds a subset, and a bench manifest there
    // would disagree with the dumped data (use a fresh outDir per
    // filtered iteration — oracle_sql.json is likewise the subset's).
    if (only.isEmpty)
      Files.writeString(Paths.get(s"$outDir/bench_queries.json"),
        SparkEntry.benchQueries.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
