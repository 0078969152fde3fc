package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must execute against an EMPTY corpus (schema-only
  * tables): the fixtures never exercise the zero-row path, where ANSI-mode
  * array indexing, head-of-empty aggregations, seed selection over an
  * empty table, or fixpoint loops with no edges would first crash in
  * production (a fresh deployment's first query runs before its first
  * ingest).
  */
class EmptyCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-corpus")
    graft.Tables.all.foreach { t =>
      // raw read (no µs conversion) so the staged schema matches the
      // fixture layout exactly — events keeps its nanosAsLong LongType ts
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  test("every registry query runs on a schema-only corpus without throwing") {
    SparkEntry.registry.foreach { q =>
      val n =
        try q.fn(spark, emptyDir).count()
        catch {
          case e: Throwable =>
            fail(s"${q.name} threw on empty corpus: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      assert(n >= 0, s"${q.name} returned negative count")
    }
  }
}
