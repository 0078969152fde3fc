package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.create(cores = "4", appName = "graft-test")
}

/** Shared deadline-poll helper for tests that wait on a background
  * consumer (resident CDC maintainers, streaming queries). */
object TestWait {
  def eventually(cond: => Boolean, hint: String, timeoutSec: Int = 60): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000L * 1000 * 1000
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, hint)
  }
}
