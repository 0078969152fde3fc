package graft.catalog

import graft.TestSpark
import graft.aql.Engine
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic-concurrency commits: two sessions committing the same
  * container serialize via the CAS claim on the version directory
  * (`Catalog.tryCommit`) — the loser re-reads the winner's version as its
  * new base, re-derives its view, and retries, so no staged operation is
  * ever lost and no committer crashes. (The reference serializes all
  * writes under one RwLock — `/root/reference/src/database.rs:1123` — so
  * this is parity-plus.)
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two concurrent committers with disjoint inserts both land; no exception") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas")
    val cat = new Catalog(spark, dir.toString)
    cat.create("c", List("id" -> graft.aql.AlbaType.of("INT"),
      "v" -> graft.aql.AlbaType.of("SMALL-STRING")))

    // Two independent transaction layers over ONE catalog (two sessions).
    val txA = new Tx(cat)
    val txB = new Tx(cat)
    import org.apache.spark.sql.Row
    txA.stageInsert("c", Seq(Row(1, "from-A")))
    txB.stageInsert("c", Seq(Row(2, "from-B")))

    // A barrier maximizes the chance both threads read base version 0 and
    // race on claiming v1; the CAS loop must make the loser rebase to v1
    // and commit as v2.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def committer(tx: Tx) = new Thread(() => {
      try { barrier.await(); tx.commit(Some("c")) }
      catch { case t: Throwable => errs.add(t) }
    })
    val ts = Seq(committer(txA), committer(txB))
    ts.foreach(_.start()); ts.foreach(_.join(120000))

    assert(errs.isEmpty, s"commit threw: ${errs.toArray.mkString(", ")}")
    assert(cat.currentVersion("c") == 2, "both commits must publish (v2)")
    val rows = cat.read("c").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "from-A"), (2, "from-B")),
      "the losing committer must rebase onto the winner, not overwrite it")
    // intermediate version holds exactly one of the two (whichever won)
    val v1 = cat.readVersion("c", 1).collect().map(_.getInt(0)).toSet
    assert(v1 == Set(1) || v1 == Set(2))
  }

  test("stress: four committers x three commits each — all twelve inserts survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas4")
    val cat = new Catalog(spark, dir.toString)
    cat.create("s", List("id" -> graft.aql.AlbaType.of("INT")))
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    import org.apache.spark.sql.Row
    val ts = (0 until 4).map { w =>
      new Thread(() => {
        try {
          val tx = new Tx(cat)
          barrier.await()
          (0 until 3).foreach { i =>
            tx.stageInsert("s", Seq(Row(w * 10 + i)))
            tx.commit(Some("s"))
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(300000))
    assert(errs.isEmpty, s"commit threw: ${errs.toArray.mkString(", ")}")
    val rows = cat.read("s").collect().map(_.getInt(0)).toSet
    val want = (for (w <- 0 until 4; i <- 0 until 3) yield w * 10 + i).toSet
    assert(rows == want, s"lost inserts: ${(want -- rows).toSeq.sorted}")
    assert(cat.currentVersion("s") == 12, "every commit must publish its own version")
  }

  test("pointer never regresses when claims publish out of order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas2")
    val cat = new Catalog(spark, dir.toString)
    cat.create("m", List("id" -> graft.aql.AlbaType.of("INT")))
    import spark.implicits._
    // sequential commits advance monotonically
    (1 to 3).foreach(i => cat.overwrite("m", Seq(i).toDF("id")))
    assert(cat.currentVersion("m") == 3)
    // a stale claim below the pointer must not move it back: tryCommit at
    // base 0 fails (v1 exists) rather than republishing v1
    assert(!cat.tryCommit("m", 0, Seq(99).toDF("id")))
    assert(cat.currentVersion("m") == 3)
  }

  test("Tx.commit escapes a dead process's claim; a live claim is never overtaken") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas5")
    val cat = new Catalog(spark, dir.toString)
    cat.create("z", List("id" -> graft.aql.AlbaType.of("INT")))
    import org.apache.spark.sql.Row
    val tx = new Tx(cat)
    tx.stageInsert("z", Seq(Row(1))); tx.commit(Some("z")) // v1
    // a claim whose recorded process has exited: provably orphaned
    val deadPid = { val p = new ProcessBuilder("true").start(); p.waitFor(); p.pid() }
    java.nio.file.Files.writeString(
      dir.resolve("catalog").resolve("z.claim-v2"), deadPid.toString)
    assert(cat.claimIsOrphan("z", 2))
    // commit rebases on v1 and publishes PAST the dead claim, losing nothing
    tx.stageInsert("z", Seq(Row(2))); tx.commit(Some("z"))
    assert(cat.currentVersion("z") == 3, "escape must publish in the next free slot")
    assert(cat.read("z").collect().map(_.getInt(0)).toSet == Set(1, 2))
    // a claim held by a LIVE process is never treated as orphaned …
    java.nio.file.Files.writeString(
      dir.resolve("catalog").resolve("z.claim-v4"), ProcessHandle.current.pid.toString)
    assert(!cat.claimIsOrphan("z", 4))
    // … and neither is an unreadable (mid-create) one
    java.nio.file.Files.writeString(dir.resolve("catalog").resolve("z.claim-v5"), "")
    assert(!cat.claimIsOrphan("z", 5))
  }

  test("an orphaned claim (crash between claim and flip) does not wedge overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas3")
    val cat = new Catalog(spark, dir.toString)
    cat.create("o", List("id" -> graft.aql.AlbaType.of("INT")))
    import spark.implicits._
    cat.overwrite("o", Seq(1).toDF("id")) // v1
    // simulate a crashed committer: v2 directory exists, pointer still at 1
    val orphan = new java.io.File(dir.toFile, "data/o@v2")
    assert(orphan.mkdirs())
    assert(cat.currentVersion("o") == 1)
    cat.overwrite("o", Seq(2).toDF("id")) // must skip the orphan → v3
    assert(cat.currentVersion("o") == 3)
    assert(cat.read("o").collect().map(_.getInt(0)).toSet == Set(2))
  }
}
