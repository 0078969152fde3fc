package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC tail consumer ([[ChangeTail]]): exactly-once windowed delivery
  * of [[Catalog.changes]] feeds with a restart-safe checkpoint.
  */
class ChangeTailSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tail-$tag")
    val cat = new Catalog(spark, dir.toString)
    cat.create("c", List("id" -> graft.aql.AlbaType.of("INT"),
      "v" -> graft.aql.AlbaType.of("SMALL-STRING")))
    (cat, new Tx(cat), dir.resolve("tail.ckpt"))
  }

  private def insert(tx: Tx, rows: (Int, String)*): Unit = {
    tx.stageInsert("c", rows.map(r => org.apache.spark.sql.Row(r._1, r._2)))
    tx.commit(Some("c"))
  }

  test("first poll delivers everything-as-inserts; caught-up polls deliver nothing") {
    val (cat, tx, ckpt) = fixture("seed")
    insert(tx, 1 -> "a", 2 -> "b")
    val tail = new ChangeTail(cat, "c", ckpt)
    var seen = Seq.empty[(Int, String, String)]
    assert(tail.pollOnce { (df, from, to) =>
      assert((from, to) == (0, 1))
      seen = df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    } == 1)
    assert(seen.toSet == Set((1, "a", "insert"), (2, "b", "insert")))
    assert(tail.pollOnce((_, _, _) => fail("caught up — must not deliver")) == 0)
  }

  test("windows are incremental and net multiple commits; checkpoint survives restart") {
    val (cat, tx, ckpt) = fixture("inc")
    insert(tx, 1 -> "a")
    val tail = new ChangeTail(cat, "c", ckpt)
    assert(tail.pollOnce((_, _, _) => ()) == 1)
    // two commits while the consumer is away: an edit then an insert
    tx.stageEdit("c", col("id") === 1, Seq("v" -> "A2"))
    tx.commit(Some("c")) // v2
    insert(tx, 2 -> "b") // v3
    // a RESTARTED tail (fresh instance, same checkpoint) nets both
    val resumed = new ChangeTail(cat, "c", ckpt)
    assert(resumed.lastDelivered == 1)
    var window = (-1, -1)
    var seen = Set.empty[(Int, String, String)]
    assert(resumed.pollOnce { (df, from, to) =>
      window = (from, to)
      seen = df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    } == 2)
    assert(window == (1, 3))
    assert(seen == Set((1, "a", "update_preimage"), (1, "A2", "update_postimage"),
      (2, "b", "insert")))
  }

  test("a failed callback leaves the checkpoint untouched — the window redelivers") {
    val (cat, tx, ckpt) = fixture("retry")
    insert(tx, 1 -> "a")
    val tail = new ChangeTail(cat, "c", ckpt)
    intercept[RuntimeException](
      tail.pollOnce((_, _, _) => throw new RuntimeException("sink down")))
    assert(tail.lastDelivered == 0, "checkpoint must not advance on failure")
    var redelivered = 0L
    tail.pollOnce((df, _, _) => redelivered = df.count())
    assert(redelivered == 1 && tail.lastDelivered == 1)
  }

  test("vacuum outrunning the tail is a loud error, never a silent skip") {
    val (cat, tx, ckpt) = fixture("vacuum")
    insert(tx, 1 -> "a")
    val tail = new ChangeTail(cat, "c", ckpt)
    tail.pollOnce((_, _, _) => ()) // delivered through v1
    insert(tx, 2 -> "b") // v2
    insert(tx, 3 -> "c") // v3
    cat.vacuum("c", keepLast = 1) // drops v1 (the tail's resume point) and v2
    val e = intercept[IllegalStateException](tail.pollOnce((_, _, _) => ()))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("round trip: streamed ingest lands commits, the tail feeds them back out exactly") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-tail-rt")
    val cat = new Catalog(spark, root.toString)
    cat.create("d", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "body" -> graft.aql.AlbaType.of("TEXT")))
    val tail = new ChangeTail(cat, "d", root.resolve("tail.ckpt"))

    val src = java.nio.file.Files.createTempDirectory("graft-tail-rt-src")
    import spark.implicits._
    def land(rows: (Long, String)*): Unit = {
      rows.toSeq.toDF("doc_id", "body").coalesce(1)
        .write.mode("append").parquet(src.toString)
    }
    def drain(ckpt: java.nio.file.Path): Unit = {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("body", StringType))))
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
      val q = graft.streaming.DocumentStreams.ingestToCatalog(stream, cat, "d")
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tail-rt-ckpt")

    land(1L -> "alpha", 2L -> "beta")
    drain(ckpt)
    var seen = Set.empty[(Long, String, String)]
    tail.pollOnce((df, _, _) => seen = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet)
    assert(seen == Set((1L, "alpha", "insert"), (2L, "beta", "insert")))

    // more micro-batches while the consumer is away: the next poll nets
    // exactly the NEW docs — the streamed commits and the feed agree
    land(3L -> "gamma")
    land(4L -> "delta")
    drain(ckpt)
    tail.pollOnce((df, _, _) => seen = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet)
    assert(seen == Set((3L, "gamma", "insert"), (4L, "delta", "insert")))
    assert(tail.lastDelivered == cat.currentVersion("d"))
  }

  test("a dropped-and-recreated container is a loud error, not a silent stall") {
    val (cat, tx, ckpt) = fixture("recreate")
    insert(tx, 1 -> "a")
    insert(tx, 2 -> "b")
    val tail = new ChangeTail(cat, "c", ckpt)
    tail.pollOnce((_, _, _) => ()) // delivered through v2
    cat.drop("c")
    cat.create("c", List("id" -> graft.aql.AlbaType.of("INT"),
      "v" -> graft.aql.AlbaType.of("SMALL-STRING")))
    val tx2 = new Tx(cat)
    tx2.stageInsert("c", Seq(org.apache.spark.sql.Row(9, "z")))
    tx2.commit(Some("c")) // new history: v1 < checkpoint 2
    val e = intercept[IllegalStateException](tail.pollOnce((_, _, _) => ()))
    assert(e.getMessage.contains("dropped and recreated"))
  }

  test("auto-vacuum keeps a lagging REGISTERED tail's window; unregistered still errors") {
    val (cat, tx, ckpt) = fixture("reg")
    tx.vacuumEvery = 1 // every commit auto-vacuums
    tx.vacuumKeepLast = 1
    insert(tx, 1 -> "a") // v1 (auto-vacuum: nothing to drop)
    val registered = ChangeTail.registered(cat, "c", "warehouse-sink")
    val unregistered = new ChangeTail(cat, "c", ckpt)
    registered.pollOnce((_, _, _) => ())
    unregistered.pollOnce((_, _, _) => ()) // both delivered through v1
    insert(tx, 2 -> "b") // v2 + auto-vacuum
    insert(tx, 3 -> "x") // v3 + auto-vacuum
    // keepLast=1 would drop v1/v2, but the registry floors retention at
    // the registered consumer's resume point — its whole window survives
    assert(cat.versions("c") == Seq(1, 2, 3),
      s"registered tail's window must survive auto-vacuum, have ${cat.versions("c")}")
    var window = (-1, -1)
    assert(registered.pollOnce((_, f, t) => window = (f, t)) == 2)
    assert(window == (1, 3))
    // caught up (checkpoint 3): the floor releases and vacuum proceeds —
    // which strands the UNREGISTERED tail, still a loud error by contract
    insert(tx, 4 -> "y") // v4 + auto-vacuum: registered ckpt 3 keeps v3/v4
    assert(cat.versions("c") == Seq(3, 4))
    val e = intercept[IllegalStateException](unregistered.pollOnce((_, _, _) => ()))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("unregistering withdraws the retention floor; re-registration is idempotent") {
    val (cat, tx, _) = fixture("unreg")
    insert(tx, 1 -> "a")
    val tail = ChangeTail.registered(cat, "c", "sink")
    tail.pollOnce((_, _, _) => ())
    assert(cat.registeredTails("c") == Map("sink" -> Some(1)))
    // same id re-registers onto the SAME checkpoint (no reset to 0)
    assert(ChangeTail.registered(cat, "c", "sink").lastDelivered == 1)
    insert(tx, 2 -> "b")
    insert(tx, 3 -> "x")
    cat.unregisterTail("c", "sink")
    cat.vacuum("c", keepLast = 1) // no floor left: v1/v2 drop
    assert(cat.versions("c") == Seq(3))
    // the registry file WAS the live tail's checkpoint: its vanishing is
    // a LOUD error (a silent 0 would replay history into a sink that
    // already consumed it), and a FRESH tail is the re-seed path
    val gone = intercept[IllegalStateException](tail.pollOnce((_, _, _) => ()))
    assert(gone.getMessage.contains("vanished"), gone.getMessage)
    val fresh = ChangeTail.registered(cat, "c", "sink")
    var reseeded = Set.empty[(Int, String)]
    fresh.pollOnce((df, from, _) => {
      assert(from == 0)
      reseeded = df.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    })
    assert(reseeded == Set(1 -> "a", 2 -> "b", 3 -> "x"),
      "a fresh tail must replay the full snapshot as inserts")
    cat.unregisterTail("c", "sink")
    // bad ids never reach the filesystem
    intercept[IllegalArgumentException](cat.registerTail("c", "../escape"))
    intercept[IllegalArgumentException](cat.registerTail("nope", "sink"))
  }

  test("an unreadable registered checkpoint floors vacuum at keep-everything") {
    val (cat, tx, _) = fixture("corrupt")
    insert(tx, 1 -> "a")
    val p = cat.registerTail("c", "sink")
    insert(tx, 2 -> "b")
    java.nio.file.Files.writeString(p, "7garbage")
    cat.vacuum("c", keepLast = 1)
    assert(cat.versions("c") == Seq(1, 2),
      "a consumer we can't price must not lose history")
    // drop removes the registry with the container's history
    cat.drop("c")
    assert(cat.registeredTails("c").isEmpty)
  }

  test("run() drains pending windows and stops on the until condition") {
    val (cat, tx, ckpt) = fixture("run")
    insert(tx, 1 -> "a")
    insert(tx, 2 -> "b")
    val tail = new ChangeTail(cat, "c", ckpt)
    var delivered = 0
    tail.run(pollMs = 5, until = () => delivered > 0) { (df, _, _) =>
      delivered += df.count().toInt
    }
    assert(delivered == 2 && tail.lastDelivered == 2)
  }
}
