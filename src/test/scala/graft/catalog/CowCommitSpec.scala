package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-granular copy-on-write commits: a version rewrites only the
  * parquet files that can contain a touched row and hard-links every
  * other base file, so commit cost scales with touched data, not
  * container size — the Delta/Iceberg commit shape expressed in the
  * versioned-directory catalog. (The reference rewrites whole-container
  * state on commit — `/root/reference/src/container.rs:248-342` — which
  * is the one operation that cannot scale to 100 TB; this is the
  * scale-hardened replacement.)
  */
class CowCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Links share an inode with their base file; a rewritten file doesn't. */
  private def sameFile(a: java.nio.file.Path, b: java.nio.file.Path): Boolean =
    java.nio.file.Files.isSameFile(a, b)

  private def fixture(tag: String, nFiles: Int = 4, rowsPerFile: Int = 10) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-cow-$tag")
    val cat = new Catalog(spark, dir.toString)
    cat.create("c", List("id" -> graft.aql.AlbaType.of("INT"),
      "v" -> graft.aql.AlbaType.of("SMALL-STRING")))
    import spark.implicits._
    // pk-range-clustered multi-file base version, mirroring the compaction
    // layout: file k holds ids [k*rowsPerFile, (k+1)*rowsPerFile)
    val base = (0 until nFiles * rowsPerFile).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(nFiles, col("id"))
      .sortWithinPartitions("id")
    cat.overwrite("c", base) // v1
    (cat, dir)
  }

  test("a point EDIT rewrites exactly the one pk-range-overlapping file; the rest are hard links") {
    val (cat, _) = fixture("edit")
    val v1Files = cat.versionFiles("c", 1)
    assert(v1Files.size == 4, "fixture must be multi-file")

    val tx = new Tx(cat)
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "EDITED"))
    tx.commit(Some("c"))
    assert(cat.currentVersion("c") == 2)

    val v2Files = cat.versionFiles("c", 2)
    val v1ByName = v1Files.map(f => f.getFileName.toString -> f).toMap
    val (linked, rewritten) = v2Files.partition(f =>
      v1ByName.get(f.getFileName.toString).exists(sameFile(_, f)))
    assert(linked.size == 3, s"3 of 4 base files must carry over as links, got ${linked.size}")
    assert(rewritten.size >= 1, "the touched pk range must be rewritten")

    // content is the exact fold
    val got = cat.read("c").collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(got.size == 40)
    assert(got(5) == "EDITED")
    assert(got(4) == "v4" && got(15) == "v15")
    // time travel to the base is untouched
    assert(cat.readVersion("c", 1).filter(col("id") === 5)
      .collect().head.getString(1) == "v5")
  }

  test("a DELETE with a range predicate rewrites only overlapping files") {
    val (cat, _) = fixture("del")
    val tx = new Tx(cat)
    // spans files 2 and 3 (ids 25..32), leaves files 0 and 1 untouched
    tx.stageDelete("c", Some(col("id") >= 25 && col("id") <= 32))
    tx.commit(Some("c"))

    val v1ByName = cat.versionFiles("c", 1).map(f => f.getFileName.toString -> f).toMap
    val (linked, _) = cat.versionFiles("c", 2).partition(f =>
      v1ByName.get(f.getFileName.toString).exists(sameFile(_, f)))
    assert(linked.size == 2, s"files 0 and 1 must carry over as links, got ${linked.size}")
    assert(cat.read("c").count() == 32)
    assert(cat.read("c").filter(col("id").between(25, 32)).count() == 0)
  }

  test("an insert-only commit is a pure append: every base file carries over as a link") {
    val (cat, _) = fixture("ins")
    val tx = new Tx(cat)
    tx.stageInsert("c", Seq(Row(100, "new-a"), Row(101, "new-b")))
    tx.commit(Some("c"))

    val v1ByName = cat.versionFiles("c", 1).map(f => f.getFileName.toString -> f).toMap
    val v2Files = cat.versionFiles("c", 2)
    val linked = v2Files.filter(f =>
      v1ByName.get(f.getFileName.toString).exists(sameFile(_, f)))
    assert(linked.size == 4, "all 4 base files must carry over untouched")
    assert(v2Files.size > 4, "the insert batch lands as fresh part file(s)")
    assert(cat.read("c").count() == 42)
  }

  test("an edit staged AFTER an insert sees the inserted rows (MVCC order preserved across the decomposition)") {
    val (cat, _) = fixture("mvcc")
    val tx = new Tx(cat)
    tx.stageInsert("c", Seq(Row(100, "fresh")))
    tx.stageEdit("c", col("v") === "fresh", Seq("v" -> "touched"))
    // and an edit staged BEFORE a later insert must NOT touch it
    tx.stageInsert("c", Seq(Row(101, "fresh")))
    tx.commit(Some("c"))
    val got = cat.read("c").collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(got(100) == "touched", "edit after insert applies to the inserted row")
    assert(got(101) == "fresh", "edit before a later insert must not apply to it")
  }

  test("predicates on non-pk columns stay exact (full scan fallback, still file-granular)") {
    val (cat, _) = fixture("nonpk")
    val tx = new Tx(cat)
    // 'v' has no clustered layout: every file may match, but the fold is exact
    tx.stageEdit("c", col("v") === "v7", Seq("v" -> "X"))
    tx.stageDelete("c", Some(col("v") === "v38"))
    tx.commit(Some("c"))
    val got = cat.read("c").collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(got(7) == "X" && !got.contains(38) && got.size == 39)
  }

  test("vacuum of the base version leaves linked files readable in the new version") {
    val (cat, _) = fixture("vac")
    val tx = new Tx(cat)
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "EDITED"))
    tx.commit(Some("c"))
    cat.vacuum("c", keepLast = 1) // drops v1, which shares inodes with v2
    assert(cat.versions("c") == Seq(2))
    val got = cat.read("c").collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(got.size == 40 && got(5) == "EDITED" && got(39) == "v39",
      "linked files must survive deletion of the version they were linked from")
  }

  test("EDIT on a post-ALTER column rewrites only overlapping files, with the widened schema") {
    val (cat, _) = fixture("alter")
    cat.addColumns("c", List("tag" -> graft.aql.AlbaType.of("TEXT")))
    val tx = new Tx(cat)
    // the predicate runs over OLD-schema files (tag reads as NULL there);
    // the set writes the NEW column into the rewritten file only
    tx.stageEdit("c", col("id") === 5, Seq("tag" -> "T"))
    tx.commit(Some("c"))
    val v1ByName = cat.versionFiles("c", 1).map(f => f.getFileName.toString -> f).toMap
    val (linked, _) = cat.versionFiles("c", 2).partition(f =>
      v1ByName.get(f.getFileName.toString).exists(sameFile(_, f)))
    assert(linked.size == 3, "non-overlapping old-schema files stay linked")
    val got = cat.read("c").collect()
      .map(r => (r.getInt(0), Option(r.getString(2)))).toMap
    assert(got(5).contains("T"), "edited row carries the new column")
    assert(got(4).isEmpty && got(39).isEmpty,
      "untouched rows (linked old-schema files) read the new column as NULL")
    // a predicate ON the new column matches nothing in old files (3VL)
    val tx2 = new Tx(cat)
    tx2.stageDelete("c", Some(col("tag") === "nope"))
    tx2.commit(Some("c"))
    assert(cat.read("c").count() == 40, "NULL tag rows are kept by 3VL delete")
  }

  test("OPTIMIZE compacts a fragmented version chain; history and content survive") {
    // the maintenance flip side of COW: many small commits accumulate
    // small appended part files (each insert-only commit adds one)
    val dir = java.nio.file.Files.createTempDirectory("graft-cow-opt")
    val eng = new graft.aql.Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER f ['k','v'] [INT, SMALL-STRING]")
    (1 to 6).foreach { i =>
      eng.execute(s"CREATE ROW ['k','v'] [$i,'v$i'] ON f")
      eng.execute("COMMIT f")
    }
    val cat = eng.catalog
    assert(cat.currentVersion("f") == 6)
    val fragmented = cat.versionFiles("f", 6).size
    assert(fragmented >= 6, s"6 append commits must fragment, got $fragmented files")

    val msg = eng.execute("OPTIMIZE f 1").asInstanceOf[graft.aql.Engine.Done].message
    assert(msg.contains("-> 1 file(s)"), msg)
    assert(cat.currentVersion("f") == 7)
    assert(cat.versionFiles("f", 7).size == 1)
    // content identical, pk-clustered
    val got = cat.read("f").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == (1 to 6).map(i => (i, s"v$i")).toSet)
    // the fragmented history is still time-travelable until vacuumed
    assert(cat.readVersion("f", 3).count() == 3)
    eng.execute("VACUUM f")
    assert(cat.versions("f") == Seq(7))
    // and the next COW commit links the compacted file set
    eng.execute("CREATE ROW ['k','v'] [7,'v7'] ON f"); eng.execute("COMMIT f")
    assert(cat.read("f").count() == 7)
    intercept[graft.aql.ParseException](eng.execute("OPTIMIZE f 0"))
  }

  test("rows staged before another session's ALTER commit with NULL in the new column") {
    // same-session ALTER is blocked while ops are staged; ANOTHER session
    // can widen the schema mid-transaction — the staged old-arity rows
    // must NULL-fill the new column, exactly like pre-ALTER parquet files
    val dir = java.nio.file.Files.createTempDirectory("graft-cow-alterrace")
    val cat = new Catalog(spark, dir.toString)
    cat.create("x", List("id" -> graft.aql.AlbaType.of("INT"),
      "v" -> graft.aql.AlbaType.of("SMALL-STRING")))
    import org.apache.spark.sql.Row
    val tx = new Tx(cat)
    tx.stageInsert("x", Seq(Row(1, "old-arity")))
    cat.addColumns("x", List("tag" -> graft.aql.AlbaType.of("TEXT"))) // session B
    tx.commit(Some("x"))
    val got = cat.read("x").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set((1, "old-arity", None)))
  }

  test("OPTIMIZE races a concurrent commit through the CAS — the commit's rows survive") {
    // regression: optimize pinned its snapshot then published via
    // last-writer-wins overwrite(), burying any version committed in
    // between; it now loses the slot race and re-compacts the new base
    val dir = java.nio.file.Files.createTempDirectory("graft-cow-optrace")
    val cat = new Catalog(spark, dir.toString)
    cat.create("r", List("id" -> graft.aql.AlbaType.of("INT")))
    import org.apache.spark.sql.Row
    val seed = new Tx(cat)
    (1 to 3).foreach { i => seed.stageInsert("r", Seq(Row(i))); seed.commit(Some("r")) }
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val opt = new Thread(() => {
      try { barrier.await(); cat.optimize("r", Some(1)) }
      catch { case t: Throwable => errs.add(t) }
    })
    val committer = new Thread(() => {
      try {
        barrier.await()
        val tx = new Tx(cat); tx.stageInsert("r", Seq(Row(99))); tx.commit(Some("r"))
      } catch { case t: Throwable => errs.add(t) }
    })
    Seq(opt, committer).foreach(_.start()); Seq(opt, committer).foreach(_.join(120000))
    assert(errs.isEmpty, s"threw: ${errs.toArray.mkString(", ")}")
    assert(cat.read("r").collect().map(_.getInt(0)).toSet == Set(1, 2, 3, 99),
      "a commit racing OPTIMIZE must never lose its rows")
  }

  test("VACUUM in the crash window adopts the published version instead of deleting the pointed one") {
    // regression: a version published but not yet pointer-flipped counted
    // toward keepLast, so vacuum could delete the version the pointer
    // still referenced and the container read empty
    val dir = java.nio.file.Files.createTempDirectory("graft-cow-vacwin")
    val cat = new Catalog(spark, dir.toString)
    cat.create("w", List("id" -> graft.aql.AlbaType.of("INT")))
    import spark.implicits._
    cat.overwrite("w", Seq(1).toDF("id")) // v1
    val tmp = dir.resolve("data/w.crashed-tmp")
    Seq(2).toDF("id").write.parquet(tmp.toString)
    java.nio.file.Files.move(tmp, dir.resolve("data/w@v2"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    assert(cat.currentVersion("w") == 1)
    cat.vacuum("w", keepLast = 1)
    assert(cat.currentVersion("w") == 2, "vacuum must adopt the published version")
    assert(cat.read("w").collect().map(_.getInt(0)).toSet == Set(2),
      "the adopted version is readable; nothing was GC'd out from under the pointer")
  }

  test("MERGE ROWS rewrites only pk-overlapping files; misses append; rest are links") {
    val (cat, _) = fixture("merge")
    import spark.implicits._
    // src hits ids 5 and 7 (both in file 0: pk range [0,10)) and misses
    // ids 200, 201 — one rewritten file, one fresh insert part, 3 links
    val src = Seq((5, "M5"), (7, "M7"), (200, "M200"), (201, "M201"))
      .toDF("id", "v")
    new Tx(cat).mergeRows("c", src)
    assert(cat.currentVersion("c") == 2)

    val v1ByName = cat.versionFiles("c", 1).map(f => f.getFileName.toString -> f).toMap
    val (linked, fresh) = cat.versionFiles("c", 2).partition(f =>
      v1ByName.get(f.getFileName.toString).exists(sameFile(_, f)))
    assert(linked.size == 3, s"3 of 4 base files must carry as links, got ${linked.size}")
    assert(fresh.nonEmpty, "the touched range + misses must produce fresh parts")

    val got = cat.read("c").collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(got.size == 42, "40 base rows + 2 inserted misses")
    assert(got(5) == "M5" && got(7) == "M7", "matches update")
    assert(got(200) == "M200" && got(201) == "M201", "misses insert")
    assert(got(4) == "v4" && got(39) == "v39", "untouched rows unchanged")
  }

  test("MERGE ROWS guards: staged ops, NULL pks, duplicate pks all throw") {
    val (cat, _) = fixture("mergeguard")
    import spark.implicits._
    val tx = new Tx(cat)
    tx.stageInsert("c", Seq(Row(300, "x")))
    intercept[IllegalArgumentException](
      tx.mergeRows("c", Seq((1, "a")).toDF("id", "v")))
    tx.rollback(Some("c"))
    intercept[IllegalArgumentException](tx.mergeRows("c",
      Seq((1, "a"), (1, "b")).toDF("id", "v")))
    intercept[IllegalArgumentException](tx.mergeRows("c",
      Seq((Option.empty[Int], "a")).toDF("id", "v")))
    assert(cat.currentVersion("c") == 1, "failed guards must not publish")
  }

  test("MERGE ROWS on an empty container inserts everything as v1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cow-merge0")
    val cat = new Catalog(spark, dir.toString)
    cat.create("c", List("id" -> graft.aql.AlbaType.of("INT"),
      "v" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n" -> graft.aql.AlbaType.of("BIGINT")))
    import spark.implicits._
    // unmentioned column n is NULL on insert
    new Tx(cat).mergeRows("c", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val got = cat.read("c").orderBy("id").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(got.forall(_.isNullAt(2)), "unmentioned columns are NULL")
  }

  test("CLONE: v1 hard-links the source's files; the two containers diverge independently") {
    val (cat, _) = fixture("clone")
    cat.cloneContainer("c", "c2")
    assert(cat.currentVersion("c2") == 1)
    assert(cat.get("c2").columns == cat.get("c").columns)
    val srcByName = cat.versionFiles("c", 1).map(f => f.getFileName.toString -> f).toMap
    val cloned = cat.versionFiles("c2", 1)
    assert(cloned.size == 4 && cloned.forall(f =>
      srcByName.get(f.getFileName.toString).exists(sameFile(_, f))),
      "every clone file must be a hard link of the source's, zero bytes copied")

    // divergence: a point edit on the clone leaves the source untouched
    val tx = new Tx(cat)
    tx.stageEdit("c2", col("id") === 5, Seq("v" -> "CLONE"))
    tx.commit(Some("c2"))
    assert(cat.read("c2").filter(col("id") === 5).collect()(0).getString(1) == "CLONE")
    assert(cat.read("c").filter(col("id") === 5).collect()(0).getString(1) == "v5")

    // dropping the source cannot break the clone: hard links keep inodes
    cat.drop("c")
    assert(cat.read("c2").count() == 40)

    // a renamed source clones its stored-name mapping (files keep the
    // pinned physical name; the clone reads under the logical name)
    cat.renameColumn("c2", "v", "val")
    cat.cloneContainer("c2", "c3")
    assert(cat.get("c3").columns.map(_._1) == List("id", "val"))
    assert(cat.read("c3").filter(col("id") === 5).collect()(0).getString(1) == "CLONE")

    // guards: unknown source, existing destination
    intercept[IllegalArgumentException](cat.cloneContainer("nope", "c4"))
    intercept[IllegalArgumentException](cat.cloneContainer("c2", "c3"))

    // drop-column tombstones travel with the clone: re-ADDing a dropped
    // column on the clone must get a FRESH stored name (suffix), never
    // bind the linked files' old bytes (the resurrection the tombstone
    // exists to prevent — the dropped column's stored name 'secret' is
    // physically present in every hard-linked file)
    import spark.implicits._
    val cat2 = { val d2 = java.nio.file.Files
      .createTempDirectory("graft-cow-clonets"); new Catalog(spark, d2.toString) }
    cat2.create("t", List("id" -> graft.aql.AlbaType.of("INT"),
      "secret" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat2.overwrite("t", Seq((1, "classified")).toDF("id", "secret"))
    cat2.dropColumns("t", List("secret"))
    cat2.cloneContainer("t", "t2")
    cat2.addColumns("t2", List("secret" -> graft.aql.AlbaType.of("SMALL-STRING")))
    assert(cat2.get("t2").stored.last != "secret",
      "re-added column must take a suffixed stored name on the clone")
    assert(cat2.read("t2").select("secret").collect().forall(_.isNullAt(0)),
      "clone's re-added column must not resurrect dropped bytes")
  }

  test("COW composes with CAS: two committers racing on the same base both land") {
    val (cat, _) = fixture("race")
    val txA = new Tx(cat); txA.stageEdit("c", col("id") === 3, Seq("v" -> "A"))
    val txB = new Tx(cat); txB.stageInsert("c", Seq(Row(200, "B")))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(txA, txB).map(tx => new Thread(() => {
      try { barrier.await(); tx.commit(Some("c")) }
      catch { case t: Throwable => errs.add(t) }
    }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"commit threw: ${errs.toArray.mkString(", ")}")
    assert(cat.currentVersion("c") == 3)
    val got = cat.read("c").collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(got(3) == "A" && got(200) == "B" && got.size == 41,
      "the CAS loser must rebase its file decomposition on the winner's version")
  }
}
