package graft.catalog

import graft.TestSpark
import graft.aql.Engine
import org.scalatest.funsuite.AnyFunSuite

/** Versioned copy-on-write commits: every COMMIT is a new immutable
  * version; old versions stay readable (time travel) until vacuumed.
  */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("commits create versions; time travel reads history; vacuum prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tt")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog

    eng.execute("CREATE CONTAINER tt ['id','v'] [INT, SMALL-STRING]")
    eng.execute("CREATE ROW ['id','v'] [1,'one'] ON tt")
    eng.execute("COMMIT tt")                       // v1
    eng.execute("EDIT ROW ['v'] ['uno'] ON tt WHERE id = 1")
    eng.execute("CREATE ROW ['id','v'] [2,'two'] ON tt")
    eng.execute("COMMIT tt")                       // v2

    assert(cat.currentVersion("tt") == 2)
    assert(cat.versions("tt") == Seq(1, 2))

    // current: edited + inserted
    val now = cat.read("tt").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(now == Set((1, "uno"), (2, "two")))

    // time travel to v1: pre-edit state
    val v1 = cat.readVersion("tt", 1).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(v1 == Set((1, "one")))

    // vacuum keeps only the latest
    cat.vacuum("tt", keepLast = 1)
    assert(cat.versions("tt") == Seq(2))
    intercept[IllegalArgumentException](cat.readVersion("tt", 1))
    // current still reads fine
    assert(cat.read("tt").count() == 2)

    // rollback of an uncommitted op never creates a version
    eng.execute("DELETE ROW ON tt WHERE id = 2")
    eng.execute("ROLLBACK tt")
    assert(cat.currentVersion("tt") == 2)

    eng.execute("DELETE CONTAINER tt")
    assert(cat.versions("tt").isEmpty && !cat.exists("tt"))
  }

  test("RESTORE republishes an old version zero-copy and preserves history") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rst")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER r ['id','v'] [INT, SMALL-STRING]")
    eng.execute("CREATE ROW ['id','v'] [1,'one'] ON r")
    eng.execute("COMMIT r")                        // v1
    eng.execute("EDIT ROW ['v'] ['damaged'] ON r WHERE id = 1")
    eng.execute("COMMIT r")                        // v2
    eng.execute("RESTORE CONTAINER r TO VERSION 1") // v3 = v1's content
    assert(cat.currentVersion("r") == 3)
    assert(cat.read("r").collect().map(_.getString(1)).toSeq == Seq("one"))
    // history intact: the damaged version still reads under time travel
    assert(cat.readVersion("r", 2).collect().head.getString(1) == "damaged")
    // zero-copy: v3's files are hard links to v1's (same inode)
    val v1files = cat.versionFiles("r", 1).map(f => f.getFileName.toString -> f).toMap
    assert(cat.versionFiles("r", 3).forall(f =>
      v1files.get(f.getFileName.toString).exists(java.nio.file.Files.isSameFile(_, f))),
      "RESTORE must hard-link the restored version's files, not copy")
    // the restored tip is a normal writable container
    eng.execute("CREATE ROW ['id','v'] [2,'two'] ON r")
    eng.execute("COMMIT r")                        // v4
    assert(cat.read("r").count() == 2)

    // guards: unknown version; staged ops must clear first
    val e1 = intercept[IllegalArgumentException](
      eng.execute("RESTORE CONTAINER r TO VERSION 99"))
    assert(e1.getMessage.contains("does not exist"))
    eng.execute("CREATE ROW ['id','v'] [3,'three'] ON r")
    intercept[graft.aql.ParseException](
      eng.execute("RESTORE CONTAINER r TO VERSION 1"))
    eng.execute("ROLLBACK r")
    // restore also works ONTO a vacuumed-away history tail: only the
    // restored version itself must still exist
    eng.execute("RESTORE CONTAINER r TO VERSION 2")
    assert(cat.read("r").collect().map(_.getString(1)).toSeq == Seq("damaged"))
  }

  test("SEARCH ... AT VERSION n reads the snapshot through AQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tt3")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER av ['id','v'] [INT, SMALL-STRING]")
    eng.execute("CREATE ROW ['id','v'] [1,'one'] ON av")
    eng.execute("COMMIT av")                       // v1
    eng.execute("EDIT ROW ['v'] ['uno'] ON av WHERE id = 1")
    eng.execute("CREATE ROW ['id','v'] [2,'two'] ON av")
    eng.execute("COMMIT av")                       // v2

    def rows(aql: String) =
      eng.execute(aql).asInstanceOf[Engine.ResultSet]
        .df.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows("SEARCH [] ON av AT VERSION 1") == Set((1, "one")))
    assert(rows("SEARCH [] ON av AT VERSION 2") == Set((1, "uno"), (2, "two")))
    assert(rows("SEARCH [] ON av AT VERSION 1 WHERE id = 1") == Set((1, "one")))
    // a historical read ignores the live staged overlay
    eng.execute("CREATE ROW ['id','v'] [3,'three'] ON av")
    assert(rows("SEARCH [] ON av AT VERSION 2") == Set((1, "uno"), (2, "two")))
    eng.execute("ROLLBACK av")
    // an outer AT VERSION reaches subquery virtual containers too
    assert(rows("SEARCH [] ON [(SEARCH [] ON av)] AT VERSION 1") == Set((1, "one")))
    // missing version + malformed syntax are errors
    intercept[IllegalArgumentException](eng.execute("SEARCH [] ON av AT VERSION 9"))
    intercept[graft.aql.ParseException](eng.execute("SEARCH [] ON av AT 1"))
    eng.execute("DELETE CONTAINER av")
  }

  test("RESTORE composes with ALTER: pre-ALTER content reads under the current schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tt-ra")
    val eng = new Engine(spark, dir.toString)
    def rows(aql: String): Set[Seq[Any]] =
      eng.orderedResult(eng.execute(aql).asInstanceOf[Engine.ResultSet].cursorId)
        .get.collect().map(_.toSeq.toVector: Seq[Any]).toSet
    eng.execute("CREATE CONTAINER ra ['id','n'] [BIGINT, BIGINT]")
    eng.execute("CREATE ROW ['id','n'] [1, 10] ON ra")
    eng.execute("COMMIT ra") // v1 — pre-ALTER files store (id, n)
    eng.execute("ALTER CONTAINER ra ADD COLUMN ['tag'] [TEXT]")
    eng.execute("CREATE ROW ['id','n','tag'] [2, 20, 'doomed'] ON ra")
    eng.execute("COMMIT ra") // v2
    eng.execute("ALTER CONTAINER ra RENAME COLUMN ['n','m']")
    eng.execute("RESTORE CONTAINER ra TO VERSION 1") // v3 = v1 hard-links
    // the restored tip serves v1's files through NULL-fill (tag) and the
    // stored→logical rename (n → m); the v2 row is gone
    assert(rows("SEARCH [] ON ra") == Set(Seq(1L, 10L, null)))
    // writable under the evolved schema
    eng.execute("CREATE ROW ['id','m','tag'] [3, 30, 'kept'] ON ra")
    eng.execute("COMMIT ra") // v4
    assert(rows("SEARCH [] ON ra") ==
      Set(Seq(1L, 10L, null), Seq(3L, 30L, "kept")))
    // history preserved: AT VERSION 2 still reads the pre-restore row,
    // rename mapping applied to the historical files too
    assert(rows("SEARCH [] ON ra AT VERSION 2") ==
      Set(Seq(1L, 10L, null), Seq(2L, 20L, "doomed")))
  }

  test("vacuum_after_commits: auto-retention prunes versions, but never a view's resume point") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avac")
    java.nio.file.Files.writeString(dir.resolve(graft.catalog.Settings.FileName),
      "vacuum_after_commits: 2\nvacuum_keep_last: 1\n")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER av2 ['id','grp'] [BIGINT, TEXT]")
    def commitRow(id: Int): Unit = {
      eng.execute(s"CREATE ROW ['id','grp'] [$id, 'g'] ON av2")
      eng.execute("COMMIT av2")
    }
    commitRow(1) // v1 (odd: no vacuum)
    commitRow(2) // v2 → auto-vacuum keeps last 1
    assert(eng.catalog.versions("av2") == Seq(2),
      "the 2nd commit must auto-vacuum down to keep_last")
    assert(eng.catalog.read("av2").count() == 2, "content is complete")
    // a dependent view's CDC resume point RAISES the retention floor:
    // vacuum still runs, but keeps back to the checkpoint version
    eng.execute("CREATE VIEW av2_mv (SEARCH [grp, count(id)] ON av2)")
    commitRow(3) // v3 (odd)
    commitRow(4) // v4: vacuum due; the view checkpoint sits at v2, so
                 // the floor keeps v2..v4 instead of dropping to v4
    assert(eng.catalog.versions("av2").contains(2),
      s"auto-vacuum must retain the view's resume point, have ${eng.catalog.versions("av2")}")
    // with keep_last 1 the checkpoint must EQUAL the triggering commit,
    // which only commit-time view refresh can deliver (the post-commit
    // hooks run refresh BEFORE retention by design) — compose the knobs
    // in a fresh session over the same database
    java.nio.file.Files.writeString(dir.resolve(graft.catalog.Settings.FileName),
      "vacuum_after_commits: 2\nvacuum_keep_last: 1\n" +
        "refresh_views_after_commit: true\n")
    val eng2 = new Engine(spark, dir.toString)
    eng2.execute("CREATE ROW ['id','grp'] [5, 'g'] ON av2")
    eng2.execute("COMMIT av2") // v5 (odd: no vacuum; refresh folds it)
    eng2.execute("CREATE ROW ['id','grp'] [6, 'g'] ON av2")
    eng2.execute("COMMIT av2") // v6: refresh first → ckpt=6 → vacuum safe
    assert(eng2.catalog.versions("av2") == Seq(6),
      s"caught-up views unblock retention, have ${eng2.catalog.versions("av2")}")
    assert(eng2.catalog.read("av2").count() == 6, "content is complete after retention")
  }

  test("a cursor over a vacuumed version expires cleanly, not with a raw FNF") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tt2")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER c2 ['n'] [INT]")
    (1 to 150).foreach(i => eng.execute(s"CREATE ROW ['n'] [$i] ON c2"))
    eng.execute("COMMIT c2") // v1
    val rs = eng.execute("SEARCH [] ON c2").asInstanceOf[Engine.ResultSet]
    // new commit + vacuum removes v1, which the open cursor's plan references
    eng.execute("CREATE ROW ['n'] [999] ON c2")
    eng.execute("COMMIT c2") // v2
    eng.catalog.vacuum("c2", keepLast = 1)
    val e = intercept[graft.aql.ParseException](
      eng.execute(s"QYCNNXT ${rs.cursorId}"))
    assert(e.getMessage.contains("expired"))
    // fresh search over v2 works
    assert(eng.execute("SEARCH [] ON c2").asInstanceOf[Engine.ResultSet].df.count() == 151)
  }
}
