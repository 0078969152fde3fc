package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC change feed ([[Catalog.changes]]): rows inserted/deleted/updated
  * between two committed versions, computed lazily from the copy-on-write
  * file-name delta — no change log is written at commit time, the versions
  * ARE the log, and the feed scans only the files whose names differ
  * (commit-sized, not table-sized).
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(tag: String, nFiles: Int = 4, rowsPerFile: Int = 10) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-cdc-$tag")
    val cat = new Catalog(spark, dir.toString)
    cat.create("c", List("id" -> graft.aql.AlbaType.of("INT"),
      "v" -> graft.aql.AlbaType.of("SMALL-STRING")))
    import spark.implicits._
    val base = (0 until nFiles * rowsPerFile).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(nFiles, col("id"))
      .sortWithinPartitions("id")
    cat.overwrite("c", base) // v1
    cat
  }

  private def feed(cat: Catalog, from: Int, to: Option[Int] = None): Map[(Int, String), String] =
    cat.changes("c", from, to).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)).getOrElse("∅")) -> r.getString(2))
      .toMap

  test("edit + delete + insert in one commit classify as update pair, delete, insert — nothing else") {
    val cat = fixture("mixed")
    val tx = new Tx(cat)
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "EDITED"))
    tx.stageDelete("c", Some(col("id") === 17))
    tx.stageInsert("c", Seq(org.apache.spark.sql.Row(99, "new")))
    tx.commit(Some("c")) // v2
    val f = feed(cat, 1)
    assert(f == Map(
      (5, "v5") -> "update_preimage",
      (5, "EDITED") -> "update_postimage",
      (17, "v17") -> "delete",
      (99, "new") -> "insert"))
  }

  test("rows rewritten byte-equal because a sibling changed are suppressed") {
    val cat = fixture("sibling")
    val tx = new Tx(cat)
    // id=5 lives in file 0 with ids 0..9; the rewrite touches all of them
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "EDITED"))
    tx.commit(Some("c"))
    // only the changed row surfaces — its 9 byte-equal file-mates don't
    assert(cat.changes("c", 1).count() == 2)
  }

  test("insert-only commit (pure append) feeds exactly the inserted rows") {
    val cat = fixture("append")
    val tx = new Tx(cat)
    tx.stageInsert("c", Seq(org.apache.spark.sql.Row(100, "a"),
      org.apache.spark.sql.Row(101, "b")))
    tx.commit(Some("c"))
    assert(feed(cat, 1) == Map((100, "a") -> "insert", (101, "b") -> "insert"))
  }

  test("OPTIMIZE (byte-equal re-clustering) yields an EMPTY feed") {
    val cat = fixture("optimize")
    cat.optimize("c", Some(2)) // v2: all fresh file names, same rows
    assert(cat.changes("c", 1).isEmpty)
  }

  test("fromV=0 reads as an empty snapshot: everything is an insert") {
    val cat = fixture("genesis", nFiles = 2, rowsPerFile = 3)
    val f = feed(cat, 0)
    assert(f.size == 6 && f.values.forall(_ == "insert"))
  }

  test("feed composes across a version RANGE (v1→v3 nets both commits)") {
    val cat = fixture("range")
    val tx = new Tx(cat)
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "E1"))
    tx.commit(Some("c")) // v2
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "E2"))
    tx.stageInsert("c", Seq(org.apache.spark.sql.Row(200, "late")))
    tx.commit(Some("c")) // v3
    // v1→v3 nets the two edits into ONE update pair (E2 vs the original)
    assert(feed(cat, 1, Some(3)) == Map(
      (5, "v5") -> "update_preimage",
      (5, "E2") -> "update_postimage",
      (200, "late") -> "insert"))
    // the adjacent v2→v3 window sees the second edit only
    assert(feed(cat, 2, Some(3)) == Map(
      (5, "E1") -> "update_preimage",
      (5, "E2") -> "update_postimage",
      (200, "late") -> "insert"))
  }

  test("feed scans ONLY the COW file-name delta, never carried files") {
    val cat = fixture("pruned")
    val tx = new Tx(cat)
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "EDITED"))
    tx.commit(Some("c"))
    // the point edit on the clustered layout rewrote exactly one file, so
    // the feed's scan relations list exactly 1 removed + 1 added file —
    // 2 of the 8 files across both versions (carried links excluded)
    val scanned = cat.changes("c", 1).queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }
    assert(scanned.nonEmpty && scanned.forall(_ == 1),
      s"each feed scan should read exactly the 1-file delta, got $scanned")
  }

  test("the feed plan carries exactly two exchanges (row-net groupBy + pk window)") {
    val cat = fixture("plan")
    val tx = new Tx(cat)
    tx.stageEdit("c", col("id") === 5, Seq("v" -> "EDITED"))
    tx.commit(Some("c"))
    // the single-pass classification's whole cost model: one shuffle to
    // net the side-tagged rows, one to pair pre/post images per pk —
    // a ChangeTail consumer pays exactly this per poll, delta-sized
    val p = cat.changes("c", 1).queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges in:\n$p")
  }

  test("invalid version bounds are rejected") {
    val cat = fixture("bounds", nFiles = 1, rowsPerFile = 2)
    intercept[IllegalArgumentException](cat.changes("c", 2, Some(1)))
    intercept[IllegalArgumentException](cat.changes("c", 5)) // v5 never existed
  }

  test("duplicate identical rows keep EXCEPT ALL multiset semantics (copies, not distinct)") {
    val cat = fixture("multiset", nFiles = 1, rowsPerFile = 2)
    val tx = new Tx(cat)
    // two byte-identical staged rows commit together: the feed must carry
    // BOTH copies as inserts (a count, not a set)
    tx.stageInsert("c", Seq(org.apache.spark.sql.Row(77, "dup"),
      org.apache.spark.sql.Row(77, "dup")))
    tx.commit(Some("c"))
    val rows = cat.changes("c", 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows.count(_ == ((77, "dup", "insert"))) == 2, s"got $rows")
  }

  test("unversioned external data (legacy dataPath mount) refuses a feed loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-ext")
    val cat = new Catalog(spark, dir.toString)
    cat.create("ext", List("id" -> graft.aql.AlbaType.of("INT")))
    import spark.implicits._
    Seq(1, 2).toDF("id").write.parquet(cat.dataPath("ext").toString)
    assert(cat.read("ext").count() == 2) // SEARCH sees the external rows…
    val e = intercept[IllegalArgumentException](cat.changes("ext", 0))
    assert(e.getMessage.contains("unversioned external data")) // …CHANGES refuses
  }

  test("(CHANGES …) composes as a SEARCH source: WHERE/projection/aggregation over the feed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-compose")
    val eng = new graft.aql.Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER t ['id','v'] [INT, TEXT]")
    eng.execute("CREATE ROW ['id','v'] [1, 'a'] ON t")
    eng.execute("CREATE ROW ['id','v'] [2, 'b'] ON t")
    eng.execute("COMMIT t") // v1
    eng.execute("EDIT ROW ['v'] ['A'] ON t WHERE id = 1")
    eng.execute("CREATE ROW ['id','v'] [3, 'c'] ON t")
    eng.execute("COMMIT t") // v2
    def rows(aql: String) =
      eng.orderedResult(eng.execute(aql)
        .asInstanceOf[graft.aql.Engine.ResultSet].cursorId).get.collect().toSeq
    // filter on the change-type column, project feed columns
    assert(rows("SEARCH ['id'] ON [(CHANGES t 1 2)] WHERE _change_type = 'insert'")
      .map(_.getInt(0)) == Seq(3))
    // aggregate over the feed: rows per change type
    assert(rows("SEARCH [_change_type, count(id)] ON [(CHANGES t 1 2)]")
      .map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("insert" -> 1L, "update_preimage" -> 1L, "update_postimage" -> 1L))
    // the feed works as a JOIN side: enrich another container's rows with
    // what changed (disjoint column names, as AQL joins require)
    eng.execute("CREATE CONTAINER u ['uid','tag'] [INT, TEXT]")
    eng.execute("CREATE ROW ['uid','tag'] [1, 'watched'] ON u")
    eng.execute("COMMIT u")
    assert(rows("SEARCH [uid, _change_type] ON u JOIN (CHANGES t 1 2) ON uid = id")
      .map(r => (r.getInt(0), r.getString(1))) ==
      Seq((1, "update_postimage"), (1, "update_preimage")))
  }

  test("AQL surface: CHANGES container fromV [toV] pages like a SEARCH") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-aql")
    val eng = new graft.aql.Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER t ['id','v'] [INT, TEXT]")
    eng.execute("CREATE ROW ['id','v'] [1, 'a'] ON t")
    eng.execute("COMMIT t") // v1
    eng.execute("EDIT ROW ['v'] ['b'] ON t WHERE id = 1")
    eng.execute("CREATE ROW ['id','v'] [2, 'c'] ON t")
    eng.execute("COMMIT t") // v2
    val rs = eng.execute("CHANGES t 1").asInstanceOf[graft.aql.Engine.ResultSet]
    // deterministic cursor order: id, v, _change_type ascending
    val rows = eng.orderedResult(rs.cursorId).get.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq((1, "a", "update_preimage"), (1, "b", "update_postimage"),
      (2, "c", "insert")))
    // explicit range + parse validation
    assert(eng.execute("CHANGES t 1 2").isInstanceOf[graft.aql.Engine.ResultSet])
    intercept[graft.aql.ParseException](eng.execute("CHANGES t 2 1"))
  }

  test("the feed composes with schema evolution: windows spanning ADD/RENAME COLUMN") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-alter")
    val eng = new graft.aql.Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER t2 ['id','n'] [BIGINT, BIGINT]")
    eng.execute("CREATE ROW ['id','n'] [1, 10] ON t2")
    eng.execute("CREATE ROW ['id','n'] [2, 20] ON t2")
    eng.execute("COMMIT t2") // v1 — files store (id, n)
    eng.execute("ALTER CONTAINER t2 ADD COLUMN ['tag'] [TEXT]")
    eng.execute("EDIT ROW ['tag'] ['x'] ON t2 WHERE id = 2")
    eng.execute("CREATE ROW ['id','n','tag'] [3, 30, 'y'] ON t2")
    eng.execute("COMMIT t2") // v2 — post-ALTER schema
    eng.execute("ALTER CONTAINER t2 RENAME COLUMN ['n','m']")
    val cat = eng.catalog
    def rows(from: Int, to: Option[Int]) = cat.changes("t2", from, to).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).getOrElse("∅"),
        r.getString(3))).toSet
    // a window ENDING before the ALTERs still serves under the CURRENT
    // schema: renamed column, NULL-filled added column
    assert(cat.changes("t2", 0, Some(1)).columns.toSeq ==
      Seq("id", "m", "tag", "_change_type"))
    assert(rows(0, Some(1)) ==
      Set((1L, 10L, "∅", "insert"), (2L, 20L, "∅", "insert")))
    // the cross-ALTER window pairs the update on the pk with the
    // pre-image NULL-filled and the post-image carrying the new column
    assert(rows(1, Some(2)) == Set(
      (2L, 20L, "∅", "update_preimage"),
      (2L, 20L, "x", "update_postimage"),
      (3L, 30L, "y", "insert")))
    // the everything-as-inserts seed reflects the final evolved state
    assert(rows(0, None) == Set(
      (1L, 10L, "∅", "insert"), (2L, 20L, "x", "insert"),
      (3L, 30L, "y", "insert")))

    // a dependent VIEW gates destructive schema changes on the columns
    // its definition references — DROP/RENAME would wedge every REFRESH
    eng.execute("CREATE VIEW t2_mv (SEARCH [tag, count(id)] ON t2)")
    val e1 = intercept[graft.aql.ParseException](
      eng.execute("ALTER CONTAINER t2 RENAME COLUMN ['tag','label']"))
    assert(e1.getMessage.contains("t2_mv"), e1.getMessage)
    val e2 = intercept[graft.aql.ParseException](
      eng.execute("ALTER CONTAINER t2 DROP COLUMN ['id']"))
    assert(e2.getMessage.contains("t2_mv"), e2.getMessage)
    // unreferenced columns stay alterable; ADD is always allowed
    eng.execute("ALTER CONTAINER t2 RENAME COLUMN ['m','mm']")
    eng.execute("ALTER CONTAINER t2 ADD COLUMN ['extra'] [TEXT]")
    eng.execute("REFRESH VIEW t2_mv") // still folds after the safe ALTERs
  }
}
