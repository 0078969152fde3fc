package graft.catalog

import graft.TestSpark
import graft.aql.Engine
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE CONTAINER / SHOW STATS: per-column statistics computed in one
  * aggregation pass, persisted in the catalog pinned to the analyzed
  * version, invalidated by schema ALTERs, removed with the container.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-stats-$tag")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER s ['id','txt','n'] [INT, TEXT, BIGINT]")
    eng.execute("CREATE ROW ['id','txt','n'] [1, 'alpha', 10] ON s")
    eng.execute("CREATE ROW ['id','txt','n'] [2, 'beta', 10] ON s")
    eng.execute("CREATE ROW ['id','txt'] [3, 'alpha'] ON s") // n NULL
    eng.execute("COMMIT s") // v1
    (eng, dir)
  }

  private def statRows(eng: Engine, aql: String) =
    eng.orderedResult(eng.execute(aql)
      .asInstanceOf[Engine.ResultSet].cursorId).get.collect()

  test("ANALYZE computes per-column stats; SHOW STATS serves the persisted copy") {
    val (eng, dir) = fixture("basic")
    val rows = statRows(eng, "ANALYZE CONTAINER s")
    assert(rows.length == 3)
    val byName = rows.map(r => r.getString(1) -> r).toMap
    val id = byName("id")
    assert(id.getInt(0) == 1 && id.getString(2) == "INT" && id.getInt(3) == 1)
    assert(id.getLong(4) == 3 && id.getLong(5) == 0 && id.getLong(6) == 3)
    assert(id.getString(7) == "1" && id.getString(8) == "3" && id.isNullAt(9))
    val txt = byName("txt")
    assert(txt.getLong(6) == 2, "distinct over ['alpha','beta','alpha']")
    assert(txt.getString(7) == "alpha" && txt.getString(8) == "beta")
    assert(math.abs(txt.getDouble(9) - (5 + 4 + 5) / 3.0) < 1e-9)
    val n = byName("n")
    assert(n.getLong(5) == 1 && n.getLong(6) == 1, "one NULL, one distinct value")
    assert(n.getString(7) == "10" && n.getString(8) == "10" && n.isNullAt(9))
    // SHOW STATS round-trips the persisted file — including through a
    // fresh session (restart)
    assert(statRows(eng, "SHOW STATS s").map(_.toSeq).toSeq ==
      rows.map(_.toSeq).toSeq)
    val eng2 = new Engine(spark, dir.toString)
    assert(statRows(eng2, "SHOW STATS s").map(_.toSeq).toSeq ==
      rows.map(_.toSeq).toSeq)
  }

  test("stats are pinned to the analyzed version; staleness is visible, re-ANALYZE refreshes") {
    val (eng, _) = fixture("stale")
    statRows(eng, "ANALYZE CONTAINER s")
    eng.execute("CREATE ROW ['id','txt','n'] [4, 'gamma', 7] ON s")
    eng.execute("COMMIT s") // v2
    // persisted stats still describe v1
    val shown = statRows(eng, "SHOW STATS s")
    assert(shown.forall(r => r.getInt(3) == 1 && r.getLong(4) == 3))
    val fresh = statRows(eng, "ANALYZE CONTAINER s")
    assert(fresh.forall(r => r.getInt(3) == 2 && r.getLong(4) == 4))
  }

  test("stats drive the value-index access path: an unselective estimate skips the probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-ap")
    java.nio.file.Files.writeString(
      dir.resolve(graft.catalog.Settings.FileName), "index_probe_cap: 4\n")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER ap ['id','tag'] [BIGINT, TEXT]")
    import spark.implicits._
    // v1: 2 distinct tags over 30 rows (avg group 15 > cap 4) — ANALYZE
    // pins the unselective estimate
    cat.overwrite("ap", (0L until 30L).map(i => (i, s"t${i % 2}")).toDF("id", "tag"))
    eng.execute("CREATE INDEX vt ON ap ['tag'] USING value")
    statRows(eng, "ANALYZE CONTAINER ap")
    // v2: tags become UNIQUE — a probe would now prune (group size 1),
    // but the engine must trust the stats and skip the index entirely
    cat.overwrite("ap", (0L until 30L).map(i => (i, s"u$i")).toDF("id", "tag"))
    def plan(): String = eng.execute("EXPLAIN SEARCH [id] ON ap WHERE tag = 'u7'")
      .asInstanceOf[Engine.Done].message
    // a 1-candidate prune lowers isin to EqualTo, so match either shape
    def pruned(p: String): Boolean =
      p.contains("id IN ") || p.contains("In(id") || p.contains("EqualTo(id,")
    assert(!pruned(plan()),
      s"stale-unselective stats must skip the probe:\n${plan()}")
    assert(plan().contains("== Access Path ==") && plan().contains("skipped"),
      s"the skip decision must be narrated in EXPLAIN:\n${plan()}")
    // correctness unaffected by the skip
    assert(eng.orderedResult(eng.execute("SEARCH [id] ON ap WHERE tag = 'u7'")
      .asInstanceOf[Engine.ResultSet].cursorId).get
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // re-ANALYZE: the estimate turns selective and the index serves again
    statRows(eng, "ANALYZE CONTAINER ap")
    assert(pruned(plan()),
      s"selective stats must restore the index path:\n${plan()}")
  }

  test("stats_distinct: approx swaps in HyperLogLog distinct counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-ax")
    java.nio.file.Files.writeString(
      dir.resolve(graft.catalog.Settings.FileName), "stats_distinct: approx\n")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER x ['id','tag'] [BIGINT, TEXT]")
    import spark.implicits._
    eng.catalog.overwrite("x",
      (0L until 500L).map(i => (i, s"t${i % 37}")).toDF("id", "tag"))
    val rows = statRows(eng, "ANALYZE CONTAINER x")
      .map(r => r.getString(1) -> r.getLong(6)).toMap
    // HLL++ default rsd 5%: the estimates land near the true 500 / 37
    assert(math.abs(rows("id") - 500) <= 50, s"approx ndv(id)=${rows("id")}")
    assert(math.abs(rows("tag") - 37) <= 8, s"approx ndv(tag)=${rows("tag")}")
    // exact counts everywhere else are untouched
    val full = statRows(eng, "SHOW STATS x")
    assert(full.forall(r => r.getLong(4) == 500 && r.getLong(5) == 0))
  }

  test("stats pin the AQL join side: referenced-column pricing beats the file-size estimate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-join")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    import spark.implicits._
    eng.execute("CREATE CONTAINER fact ['id','v'] [BIGINT, BIGINT]")
    cat.overwrite("fact", (0L until 5000L).map(i => (i, i % 7)).toDF("id", "v"))

    // dim: 60 rows whose FAT payload column inflates the on-disk size far
    // past the 10MB broadcast threshold (incompressible random text), but
    // whose joined columns price to ~nothing — the case a file-size
    // estimate gets wrong and referenced-column stats get right
    eng.execute("CREATE CONTAINER dim ['dkey','dname','payload'] [BIGINT, TEXT, TEXT]")
    // incompressible payload: Catalyst prices every string column at a
    // default ~20 bytes when scaling the scan estimate by projected
    // width, so the fixture must be big enough that even the
    // pruned-width-scaled file size stays over the threshold
    val rnd = new java.util.Random(7)
    def blob(): String = {
      val b = new Array[Byte](340000); rnd.nextBytes(b)
      java.util.Base64.getEncoder.encodeToString(b)
    }
    val fat = (0L until 60L).map(k => (k, s"n$k", blob())).toDF("dkey", "dname", "payload")
    cat.overwrite("dim", fat)
    // committed versions live at data/dim@vN
    val dimBytes = java.nio.file.Files.walk(dir.resolve("data"))
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.contains("dim@v"))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    assert(dimBytes > (10L << 20),
      s"fixture must exceed the broadcast threshold on disk, got $dimBytes")

    def plan(): String = eng.execute(
      "EXPLAIN SEARCH [id, dname] ON fact JOIN dim ON id = dkey")
      .asInstanceOf[Engine.Done].message
    // without stats the planner can only broadcast the narrow FACT side
    // (the dim relation prices >10MB even after projected-width scaling)
    assert(!plan().contains("BuildRight"),
      s"without stats the inflated dim must not be the build side:\n${plan()}")
    statRows(eng, "ANALYZE CONTAINER dim")
    // with stats: 60 rows × (dkey + dname) prices to ~2KB → the DIM
    // becomes the pinned broadcast side, the fact streams
    assert(plan().contains("BroadcastHashJoin") && plan().contains("BuildRight"),
      s"stats must pin the broadcast of the referenced dim columns:\n${plan()}")
    // correctness unaffected by the pin
    assert(eng.orderedResult(eng.execute(
      "SEARCH [id, dname] ON fact JOIN dim ON id = dkey WHERE id < 3")
      .asInstanceOf[Engine.ResultSet].cursorId).get.collect().length == 3)

    // the reverse guard — the executor-OOM direction a file-size model
    // gets WRONG: a small-on-disk container (constant text, RLE
    // compresses to ~nothing) whose stats price it far over the
    // threshold. Without stats the planner happily broadcasts it; with
    // stats the join is pinned to a sort-merge.
    eng.execute("CREATE CONTAINER big ['bkey','btxt'] [BIGINT, TEXT]")
    cat.overwrite("big", (0L until 300000L).map(i => (i, "a" * 200)).toDF("bkey", "btxt"))
    def p2(): String = eng.execute(
      "EXPLAIN SEARCH [id, btxt] ON fact JOIN big ON id = bkey")
      .asInstanceOf[Engine.Done].message
    assert(p2().contains("BroadcastHashJoin"),
      s"fixture sanity: without stats the size estimate broadcasts:\n${p2()}")
    statRows(eng, "ANALYZE CONTAINER big")
    assert(!p2().contains("BroadcastHashJoin") && p2().contains("SortMergeJoin"),
      s"row-priced-huge side must never broadcast:\n${p2()}")
    // the mirrored guard: the huge container as the LEFT/stream side —
    // without the pin the planner would BuildLeft-broadcast it off the
    // tiny on-disk estimate
    val p3 = eng.execute(
      "EXPLAIN SEARCH [bkey, btxt, v] ON big JOIN fact ON bkey = id")
      .asInstanceOf[Engine.Done].message
    assert(!p3.contains("BroadcastHashJoin") && p3.contains("SortMergeJoin"),
      s"row-priced-huge LEFT side must never broadcast either:\n$p3")
    // the guard survives a JOIN CHAIN: the intermediate containing the
    // huge side must not be BuildLeft-broadcast at join 2 off the tiny
    // on-disk estimate (fact2 is stats-less, so nothing else pins it)
    eng.execute("CREATE CONTAINER fact2 ['id2','w'] [BIGINT, BIGINT]")
    cat.overwrite("fact2", (0L until 5000L).map(i => (i, i % 3)).toDF("id2", "w"))
    val p4 = eng.execute(
      "EXPLAIN SEARCH [bkey, btxt, v, w] ON big JOIN fact ON bkey = id " +
        "JOIN fact2 ON bkey = id2")
      .asInstanceOf[Engine.Done].message
    assert(!p4.contains("BroadcastHashJoin"),
      s"a chain intermediate containing the huge side must not broadcast:\n$p4")

    // STALE stats must not force a broadcast: a container analyzed when
    // small and grown since would otherwise be pinned into an OOM on the
    // old n_rows — the pin requires analyzed_version == currentVersion
    cat.overwrite("dim",
      fat.unionByName((60L until 120L).map(k =>
        (k, s"n$k", "x")).toDF("dkey", "dname", "payload")))
    assert(!plan().contains("BuildRight"),
      s"post-ANALYZE growth must disarm the broadcast pin:\n${plan()}")
    statRows(eng, "ANALYZE CONTAINER dim")
    assert(plan().contains("BuildRight"),
      s"re-ANALYZE must re-arm the pin:\n${plan()}")

    // correctness-neutrality of every pinned shape: whatever strategy
    // the pins force, the rows equal a plain Spark join of the same reads
    import org.apache.spark.sql.functions.col
    def engineRows(aql: String): Set[Seq[Any]] =
      eng.orderedResult(eng.execute(aql).asInstanceOf[Engine.ResultSet].cursorId)
        .get.collect().map(_.toSeq.toVector: Seq[Any]).toSet
    def refRows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq.toVector: Seq[Any]).toSet
    // pinned broadcast dim (fresh small stats)
    assert(engineRows("SEARCH [id, dname] ON fact JOIN dim ON id = dkey WHERE id < 50") ==
      refRows(cat.read("fact").filter(col("id") < 50)
        .join(cat.read("dim"), col("id") === col("dkey"))
        .select(col("id"), col("dname"))))
    // pinned merge right (row-priced-huge build side)
    assert(engineRows("SEARCH [id, btxt] ON fact JOIN big ON id = bkey WHERE id < 40") ==
      refRows(cat.read("fact").filter(col("id") < 40)
        .join(cat.read("big"), col("id") === col("bkey"))
        .select(col("id"), col("btxt"))))
    // pinned merge on the stream side through a chain
    assert(engineRows("SEARCH [bkey, v, w] ON big JOIN fact ON bkey = id " +
        "JOIN fact2 ON bkey = id2 WHERE bkey < 30") ==
      refRows(cat.read("big").filter(col("bkey") < 30)
        .join(cat.read("fact"), col("bkey") === col("id"))
        .join(cat.read("fact2"), col("bkey") === col("id2"))
        .select(col("bkey"), col("v"), col("w"))))
  }

  test("BYTES columns price from measured byte widths: embeddings join both pin directions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-bytes")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    import spark.implicits._
    eng.execute("CREATE CONTAINER fact ['id','v'] [BIGINT, BIGINT]")
    cat.overwrite("fact", (0L until 5000L).map(i => (i, i % 7)).toDF("id", "v"))
    // the REAL embeddings fixture, packed float32 → BYTES (the engine's
    // vector storage type): 64 dims × 4 bytes = exactly 256 per row
    eng.execute("CREATE CONTAINER eb ['vec_id','emb'] [BIGINT, LARGE-BYTES]")
    val packed = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), graft.functions.Float32Unpack.pack(
        r.getSeq[Float](1))))
    cat.overwrite("eb", packed.toSeq.toDF("vec_id", "emb"))
    statRows(eng, "ANALYZE CONTAINER eb")
    // measured byte length, not a guessed floor
    val embStat = statRows(eng, "SHOW STATS eb")
      .find(_.getString(1) == "emb").get
    assert(embStat.getString(2) == "LARGE-BYTES" && embStat.getDouble(9) == 256.0,
      s"avg_len must be the exact packed width, got ${embStat.getDouble(9)}")
    assert(Stats.estimatedBytes(cat, "eb", Seq("vec_id", "emb"))
      .contains((500L * (8 + 256 + 16)).toLong))
    // referencing the BYTES column in the join prices it INTO the model:
    // 500 rows × ~280B ≈ 140KB → pinned broadcast, narrated
    val p = eng.execute("EXPLAIN SEARCH [id, emb] ON fact JOIN eb ON id = vec_id")
      .asInstanceOf[Engine.Done].message
    assert(p.contains("join side pinned: eb") && p.contains("BuildRight"),
      s"priced embeddings dim must pin broadcast:\n$p")
    // the OOM direction: constant bytes RLE-compress to ~nothing on disk
    // but price 30k × ~1400B ≈ 42MB > 4× threshold → pinned merge
    eng.execute("CREATE CONTAINER ebig ['bkey','blob'] [BIGINT, LARGE-BYTES]")
    cat.overwrite("ebig", spark.range(30000)
      .selectExpr("id AS bkey", "cast(repeat('x', 1400) as binary) AS blob"))
    statRows(eng, "ANALYZE CONTAINER ebig")
    val p2 = eng.execute("EXPLAIN SEARCH [id, blob] ON fact JOIN ebig ON id = bkey")
      .asInstanceOf[Engine.Done].message
    assert(p2.contains("never broadcast") && !p2.contains("BroadcastHashJoin"),
      s"row-priced-fat BYTES side must pin merge:\n$p2")
    // an all-NULL BYTES column is UNPRICEABLE → no pin either way
    eng.execute("CREATE CONTAINER enull ['nk','nblob'] [BIGINT, SMALL-BYTES]")
    cat.overwrite("enull", spark.range(40)
      .selectExpr("id AS nk", "cast(null as binary) AS nblob"))
    statRows(eng, "ANALYZE CONTAINER enull")
    assert(Stats.estimatedBytes(cat, "enull", Seq("nk", "nblob")).isEmpty)
    val p3 = eng.execute("EXPLAIN SEARCH [id, nblob] ON fact JOIN enull ON id = nk")
      .asInstanceOf[Engine.Done].message
    assert(!p3.contains("join side pinned"),
      s"unpriceable BYTES must defer to the planner:\n$p3")
    // correctness-neutrality of the pinned shapes over binary payloads
    import org.apache.spark.sql.functions.col
    val engRows = eng.orderedResult(eng.execute(
      "SEARCH [id, emb] ON fact JOIN eb ON id = vec_id WHERE id < 100")
      .asInstanceOf[Engine.ResultSet].cursorId).get.collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Array[Byte]].toSeq)).toSet
    val ref = cat.read("fact").filter(col("id") < 100)
      .join(cat.read("eb"), col("id") === col("vec_id"))
      .select(col("id"), col("emb")).collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Array[Byte]].toSeq)).toSet
    assert(engRows == ref && engRows.size == 100)
  }

  test("analyze_after_commits: stats auto-refresh every Nth commit and re-arm the access path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-auto")
    java.nio.file.Files.writeString(dir.resolve(graft.catalog.Settings.FileName),
      "analyze_after_commits: 2\nindex_probe_cap: 4\n")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER au ['id','tag'] [BIGINT, TEXT]")
    eng.execute("CREATE INDEX vt ON au ['tag'] USING value")
    import spark.implicits._
    // v1 (not a multiple of 2): no auto-stats yet
    cat.overwrite("au", (0L until 30L).map(i => (i, s"t${i % 2}")).toDF("id", "tag"))
    eng.execute("CREATE ROW ['id','tag'] [100, 't0'] ON au")
    intercept[graft.aql.ParseException](eng.execute("SHOW STATS au"))
    // v2 via the Tx commit path: the hook fires and pins v2 — with 2
    // distinct tags over 31 rows the estimate is UNSELECTIVE (group 15 >
    // cap 4), so the planner skips the index probe
    eng.execute("COMMIT au")
    def shown() = statRows(eng, "SHOW STATS au")
    assert(shown().forall(_.getInt(3) == 2),
      "the 2nd commit must auto-ANALYZE and pin version 2")
    def plan(): String = eng.execute("EXPLAIN SEARCH [id] ON au WHERE tag = 'u7'")
      .asInstanceOf[Engine.Done].message
    def pruned(p: String): Boolean =
      p.contains("id IN ") || p.contains("In(id") || p.contains("EqualTo(id,")
    assert(!pruned(plan()), s"unselective auto-stats must skip the probe:\n${plan()}")
    // v3 rewrites tags to UNIQUE (no auto-stats — odd version), v4 is the
    // next multiple: the auto pass must pick up the ndv collapse and flip
    // the decision back to the index probe WITHOUT any explicit ANALYZE
    cat.overwrite("au", (0L until 30L).map(i => (i, s"u$i")).toDF("id", "tag")) // v3
    assert(shown().forall(_.getInt(3) == 2), "v3 must not auto-analyze")
    eng.execute("CREATE ROW ['id','tag'] [200, 'u200'] ON au")
    eng.execute("COMMIT au") // v4
    assert(shown().forall(r => r.getInt(3) == 4 && r.getLong(4) == 31))
    assert(pruned(plan()),
      s"selective auto-stats must re-arm the index path:\n${plan()}")
  }

  test("vacuum GCs crashed metadata staging files; live writers' are spared") {
    val (eng, dir) = fixture("tmpgc")
    val cat = eng.catalog
    val catDir = dir.resolve("catalog")
    val deadPid = 999999999L
    val livePid = ProcessHandle.current.pid
    java.nio.file.Files.writeString(
      catDir.resolve(s"s.stats.tmp-$deadPid-1"), "junk")
    java.nio.file.Files.writeString(
      catDir.resolve(s"s.cluster.tmp-$deadPid-2"), "junk")
    java.nio.file.Files.writeString(
      catDir.resolve(s"s.stats.tmp-$livePid-3"), "mine")
    cat.vacuum("s")
    assert(!java.nio.file.Files.exists(catDir.resolve(s"s.stats.tmp-$deadPid-1")),
      "dead ANALYZE staging must GC")
    assert(!java.nio.file.Files.exists(catDir.resolve(s"s.cluster.tmp-$deadPid-2")),
      "dead clustering-policy staging must GC")
    assert(java.nio.file.Files.exists(catDir.resolve(s"s.stats.tmp-$livePid-3")),
      "a live writer's staging file is never touched")
  }

  test("SHOW STATS before ANALYZE errors; ALTER invalidates; DROP cleans up") {
    val (eng, dir) = fixture("lifecycle")
    val e = intercept[graft.aql.ParseException](eng.execute("SHOW STATS s"))
    assert(e.getMessage.contains("ANALYZE"))
    statRows(eng, "ANALYZE CONTAINER s")
    // a schema ALTER invalidates (stats describe the old column set)
    eng.execute("ALTER CONTAINER s RENAME COLUMN ['txt','body']")
    intercept[graft.aql.ParseException](eng.execute("SHOW STATS s"))
    val renamed = statRows(eng, "ANALYZE CONTAINER s")
    assert(renamed.map(_.getString(1)).toSeq == Seq("id", "body", "n"))
    eng.execute("DELETE CONTAINER s")
    assert(!java.nio.file.Files.exists(
      dir.resolve("catalog").resolve("s.stats")))
  }
}
