package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end AQL: DDL → DML → transactional search → cursor paging,
  * exercising the parity cases from FIXTURES.md.
  */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private var dir: java.nio.file.Path = _
  private var eng: Engine = _

  override def beforeAll(): Unit = {
    dir = java.nio.file.Files.createTempDirectory("graft-engine-spec")
    eng = new Engine(spark, dir.toString)
  }

  private def searchRows(aql: String, args: Seq[String] = Nil): Seq[org.apache.spark.sql.Row] =
    eng.execute(aql, args).asInstanceOf[Engine.ResultSet].df.collect().toSeq

  test("01 create container / list / duplicate rejected") {
    eng.execute("CREATE CONTAINER people ['id','name','age','score','ok'] " +
      "[BIGINT, SMALL-STRING, INT, FLOAT, BOOL]")
    assert(eng.catalog.list() == Seq("people"))
    intercept[IllegalArgumentException](
      eng.execute("CREATE CONTAINER people ['a'] [INT]"))
  }

  test("02 staged rows visible before commit (MVCC view)") {
    eng.execute("CREATE ROW ['id','name','age','score','ok'] [1,'ana',30,9.5,true] ON people")
    eng.execute("CREATE ROW ['id','name','age','score','ok'] [2,'bo',40,3.25,false] ON people")
    // read-your-writes without commit (reference MVCC overlay)
    assert(searchRows("SEARCH [] ON people").length == 2)
    // committed base is still empty
    assert(eng.catalog.read("people").count() == 0)
  }

  test("03 rollback discards staging; commit persists") {
    eng.execute("ROLLBACK people")
    assert(searchRows("SEARCH [] ON people").isEmpty)
    eng.execute("CREATE ROW ['id','name','age','score','ok'] [1,'ana',30,9.5,true] ON people")
    eng.execute("CREATE ROW ['id','name','age','score','ok'] [2,'bo',40,3.25,false] ON people")
    eng.execute("CREATE ROW ['id','name','age','score','ok'] [3,'cy',25,7.0,true] ON people")
    eng.execute("COMMIT people")
    assert(eng.catalog.read("people").count() == 3)
  }

  test("04 projection is real (quirk Q3 fixed)") {
    val df = eng.execute("SEARCH ['id','name'] ON people")
      .asInstanceOf[Engine.ResultSet].df
    assert(df.columns.toSeq == Seq("id", "name"))
  }

  test("05 all ten operators with standard operand order (Q1 fixed)") {
    assert(searchRows("SEARCH ['id'] ON people WHERE age > 28").map(_.getLong(0)).sorted == Seq(1L, 2L))
    assert(searchRows("SEARCH ['id'] ON people WHERE age >= 30").length == 2)
    assert(searchRows("SEARCH ['id'] ON people WHERE age < 30").map(_.getLong(0)) == Seq(3L))
    assert(searchRows("SEARCH ['id'] ON people WHERE age <= 25").length == 1)
    assert(searchRows("SEARCH ['id'] ON people WHERE name = 'ana'").length == 1)
    assert(searchRows("SEARCH ['id'] ON people WHERE name == 'ana'").length == 1)
    assert(searchRows("SEARCH ['id'] ON people WHERE name != 'ana'").length == 2)
    assert(searchRows("SEARCH ['id'] ON people WHERE name &> 'n'").map(_.getLong(0)) == Seq(1L))
    assert(searchRows("SEARCH ['id'] ON people WHERE name &&> 'AN'").map(_.getLong(0)) == Seq(1L))
    assert(searchRows("SEARCH ['id'] ON people WHERE name &&&> '^[ab]'").length == 2)
  }

  test("06 AND binds tighter than OR (SQL precedence, Q2 standardized)") {
    // ok=true OR age=40 AND score<4  ⇒  ok OR (age=40 AND score<4) = {1,2,3}
    // last-atom-wins (reference) would give a different set
    val ids = searchRows(
      "SEARCH ['id'] ON people WHERE ok = true OR age = 40 AND score < 4")
      .map(_.getLong(0)).sorted
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("07 literal coercion in predicates (P5)") {
    assert(searchRows("SEARCH ['id'] ON people WHERE age > '28'").length == 2)
    assert(searchRows("SEARCH ['id'] ON people WHERE ok = 1").length == 2)
  }

  test("08 EDIT overlays values by name (quirk Q6 fixed), then commit") {
    eng.execute("EDIT ROW ['score'] [0.5] ON people WHERE age >= 30")
    val staged = searchRows("SEARCH ['id','score'] ON people WHERE score = 0.5")
    assert(staged.map(_.getLong(0)).sorted == Seq(1L, 2L))
    eng.execute("ROLLBACK people") // discard: base untouched
    assert(searchRows("SEARCH ['id'] ON people WHERE score = 0.5").isEmpty)
  }

  test("09 DELETE ROW stages tombstones; commit rewrites") {
    eng.execute("DELETE ROW ON people WHERE name &> 'b'")
    assert(searchRows("SEARCH [] ON people").length == 2)
    eng.execute("COMMIT people")
    assert(eng.catalog.read("people").count() == 2)
    // restore
    eng.execute("CREATE ROW ['id','name','age','score','ok'] [2,'bo',40,3.25,false] ON people")
    eng.execute("COMMIT people")
  }

  test("10 capped strings truncate on ingest (alba_types.rs:317-323)") {
    eng.execute("CREATE CONTAINER caps ['k','s'] [INT, NANO-STRING]")
    eng.execute("CREATE ROW ['k','s'] [1,'abcdefghijKLMNOP'] ON caps")
    val rows = searchRows("SEARCH ['s'] ON caps")
    assert(rows.head.getString(0) == "abcdefghij") // NANO cap = 10
  }

  test("11 byte literals and BYTES columns") {
    eng.execute("CREATE CONTAINER blobs ['k','b'] [INT, NANO-BYTES]")
    eng.execute("CREATE ROW ['k','b'] [1, §aGVsbG8=] ON blobs")
    val rows = searchRows("SEARCH ['b'] ON blobs")
    assert(new String(rows.head.getAs[Array[Byte]](0), "UTF-8") == "hello")
  }

  test("12 prepared-statement arguments") {
    eng.execute("CREATE ROW ['k','s'] [?, ?] ON caps", args = Seq("2", "'via-arg'"))
    assert(searchRows("SEARCH ['s'] ON caps WHERE k = ?", Seq("2"))
      .head.getString(0) == "via-arg")
  }

  test("13 multi-container union + subquery virtual container (L4)") {
    eng.execute("CREATE CONTAINER caps2 ['k','s'] [INT, NANO-STRING]")
    eng.execute("CREATE ROW ['k','s'] [100,'other'] ON caps2")
    eng.execute("COMMIT")
    val rows = searchRows("SEARCH ['k'] ON [caps, (SEARCH ['k'] ON caps2)]")
    assert(rows.map(_.getInt(0)).sorted == Seq(1, 2, 100))
  }

  test("14 union type mismatch is an error (quirk Q8 standardized)") {
    intercept[ParseException](
      eng.execute("SEARCH [] ON [people, caps]"))
  }

  test("15 cursor paging: 100-row pages, next/previous/exit (query.rs:9)") {
    eng.execute("CREATE CONTAINER seq ['n'] [INT]")
    (1 to 250).foreach(i => eng.execute(s"CREATE ROW ['n'] [$i] ON seq"))
    eng.execute("COMMIT seq")
    val rs = eng.execute("SEARCH [] ON seq").asInstanceOf[Engine.ResultSet]
    val p1 = eng.execute(s"QYCNNXT ${rs.cursorId}").asInstanceOf[Engine.Page]
    assert(p1.rows.length == 100 && p1.rows.head.getInt(0) == 101)
    // the first fetch materialized the sorted result: later pages slice the
    // cached partitions instead of re-running the scan+sort (query.rs:110-164)
    val cur = eng.cursorState(rs.cursorId).get
    assert(cur.paged.storageLevel.useMemory, "cursor result not persisted after first page")
    val pagePlan = cur.materialized.offset(100).limit(100)
      .queryExecution.executedPlan.toString()
    assert(pagePlan.contains("InMemoryTableScan") || pagePlan.contains("TableCacheQueryStage"),
      s"page slice does not read the cached result:\n$pagePlan")
    val p2 = eng.execute(s"QYCNNXT ${rs.cursorId}").asInstanceOf[Engine.Page]
    assert(p2.rows.length == 50 && p2.rows.head.getInt(0) == 201)
    val p0 = eng.execute(s"QYCNPVS ${rs.cursorId}").asInstanceOf[Engine.Page]
    assert(p0.rows.length == 100 && p0.rows.head.getInt(0) == 101)
    eng.execute(s"QYCNEXT ${rs.cursorId}")
    assert(cur.paged.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "cursor close must release the cached result")
    intercept[ParseException](eng.execute(s"QYCNNXT ${rs.cursorId}"))
  }

  test("15y cursor cache guardrail: results over the memory budget page without persisting") {
    // a cursor whose plan-stats estimate exceeds its cap must fall back
    // to sort-per-page — one page of a huge SEARCH must not pin a
    // full-table sort in the cache
    val big = spark.range(0, 200000).toDF("n") // stats ≈ 1.6 MB > 1 KB cap
    val cur = Engine.Cursor(big, page = 0, needsDefaultSort = true, cacheCap = 1024)
    assert(cur.estimatedBytes > 1024)
    val rows = cur.materialized.offset(100).limit(100).collect()
    assert(rows.length == 100 && rows.head.getLong(0) == 100)
    assert(cur.paged.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "an over-budget result must not be persisted")
    // pages stay deterministic without the cache
    val again = cur.materialized.offset(100).limit(100).collect()
    assert(rows.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // the same result under a roomy cap persists as before
    val small = Engine.Cursor(big, page = 0, needsDefaultSort = true)
    small.materialized.limit(1).collect()
    assert(small.paged.storageLevel.useMemory, "under-budget results keep the cache")
    small.release()
    // engine-created cursors inherit the settings.yaml memory_limit
    val rs = eng.execute("SEARCH [] ON people").asInstanceOf[Engine.ResultSet]
    assert(eng.cursorState(rs.cursorId).get.cacheCap == eng.settings.memoryLimit)
    eng.execute(s"QYCNEXT ${rs.cursorId}")
  }

  test("15z no-ORDER-BY SEARCH plans contain no global sort; the cursor adds it lazily") {
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    // the non-paginating client's plan: NO sort node anywhere — at 100 TB
    // the old always-on all-columns orderBy was an avoidable full shuffle
    val rs = eng.execute("SEARCH [] ON seq WHERE n > 5").asInstanceOf[Engine.ResultSet]
    assert(rs.df.queryExecution.optimizedPlan.collect { case s: Sort => s }.isEmpty,
      s"unpaginated SEARCH must not sort:\n${rs.df.queryExecution.optimizedPlan}")
    // the cursor's paged view of the SAME search carries the
    // deterministic all-columns order
    val cur = eng.cursorState(rs.cursorId).get
    assert(cur.paged.queryExecution.optimizedPlan.collect { case s: Sort => s }.nonEmpty,
      "cursor paging must be deterministically ordered")
    val p1 = eng.execute(s"QYCNNXT ${rs.cursorId}").asInstanceOf[Engine.Page]
    assert(p1.rows.map(_.getInt(0)) == (106 to 205).toSeq,
      "page 1 must follow the deterministic cursor order")
    // explicit ORDER BY still sorts in the plan itself
    val explicit = eng.execute("SEARCH [] ON seq ORDER BY [n DESC]")
      .asInstanceOf[Engine.ResultSet]
    assert(explicit.df.queryExecution.optimizedPlan.collect { case s: Sort => s }.nonEmpty)
    eng.execute(s"QYCNEXT ${rs.cursorId}")
    eng.execute(s"QYCNEXT ${explicit.cursorId}")
  }

  test("15a closing one of two identical cursors keeps the shared cache alive") {
    // Spark's CacheManager keys entries by canonicalized plan, so two
    // identical SEARCHes share one cache entry — the first close must not
    // unpersist it out from under the survivor.
    val rs1 = eng.execute("SEARCH [] ON seq").asInstanceOf[Engine.ResultSet]
    val rs2 = eng.execute("SEARCH [] ON seq").asInstanceOf[Engine.ResultSet]
    eng.execute(s"QYCNNXT ${rs1.cursorId}")
    eng.execute(s"QYCNNXT ${rs2.cursorId}")
    val survivor = eng.cursorState(rs1.cursorId).get
    eng.execute(s"QYCNEXT ${rs2.cursorId}")
    assert(survivor.paged.storageLevel.useMemory,
      "shared cache entry was unpersisted by the other cursor's close")
    eng.execute(s"QYCNEXT ${rs1.cursorId}")
    assert(survivor.paged.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "last close must release the cache")
  }

  test("15c IN (SEARCH …) membership subquery lowers to a semi join") {
    // `seq` holds 1..250 from test 15
    val in4 = searchRows("SEARCH ['n'] ON seq WHERE n IN (SEARCH ['n'] ON seq WHERE n < 5)")
    assert(in4.map(_.getInt(0)).sorted == Seq(1, 2, 3, 4))
    val mixed = searchRows(
      "SEARCH ['n'] ON seq WHERE n > 2 AND n IN (SEARCH ['n'] ON seq WHERE n < 5)")
    assert(mixed.map(_.getInt(0)).sorted == Seq(3, 4))
    // OR with IN is rejected (documented AND-only restriction)
    intercept[ParseException](eng.execute(
      "SEARCH ['n'] ON seq WHERE n > 240 OR n IN (SEARCH ['n'] ON seq WHERE n < 5)"))
    // IN outside SEARCH (EDIT/DELETE predicates) is rejected
    intercept[ParseException](eng.execute(
      "DELETE ROW ON seq WHERE n IN (SEARCH ['n'] ON seq WHERE n < 5)"))
    // subquery must project exactly one column (people has five)
    intercept[ParseException](eng.execute(
      "SEARCH ['n'] ON seq WHERE n IN (SEARCH [] ON people)"))
    // strict type agreement: INT column vs TEXT-projecting subquery
    intercept[ParseException](eng.execute(
      "SEARCH ['n'] ON seq WHERE n IN (SEARCH ['name'] ON people)"))
  }

  test("15e NOT IN (SEARCH …) is an anti join (NOT-EXISTS semantics)") {
    val out = searchRows(
      "SEARCH ['n'] ON seq WHERE n < 7 AND n NOT IN (SEARCH ['n'] ON seq WHERE n < 5)")
    assert(out.map(_.getInt(0)).sorted == Seq(5, 6))
    intercept[ParseException](eng.execute(
      "DELETE ROW ON seq WHERE n NOT IN (SEARCH ['n'] ON seq WHERE n < 5)"))
  }

  test("15f aggregate projections: fn(col) groups by the plain columns") {
    // seq holds 1..250 from test 15
    val global = searchRows(
      "SEARCH [count(n), sum(n), min(n), max(n)] ON seq WHERE n <= 10")
    assert(global.length == 1)
    val r = global.head
    assert(r.getLong(0) == 10 && r.getLong(1) == 55 && r.getInt(2) == 1 && r.getInt(3) == 10)
    // grouped: people(id,name,age,score,ok) — group by ok
    val grouped = searchRows("SEARCH [ok, count(id), avg(age)] ON people")
    assert(grouped.length == 2)
    val byOk = grouped.map(x => x.getBoolean(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(byOk(true) == ((2L, 27.5)) && byOk(false) == ((1L, 40.0)))
    // unknown aggregate + wrong arity are parse errors
    intercept[ParseException](eng.execute("SEARCH [mode(n)] ON seq"))
    intercept[ParseException](eng.execute("SEARCH [sum(n n)] ON seq"))
    // HAVING filters the aggregated output by its column names
    val hv = searchRows(
      "SEARCH [ok, count(id)] ON people HAVING count_id > 1")
    assert(hv.length == 1 && hv.head.getBoolean(0) == true && hv.head.getLong(1) == 2)
    intercept[ParseException](eng.execute("SEARCH ['n'] ON seq HAVING n > 1"))
    // mixed-case duplicates resolve to one physical column, never two
    val mixed = searchRows("SEARCH [ok, count(id), sum(ID)] ON people")
    assert(mixed.length == 2)
    // strict input typing: sum/avg need numerics
    intercept[ParseException](eng.execute("SEARCH [sum(name)] ON people"))
    intercept[ParseException](eng.execute("SEARCH [avg(ok)] ON people"))
    // duplicate outputs are parse errors, not ambiguous-reference crashes
    intercept[ParseException](eng.execute("SEARCH [count(id), count(ID)] ON people"))
    // a bare word `having` in value position is still a value
    intercept[AlbaType.CoercionException](eng.execute(
      "SEARCH ['n'] ON seq WHERE n = having"))
  }

  test("15h aggregates over arithmetic: fn(expr) computes the measure per row") {
    // seq holds 1..250 from test 15: sum(n * 2 + 1) over n<=4 = 3+5+7+9
    val r = searchRows(
      "SEARCH [sum(n * 2 + 1), min(n * n), max(n - 5)] ON seq WHERE n <= 4").head
    def num(i: Int) = r.get(i).asInstanceOf[Number].longValue
    assert(num(0) == 24 && num(1) == 1 && num(2) == -1)
    // grouped + HAVING over the generated name; keys group as usual
    val g = searchRows(
      "SEARCH [ok, sum(age * 10)] ON people HAVING sum_age_mul_10 > 500")
    assert(g.length == 1 && g.head.getBoolean(0) == true && g.head.getLong(1) == 550)
    // aggregate over a scalar fn: input typed by the fn, result by the agg
    val fnAgg = searchRows(
      "SEARCH [sum(length(name)), min(lower(name))] ON people").head
    assert(fnAgg.getLong(0) == 7 && fnAgg.getString(1) == "ana") // ana+bo+cy
    intercept[ParseException](eng.execute("SEARCH [sum(lower(name))] ON people"))
    // strict typing: string leaves inside the expression are rejected
    intercept[ParseException](eng.execute("SEARCH [sum(name * 2)] ON people"))
    // views reject expression aggregates with a clear message
    val e = intercept[ParseException](eng.execute(
      "CREATE VIEW vexpr (SEARCH [ok, sum(age * 10)] ON people)"))
    assert(e.getMessage.contains("arithmetic"))
  }

  test("15i window items: rank/dense_rank/row_number PER partition") {
    // people: (1,'ana',30,true-ish...), ages 25,30,40; ok = true,true,false
    val r = searchRows(
      "SEARCH [id, ok, rank(age DESC) PER [ok]] ON people")
      .map(x => (x.getLong(0), x.getLong(2))).toMap
    // within ok=true ages 30,25 → ranks 1,2; ok=false alone → 1
    assert(r(1) == 1 && r(3) == 2 && r(2) == 1)
    // global window: PER [] ranks everyone; row_number is total-ordered
    val g = searchRows(
      "SEARCH [id, row_number(age) PER []] ON people")
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(g.values.toSet == Set(1L, 2L, 3L))
    assert(g(3) == 1 && g(1) == 2 && g(2) == 3) // ages 25 < 30 < 40
    // windowed AGGREGATE: sum(age) PER [ok] = SUM OVER (PARTITION BY ok)
    val wa = searchRows("SEARCH [id, sum(age) PER [ok], avg(age) PER []] ON people")
      .map(x => (x.getLong(0), (x.getLong(1), x.getDouble(2)))).toMap
    assert(wa(1) == ((55L, 95.0 / 3)) && wa(3) == ((55L, 95.0 / 3)))
    assert(wa(2)._1 == 40L)
    // median as a grouped aggregate (exact interpolated, like the oracle)
    val med = searchRows("SEARCH [median(age)] ON people").head.getDouble(0)
    assert(med == 30.0)
    intercept[ParseException](eng.execute("SEARCH [median(name)] ON people"))
    // navigation: lag/lead of a value column ordered within the partition
    val nav = searchRows(
      "SEARCH [id, lag(name BY age) PER [], lead(name BY age) PER []] ON people")
      .map(x => (x.getLong(0), (Option(x.getString(1)), Option(x.getString(2))))).toMap
    // age order: cy(25) < ana(30) < bo(40)
    assert(nav(3) == ((None, Some("ana"))))
    assert(nav(1) == ((Some("cy"), Some("bo"))))
    assert(nav(2) == ((Some("ana"), None)))
    intercept[ParseException](eng.execute("SEARCH [lag(name) PER []] ON people"))
    // fractional ranks + first/last picks
    val fr = searchRows(
      "SEARCH [id, percent_rank(age) PER [], first_value(name BY age) PER [], " +
        "last_value(name BY age) PER []] ON people")
      .map(x => (x.getLong(0), (x.getDouble(1), x.getString(2), x.getString(3)))).toMap
    // ages 25(cy) < 30(ana) < 40(bo): percent_rank 0, .5, 1
    assert(fr(3) == ((0.0, "cy", "bo")))
    assert(fr(1) == ((0.5, "cy", "bo")))
    assert(fr(2) == ((1.0, "cy", "bo")))
    // a window fn without PER errors loudly; no combining with aggregates
    intercept[ParseException](eng.execute("SEARCH [rank(age)] ON people"))
    intercept[ParseException](eng.execute(
      "SEARCH [ok, count(id), rank(age) PER [ok]] ON people"))
    // views reject window items
    val e = intercept[ParseException](eng.execute(
      "CREATE VIEW vwin (SEARCH [ok, rank(age) PER [ok]] ON people)"))
    assert(e.getMessage.contains("maintainable"))
  }

  test("15j value index auto-serves equality predicates; overlay/OR fall back") {
    eng.execute("CREATE CONTAINER ixt ['id','tag','n'] [BIGINT, TEXT, INT]")
    (0 until 30).foreach(i => eng.execute(
      s"CREATE ROW ['id','tag','n'] [$i, 'tg${i % 3}', ${i % 4}] ON ixt"))
    eng.execute("COMMIT ixt")
    eng.execute("CREATE INDEX vt ON ixt ['tag'] USING value")
    // result identical to the plain filter, plan pk-pruned (isin on id)
    val got = searchRows("SEARCH [id] ON ixt WHERE tag = 'tg1'")
      .map(_.getLong(0)).toSet
    assert(got == (0 until 30).filter(_ % 3 == 1).map(_.toLong).toSet)
    val plan = eng.execute("EXPLAIN SEARCH [id] ON ixt WHERE tag = 'tg1'")
      .asInstanceOf[Engine.Done].message
    assert(plan.contains("id IN ") || plan.contains("In(id"),
      s"index-served scan must prune by pk candidates:\n$plan")
    // composes with other AND conditions (full predicate re-applied)
    val both = searchRows("SEARCH [id] ON ixt WHERE tag = 'tg1' AND n = 2")
      .map(_.getLong(0)).toSet
    assert(both == (0 until 30).filter(i => i % 3 == 1 && i % 4 == 2)
      .map(_.toLong).toSet)
    // an OR chain must NOT prune (the other side matches outside the probe)
    val orPlan = eng.execute(
      "EXPLAIN SEARCH [id] ON ixt WHERE tag = 'tg1' OR n = 0")
      .asInstanceOf[Engine.Done].message
    assert(!orPlan.contains("id IN ") && !orPlan.contains("In(id"))
    // range probe on an INT value index (reference Indexed(Range) shape)
    eng.execute("CREATE INDEX vn ON ixt ['n'] USING value")
    val rng = searchRows("SEARCH [id] ON ixt WHERE n >= 1 AND n < 3")
      .map(_.getLong(0)).toSet
    assert(rng == (0 until 30).filter(i => i % 4 == 1 || i % 4 == 2)
      .map(_.toLong).toSet)
    val rngPlan = eng.execute("EXPLAIN SEARCH [id] ON ixt WHERE n >= 1 AND n < 3")
      .asInstanceOf[Engine.Done].message
    assert(rngPlan.contains("id IN ") || rngPlan.contains("In(id"),
      s"range probe must prune by pk candidates:\n$rngPlan")
    // staged rows aren't indexed: the overlay view keeps them anyway
    eng.execute("CREATE ROW ['id','tag','n'] [900, 'tg1', 9] ON ixt")
    val staged = searchRows("SEARCH [id] ON ixt WHERE tag = 'tg1'")
      .map(_.getLong(0)).toSet
    assert(staged.contains(900L), "staged row must survive (no index prune)")
    eng.execute("ROLLBACK ixt")
  }

  test("15k computed GROUP BY keys: arithmetic/scalar items group the aggregate") {
    // arithmetic key: every n<=10 maps to key 0 → one group of 10
    val g = searchRows("SEARCH [n * 0, count(n)] ON seq WHERE n <= 10")
    assert(g.length == 1 && g.head.getLong(1) == 10)
    // scalar-fn key groups like SQL GROUP BY lower(name)
    val byName = searchRows("SEARCH [lower(name), count(id)] ON people")
    assert(byName.length == 3 && byName.forall(_.getLong(1) == 1))
    // HAVING addresses the aggregate over computed keys
    val hv = searchRows(
      "SEARCH [n * 0, count(n)] ON seq WHERE n <= 10 HAVING count_n > 5")
    assert(hv.length == 1)
    assert(searchRows(
      "SEARCH [n * 0, count(n)] ON seq WHERE n <= 10 HAVING count_n > 50").isEmpty)
    // string leaves inside an arithmetic key stay rejected
    intercept[ParseException](eng.execute("SEARCH [name * 2, count(id)] ON people"))
  }

  test("15g SEARCH DISTINCT dedupes the projected rows") {
    assert(searchRows("SEARCH [ok] ON people").length == 3)
    val d = searchRows("SEARCH DISTINCT [ok] ON people")
    assert(d.length == 2, "two distinct ok values expected")
    // over unique rows it is a no-op; composes with WHERE and LIMIT
    assert(searchRows("SEARCH DISTINCT [] ON seq WHERE n <= 5").length == 5)
    assert(searchRows("SEARCH DISTINCT [ok] ON people LIMIT 1").length == 1)
  }

  test("15d outer WHERE applies to virtual containers (scalar and IN)") {
    val scalar = searchRows("SEARCH ['n'] ON [(SEARCH ['n'] ON seq)] WHERE n < 3")
    assert(scalar.map(_.getInt(0)).sorted == Seq(1, 2))
    val viaIn = searchRows(
      "SEARCH ['n'] ON [(SEARCH ['n'] ON seq)] WHERE n IN (SEARCH ['n'] ON seq WHERE n < 5)")
    assert(viaIn.map(_.getInt(0)).sorted == Seq(1, 2, 3, 4))
  }

  test("15b CHAR + NONE columns round-trip through DDL/DML (alba_types.rs:15,26)") {
    eng.execute("CREATE CONTAINER chars ['id','c','pad'] [BIGINT, CHAR, NONE]")
    eng.execute("CREATE ROW ['id','c','pad'] [1,'x','discarded'] ON chars")
    eng.execute("CREATE ROW ['id','c'] [2,'é'] ON chars")
    eng.execute("COMMIT chars")
    val rows = searchRows("SEARCH [] ON chars WHERE c == 'x'")
    assert(rows.length == 1 && rows.head.getString(1) == "x")
    // NONE discards every written value (alba_types.rs:273)
    assert(searchRows("SEARCH ['pad'] ON chars").forall(_.isNullAt(0)))
    // multi-character value must not coerce into CHAR
    intercept[AlbaType.CoercionException](
      eng.execute("CREATE ROW ['id','c'] [3,'ab'] ON chars"))
    eng.execute("DELETE CONTAINER chars")
  }

  test("16 auto_commit applies inserts immediately (database.rs:630-633)") {
    eng.tx.autoCommit = true
    eng.execute("CREATE ROW ['k','s'] [50,'auto'] ON caps2")
    assert(eng.catalog.read("caps2").count() == 2)
    eng.tx.autoCommit = false
  }

  test("17 DELETE CONTAINER removes data + registry entry") {
    eng.execute("DELETE CONTAINER caps2")
    assert(!eng.catalog.exists("caps2"))
    intercept[IllegalArgumentException](eng.execute("SEARCH [] ON caps2"))
  }

  test("18a EXPLAIN returns the formatted physical plan with pushed filters") {
    val out = eng.execute("EXPLAIN SEARCH ['id'] ON people WHERE age > 28")
      .asInstanceOf[Engine.Done].message
    assert(out.contains("Physical Plan"))
    assert(out.contains("PushedFilters") && out.contains("GreaterThan(age,28)"))
  }

  test("18d EXPLAIN ANALYZE executes the plan and reports actual rows") {
    val out = eng.execute("EXPLAIN ANALYZE SEARCH ['id'] ON people WHERE age > 28")
      .asInstanceOf[Engine.Done].message
    assert(out.contains("Physical Plan"))
    assert(out.contains("Actual Rows"))
    // ages 30,40 pass the filter: some operator reports exactly 2 rows
    assert(out.linesIterator.exists(l => l.contains("rows=2")), out)
    // under the batch profile (AQE on) the adaptive root must be
    // unwrapped or the metric walk reports nothing
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val aqe = eng.execute("EXPLAIN ANALYZE SEARCH ['id'] ON people WHERE age > 28")
        .asInstanceOf[Engine.Done].message
      assert(aqe.linesIterator.exists(l => l.contains("rows=2")), aqe)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  test("18c EXPLAIN covers MATCH/SIMILAR/CHANGES read plans") {
    eng.execute("CREATE CONTAINER exq ['id','body'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['id','body'] [1,'alpha beta gamma delta'] ON exq")
    eng.execute("COMMIT exq")
    eng.execute("CREATE INDEX ft ON exq ['body'] USING text")
    eng.execute("CREATE INDEX nd ON exq ['body'] USING lsh")
    val m = eng.execute("EXPLAIN MATCH ['alpha'] ON exq")
      .asInstanceOf[Engine.Done].message
    assert(m.contains("Physical Plan"), m)
    val sm = eng.execute("EXPLAIN SIMILAR 1 ON exq USING nd")
      .asInstanceOf[Engine.Done].message
    assert(sm.contains("Physical Plan"), sm)
    val ch = eng.execute("EXPLAIN CHANGES exq 0")
      .asInstanceOf[Engine.Done].message
    assert(ch.contains("Physical Plan"), ch)
    // the round-14 forms plan too: conjunctive/phrase/filtered MATCH,
    // the text-probe SIMILAR, the filtered SCORED SIMILAR, and the
    // decontamination dry run (its funnel is lazy — plan-only)
    assert(eng.execute("EXPLAIN MATCH ALL ['alpha','beta'] ON exq")
      .asInstanceOf[Engine.Done].message.contains("Physical Plan"))
    assert(eng.execute("EXPLAIN MATCH PHRASE ['alpha beta'] ON exq")
      .asInstanceOf[Engine.Done].message.contains("Physical Plan"))
    assert(eng.execute("EXPLAIN MATCH ['alpha'] ON exq WHERE id > 0")
      .asInstanceOf[Engine.Done].message.contains("Physical Plan"))
    assert(eng.execute("EXPLAIN SIMILAR 'alpha beta gamma delta' ON exq USING nd SCORED")
      .asInstanceOf[Engine.Done].message.contains("Physical Plan"))
    assert(eng.execute("EXPLAIN SIMILAR 1 ON exq USING nd WHERE id > 0 SCORED")
      .asInstanceOf[Engine.Done].message.contains("Physical Plan"))
    eng.execute("CREATE CONTAINER exqe ['eid','body'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['eid','body'] [1,'alpha beta gamma delta'] ON exqe")
    eng.execute("COMMIT exqe")
    assert(eng.execute("EXPLAIN SHOW DECONTAMINATE exq AGAINST exqe ON body")
      .asInstanceOf[Engine.Done].message.contains("Physical Plan"))
    // the funnel's self-target reject fires through EXPLAIN too
    intercept[ParseException](
      eng.execute("EXPLAIN SHOW DECONTAMINATE exq AGAINST exq ON body"))
    intercept[ParseException](eng.execute("EXPLAIN COMMIT exq"))
    eng.execute("DELETE CONTAINER exq")
    eng.execute("DELETE CONTAINER exqe")
  }

  test("18b VACUUM prunes old versions through AQL") {
    eng.execute("CREATE CONTAINER vac ['k'] [INT]")
    eng.execute("CREATE ROW ['k'] [1] ON vac"); eng.execute("COMMIT vac")
    eng.execute("CREATE ROW ['k'] [2] ON vac"); eng.execute("COMMIT vac")
    assert(eng.catalog.versions("vac").length == 2)
    val msg = eng.execute("VACUUM vac").asInstanceOf[Engine.Done].message
    assert(msg.contains("1 version(s) removed"))
    assert(eng.catalog.versions("vac").length == 1)
    intercept[ParseException](eng.execute("VACUUM vac 0"))
    // a lagging REGISTERED CDC consumer: explicit VACUUM refuses with the
    // consumer named and the fix, like the dependent-view refusal
    val tail = graft.catalog.ChangeTail.registered(eng.catalog, "vac", "sink")
    tail.pollOnce((_, _, _) => ())
    eng.execute("CREATE ROW ['k'] [3] ON vac"); eng.execute("COMMIT vac")
    eng.execute("CREATE ROW ['k'] [4] ON vac"); eng.execute("COMMIT vac")
    val re = intercept[ParseException](eng.execute("VACUUM vac 1"))
    assert(re.getMessage.contains("registered consumer 'sink'"), re.getMessage)
    tail.pollOnce((_, _, _) => ()) // caught up: the refusal lifts
    eng.execute("VACUUM vac 1")
    eng.catalog.unregisterTail("vac", "sink")
  }

  test("19 ORDER BY / LIMIT: explicit order, tie-break, TakeOrderedAndProject plan") {
    // people: (1,'ana',30,9.5), (2,'bo',40,3.25), (3,'cy',25,7.0)
    val top = searchRows("SEARCH ['id','score'] ON people ORDER BY [score DESC] LIMIT 2")
    assert(top.map(_.getLong(0)) == Seq(1L, 3L)) // 9.5, 7.0
    // default direction is ASC; unnamed output columns tie-break ascending
    val asc = searchRows("SEARCH ['id'] ON people ORDER BY [id]")
    assert(asc.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    // ORDER BY resolves against OUTPUT columns only
    intercept[ParseException](
      searchRows("SEARCH ['id'] ON people ORDER BY [nope]"))
    // sort+limit lowers to TakeOrderedAndProject (per-partition top-k
    // heap + single merge), never a global sort then limit
    val plan = eng.execute(
      "EXPLAIN SEARCH ['id','score'] ON people ORDER BY [score DESC] LIMIT 2")
      .asInstanceOf[Engine.Done].message
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("20 JOIN: equi-join of two containers with WHERE/projection over the joined row") {
    eng.execute("CREATE CONTAINER pets ['owner_id','pet'] [BIGINT, SMALL-STRING]")
    eng.execute("CREATE ROW ['owner_id','pet'] [1,'cat'] ON pets")
    eng.execute("CREATE ROW ['owner_id','pet'] [1,'dog'] ON pets")
    eng.execute("CREATE ROW ['owner_id','pet'] [3,'eel'] ON pets")
    eng.execute("CREATE ROW ['owner_id','pet'] [9,'owl'] ON pets") // no matching person
    eng.execute("COMMIT pets")

    // inner join drops non-matching rows on both sides; projection and
    // WHERE reach columns of both containers
    val rows = searchRows(
      "SEARCH ['name','pet'] ON people JOIN pets ON id = owner_id WHERE age >= 25")
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSet == Set(("ana", "cat"), ("ana", "dog"), ("cy", "eel")))

    // qualified names resolve; either written order works
    assert(searchRows(
      "SEARCH ['pet'] ON people JOIN pets ON pets.owner_id = people.id").length == 3)

    // aggregation over the joined source
    val agg = searchRows("SEARCH ['name', count(pet)] ON people JOIN pets ON id = owner_id")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(agg.toSet == Set(("ana", 2L), ("cy", 1L)))

    // the join sees the live transactional view (staged rows join too)
    eng.execute("CREATE ROW ['owner_id','pet'] [2,'fox'] ON pets")
    assert(searchRows("SEARCH ['pet'] ON people JOIN pets ON id = owner_id").length == 4)
    eng.execute("ROLLBACK pets")

    // errors: unknown qualifier, unrelated condition, type mismatch,
    // column collision (self-join without a rename)
    intercept[ParseException](searchRows(
      "SEARCH ['pet'] ON people JOIN pets ON zoo.id = owner_id"))
    intercept[ParseException](searchRows(
      "SEARCH ['pet'] ON people JOIN pets ON id = name"))    // both resolve left
    intercept[ParseException](searchRows(
      "SEARCH ['pet'] ON people JOIN pets ON age = owner_id")) // INT vs BIGINT
    intercept[ParseException](searchRows(
      "SEARCH [] ON pets JOIN pets ON owner_id = owner_id"))
  }

  test("21 JOIN composes with virtual containers on either side") {
    // virtual RIGHT side: join against a filtered subquery
    val viaSub = searchRows(
      "SEARCH ['name','pet'] ON people JOIN " +
        "(SEARCH ['owner_id','pet'] ON pets WHERE pet != 'eel') ON id = owner_id")
      .map(r => (r.getString(0), r.getString(1)))
    assert(viaSub.toSet == Set(("ana", "cat"), ("ana", "dog")))
    // virtual LEFT side: the subquery renames via projection… (projection
    // can't rename in AQL, so this pins that a virtual base also joins)
    val viaBase = searchRows(
      "SEARCH ['id','pet'] ON [(SEARCH ['id'] ON people WHERE age > 28)] " +
        "JOIN pets ON id = owner_id")
    assert(viaBase.map(_.getLong(0)).toSet == Set(1L))
  }

  test("23 AQL JOIN plans as a hash/merge equi-join, never a nested loop") {
    val plan = eng.execute(
      "EXPLAIN SEARCH ['name','pet'] ON people JOIN pets ON id = owner_id")
      .asInstanceOf[Engine.Done].message
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"AQL join fell off the equi-join path:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"), plan)
  }

  test("22 LEFT JOIN keeps unmatched left rows with NULL right columns") {
    val rows = searchRows(
      "SEARCH ['name','pet'] ON people LEFT JOIN pets ON id = owner_id")
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(rows.toSet ==
      Set(("ana", "cat"), ("ana", "dog"), ("bo", null), ("cy", "eel")))
  }

  test("25 IN-subquery membership composes with JOIN (semi-join over the joined row)") {
    val rows = searchRows(
      "SEARCH ['name','pet'] ON people JOIN pets ON id = owner_id " +
        "WHERE id IN (SEARCH ['owner_id'] ON pets WHERE pet = 'cat')")
      .map(r => (r.getString(0), r.getString(1)))
    // only ana owns a cat; the join still yields BOTH her pets
    assert(rows.toSet == Set(("ana", "cat"), ("ana", "dog")))
  }

  test("24 AT VERSION applies to every container in a JOIN (both sides time-travel)") {
    eng.execute("CREATE CONTAINER ha ['k','va'] [INT, SMALL-STRING]")
    eng.execute("CREATE CONTAINER hb ['kb','vb'] [INT, SMALL-STRING]")
    eng.execute("CREATE ROW ['k','va'] [1,'a1'] ON ha"); eng.execute("COMMIT ha")  // ha@v1
    eng.execute("CREATE ROW ['kb','vb'] [1,'b1'] ON hb"); eng.execute("COMMIT hb") // hb@v1
    eng.execute("EDIT ROW ['va'] ['a2'] ON ha WHERE k = 1"); eng.execute("COMMIT ha")  // v2
    eng.execute("EDIT ROW ['vb'] ['b2'] ON hb WHERE kb = 1"); eng.execute("COMMIT hb") // v2
    def pair(aql: String) = searchRows(aql).map(r => (r.getString(0), r.getString(1)))
    assert(pair("SEARCH ['va','vb'] ON ha JOIN hb ON k = kb") == Seq(("a2", "b2")))
    assert(pair("SEARCH ['va','vb'] ON ha JOIN hb ON k = kb AT VERSION 1")
      == Seq(("a1", "b1")))
    eng.execute("DELETE CONTAINER ha"); eng.execute("DELETE CONTAINER hb")
  }

  test("18 schema + data survive an engine restart (quirk Q5 fixed)") {
    val eng2 = new Engine(spark, dir.toString) // fresh engine, same root
    assert(eng2.catalog.list().contains("people"))
    assert(eng2.catalog.get("people").columns.map(_._1) ==
      List("id", "name", "age", "score", "ok"))
    val rows = eng2.execute("SEARCH ['id'] ON people")
      .asInstanceOf[Engine.ResultSet].df.collect()
    assert(rows.length == 3)
  }

  test("27 WHERE arithmetic and column-to-column comparison") {
    eng.execute("CREATE CONTAINER arith ['a','b','t'] [BIGINT, FLOAT, TEXT]")
    eng.execute("CREATE ROW ['a','b','t'] [1, 5.0, 'x'] ON arith")
    eng.execute("CREATE ROW ['a','b','t'] [6, 2.0, 'b'] ON arith")
    eng.execute("CREATE ROW ['a','b','t'] [10, 30.0, 'a'] ON arith")
    eng.execute("COMMIT arith")
    def ids(aql: String) = searchRows(aql).map(_.getLong(0)).toSet
    // plain column-to-column on a numeric LHS
    assert(ids("SEARCH ['a'] ON arith WHERE a > b") == Set(6L))
    // arithmetic RHS with * / + precedence
    assert(ids("SEARCH ['a'] ON arith WHERE b >= a * 3") == Set(1L, 10L))
    assert(ids("SEARCH ['a'] ON arith WHERE b > a * 2 + 1") == Set(1L, 10L))
    assert(ids("SEARCH ['a'] ON arith WHERE a >= b / 2 + 1") == Set(6L))
    // on a TEXT column a bare word stays a string LITERAL even when it
    // names a column (reference P5 semantics, pinned)
    assert(ids("SEARCH ['a'] ON arith WHERE t = b") == Set(6L))
    // unknown word inside arithmetic is an error, not a literal
    intercept[ParseException](
      searchRows("SEARCH [] ON arith WHERE a > nope + 1"))
    // EDIT/DELETE predicates share the lowering (arithmetic reaches Tx)
    eng.execute("EDIT ROW ['t'] ['hit'] ON arith WHERE b > a * 2 + 1")
    assert(ids("SEARCH ['a'] ON arith WHERE t = hit") == Set(1L, 10L))
    eng.execute("ROLLBACK arith")
    // arithmetic LEFT-hand side (the VERDICT example shape: a + b > c)
    // rows (a, b): (1,5.0), (6,2.0), (10,30.0) — sums 6, 8, 40
    assert(ids("SEARCH ['a'] ON arith WHERE a + b > 7") == Set(6L, 10L))
    // both sides arithmetic: 2<=10 T, 12<=7 F, 20<=35 T
    assert(ids("SEARCH ['a'] ON arith WHERE a * 2 <= b + 5") == Set(1L, 10L))
    // literal-first LHS
    assert(ids("SEARCH ['a'] ON arith WHERE 2 * a < b") == Set(1L, 10L))
    intercept[ParseException](
      searchRows("SEARCH [] ON arith WHERE a + nope > 1"))
    // scalar functions as a predicate side; t values: 'x', 'b', 'a'
    assert(ids("SEARCH ['a'] ON arith WHERE upper(t) = 'X'") == Set(1L))
    assert(ids("SEARCH ['a'] ON arith WHERE length(t) = 1") == Set(1L, 6L, 10L))
    assert(ids("SEARCH ['a'] ON arith WHERE ceil(b) > a") == Set(1L, 10L))
    // a bare RHS word under a STRING-result fn stays a literal even when
    // it names a column ('b' is both a value of t and a column name)
    assert(ids("SEARCH ['a'] ON arith WHERE lower(t) = b") == Set(6L))
    intercept[ParseException](
      searchRows("SEARCH [] ON arith WHERE lower(a) = 'x'")) // typing
    // a bare word resolving to a TEXT column in a NUMERIC comparison is
    // an error — Spark's implicit string-to-double cast would null the
    // predicate and silently return 0 rows (ADVICE r5)
    intercept[ParseException](searchRows("SEARCH [] ON arith WHERE a > t"))
    // same inside arithmetic: text columns never participate
    intercept[ParseException](
      searchRows("SEARCH [] ON arith WHERE a > t + 1"))
    intercept[ParseException](
      searchRows("SEARCH [] ON arith WHERE t + 1 > a"))
  }

  test("28 computed projection items evaluate with output = plain-then-computed") {
    // arith container from test 27: (1,5.0,'x'), (6,2.0,'b'), (10,30.0,'a')
    val df = eng.execute("SEARCH [a, b, a * 2 + 1] ON arith")
      .asInstanceOf[Engine.ResultSet].df
    assert(df.columns.toSeq == Seq("a", "b", "a_mul_2_plus_1"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 3L, 6L -> 13L, 10L -> 21L))
    // exprs-only projection outputs only the computed column
    val only = eng.execute("SEARCH [b / 2] ON arith")
      .asInstanceOf[Engine.ResultSet].df
    assert(only.columns.toSeq == Seq("b_div_2"))
    // composes with WHERE and ORDER BY over the computed name
    val rows = searchRows(
      "SEARCH [a, b * 2] ON arith WHERE a > 1 ORDER BY [b_mul_2 DESC]")
    assert(rows.map(_.getLong(0)) == Seq(10L, 6L))
    // string columns are rejected (strict typing, like sum/avg)
    intercept[ParseException](searchRows("SEARCH [t * 2] ON arith"))
    // name collision with a plain output column is an error
    eng.execute("CREATE CONTAINER collide ['x','x_mul_2'] [INT, INT]")
    intercept[ParseException](searchRows("SEARCH [x_mul_2, x * 2] ON collide"))
  }

  test("28b computed items compose with unions, joins, and subqueries") {
    // union of the container with itself: expr applies over the union
    val u = searchRows("SEARCH [a * 2] ON [arith, arith]")
      .map(_.getLong(0)).sorted
    assert(u == Seq(2L, 2L, 12L, 12L, 20L, 20L))
    // over a JOIN: leaves ride the joined projection (people ⋈ pets)
    val j = searchRows(
      "SEARCH [id * 10] ON people JOIN pets ON id = owner_id WHERE pet = 'cat'")
    assert(j.map(_.getLong(0)) == Seq(10L))
    // as a subquery feeding an outer aggregate
    val agg = searchRows(
      "SEARCH [count(a_mul_2)] ON [(SEARCH [a * 2] ON arith)]")
    assert(agg.head.getLong(0) == 3L)
  }

  test("29 scalar function projection items (fn_col outputs, strict typing)") {
    // arith container: (1,5.0,'x'), (6,2.0,'b'), (10,30.0,'a')
    val df = eng.execute("SEARCH [a, upper(t), ceil(b)] ON arith")
      .asInstanceOf[Engine.ResultSet].df
    assert(df.columns.toSeq == Seq("a", "upper_t", "ceil_b"))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "X", 5.0), (6L, "B", 2.0), (10L, "A", 30.0)))
    // scalar fns compose with computed arithmetic in one projection
    val mixed = eng.execute("SEARCH [length(t), a * 2] ON arith")
      .asInstanceOf[Engine.ResultSet].df
    assert(mixed.columns.toSet == Set("length_t", "a_mul_2"))
    // strict typing both ways
    intercept[ParseException](searchRows("SEARCH [lower(a)] ON arith"))
    intercept[ParseException](searchRows("SEARCH [abs(t)] ON arith"))
    // unknown function names the whole supported set
    val err = intercept[ParseException](searchRows("SEARCH [sqrt(a)] ON arith"))
    assert(err.getMessage.contains("scalar"))
    // scalar fn + aggregate: the fn output becomes a GROUP BY key
    val keyed = searchRows("SEARCH [count(a), lower(t)] ON arith")
    assert(keyed.nonEmpty) // groups by lower(t), counts per group
    // multi-arg fns in every position: a string-default coalesce on the
    // predicate LHS keeps STRING comparison semantics (the RHS is a
    // literal, never a misresolved column/number), and a numeric-default
    // coalesce passes the aggregate's numeric-result gate
    val co = searchRows("SEARCH [a] ON arith WHERE coalesce(t 'zz') = 'x'")
    assert(co.map(_.getLong(0)).toSet == Set(1L))
    val sub = searchRows("SEARCH [a] ON arith WHERE substr(t 1 1) = 'b'")
    assert(sub.map(_.getLong(0)).toSet == Set(6L))
    val agg = searchRows("SEARCH [sum(coalesce(a 0))] ON arith")
    assert(agg.head.getLong(0) == 17L)
  }

  test("26 ALTER CONTAINER ADD COLUMN: old versions read NULL, new rows carry the column") {
    eng.execute("CREATE CONTAINER alt ['id','v'] [BIGINT, SMALL-STRING]")
    eng.execute("CREATE ROW ['id','v'] [1,'one'] ON alt")
    eng.execute("CREATE ROW ['id','v'] [2,'two'] ON alt")
    eng.execute("COMMIT alt") // v1, two-column schema

    // guard: staged ops must be settled before a schema change
    eng.execute("CREATE ROW ['id','v'] [9,'x'] ON alt")
    intercept[ParseException](
      eng.execute("ALTER CONTAINER alt ADD COLUMN ['tag'] [TEXT]"))
    eng.execute("ROLLBACK alt")

    eng.execute("ALTER CONTAINER alt ADD COLUMN ['tag'] [TEXT]")
    assert(eng.catalog.get("alt").columns.map(_._1) == List("id", "v", "tag"))
    // duplicate (case-insensitive) rejected
    intercept[IllegalArgumentException](
      eng.execute("ALTER CONTAINER alt ADD COLUMN ['TAG'] [TEXT]"))

    eng.execute("CREATE ROW ['id','v','tag'] [3,'three','fresh'] ON alt")
    eng.execute("COMMIT alt") // v2: v1 files carried over, mixed schemas
    val got = searchRows("SEARCH [] ON alt").map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set((1L, "one", None), (2L, "two", None),
      (3L, "three", Some("fresh"))),
      "pre-ALTER rows must read the new column as NULL")
    // time travel: the pre-ALTER version reads under the NEW schema with NULLs
    val v1 = searchRows("SEARCH [] ON alt AT VERSION 1").map(r =>
      (r.getLong(0), Option(r.getString(2)))).toSet
    assert(v1 == Set((1L, None), (2L, None)))
    // restart: the widened schema round-trips through the catalog files
    val eng3 = new Engine(spark, dir.toString)
    assert(eng3.catalog.get("alt").columns.map(_._1) == List("id", "v", "tag"))
  }

  test("27 MERGE ROW upserts on the pk convention column") {
    eng.execute("CREATE CONTAINER mrg ['id','v','n'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute("CREATE ROW ['id','v','n'] [1,'one',10] ON mrg")
    eng.execute("CREATE ROW ['id','v','n'] [2,'two',20] ON mrg")
    eng.execute("COMMIT mrg")

    // miss → insert (unmentioned column NULL), hit → update mentioned
    // columns only (n keeps its value)
    eng.execute("MERGE ROW ['id','v'] [3,'three'] ON mrg")
    eng.execute("MERGE ROW ['id','v'] [1,'uno'] ON mrg")
    // read-your-writes: a second merge on the STAGED insert updates it
    eng.execute("MERGE ROW ['id','v'] [3,'tres'] ON mrg")
    eng.execute("COMMIT mrg")

    val got = searchRows("SEARCH [] ON mrg").map(r =>
      (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(got == Set((1L, "uno", Some(10L)), (2L, "two", Some(20L)),
      (3L, "tres", None)))

    // the key column is mandatory and NOT NULL; unknown columns rejected
    intercept[ParseException](eng.execute("MERGE ROW ['v'] ['x'] ON mrg"))
    intercept[ParseException](eng.execute("MERGE ROW ['id','nope'] [9,'x'] ON mrg"))

    // auto_commit symmetry: both MERGE branches commit immediately
    eng.tx.autoCommit = true
    try {
      eng.execute("MERGE ROW ['id','v'] [4,'four'] ON mrg")  // miss → insert
      eng.execute("MERGE ROW ['id','v'] [1,'eins'] ON mrg")  // hit → update
      assert(eng.tx.stagedOps("mrg") == 0, "auto_commit must leave nothing staged")
      val committed = eng.catalog.read("mrg").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(committed(4L) == "four" && committed(1L) == "eins")
    } finally eng.tx.autoCommit = false
  }

  test("30 CREATE INDEX through AQL: maintained by commit, serves lookups, droppable") {
    eng.execute("CREATE CONTAINER idocs ['doc_id','body'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['doc_id','body'] [1,'the quick brown fox jumps over the lazy dog'] ON idocs")
    eng.execute("CREATE ROW ['doc_id','body'] [2,'pack my box with five dozen liquor jugs now'] ON idocs")
    eng.execute("COMMIT idocs")
    eng.execute("CREATE INDEX nd ON idocs ['body']")
    assert(eng.catalog.indexDefs("idocs").map(i => (i.ix, i.kind, i.column))
      == Seq(("nd", "lsh", "body")))

    // a committed near-dup is indexed by its own commit and found by probe
    eng.execute("CREATE ROW ['doc_id','body'] [3,'the quick brown fox jumps over the lazy dog'] ON idocs")
    eng.execute("COMMIT idocs")
    import spark.implicits._
    val cands = eng.catalog.indexLookup("idocs", "nd",
        Seq((99L, "the quick brown fox jumps over the lazy dog"))
          .toDF("doc_id", "body"))
      .collect().map(_.getLong(1)).toSet
    assert(cands == Set(1L, 3L), s"expected the near-dup family, got $cands")

    // SIMILAR serves the band index through AQL: doc 1's family is doc 3
    val sim = searchRows("SIMILAR 1 ON idocs")
    assert(sim.map(_.getLong(0)) == Seq(3L), s"got $sim")
    // (SIMILAR …) as a SEARCH source: join candidates back to their rows
    val simJoin = searchRows(
      "SEARCH [doc_id, body] ON [(SIMILAR 1 ON idocs)] JOIN idocs ON doc_id = doc_id")
    assert(simJoin.map(_.getLong(0)) == Seq(3L) &&
      simJoin.head.getString(1).contains("quick brown fox"))
    // an unknown pk probes nothing: empty candidate set, not an error
    assert(searchRows("SIMILAR 999 ON idocs").isEmpty)
    // a literal VECTOR can't probe a band (text) index — loud error
    // naming the kinds, never a silent empty set
    val eVec = intercept[ParseException](
      eng.execute("SIMILAR [0.1, 0.2] ON idocs"))
    assert(eVec.getMessage.contains("ivf"), eVec.getMessage)
    // ...and PROBE has no band-index meaning either (no cells to widen)
    val ePr = intercept[ParseException](
      eng.execute("SIMILAR 1 ON idocs PROBE 2"))
    assert(ePr.getMessage.contains("ivf"), ePr.getMessage)
    // ...but SCORED works on a band index (round 13): candidates ranked
    // by EXACT 3-gram Jaccard — docs 1 and 3 are verbatim duplicates, so
    // the one candidate scores exactly 1.0
    val scored = searchRows("SIMILAR 1 ON idocs SCORED")
    assert(scored.map(r => (r.getLong(0), r.getDouble(1))) == Seq((3L, 1.0)),
      s"got $scored")
    // a duplicate-pk corpus (repeated raw insert) serves each candidate
    // pk ONCE under SCORED — min-by-bytes representative, the ivf twin's
    // documented stance (Index.ivfLookup)
    eng.execute("CREATE ROW ['doc_id','body'] [3,'the quick brown fox jumps over the lazy dog'] ON idocs")
    eng.execute("COMMIT idocs")
    val dupScored = searchRows("SIMILAR 1 ON idocs SCORED")
    assert(dupScored.map(_.getLong(0)) == Seq(3L),
      s"duplicate pk must occupy one LIMIT slot, got $dupScored")

    eng.execute("DELETE INDEX nd ON idocs")
    assert(eng.catalog.indexDefs("idocs").isEmpty)
    intercept[ParseException](eng.execute("SIMILAR 1 ON idocs"))
    // unknown kind through the full AQL path fails loudly
    intercept[RuntimeException](
      eng.execute("CREATE INDEX x ON idocs ['body'] USING btree"))
  }

  test("51 DELETE ROWS: set-oriented pk delete — misses ignored, no-op burns no version") {
    eng.execute("CREATE CONTAINER drw ['id','v'] [BIGINT, BIGINT]")
    (1 to 4).foreach(i =>
      eng.execute(s"CREATE ROW ['id','v'] [$i, ${i * 10}] ON drw"))
    eng.execute("COMMIT drw")
    val v1 = eng.catalog.currentVersion("drw")
    eng.execute("DELETE ROWS (SEARCH [id] ON drw WHERE v >= 30) ON drw")
    assert(searchRows("SEARCH [id] ON drw").map(_.getLong(0)).sorted == Seq(1L, 2L))
    assert(eng.catalog.currentVersion("drw") == v1 + 1,
      "the removal is ONE atomic published version")
    // the (now-empty) removal list is an all-miss: nothing publishes
    eng.execute("DELETE ROWS (SEARCH [id] ON drw WHERE v >= 30) ON drw")
    assert(eng.catalog.currentVersion("drw") == v1 + 1,
      "an all-miss delete must not burn a version")
    // staged ops refuse (immediate set-oriented op, like MERGE ROWS)
    eng.execute("CREATE ROW ['id','v'] [9, 90] ON drw")
    intercept[IllegalArgumentException](
      eng.execute("DELETE ROWS (SEARCH [id] ON drw) ON drw"))
    eng.execute("ROLLBACK drw")
    // a multi-column subquery is a projection typo, not "use the first
    // column" — the MERGE ROWS arity discipline (r13 advice)
    val ar = intercept[ParseException](
      eng.execute("DELETE ROWS (SEARCH [id, v] ON drw) ON drw"))
    assert(ar.getMessage.contains("exactly one column"), ar.getMessage)
    eng.execute("DELETE CONTAINER drw")
    // a column that casts to NULL against the pk type fails loudly
    // instead of silently reporting 'no matching rows' (ANSI off)
    eng.execute("CREATE CONTAINER drt ['id','label'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['id','label'] [1,'abc'] ON drt")
    eng.execute("COMMIT drt")
    val ct = intercept[ParseException](
      eng.execute("DELETE ROWS (SEARCH [label] ON drt) ON drt"))
    assert(ct.getMessage.contains("does not cast"), ct.getMessage)
    eng.execute("DELETE CONTAINER drt")
  }

  test("35 unversioned external-data containers refuse MERGE ROWS/IMPORT/CLONE loudly") {
    eng.execute("CREATE CONTAINER extd ['id'] [BIGINT]")
    // simulate the legacy external layout: rows under dataPath, version 0
    import spark.implicits._
    Seq(1L, 2L).toDF("id").write.parquet(eng.catalog.dataPath("extd").toString)
    assert(eng.catalog.currentVersion("extd") == 0)
    assert(searchRows("SEARCH [] ON extd").size == 2, "external rows readable")
    // each statement's base-0 path would silently REPLACE those rows
    intercept[IllegalArgumentException](
      eng.execute("MERGE ROWS ['id'] (SEARCH [id] ON extd) ON extd"))
    intercept[IllegalArgumentException](
      eng.execute("CLONE CONTAINER extd extd2"))
    val io = java.nio.file.Files.createTempDirectory("graft-extd-io")
    eng.execute(s"EXPORT extd TO '$io/d'") // export is read-only: fine
    intercept[IllegalArgumentException](
      eng.execute(s"IMPORT '$io/d' INTO extd"))
    assert(searchRows("SEARCH [] ON extd").size == 2, "rows survived every refusal")
  }

  test("34 EXPORT/IMPORT round-trips a container through jsonl and csv") {
    val io = java.nio.file.Files.createTempDirectory("graft-io")
    eng.execute("CREATE CONTAINER exio ['id','txt','n'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute("CREATE ROW ['id','txt','n'] [1,'alpha',10] ON exio")
    eng.execute("CREATE ROW ['id','txt','n'] [2,'beta',20] ON exio")
    eng.execute("COMMIT exio")

    eng.execute(s"EXPORT exio TO '$io/d1'")
    eng.execute("CREATE CONTAINER exio2 ['id','txt','n'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute(s"IMPORT '$io/d1' INTO exio2")
    assert(searchRows("SEARCH [] ON exio2").map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((1L, "alpha", 10L), (2L, "beta", 20L)))

    // csv round-trip, and a second IMPORT appends (a new version)
    eng.execute(s"EXPORT exio TO '$io/d2' USING csv")
    eng.execute("CREATE CONTAINER exio3 ['id','txt','n'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute(s"IMPORT '$io/d2' INTO exio3 USING csv")
    assert(searchRows("SEARCH [count(id)] ON exio3").head.getLong(0) == 2L)
    eng.execute(s"IMPORT '$io/d1' INTO exio3")
    assert(searchRows("SEARCH [count(id)] ON exio3").head.getLong(0) == 4L)
    assert(eng.catalog.currentVersion("exio3") == 2, "each import is one commit")

    // an existing path is never clobbered; newline text refuses CSV
    intercept[Exception](eng.execute(s"EXPORT exio TO '$io/d1'"))
    eng.tx.stageInsert("exio",
      Seq(org.apache.spark.sql.Row(3L, "two\nlines", 30L)))
    eng.execute("COMMIT exio")
    intercept[ParseException](eng.execute(s"EXPORT exio TO '$io/d3' USING csv"))
    eng.execute(s"EXPORT exio TO '$io/d3'") // jsonl escapes newlines fine
    Seq("exio", "exio2", "exio3").foreach(c => eng.execute(s"DELETE CONTAINER $c"))
  }

  test("33 CLONE CONTAINER snapshots through AQL; clone and source diverge") {
    eng.execute("CREATE CONTAINER cl ['id','v'] [BIGINT, SMALL-STRING]")
    eng.execute("CREATE ROW ['id','v'] [1,'a'] ON cl")
    eng.execute("COMMIT cl")
    eng.execute("CLONE CONTAINER cl cl2")
    assert(searchRows("SEARCH [] ON cl2").map(_.getLong(0)) == Seq(1L))
    eng.execute("EDIT ROW ['v'] ['b'] ON cl2 WHERE id = 1")
    eng.execute("COMMIT cl2")
    assert(searchRows("SEARCH ['v'] ON cl").map(_.getString(0)) == Seq("a"))
    assert(searchRows("SEARCH ['v'] ON cl2").map(_.getString(0)) == Seq("b"))
    eng.execute("DELETE CONTAINER cl")
    eng.execute("DELETE CONTAINER cl2")
  }

  test("32 MERGE ROWS bulk-upserts a subquery on the pk, atomically") {
    eng.execute("CREATE CONTAINER bm ['id','v','n'] [BIGINT, SMALL-STRING, BIGINT]")
    (1L to 4L).foreach(i =>
      eng.execute(s"CREATE ROW ['id','v','n'] [$i,'v$i',${i * 10}] ON bm"))
    eng.execute("COMMIT bm")

    // self-referencing merge: bump n for ids < 3 (update path), shift two
    // pks out of range (insert path) — one statement each, both atomic
    eng.execute("MERGE ROWS ['id','n'] (SEARCH [id, n + 100] ON bm WHERE id < 3) ON bm")
    assert(eng.catalog.currentVersion("bm") == 2, "MERGE ROWS publishes its own version")
    val afterUpd = searchRows("SEARCH [] ON bm")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(afterUpd.toSet == Set((1L, "v1", 110L), (2L, "v2", 120L),
      (3L, "v3", 30L), (4L, "v4", 40L)), s"got $afterUpd")

    // a mixed projection lowers plain-then-computed (documented at
    // Ast.Search), so the positional column list follows that order:
    // output here is (n, id_plus_100) → cols ['n','id']
    eng.execute("MERGE ROWS ['n','id'] (SEARCH [id + 100, n] ON bm WHERE id = 1) ON bm")
    val ins = searchRows("SEARCH [] ON bm WHERE id = 101")
    assert(ins.size == 1 && ins.head.isNullAt(1) && ins.head.getLong(2) == 110L,
      "miss inserts with NULL unmentioned columns")

    // guards through the AQL surface
    intercept[ParseException](  // pk not mentioned
      eng.execute("MERGE ROWS ['n'] (SEARCH [n] ON bm) ON bm"))
    intercept[ParseException](  // arity mismatch
      eng.execute("MERGE ROWS ['id','n'] (SEARCH [id] ON bm) ON bm"))
    intercept[IllegalArgumentException] { // staged ops block the atomic merge
      eng.execute("CREATE ROW ['id','v','n'] [50,'x',1] ON bm")
      try eng.execute("MERGE ROWS ['id','n'] (SEARCH [id, n] ON bm WHERE id = 1) ON bm")
      finally eng.execute("ROLLBACK bm")
    }
  }

  test("31 MATCH serves BM25 search from a text index, maintained by commit") {
    eng.execute("CREATE CONTAINER ftd ['doc_id','body'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['doc_id','body'] [1,'spark query engine for big data'] ON ftd")
    eng.execute("CREATE ROW ['doc_id','body'] [2,'spark spark spark streams'] ON ftd")
    eng.execute("CREATE ROW ['doc_id','body'] [3,'a duckdb oracle for every query'] ON ftd")
    eng.execute("COMMIT ftd")

    // MATCH before any text index fails with a pointer to the DDL
    val noIx = intercept[ParseException](eng.execute("MATCH ['spark'] ON ftd"))
    assert(noIx.getMessage.contains("USING text"))

    eng.execute("CREATE INDEX ft ON ftd ['body'] USING text")
    val hits = searchRows("MATCH ['spark'] ON ftd")
    // highest tf in the shortest doc ranks first; doc 3 has no 'spark'
    assert(hits.map(_.getLong(0)) == Seq(2L, 1L))
    assert(hits.head.getDouble(1) > hits(1).getDouble(1))

    // multi-term query with LIMIT; n_terms counts matched distinct terms
    val q2 = searchRows("MATCH ['spark','oracle'] ON ftd LIMIT 2")
    assert(q2.size == 2 && q2.forall(_.getLong(2) >= 1L))

    // a committed insert is searchable immediately — same-commit maintenance
    eng.execute("CREATE ROW ['doc_id','body'] [4,'oracle oracle oracle'] ON ftd")
    eng.execute("COMMIT ftd")
    val afterIns = searchRows("MATCH ['oracle'] ON ftd")
    assert(afterIns.map(_.getLong(0)) == Seq(4L, 3L))

    // time-traveled search: v1 predates doc 4, so its index (self-healed
    // on demand) scores only doc 3 — with v1's N/avgdl, not the current
    val atV1 = searchRows("MATCH ['oracle'] ON ftd AT VERSION 1")
    assert(atV1.map(_.getLong(0)) == Seq(3L), s"got $atV1")

    // USING picks a named index; unknown name fails loudly
    assert(searchRows("MATCH ['oracle'] ON ftd USING ft").size == 2)
    intercept[ParseException](eng.execute("MATCH ['oracle'] ON ftd USING nope"))

    // MATCH ALL (round 14): conjunctive — only docs with EVERY term.
    // 'spark' hits {1,2}, 'query' hits {1,3}; the conjunction is {1}
    val allHits = searchRows("MATCH ALL ['spark','query'] ON ftd")
    assert(allHits.map(_.getLong(0)) == Seq(1L), s"got $allHits")
    assert(allHits.head.getLong(2) == 2L, "n_terms must equal the query size")
    // no doc holds all three → empty, not an error
    assert(searchRows("MATCH ALL ['spark','query','duckdb'] ON ftd").isEmpty)
    // repeated terms collapse: 'spark spark query' still means {spark, query}
    assert(searchRows("MATCH ALL ['spark','spark','query'] ON ftd")
      .map(_.getLong(0)) == Seq(1L))

    // MATCH PHRASE (round 14): token adjacency — doc 1 says 'spark
    // query engine', so 'query engine' hits it; doc 3 has 'query' but
    // never adjacent to 'engine'; CONTAINMENT is not adjacency: doc 2's
    // 'spark spark spark streams' serves 'spark spark' but 'spark
    // streams spark' matches nothing
    val ph = searchRows("MATCH PHRASE ['query engine'] ON ftd")
    assert(ph.map(_.getLong(0)) == Seq(1L), s"got $ph")
    assert(searchRows("MATCH PHRASE ['spark spark'] ON ftd")
      .map(_.getLong(0)) == Seq(2L))
    assert(searchRows("MATCH PHRASE ['engine query'] ON ftd").isEmpty,
      "order matters — reversed phrase must not match")
    // a phrase hit scores exactly like the same doc under plain MATCH
    // over the same terms (df keeps its corpus meaning)
    val plain = searchRows("MATCH ['query','engine'] ON ftd")
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ph.head.getDouble(1) == plain(1L),
      s"phrase score ${ph.head.getDouble(1)} != plain ${plain(1L)}")

    // WHERE (round 14): filters BEFORE the LIMIT, df untouched —
    // 'spark' hits {1,2}; doc_id > 1 keeps only doc 2, at its plain score
    val fw = searchRows("MATCH ['spark'] ON ftd WHERE doc_id > 1 LIMIT 1")
    val plainSpark = searchRows("MATCH ['spark'] ON ftd")
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fw.map(_.getLong(0)) == Seq(2L), s"got $fw")
    assert(fw.head.getDouble(1) == plainSpark(2L),
      "the WHERE must filter, never rescore")
    // ...and composes with ALL and PHRASE
    assert(searchRows("MATCH ALL ['spark','query'] ON ftd WHERE doc_id > 1").isEmpty)
    assert(searchRows("MATCH PHRASE ['query engine'] ON ftd WHERE doc_id > 1").isEmpty)

    // (MATCH …) as a SEARCH source: hits join back to their bodies on the
    // shared pk (USING-join semantics — one doc_id output column), and
    // WHERE/ORDER BY compose over the joined row
    val joined = searchRows(
      "SEARCH [doc_id, body] ON [(MATCH ['oracle'] ON ftd)] " +
        "JOIN ftd ON doc_id = doc_id WHERE bm25 > 0 ORDER BY [doc_id]")
    assert(joined.map(r => (r.getLong(0), r.getString(1))) ==
      Seq(3L -> "a duckdb oracle for every query", 4L -> "oracle oracle oracle"))
    // aggregation over hits
    val agg = searchRows("SEARCH [count(doc_id)] ON [(MATCH ['oracle'] ON ftd)]")
    assert(agg.head.getLong(0) == 2L)
    eng.execute("DELETE INDEX ft ON ftd")
  }

  test("48 FUSE: RRF over MATCH + SIMILAR SCORED in one statement; guards") {
    eng.execute("CREATE CONTAINER fz ['doc_id','body'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['doc_id','body'] [1,'alpha beta gamma delta words here today'] ON fz")
    eng.execute("CREATE ROW ['doc_id','body'] [2,'alpha beta gamma delta words here today'] ON fz")
    eng.execute("CREATE ROW ['doc_id','body'] [3,'alpha alpha alpha alpha alpha alpha alpha'] ON fz")
    eng.execute("COMMIT fz")
    eng.execute("CREATE INDEX ft ON fz ['body'] USING text")
    eng.execute("CREATE INDEX nd ON fz ['body'] USING lsh")

    val fused = searchRows("FUSE [(MATCH ['alpha'] ON fz), " +
      "(SIMILAR 1 ON fz USING nd SCORED)]")
    // schema: (pk, rrf, rank_1 … rank_N), ranks BIGINT like the SQL
    // window convention
    assert(fused.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "rrf", "rank_1", "rank_2"))
    // doc 2 is doc 1's only verbatim near-dup → cosine-side rank 1; every
    // doc matches 'alpha' on the BM25 side
    val byId = fused.map(r => r.getLong(0) ->
      (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(byId(2L)._2.contains(1L), s"got $byId")
    assert(byId.forall(_._2._1.isDefined), "all three docs carry a bm25 rank")
    // rrf ≡ Σ 1/(60+rank) with absent sides contributing 0 — recompute
    fused.foreach { r =>
      val expect = Seq(Option(r.get(2)), Option(r.get(3))).map {
        case Some(rank) => 1.0 / (60.0 + rank.asInstanceOf[Long])
        case None => 0.0
      }.reduce(_ + _)
      assert(math.abs(r.getDouble(1) -
        BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-12, s"rrf mismatch on row $r")
    }
    // ordering: rrf desc, pk asc
    assert(fused.map(_.getDouble(1)) == fused.map(_.getDouble(1)).sortBy(-_))
    // the fused ranking composes as a SEARCH source
    val src = searchRows("SEARCH [doc_id, rrf] ON [(FUSE [(MATCH ['alpha'] ON fz), " +
      "(SIMILAR 1 ON fz USING nd SCORED)])] WHERE rrf > 0.02")
    assert(src.nonEmpty && src.head.schema.fieldNames.toSeq == Seq("doc_id", "rrf"))
    // WEIGHTS reweight each side's contribution: w_i/(60+rank_i)
    val wfused = searchRows("FUSE [(MATCH ['alpha'] ON fz), " +
      "(SIMILAR 1 ON fz USING nd SCORED)] WEIGHTS [0.7, 0.3]")
    wfused.foreach { r =>
      val expect = Seq(Option(r.get(2)) -> 0.7, Option(r.get(3)) -> 0.3).map {
        case (Some(rank), w) => w / (60.0 + rank.asInstanceOf[Long])
        case (None, _) => 0.0
      }.reduce(_ + _)
      assert(math.abs(r.getDouble(1) -
        BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-12, s"weighted rrf mismatch on row $r")
    }
    // round-14 sides compose: a PHRASE match and a WHERE-filtered
    // SCORED similar fuse like any ranked sides — doc 3 has no
    // 'beta gamma' adjacency and doc 1 is predicate-excluded on the
    // vector side, so only doc 2 carries both ranks
    val f14 = searchRows("FUSE [(MATCH PHRASE ['beta gamma'] ON fz), " +
      "(SIMILAR 1 ON fz USING nd WHERE doc_id > 1 SCORED)]")
    val by14 = f14.map(r => r.getLong(0) ->
      (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(by14(2L)._1.isDefined && by14(2L)._2.isDefined, s"got $by14")
    assert(!by14.contains(3L), s"doc 3 has no phrase and no near-dup: $by14")
    // an unscored SIMILAR side has no ranking to fuse — loud reject
    val eUn = intercept[ParseException](eng.execute(
      "FUSE [(MATCH ['alpha'] ON fz), (SIMILAR 1 ON fz USING nd)]"))
    assert(eUn.getMessage.contains("SCORED"), eUn.getMessage)
    // sides must share one pk domain
    eng.execute("CREATE CONTAINER fz2 ['id','body'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['id','body'] [1,'alpha beta gamma'] ON fz2")
    eng.execute("COMMIT fz2")
    eng.execute("CREATE INDEX ft2 ON fz2 ['body'] USING text")
    val ePk = intercept[ParseException](eng.execute(
      "FUSE [(MATCH ['alpha'] ON fz), (MATCH ['alpha'] ON fz2)]"))
    assert(ePk.getMessage.contains("pk domain"), ePk.getMessage)
    // EXPLAIN narrates the fusion in the Access Path section
    val ex = eng.execute("EXPLAIN FUSE [(MATCH ['alpha'] ON fz), " +
      "(SIMILAR 1 ON fz USING nd SCORED)]").asInstanceOf[Engine.Done].message
    assert(ex.contains("Access Path") && ex.contains("RRF"), ex.take(400))
    Seq("fz", "fz2").foreach(c => eng.execute(s"DELETE CONTAINER $c"))
  }

  test("49 SHOW DEDUP: the funnel report served from a persisted band index") {
    eng.execute("CREATE CONTAINER ddc ['doc_id','body'] [BIGINT, TEXT]")
    val dup = "the quick brown fox jumps over the lazy dog"
    eng.execute(s"CREATE ROW ['doc_id','body'] [1,'$dup'] ON ddc")
    eng.execute(s"CREATE ROW ['doc_id','body'] [2,'$dup'] ON ddc")
    eng.execute("CREATE ROW ['doc_id','body'] [3,'pack my box with five dozen liquor jugs now'] ON ddc")
    eng.execute(s"CREATE ROW ['doc_id','body'] [4,'$dup'] ON ddc")
    eng.execute("COMMIT ddc")
    // no band index yet: loud pointer to the DDL
    val noIx = intercept[ParseException](eng.execute("SHOW DEDUP ddc"))
    assert(noIx.getMessage.contains("USING lsh|simhash"), noIx.getMessage)
    eng.execute("CREATE INDEX nd ON ddc ['body'] USING lsh")
    // docs 1/2/4 are one exact-dup family: every funnel stage sees them —
    // 3 docs in exact groups, 3 band-candidate docs, 3 verified, 1
    // cluster, 2 implied removals
    val rep = searchRows("SHOW DEDUP ddc USING nd")
    assert(rep.size == 1)
    val r = rep.head
    assert(r.schema.fieldNames.toSeq == Seq("n_docs", "exact_dup_docs",
      "candidate_docs", "verified_dup_docs", "n_clusters", "near_dup_removals"))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((4L, 3L, 3L, 3L, 1L, 2L)), s"got $r")
    // verbatim dups score Jaccard 1.0, so the strictest threshold keeps
    // them — the knob reaches the verify stage
    val strict = searchRows("SHOW DEDUP ddc USING nd THRESHOLD 1").head
    assert(strict.getLong(3) == 3L && strict.getLong(4) == 1L)
    // the simhash family serves the same funnel (identical text ⇒
    // identical signatures ⇒ hamming 0 ≥ any threshold)
    eng.execute("CREATE INDEX sh ON ddc ['body'] USING simhash")
    val shRep = searchRows("SHOW DEDUP ddc USING sh").head
    assert((shRep.getLong(0), shRep.getLong(3), shRep.getLong(4))
      == ((4L, 3L, 1L)), s"got $shRep")
    // with two band indexes the bare form demands USING
    val amb = intercept[ParseException](eng.execute("SHOW DEDUP ddc"))
    assert(amb.getMessage.contains("USING"), amb.getMessage)
    // a text index never serves SHOW DEDUP
    intercept[ParseException](eng.execute("SHOW DEDUP ddc USING nope"))
    // CLUSTERS: the decision detail — one cluster {1,2,4}, keeper 1
    // (equal lengths, lowest pk), the SAME pick DEDUP would apply
    val cl = searchRows("SHOW DEDUP ddc USING nd CLUSTERS")
    assert(cl.size == 1 && cl.head.schema.fieldNames.toSeq ==
      Seq("cluster_id", "n_docs", "keeper", "keeper_len"), s"got $cl")
    assert((cl.head.getLong(0), cl.head.getLong(1), cl.head.getLong(2))
      == ((1L, 3L, 1L)), s"got ${cl.head}")
    // AT VERSION: each version owns its index parts, so the funnel
    // time-travels — the pre-delete snapshot still reports 4 docs and
    // the 3-doc family, the current one the shrunken family
    eng.execute("DELETE ROW ON ddc WHERE doc_id = 4")
    eng.execute("COMMIT ddc")
    val now = searchRows("SHOW DEDUP ddc USING nd").head
    assert((now.getLong(0), now.getLong(3), now.getLong(5)) == ((3L, 2L, 1L)),
      s"got $now")
    val before = searchRows("SHOW DEDUP ddc AT VERSION 1 USING nd").head
    assert((before.getLong(0), before.getLong(3), before.getLong(5))
      == ((4L, 3L, 2L)), s"got $before")
    intercept[ParseException](
      eng.execute("SHOW DEDUP ddc AT VERSION 99 USING nd"))
    // EXPLAIN stays plan-only: the eager cluster loop is NOT lowered —
    // the Access Path narrates that it runs at statement execution
    val ex = eng.execute("EXPLAIN SHOW DEDUP ddc USING nd")
      .asInstanceOf[Engine.Done].message
    assert(ex.contains("Access Path") && ex.contains("cluster stage"),
      ex.take(400))
    eng.execute("DELETE CONTAINER ddc")
  }

  test("50 DEDUP applies the funnel decision: keeper stays, losers removed in one version") {
    eng.execute("CREATE CONTAINER ddap ['doc_id','body'] [BIGINT, TEXT]")
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    eng.execute(s"CREATE ROW ['doc_id','body'] [1,'$base'] ON ddap")
    eng.execute(s"CREATE ROW ['doc_id','body'] [2,'$base'] ON ddap")
    eng.execute("CREATE ROW ['doc_id','body'] [3,'completely different content about distributed query engines today'] ON ddap")
    // the LONGEST cluster member wins even with the highest pk
    eng.execute(s"CREATE ROW ['doc_id','body'] [5,'$base extended'] ON ddap")
    eng.execute("COMMIT ddap")
    eng.execute("CREATE INDEX nd ON ddap ['body'] USING lsh")
    val v1 = eng.catalog.currentVersion("ddap")
    val msg = eng.execute("DEDUP ddap USING nd").asInstanceOf[Engine.Done].message
    // cluster {1, 2, 5}: keeper = 5 (longest text), 1 and 2 removed
    assert(msg.contains("removed 2") && msg.contains("1 cluster"), msg)
    assert(searchRows("SEARCH [doc_id] ON ddap").map(_.getLong(0)).sorted
      == Seq(3L, 5L))
    assert(eng.catalog.currentVersion("ddap") == v1 + 1,
      "the removal is ONE atomic published version")
    // dry run ≡ wet run: the post-state funnel is clean
    val rep = searchRows("SHOW DEDUP ddap USING nd").head
    assert(rep.getLong(3) == 0L && rep.getLong(5) == 0L, s"got $rep")
    // idempotent: a second DEDUP removes nothing and publishes NOTHING
    val again = eng.execute("DEDUP ddap USING nd").asInstanceOf[Engine.Done].message
    assert(again.contains("nothing removed"), again)
    assert(eng.catalog.currentVersion("ddap") == v1 + 1,
      "a no-op dedup must not burn a version")
    // staged ops refuse (the set-oriented delete is immediate, like MERGE ROWS)
    eng.execute("CREATE ROW ['doc_id','body'] [9,'staged'] ON ddap")
    intercept[IllegalArgumentException](eng.execute("DEDUP ddap USING nd"))
    eng.execute("ROLLBACK ddap")
    eng.execute("DELETE CONTAINER ddap")
  }

  test("50b duplicate-pk corpus: the cluster keeper ranks ONCE — DEDUP never deletes its own keeper") {
    // a keeper pk committed twice (raw insert permits duplicate pks)
    // must collapse to ONE ranked row before the keeper ranking: two
    // rows would take _dd_rn 1 AND 2, land the keeper's own pk in the
    // loser set, and delete every row of the cluster head (r13 advice)
    eng.execute("CREATE CONTAINER dddp ['doc_id','body'] [BIGINT, TEXT]")
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    eng.execute(s"CREATE ROW ['doc_id','body'] [1,'$base'] ON dddp")
    eng.execute(s"CREATE ROW ['doc_id','body'] [1,'$base'] ON dddp")
    eng.execute(s"CREATE ROW ['doc_id','body'] [2,'$base'] ON dddp")
    eng.execute("COMMIT dddp")
    eng.execute("CREATE INDEX nd ON dddp ['body'] USING lsh")
    // CLUSTERS detail: one cluster {1,2}, keeper pk 1, reported once
    val cl = searchRows("SHOW DEDUP dddp USING nd CLUSTERS")
    assert(cl.size == 1 &&
      (cl.head.getLong(1), cl.head.getLong(2)) == ((2L, 1L)), s"got $cl")
    val msg = eng.execute("DEDUP dddp USING nd").asInstanceOf[Engine.Done].message
    assert(msg.contains("removed 1"), msg)
    // keeper pk 1 keeps BOTH its committed rows (dedup removes near-dup
    // cluster LOSERS by pk; exact duplicate-pk copies of the keeper are
    // the pk's rows, not cluster members); loser pk 2 is gone
    assert(searchRows("SEARCH [doc_id] ON dddp").map(_.getLong(0)).sorted
      == Seq(1L, 1L))
    eng.execute("DELETE CONTAINER dddp")
  }

  test("52 filtered ANN: SIMILAR WHERE applies before LIMIT, widening ivf probes until k matches") {
    // 10 vectors in 2 cells (axis = vid % 2); tag 'en' on {0, 1, 3} —
    // the nearest cell to an axis-0 query holds ONE 'en' row, so top-3
    // under WHERE tag='en' must widen the probe to the second cell
    eng.execute("CREATE CONTAINER fvec ['vid','tag','emb'] [BIGINT, TEXT, MEDIUM-BYTES]")
    import spark.implicits._
    val rows = (0L until 10L).map { i =>
      val axis = (i % 2).toInt
      (i, if (Set(0L, 1L, 3L).contains(i)) "en" else "xx",
        graft.functions.Float32Unpack.pack(
          (0 until 4).map(a => if (a == axis) 1f else 0f)))
    }
    eng.catalog.overwrite("fvec", rows.toDF("vid", "tag", "emb"))
    eng.execute("CREATE INDEX ann ON fvec ['emb'] USING ivf 2")
    // unfiltered: the nearest cell alone fills the LIMIT
    val plain = searchRows("SIMILAR [1.0, 0.0, 0.0, 0.0] ON fvec USING ann LIMIT 3 SCORED")
    assert(plain.size == 3 && plain.forall(_.getDouble(1) == 1.0), s"got $plain")
    // filtered: cell 0 has one 'en' row (vid 0) — the probe widens to
    // cell 1 and the statement still returns 3 (0 first, cosine 1.0)
    val filt = searchRows("SIMILAR [1.0, 0.0, 0.0, 0.0] ON fvec USING ann " +
      "WHERE tag = 'en' LIMIT 3 SCORED")
    assert(filt.map(_.getLong(0)) == Seq(0L, 1L, 3L), s"got $filt")
    assert(filt.head.getDouble(1) == 1.0 && filt(1).getDouble(1) == 0.0, s"got $filt")
    // the unscored form filters the same way (candidate set, pk-asc)
    val uf = searchRows("SIMILAR [1.0, 0.0, 0.0, 0.0] ON fvec USING ann " +
      "WHERE tag = 'en' LIMIT 3")
    assert(uf.map(_.getLong(0)) == Seq(0L, 1L, 3L), s"got $uf")
    // a predicate with fewer than LIMIT matches returns them all after
    // widening to every trained cell — never an error, never extras
    val few = searchRows("SIMILAR [1.0, 0.0, 0.0, 0.0] ON fvec USING ann " +
      "WHERE vid >= 9 LIMIT 5 SCORED")
    assert(few.map(_.getLong(0)) == Seq(9L), s"got $few")
    // the WHERE composes with INT8 lists: same widening, same filtered
    // set, exact refetched scores (one-hot components sit ON the grid)
    eng.execute("CREATE INDEX ann8 ON fvec ['emb'] USING ivf 2 INT8")
    val f8 = searchRows("SIMILAR [1.0, 0.0, 0.0, 0.0] ON fvec USING ann8 " +
      "WHERE tag = 'en' LIMIT 3 SCORED")
    assert(f8.map(r => (r.getLong(0), r.getDouble(1)))
      == filt.map(r => (r.getLong(0), r.getDouble(1))),
      s"int8 filtered must equal the float twin: $f8 vs $filt")
    eng.execute("DELETE CONTAINER fvec")
  }

  test("53 query-by-text SIMILAR: a string literal probes a band index as a document") {
    eng.execute("CREATE CONTAINER tdocs ['doc_id','body'] [BIGINT, TEXT]")
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank"
    eng.execute(s"CREATE ROW ['doc_id','body'] [1,'$base'] ON tdocs")
    eng.execute(s"CREATE ROW ['doc_id','body'] [2,'$base today'] ON tdocs")
    eng.execute("CREATE ROW ['doc_id','body'] [3,'pack my box with five dozen liquor jugs before noon arrives today'] ON tdocs")
    eng.execute("COMMIT tdocs")
    eng.execute("CREATE INDEX nd ON tdocs ['body'] USING lsh")
    eng.execute("CREATE INDEX sh ON tdocs ['body'] USING simhash")
    // the literal is a DOCUMENT (pk is BIGINT — a string can never be a
    // pk): exact copy scores 1.0 first, the one-word extension next
    val hits = searchRows(s"SIMILAR '$base' ON tdocs USING nd LIMIT 10 SCORED")
    assert(hits.nonEmpty && hits.head.getLong(0) == 1L &&
      hits.head.getDouble(1) == 1.0, s"got $hits")
    assert(!hits.map(_.getLong(0)).contains(3L), s"unrelated doc served: $hits")
    // unscored form: the collision candidate set, pk-asc
    val cands = searchRows(s"SIMILAR '$base' ON tdocs USING nd LIMIT 10")
    assert(cands.map(_.getLong(0)).contains(1L), s"got $cands")
    // WHERE filters the collision set before the LIMIT
    val filt = searchRows(
      s"SIMILAR '$base' ON tdocs USING nd WHERE doc_id > 1 LIMIT 10 SCORED")
    assert(!filt.map(_.getLong(0)).contains(1L), s"got $filt")
    // simhash twin serves the same quadrant
    val sh = searchRows(s"SIMILAR '$base' ON tdocs USING sh LIMIT 10 SCORED")
    assert(sh.nonEmpty && sh.head.getLong(0) == 1L &&
      sh.head.getDouble(1) == 1.0, s"got $sh")
    // a text literal can't probe an ivf index — the existing loud error
    eng.execute("DELETE CONTAINER tdocs")
  }

  test("54 DECONTAMINATE removes eval-overlapping docs atomically; SHOW is the dry run") {
    eng.execute("CREATE CONTAINER dcorp ['doc_id','body'] [BIGINT, TEXT]")
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    // doc 1 = the eval text verbatim (contamination 1.0); doc 2 = eval
    // text + tail (5 of 8 grams hit, 0.625); doc 3 unrelated (0.0);
    // doc 4 too short for a 4-gram (unmeasured — never removed)
    eng.execute(s"CREATE ROW ['doc_id','body'] [1,'$evalText'] ON dcorp")
    eng.execute(s"CREATE ROW ['doc_id','body'] [2,'$evalText and three more'] ON dcorp")
    eng.execute("CREATE ROW ['doc_id','body'] [3,'totally different content about query engines and spark pipelines today'] ON dcorp")
    eng.execute("CREATE ROW ['doc_id','body'] [4,'too short'] ON dcorp")
    eng.execute("COMMIT dcorp")
    eng.execute("CREATE CONTAINER deval ['eid','body'] [BIGINT, TEXT]")
    eng.execute(s"CREATE ROW ['eid','body'] [1,'$evalText'] ON deval")
    eng.execute("COMMIT deval")
    // dry run first: 4 docs, 3 measured, 2 past the 0.5 default, max 1.0
    val rep = searchRows("SHOW DECONTAMINATE dcorp AGAINST deval ON body").head
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getDouble(3))
      == ((4L, 3L, 2L, 1.0)), s"got $rep")
    // THRESHOLD 1 narrows the decision to verbatim containment
    val strict = searchRows(
      "SHOW DECONTAMINATE dcorp AGAINST deval ON body THRESHOLD 1").head
    assert(strict.getLong(2) == 1L, s"got $strict")
    // DOCS: the per-doc removal list — doc 1 (1.0) then doc 2 (0.625),
    // exactly what DECONTAMINATE deletes below, from the same funnel
    val detail = searchRows(
      "SHOW DECONTAMINATE dcorp AGAINST deval ON body DOCS")
    assert(detail.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_grams", "n_contaminated", "contamination"), detail.toString)
    assert(detail.map(r => (r.getLong(0), r.getDouble(3)))
      == Seq((1L, 1.0), (2L, 0.625)), s"got $detail")
    // the applied decision: docs 1 and 2 removed in ONE version
    val v1 = eng.catalog.currentVersion("dcorp")
    val msg = eng.execute("DECONTAMINATE dcorp AGAINST deval ON body")
      .asInstanceOf[Engine.Done].message
    assert(msg.contains("removed 2"), msg)
    assert(searchRows("SEARCH [doc_id] ON dcorp").map(_.getLong(0)).sorted
      == Seq(3L, 4L))
    assert(eng.catalog.currentVersion("dcorp") == v1 + 1)
    // idempotent: the second pass removes nothing and burns no version
    val again = eng.execute("DECONTAMINATE dcorp AGAINST deval ON body")
      .asInstanceOf[Engine.Done].message
    assert(again.contains("nothing removed"), again)
    assert(eng.catalog.currentVersion("dcorp") == v1 + 1)
    // guards: staged ops refuse; self-target refuses; non-text column
    // and unknown column fail loudly
    eng.execute("CREATE ROW ['doc_id','body'] [9,'staged'] ON dcorp")
    intercept[IllegalArgumentException](
      eng.execute("DECONTAMINATE dcorp AGAINST deval ON body"))
    eng.execute("ROLLBACK dcorp")
    intercept[ParseException](
      eng.execute("DECONTAMINATE dcorp AGAINST dcorp ON body"))
    intercept[ParseException](
      eng.execute("DECONTAMINATE dcorp AGAINST deval ON doc_id"))
    intercept[ParseException](
      eng.execute("DECONTAMINATE dcorp AGAINST deval ON nope"))
    eng.execute("DELETE CONTAINER dcorp")
    eng.execute("DELETE CONTAINER deval")
  }

  test("28 ALTER RENAME COLUMN is pure metadata; commits keep the stored name") {
    eng.execute("CREATE CONTAINER rn ['id','a','b'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute("CREATE ROW ['id','a','b'] [1,'x',10] ON rn")
    eng.execute("COMMIT rn") // v1 stores physical column 'a'

    eng.execute("ALTER CONTAINER rn RENAME COLUMN ['a','alpha']")
    assert(eng.catalog.get("rn").columns.map(_._1) == List("id", "alpha", "b"))
    // old name gone from the logical surface, values preserved under new
    intercept[Exception](searchRows("SEARCH ['a'] ON rn"))
    assert(searchRows("SEARCH ['id','alpha'] ON rn WHERE alpha = 'x'")
      .map(_.getLong(0)) == Seq(1L))

    // a post-rename insert commits under the PINNED stored name: every
    // file of the container matches one stored schema forever
    eng.execute("CREATE ROW ['id','alpha','b'] [2,'y',20] ON rn")
    eng.execute("COMMIT rn") // v2 = v1 file linked + new part
    val v2 = dir.resolve("data").resolve("rn@v2")
    val physical = spark.read.parquet(v2.toString).schema.fieldNames.toSet
    assert(physical == Set("id", "a", "b"),
      s"parquet must store the physical names, got $physical")
    assert(searchRows("SEARCH [] ON rn").map(r => (r.getLong(0), r.getString(1)))
      .toSet == Set((1L, "x"), (2L, "y")))

    // time travel reads old versions under the CURRENT logical names
    assert(searchRows("SEARCH ['alpha'] ON rn AT VERSION 1")
      .map(_.getString(0)) == Seq("x"))

    // rename collision + staged-op guard
    intercept[IllegalArgumentException](
      eng.execute("ALTER CONTAINER rn RENAME COLUMN ['alpha','b']"))
    eng.execute("CREATE ROW ['id','alpha','b'] [9,'z',0] ON rn")
    intercept[ParseException](
      eng.execute("ALTER CONTAINER rn RENAME COLUMN ['alpha','c']"))
    eng.execute("ROLLBACK rn")

    // schema round-trips through the catalog files across a restart
    val eng4 = new Engine(spark, dir.toString)
    assert(eng4.catalog.get("rn").columns.map(_._1) == List("id", "alpha", "b"))
    assert(eng4.catalog.get("rn").stored == List("id", "a", "b"))
  }

  test("29 ALTER DROP COLUMN narrows reads; re-ADD cannot resurrect dropped bytes") {
    eng.execute("CREATE CONTAINER dc ['id','keep','gone'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute("CREATE ROW ['id','keep','gone'] [1,'k',111] ON dc")
    eng.execute("COMMIT dc")

    // pk is protected; unknown rejected
    intercept[IllegalArgumentException](
      eng.execute("ALTER CONTAINER dc DROP COLUMN ['id']"))
    intercept[IllegalArgumentException](
      eng.execute("ALTER CONTAINER dc DROP COLUMN ['nope']"))

    eng.execute("ALTER CONTAINER dc DROP COLUMN ['gone']")
    assert(eng.catalog.get("dc").columns.map(_._1) == List("id", "keep"))
    intercept[Exception](searchRows("SEARCH ['gone'] ON dc"))
    // the bytes are still in the old file (lazy reclamation)…
    val v1 = dir.resolve("data").resolve("dc@v1")
    assert(spark.read.parquet(v1.toString).schema.fieldNames.contains("gone"))

    // …but re-adding the same NAME binds a FRESH stored column: the old
    // values must NOT come back
    eng.execute("ALTER CONTAINER dc ADD COLUMN ['gone'] [BIGINT]")
    val rows = searchRows("SEARCH [] ON dc").map(r =>
      (r.getLong(0), Option(r.get(2))))
    assert(rows == Seq((1L, None)),
      s"re-added column must read NULL for old rows, got $rows")
    // new writes land in the fresh stored column and read back
    eng.execute("CREATE ROW ['id','keep','gone'] [2,'m',222] ON dc")
    eng.execute("COMMIT dc")
    assert(searchRows("SEARCH ['id','gone'] ON dc WHERE gone = 222")
      .map(_.getLong(0)) == Seq(2L))

    // OPTIMIZE reclaims the dropped bytes by rewriting through the
    // narrowed schema
    eng.execute("OPTIMIZE dc")
    val cur = eng.catalog.currentVersion("dc")
    val phys = spark.read.parquet(
      dir.resolve("data").resolve(s"dc@v$cur").toString).schema.fieldNames.toSet
    assert(!phys.contains("gone") && phys.contains("gone__2"),
      s"optimize must drop tombstoned bytes and keep the fresh column, got $phys")
  }

  test("33 AQL keywords are reserved container names (clear error at CREATE, not query-time mystery)") {
    // the lexer uppercases keyword bare words, so a container named
    // 'changes' would be unreachable from unquoted AQL — rejected upfront
    val e = intercept[IllegalArgumentException](
      eng.execute("CREATE CONTAINER changes ['id'] [INT]"))
    assert(e.getMessage.contains("keyword"))
    intercept[IllegalArgumentException](
      eng.execute("CREATE CONTAINER 'versions' ['id'] [INT]"))
  }

  test("32 registerViews: spark.sql composes with the transactional read view") {
    // names with identifier-hostile chars sanitize instead of aborting
    // the sweep (container names allow '-' and '.'; view names don't)
    eng.execute("CREATE CONTAINER sql-dash ['id'] [INT]")
    assert(eng.registerViews().contains("graft_sql_dash"))
    assert(spark.sql("SELECT count(*) FROM graft_sql_dash").head().getLong(0) == 0)
    eng.execute("DELETE CONTAINER sql-dash")
    eng.execute("CREATE CONTAINER sqlv ['id','v'] [BIGINT, SMALL-STRING]")
    eng.execute("CREATE ROW ['id','v'] [1,'a'] ON sqlv")
    eng.execute("COMMIT sqlv")
    eng.execute("CREATE ROW ['id','v'] [2,'b'] ON sqlv") // staged, uncommitted
    val names = eng.registerViews()
    assert(names.contains("graft_sqlv"))
    // the view is the SESSION view: committed base plus staged ops
    assert(spark.sql("SELECT count(*) FROM graft_sqlv").head().getLong(0) == 2)
    // full SQL composes over it (join with an ad-hoc Spark relation)
    spark.sql("SELECT 1 AS id, 'x' AS tag").createOrReplaceTempView("adhoc")
    val joined = spark.sql(
      "SELECT v, tag FROM graft_sqlv JOIN adhoc USING (id)").collect()
    assert(joined.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "x")))
    // snapshot semantics: a later commit needs a re-register to surface
    eng.execute("COMMIT sqlv")
    eng.execute("CREATE ROW ['id','v'] [3,'c'] ON sqlv")
    eng.execute("COMMIT sqlv")
    eng.registerViews()
    assert(spark.sql("SELECT count(*) FROM graft_sqlv").head().getLong(0) == 3)
  }

  test("34 CREATE/REFRESH/DELETE VIEW: incremental MV lifecycle through AQL") {
    eng.execute("CREATE CONTAINER vsrc ['id','grp','amt'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute("CREATE ROW ['id','grp','amt'] [1,'a',10] ON vsrc")
    eng.execute("CREATE ROW ['id','grp','amt'] [2,'a',20] ON vsrc")
    eng.execute("CREATE ROW ['id','grp','amt'] [3,'b',5] ON vsrc")
    eng.execute("COMMIT vsrc")
    eng.execute(
      "CREATE VIEW vagg (SEARCH [grp, count(id), sum(amt)] ON vsrc WHERE amt > 1)")
    def mv(): Set[(String, Long, Long, Long)] =
      searchRows("SEARCH [] ON vagg")
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // seeded from the snapshot at creation
    assert(mv() == Set(("a", 2L, 2L, 30L), ("b", 1L, 1L, 5L)))

    // a group-moving edit, a delete, an insert — REFRESH folds the feed
    eng.execute("EDIT ROW ['grp'] ['b'] ON vsrc WHERE id = 2")
    eng.execute("DELETE ROW ON vsrc WHERE id = 3")
    eng.execute("CREATE ROW ['id','grp','amt'] [4,'c',7] ON vsrc")
    eng.execute("COMMIT vsrc")
    eng.execute("REFRESH VIEW vagg")
    assert(mv() == Set(("a", 1L, 1L, 10L), ("b", 1L, 1L, 20L), ("c", 1L, 1L, 7L)))
    // caught up: a second refresh applies nothing and changes nothing
    eng.execute("REFRESH VIEW vagg")
    assert(mv() == Set(("a", 1L, 1L, 10L), ("b", 1L, 1L, 20L), ("c", 1L, 1L, 7L)))

    // guards: non-maintainable shapes rejected; the MV container is
    // view-managed
    intercept[ParseException](
      eng.execute("CREATE VIEW v2 (SEARCH [grp] ON vsrc)")) // no aggregate
    intercept[ParseException](
      eng.execute("CREATE VIEW v3 (SEARCH [grp, count(DISTINCT id)] ON vsrc)"))
    intercept[ParseException](eng.execute("DELETE CONTAINER vagg"))
    intercept[IllegalArgumentException](eng.execute("REFRESH VIEW no_such"))

    eng.execute("DELETE VIEW vagg")
    assert(!eng.catalog.exists("vagg"))
  }

  test("35 view guards: MV containers and view sources are protected; SHOW VIEWS lists defs") {
    eng.execute("CREATE CONTAINER gsrc ['id','grp','amt'] [BIGINT, SMALL-STRING, BIGINT]")
    eng.execute("CREATE ROW ['id','grp','amt'] [1,'a',10] ON gsrc")
    eng.execute("COMMIT gsrc")
    eng.execute("CREATE VIEW gmv (SEARCH [grp, sum(amt)] ON gsrc WHERE amt > 1)")

    // writes/ALTERs to the MV container are refused — it is view-managed
    intercept[ParseException](
      eng.execute("CREATE ROW ['grp','n_rows','sum_amt'] ['z',9,9] ON gmv"))
    intercept[ParseException](eng.execute("EDIT ROW ['n_rows'] [0] ON gmv WHERE n_rows > 0"))
    intercept[ParseException](eng.execute("DELETE ROW ON gmv"))
    intercept[ParseException](eng.execute("MERGE ROW ['grp','n_rows','sum_amt'] ['z',1,1] ON gmv"))
    intercept[ParseException](eng.execute("ALTER CONTAINER gmv DROP COLUMN ['n_rows']"))

    // the SOURCE can't be dropped out from under the view
    val e = intercept[ParseException](eng.execute("DELETE CONTAINER gsrc"))
    assert(e.getMessage.contains("gmv"))

    // SHOW VIEWS lists the persisted, re-parseable definition plus
    // refresh-lag observability (checkpoint vs source version)
    val views = searchRows("SHOW VIEWS")
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(views.exists { case (v, d, ckpt, cur, behind) =>
      v == "gmv" && d.contains("SEARCH [grp, sum(amt)] ON gsrc WHERE amt > 1") &&
        ckpt == 1 && cur == 1 && behind == 0
    }, s"got $views")
    // a commit the view hasn't folded yet shows as lag
    eng.execute("CREATE ROW ['id','grp','amt'] [2,'a',3] ON gsrc")
    eng.execute("COMMIT gsrc")
    val lagged = searchRows("SHOW VIEWS").find(_.getString(0) == "gmv").get
    assert(lagged.getInt(4) == 1, s"expected behind=1, got $lagged")
    eng.execute("REFRESH VIEW gmv")
    assert(searchRows("SHOW VIEWS").find(_.getString(0) == "gmv").get.getInt(4) == 0)

    // colliding output names are rejected upfront, with no half-created view
    intercept[ParseException](
      eng.execute("CREATE VIEW gbad (SEARCH [grp, count(id), count(ID)] ON gsrc)"))
    assert(!eng.catalog.exists("gbad"))

    // a vacuum that would drop the view's resume point is refused with
    // the fix; after a REFRESH the same vacuum passes
    eng.execute("CREATE ROW ['id','grp','amt'] [3,'c',4] ON gsrc")
    eng.execute("COMMIT gsrc") // view now one version behind
    val ve = intercept[ParseException](eng.execute("VACUUM gsrc 1"))
    assert(ve.getMessage.contains("resume point"))
    eng.execute("REFRESH VIEW gmv")
    eng.execute("VACUUM gsrc 1")

    eng.execute("DELETE VIEW gmv")
    eng.execute("DELETE CONTAINER gsrc")
  }

  test("36 refresh_views_after_commit: every commit folds into dependent views automatically") {
    val dir2 = java.nio.file.Files.createTempDirectory("graft-autorefresh")
    java.nio.file.Files.writeString(dir2.resolve("settings.yaml"),
      "refresh_views_after_commit: true\n")
    val eng2 = new Engine(spark, dir2.toString)
    eng2.execute("CREATE CONTAINER asrc ['id','grp','amt'] [BIGINT, SMALL-STRING, BIGINT]")
    eng2.execute("CREATE ROW ['id','grp','amt'] [1,'a',10] ON asrc")
    eng2.execute("COMMIT asrc")
    eng2.execute("CREATE VIEW amv (SEARCH [grp, sum(amt)] ON asrc)")
    // a later commit reaches the view WITHOUT an explicit REFRESH
    eng2.execute("CREATE ROW ['id','grp','amt'] [2,'a',5] ON asrc")
    eng2.execute("CREATE ROW ['id','grp','amt'] [3,'b',7] ON asrc")
    eng2.execute("COMMIT asrc")
    val rows = eng2.execute("SEARCH [] ON amv").asInstanceOf[Engine.ResultSet]
      .df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("a", 2L, 15L), ("b", 1L, 7L)))
    // MERGE under auto-commit flows through the same hook
    eng2.tx.autoCommit = true
    eng2.execute("MERGE ROW ['id','grp','amt'] [3,'b',9] ON asrc")
    val rows2 = eng2.execute("SEARCH [] ON amv").asInstanceOf[Engine.ResultSet]
      .df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows2 == Set(("a", 2L, 15L), ("b", 1L, 9L)))

    // streamed ingest (Catalog.append, bypassing Tx) reaches views too
    import spark.implicits._
    eng2.catalog.append("asrc",
      Seq((4L, "c", 11L)).toDF("id", "grp", "amt"))
    val rowsS = eng2.execute("SEARCH [] ON amv").asInstanceOf[Engine.ResultSet]
      .df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rowsS == Set(("a", 2L, 15L), ("b", 1L, 9L), ("c", 1L, 11L)))

    // OPTIMIZE is content-neutral: the caught-up view checkpoint
    // fast-forwards past the compaction version instead of diffing a
    // full rewrite that nets zero
    def ckptOf(v: String): Int = java.nio.file.Files.readString(
      graft.catalog.Views.ckptFile(eng2.catalog, v)).trim.toInt
    val before = ckptOf("amv")
    eng2.execute("OPTIMIZE asrc")
    assert(ckptOf("amv") == eng2.catalog.currentVersion("asrc")
      && ckptOf("amv") > before)
    // and the MV content is unchanged
    val rows3 = eng2.execute("SEARCH [] ON amv").asInstanceOf[Engine.ResultSet]
      .df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows3 == rowsS)
  }

  test("31 catalog introspection: SHOW CONTAINERS / DESCRIBE / SHOW INDEXES / SHOW VERSIONS") {
    eng.execute("CREATE CONTAINER meta1 ['id','body'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['id','body'] [1,'the quick brown fox'] ON meta1")
    eng.execute("COMMIT meta1") // v1
    eng.execute("CREATE ROW ['id','body'] [2,'jumps over the dog'] ON meta1")
    eng.execute("COMMIT meta1") // v2
    eng.execute("CREATE INDEX nd ON meta1 ['body']")

    val containers = searchRows("SHOW CONTAINERS").map(_.getString(0))
    assert(containers.contains("meta1"))

    // DESCRIBE: ordinal schema positions, AlbaType names, pk flag on col 1
    val desc = searchRows("DESCRIBE meta1")
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(desc == Seq((1, "id", "BIGINT", true), (2, "body", "TEXT", false)))

    val ixs = searchRows("SHOW INDEXES meta1")
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(ixs == Seq(("nd", "lsh", "body")))

    // SHOW VERSIONS: one row per committed version, current flagged,
    // per-version file counts positive
    val vers = searchRows("SHOW VERSIONS meta1")
      .map(r => (r.getInt(0), r.getBoolean(1), r.getInt(2)))
    assert(vers.map(_._1) == Seq(1, 2))
    assert(vers.filter(_._2).map(_._1) == Seq(2), "only v2 is current")
    assert(vers.forall(_._3 > 0))

    // introspection statements page through the cursor protocol like any
    // SEARCH (metadata is a result set, not a Done message)
    assert(eng.execute("SHOW CONTAINERS").isInstanceOf[Engine.ResultSet])
    intercept[IllegalArgumentException](eng.execute("DESCRIBE no_such"))

    // SHOW CREATE CONTAINER: re-runnable DDL — replaying it on a fresh
    // database recreates the schema and its indexes exactly
    val ddl = searchRows("SHOW CREATE CONTAINER meta1")
      .sortBy(_.getInt(0)).map(_.getString(1))
    assert(ddl == Seq(
      "CREATE CONTAINER meta1 ['id', 'body'] [BIGINT, TEXT]",
      "CREATE INDEX nd ON meta1 ['body'] USING lsh"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-showcreate")
    val eng2 = new Engine(TestSpark.spark, dir2.toString)
    ddl.foreach(s => eng2.execute(s))
    assert(eng2.execute("DESCRIBE meta1").isInstanceOf[Engine.ResultSet])
    assert(eng2.catalog.indexDefs("meta1").map(d => (d.ix, d.kind, d.column)) ==
      Seq(("nd", "lsh", "body")))
  }

  test("39 EXPORT AT VERSION writes the committed snapshot, not the live view") {
    val dir2 = java.nio.file.Files.createTempDirectory("graft-expv")
    val eng2 = new Engine(TestSpark.spark, dir2.toString)
    eng2.execute("CREATE CONTAINER ex ['id','v'] [BIGINT, TEXT]")
    eng2.execute("CREATE ROW ['id','v'] [1, 'one'] ON ex")
    eng2.execute("COMMIT ex") // v1
    eng2.execute("EDIT ROW ['v'] ['uno'] ON ex WHERE id = 1")
    eng2.execute("CREATE ROW ['id','v'] [2, 'two'] ON ex")
    eng2.execute("COMMIT ex") // v2
    val out1 = dir2.resolve("backup-v1").toString
    val out2 = dir2.resolve("backup-now").toString
    eng2.execute(s"EXPORT ex AT VERSION 1 TO '$out1' USING parquet")
    eng2.execute(s"EXPORT ex TO '$out2' USING parquet")
    def read(p: String) = TestSpark.spark.read.parquet(p).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(read(out1) == Set((1L, "one")), "the snapshot export is pre-edit")
    assert(read(out2) == Set((1L, "uno"), (2L, "two")))
    // guards: missing version, unknown container, bounds
    intercept[IllegalArgumentException](
      eng2.execute(s"EXPORT ex AT VERSION 9 TO '${dir2.resolve("x")}'"))
    intercept[IllegalArgumentException](
      eng2.execute(s"EXPORT nope AT VERSION 1 TO '${dir2.resolve("y")}'"))
    intercept[ParseException](
      eng2.execute(s"EXPORT ex AT VERSION 0 TO '${dir2.resolve("z")}'"))
  }

  test("38 SHOW SETTINGS serves the normalized knobs; auth_token is redacted") {
    val dir2 = java.nio.file.Files.createTempDirectory("graft-showset")
    java.nio.file.Files.writeString(dir2.resolve(graft.catalog.Settings.FileName),
      "auth_token: s3cret\nanalyze_after_commits: -5\nindex_probe_cap: 4\n")
    val eng2 = new Engine(TestSpark.spark, dir2.toString)
    val rows = eng2.orderedResult(eng2.execute("SHOW SETTINGS")
      .asInstanceOf[Engine.ResultSet].cursorId).get.collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(rows("index_probe_cap") == "4")
    assert(rows("analyze_after_commits") == "0",
      "SHOW SETTINGS reports the NORMALIZED value, not the raw file text")
    assert(rows("auth_token") == "********", "credentials never echo")
    assert(rows("stats_distinct") == "exact")
    // SETTINGS stays a usable identifier (not reserved)
    eng.execute("CREATE CONTAINER settings ['id'] [BIGINT]")
    eng.execute("DELETE CONTAINER settings")
  }

  test("55 band SCORED past-cap fallback: the candidate fetch pins a shuffle-hash join") {
    // index_probe_cap 1 forces the fallback on ANY multi-candidate probe;
    // past the cap the collision cardinality is unknown, so the fetch
    // must NOT broadcast the candidate side (a pathological corpus can
    // share one band key across millions of docs) — shuffle-hash keeps
    // per-partition memory bounded at any cardinality (r13 judge)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bandcap")
    java.nio.file.Files.writeString(dir2.resolve(graft.catalog.Settings.FileName),
      "index_probe_cap: 1\n")
    val eng2 = new Engine(TestSpark.spark, dir2.toString)
    eng2.execute("CREATE CONTAINER bc ['doc_id','body'] [BIGINT, TEXT]")
    val base = "the quick brown fox jumps over the lazy dog near the river"
    (1 to 4).foreach(i =>
      eng2.execute(s"CREATE ROW ['doc_id','body'] [$i,'$base'] ON bc"))
    eng2.execute("COMMIT bc")
    eng2.execute("CREATE INDEX nd ON bc ['body'] USING lsh")
    val rs = eng2.execute("SIMILAR 1 ON bc USING nd LIMIT 10 SCORED")
      .asInstanceOf[Engine.ResultSet].df
    val plan = rs.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"past-cap candidate fetch must pin shuffle-hash, plan:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastHashJoin") ||
      plan.indexOf("ShuffledHashJoin") >= 0, plan.take(500))
    // results stay correct through the fallback: verbatim copies at 1.0
    val rows2 = rs.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows2.map(_._1).sorted == Seq(2L, 3L, 4L) &&
      rows2.forall(_._2 == 1.0), s"got $rows2")
  }

  test("56 round-14 plan shapes: broadcast eval grams, pruned postings, semi-join filtered ANN") {
    val dir2 = java.nio.file.Files.createTempDirectory("graft-r14plans")
    val eng2 = new Engine(TestSpark.spark, dir2.toString)
    eng2.execute("CREATE CONTAINER pc ['doc_id','body'] [BIGINT, TEXT]")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    (1 to 6).foreach(i =>
      eng2.execute(s"CREATE ROW ['doc_id','body'] [$i,'$base doc$i'] ON pc"))
    eng2.execute("COMMIT pc")
    eng2.execute("CREATE CONTAINER pe ['eid','body'] [BIGINT, TEXT]")
    eng2.execute(s"CREATE ROW ['eid','body'] [1,'$base'] ON pe")
    eng2.execute("COMMIT pe")
    // DECONTAMINATE funnel: the EVAL gram set is the broadcast side of
    // the hit join — the corpus side must never shuffle its grams for
    // the probe (an eval suite is MBs against a 100 TB corpus)
    val dp = eng2.execute("SHOW DECONTAMINATE pc AGAINST pe ON body")
      .asInstanceOf[Engine.ResultSet].df.queryExecution.executedPlan.toString
    assert(dp.contains("BroadcastHashJoin"),
      s"eval grams must broadcast into the hit join:\n${dp.take(1500)}")
    // MATCH PHRASE: the postings scan is pruned to the phrase's literal
    // terms (pushed In filter reaches the index parquet scan)
    eng2.execute("CREATE INDEX ft ON pc ['body'] USING text")
    val pp = eng2.execute("MATCH PHRASE ['alpha beta'] ON pc")
      .asInstanceOf[Engine.ResultSet].df.queryExecution.executedPlan.toString
    assert(pp.contains("PushedFilters") && pp.contains("alpha"),
      s"phrase postings scan must push the literal term list:\n${pp.take(1500)}")
    // filtered ANN: the predicate lands as a LEFT-SEMI join against the
    // pushed-filter snapshot scan — before the LIMIT, never after
    eng2.execute("CREATE CONTAINER pv ['vid','tag','emb'] [BIGINT, TEXT, MEDIUM-BYTES]")
    import spark.implicits._
    val rows = (0L until 8L).map { i =>
      (i, if (i % 2 == 0) "en" else "xx", graft.functions.Float32Unpack.pack(
        (0 until 4).map(a => if (a == (i % 2).toInt) 1f else 0f)))
    }
    eng2.catalog.overwrite("pv", rows.toDF("vid", "tag", "emb"))
    eng2.execute("CREATE INDEX ann ON pv ['emb'] USING ivf 2")
    val fp = eng2.execute(
      "SIMILAR [1.0, 0.0, 0.0, 0.0] ON pv USING ann WHERE tag = 'en' LIMIT 3 SCORED")
      .asInstanceOf[Engine.ResultSet].df.queryExecution.executedPlan.toString
    assert(fp.contains("LeftSemi"),
      s"the WHERE must filter candidates via a semi join:\n${fp.take(1500)}")
    assert(fp.contains("tag"), "the predicate must reach the snapshot scan")
    Seq("pc", "pe", "pv").foreach(c => eng2.execute(s"DELETE CONTAINER $c"))
  }

  test("37 fn_col output naming: same fn twice over one column is a clear reject") {
    // The derived output name ignores literal args (documented limitation:
    // one invocation per fn×column per projection), so two substr() items
    // over the same column would collide on `substr_text` — that must be a
    // parse-time duplicate-output error in BOTH the plain and the
    // aggregate projection paths, never an ambiguous default-sort /
    // ORDER BY reference downstream.
    val e1 = intercept[ParseException](
      eng.execute("SEARCH [substr(name 1 2), substr(name 3 2)] ON people"))
    assert(e1.getMessage.contains("Duplicate output columns"), e1.getMessage)
    val e2 = intercept[ParseException](
      eng.execute("SEARCH [round(score 1), round(score 0), count(id)] ON people"))
    assert(e2.getMessage.contains("Duplicate output columns"), e2.getMessage)
    // distinct columns keep working — the limitation is per fn×column
    assert(searchRows("SEARCH [id, substr(name 1 2)] ON people").nonEmpty)
  }

  test("40 approx_distinct aggregate: coupon-exact estimates; typed and arity rejects") {
    eng.execute("CREATE CONTAINER adx ['id','g','v','f'] [BIGINT, TEXT, BIGINT, FLOAT]")
    // duplicated values well under the HLL coupon-mode promotion, so the
    // DataSketches estimate is EXACT and the pin can be equality
    (1 to 40).foreach(i => eng.execute(
      s"CREATE ROW ['id','g','v','f'] [$i, '${if (i % 2 == 0) "a" else "b"}', " +
        s"${i % 9}, 1.5] ON adx"))
    eng.execute("COMMIT adx")
    val rows = searchRows("SEARCH [g, approx_distinct(v)] ON adx")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // g=a: even i → i%9 over 2,4,6,8,0,1,3,5,7 = 9 distinct; g=b: odd i
    assert(rows == Map("a" -> 9L, "b" -> 9L), s"got $rows")
    // global (no keys) form composes with other aggregates
    val g = searchRows("SEARCH [count(id), approx_distinct(g)] ON adx").head
    assert(g.getLong(0) == 40L && g.getLong(1) == 2L)
    // FLOAT columns are a clean reject (the sketch hashes int/long/
    // string/binary), as are arithmetic arguments
    val e1 = intercept[ParseException](
      eng.execute("SEARCH [g, approx_distinct(f)] ON adx"))
    assert(e1.getMessage.contains("INT/BIGINT/TEXT/BYTES"), e1.getMessage)
    val e2 = intercept[ParseException](
      eng.execute("SEARCH [g, approx_distinct(v + 1)] ON adx"))
    assert(e2.getMessage.contains("plain column"), e2.getMessage)
    eng.execute("DELETE CONTAINER adx")
  }

  test("42 approx_median / approx_quantile: exact below sketch capacity; rank and type rejects") {
    eng.execute("CREATE CONTAINER kqx ['id','g','v','t'] [BIGINT, TEXT, BIGINT, TEXT]")
    // g=a: {10,20,30,40,50}; g=b: {1,2,3,4} — below KLL capacity the
    // sketch retains every value, so the estimates are EXACT inclusive
    // order statistics and the pins can be equalities
    (1 to 5).foreach(i => eng.execute(
      s"CREATE ROW ['id','g','v','t'] [$i, 'a', ${i * 10}, 'x'] ON kqx"))
    (6 to 9).foreach(i => eng.execute(
      s"CREATE ROW ['id','g','v','t'] [$i, 'b', ${i - 5}, 'x'] ON kqx"))
    eng.execute("COMMIT kqx")
    val med = searchRows("SEARCH [g, approx_median(v)] ON kqx")
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: v⌈5/2⌉ = v3 = 30; b: v⌈4/2⌉ = v2 = 2
    assert(med == Map("a" -> 30.0, "b" -> 2.0), s"got $med")
    val p90 = searchRows("SEARCH [g, approx_quantile(v 0.9)] ON kqx")
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // inclusive rank ≥ 0.9: a → v5 = 50; b → v4 = 4
    assert(p90 == Map("a" -> 50.0, "b" -> 4.0), s"got $p90")
    // TWO ranks over one column coexist — the rank is part of the
    // output name (approx_quantile_v_p50 / _p90), so the duplicate-
    // output guard doesn't false-positive on the canonical p50+p90 ask
    val multi = eng.execute(
      "SEARCH [g, approx_quantile(v 0.5), approx_quantile(v 0.9)] ON kqx")
      .asInstanceOf[Engine.ResultSet]
    val mdf = eng.orderedResult(multi.cursorId).get
    assert(mdf.columns.toSeq ==
      Seq("g", "approx_quantile_v_p50", "approx_quantile_v_p90"))
    val byG = mdf.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byG == Map("a" -> ((30.0, 50.0)), "b" -> ((2.0, 4.0))), s"got $byG")
    // ...and both render from ONE sketch buffer: Catalyst dedupes the
    // semantically-equal kll_sketch_agg children, so adding ranks adds
    // projections, not aggregation state/CPU (pinned here so a lowering
    // change that breaks expression equality surfaces as a test failure)
    val mplan = mdf.queryExecution.executedPlan.toString
    assert("kll_sketch_agg".r.findAllIn(mplan).length == 2, // partial+final
      s"multi-rank SEARCH should build one shared sketch buffer:\n$mplan")
    // rejects: TEXT column, missing/out-of-range rank, arithmetic arg
    val e1 = intercept[ParseException](
      eng.execute("SEARCH [g, approx_median(t)] ON kqx"))
    assert(e1.getMessage.contains("numeric"), e1.getMessage)
    val e2 = intercept[ParseException](
      eng.execute("SEARCH [g, approx_quantile(v)] ON kqx"))
    assert(e2.getMessage.contains("literal rank"), e2.getMessage)
    val e3 = intercept[ParseException](
      eng.execute("SEARCH [g, approx_quantile(v 1.5)] ON kqx"))
    assert(e3.getMessage.contains("outside [0, 1]"), e3.getMessage)
    val e4 = intercept[ParseException](
      eng.execute("SEARCH [g, approx_median(v + 1)] ON kqx"))
    assert(e4.getMessage.contains("plain column"), e4.getMessage)
    // views: approx_quantile maintains at the definition's rank (the
    // IncrementalView path; fold semantics are pinned in
    // IncrementalViewSpec and the aql_view_approx_quantile oracle row),
    // and two ranks of one column coexist in one view (one sketch each)
    eng.execute("CREATE VIEW vq " +
      "(SEARCH [g, approx_quantile(v 0.5), approx_quantile(v 0.9)] ON kqx)")
    val vrows = searchRows(
      "SEARCH [g, approx_quantile_v_p50, approx_quantile_v_p90] ON vq")
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(vrows == Map("a" -> ((30.0, 50.0)), "b" -> ((2.0, 4.0))), s"got $vrows")
    // ...and they SHARE one persisted sketch (any rank renders from the
    // same KLL), not one `_sk` per rank
    val skCols = eng.catalog.get("vq").columns.map(_._1).filter(_.endsWith("_sk"))
    assert(skCols == List("approx_quantile_v_p50_sk"), s"got $skCols")
    eng.execute("DELETE VIEW vq")
    eng.execute("DELETE CONTAINER kqx")
  }

  test("47 approx_top_k: two k's of one column coexist (k-qualified names) and share one view sketch") {
    eng.execute("CREATE CONTAINER tkx ['id','g','s'] [BIGINT, TEXT, TEXT]")
    // g=a: x×3, y×2, z×1
    Seq("x", "x", "x", "y", "y", "z").zipWithIndex.foreach { case (v, i) =>
      eng.execute(s"CREATE ROW ['id','g','s'] [$i, 'a', '$v'] ON tkx") }
    eng.execute("COMMIT tkx")
    // the k is part of the output name (approx_top_k_s_k1 / _k3), so the
    // duplicate-output guard doesn't false-positive on top-1+top-3
    val rs = eng.execute(
      "SEARCH [g, approx_top_k(s 1), approx_top_k(s 3)] ON tkx")
      .asInstanceOf[Engine.ResultSet]
    val df = eng.orderedResult(rs.cursorId).get
    assert(df.columns.toSeq ==
      Seq("g", "approx_top_k_s_k1", "approx_top_k_s_k3"))
    val row = df.collect().map(r =>
      r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(row == Map("a" -> (("x:3", "x:3,y:2,z:1"))), s"got $row")
    // both renderings derive from ONE sketch buffer (Catalyst dedupes
    // the equal freq_sketch_agg children — same pin as the KLL share)
    val plan = df.queryExecution.executedPlan.toString
    assert("freq_sketch_agg".r.findAllIn(plan).length == 2, // partial+final
      s"multi-k SEARCH should build one shared sketch buffer:\n$plan")
    // views: one persisted `_sk` for the column (the owner's), both
    // renderings maintained from it
    eng.execute("CREATE VIEW vtk " +
      "(SEARCH [g, approx_top_k(s 1), approx_top_k(s 3)] ON tkx)")
    val skCols = eng.catalog.get("vtk").columns.map(_._1).filter(_.endsWith("_sk"))
    assert(skCols == List("approx_top_k_s_k1_sk"), s"got $skCols")
    // a fold window unions once into the shared sketch; both re-render
    eng.execute("CREATE ROW ['id','g','s'] [10, 'a', 'z'] ON tkx")
    eng.execute("CREATE ROW ['id','g','s'] [11, 'a', 'z'] ON tkx")
    eng.execute("CREATE ROW ['id','g','s'] [12, 'a', 'z'] ON tkx")
    eng.execute("COMMIT tkx")
    eng.execute("REFRESH VIEW vtk")
    val vrow = searchRows(
      "SEARCH [g, approx_top_k_s_k1, approx_top_k_s_k3] ON vtk")
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(vrow == Map("a" -> (("z:4", "z:4,x:3,y:2"))), s"got $vrow")
    eng.execute("DELETE VIEW vtk")
    eng.execute("DELETE CONTAINER tkx")
  }

  test("41 SHOW TAILS lists registered CDC consumers with lag; TAILS stays unreserved") {
    eng.execute("CREATE CONTAINER tl ['id'] [BIGINT]")
    eng.execute("CREATE ROW ['id'] [1] ON tl"); eng.execute("COMMIT tl") // v1
    val tail = graft.catalog.ChangeTail.registered(eng.catalog, "tl", "sink-a")
    tail.pollOnce((_, _, _) => ())
    eng.execute("CREATE ROW ['id'] [2] ON tl"); eng.execute("COMMIT tl") // v2
    val rows = searchRows("SHOW TAILS tl")
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(rows == Seq(("sink-a", 1, 2, 1)), s"got $rows")
    // a corrupt checkpoint surfaces as NULL (vacuum: keep-everything)
    java.nio.file.Files.writeString(
      eng.catalog.registerTail("tl", "sink-b"), "9x")
    val byId = searchRows("SHOW TAILS tl").map(r => r.getString(0) -> r).toMap
    assert(byId("sink-b").isNullAt(1) && byId("sink-b").isNullAt(3))
    assert(byId("sink-a").getInt(1) == 1)
    // TAILS stays a usable identifier (not reserved)
    eng.execute("CREATE CONTAINER tails ['id'] [BIGINT]")
    eng.execute("DELETE CONTAINER tails")
    eng.catalog.unregisterTail("tl", "sink-a")
    eng.catalog.unregisterTail("tl", "sink-b")
    eng.execute("DELETE CONTAINER tl")
  }

  test("44 enrichment-join views: AQL lifecycle, dim-commit reseed, guards") {
    eng.execute("CREATE CONTAINER jf ['id','nat','v'] [BIGINT, BIGINT, BIGINT]")
    eng.execute("CREATE CONTAINER jd ['nat','region'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['nat','region'] [1, 'EU'] ON jd")
    eng.execute("CREATE ROW ['nat','region'] [2, 'US'] ON jd")
    eng.execute("COMMIT jd")
    (1 to 4).foreach(i => eng.execute(
      s"CREATE ROW ['id','nat','v'] [$i, ${(i % 2) + 1}, ${i * 10}] ON jf"))
    eng.execute("COMMIT jf")
    eng.execute(
      "CREATE VIEW mvj (SEARCH [region, sum(v), min(v)] ON jf JOIN jd ON nat = nat)")
    def rows: Map[String, (Long, Long, Long)] =
      searchRows("SEARCH [] ON mvj").map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // nat 1 ← ids 2,4 (v 20,40); nat 2 ← ids 1,3 (v 10,30)
    assert(rows == Map("EU" -> (2L, 60L, 20L), "US" -> (2L, 40L, 10L)))
    // a fact window folds through the persisted definition (the viewdef
    // round-trips the JOIN clause)
    eng.execute("CREATE ROW ['id','nat','v'] [5, 1, 5] ON jf")
    eng.execute("COMMIT jf")
    eng.execute("REFRESH VIEW mvj")
    assert(rows == Map("EU" -> (3L, 65L, 5L), "US" -> (2L, 40L, 10L)))
    // a DIM commit reseeds on the next refresh (auto or explicit)
    eng.execute("EDIT ROW ['region'] ['NA'] ON jd WHERE nat = 1")
    eng.execute("COMMIT jd")
    eng.execute("REFRESH VIEW mvj")
    assert(rows == Map("NA" -> (3L, 65L, 5L), "US" -> (2L, 40L, 10L)))
    // ...and fact windows keep folding after the reseed
    eng.execute("DELETE ROW ON jf WHERE id = 1") // US loses its min
    eng.execute("COMMIT jf")
    eng.execute("REFRESH VIEW mvj")
    assert(rows == Map("NA" -> (3L, 65L, 5L), "US" -> (1L, 30L, 30L)))
    // a content-neutral dim OPTIMIZE must NOT reseed (a reseed would be
    // a fact-sized re-aggregation): the first refresh republishes the
    // aggregate-sized MV once to ADVANCE the stamp (releasing the old
    // dim version's vacuum floor), and later refreshes are no-ops
    eng.execute("OPTIMIZE jd 1 USING [nat]")
    val mvVerBefore = eng.catalog.currentVersion("mvj")
    eng.execute("REFRESH VIEW mvj")
    val mvVerAfter = eng.catalog.currentVersion("mvj")
    assert(mvVerAfter <= mvVerBefore + 1,
      "neutral dim compaction must restamp at most once, never reseed-loop")
    assert(rows == Map("NA" -> (3L, 65L, 5L), "US" -> (1L, 30L, 30L)))
    eng.execute("REFRESH VIEW mvj")
    assert(eng.catalog.currentVersion("mvj") == mvVerAfter,
      "the advanced stamp must make later refreshes no-ops")
    assert(rows == Map("NA" -> (3L, 65L, 5L), "US" -> (1L, 30L, 30L)))
    // SHOW VIEWS surfaces the dim drift: after the restamp it reads 0
    val sv = searchRows("SHOW VIEWS").find(_.getString(0) == "mvj").get
    assert(sv.getInt(5) == 0, s"expected dim_behind=0 after restamp, got $sv")
    // vacuum floors: the dim version the MV stamp pins stays readable
    // even when VACUUM asks for less (the enrichment's snapshot)
    val pinned = graft.catalog.IncrementalView
      .stampedDimVersion(eng.catalog, "mvj").get
    eng.execute("VACUUM jd 1")
    assert(eng.catalog.readVersion("jd", pinned).count() == 2,
      s"stamped dim version $pinned must survive VACUUM")
    // guards: the DIM is a protected source; outer joins, payload
    // collisions, and ALTERs that would CREATE a cross-side collision
    // are clean rejects (a collision surfacing only at refresh would be
    // swallowed by the auto-refresh hook — a silently frozen view)
    val eDrop = intercept[ParseException](eng.execute("DELETE CONTAINER jd"))
    assert(eDrop.getMessage.contains("mvj"), eDrop.getMessage)
    val eAddDim = intercept[ParseException](
      eng.execute("ALTER CONTAINER jd ADD COLUMN ['v'] [BIGINT]"))
    assert(eAddDim.getMessage.contains("collides across the join"), eAddDim.getMessage)
    val eAddFact = intercept[ParseException](
      eng.execute("ALTER CONTAINER jf ADD COLUMN ['region'] [TEXT]"))
    assert(eAddFact.getMessage.contains("collides across the join"), eAddFact.getMessage)
    // the fold's reserved working columns can't be ALTERed onto a
    // view-read container either (the freeze would only surface at the
    // next refresh, where the auto-refresh hook swallows it)
    val eAddW = intercept[ParseException](
      eng.execute("ALTER CONTAINER jf ADD COLUMN ['_w'] [BIGINT]"))
    assert(eAddW.getMessage.contains("working columns"), eAddW.getMessage)
    val eOuter = intercept[ParseException](eng.execute(
      "CREATE VIEW mvj2 (SEARCH [region, sum(v)] ON jf LEFT JOIN jd ON nat = nat)"))
    assert(eOuter.getMessage.contains("INNER"), eOuter.getMessage)
    eng.execute("CREATE CONTAINER jd2 ['nat','v'] [BIGINT, BIGINT]")
    val eColl = intercept[ParseException](eng.execute(
      "CREATE VIEW mvj3 (SEARCH [v, sum(v)] ON jf JOIN jd2 ON nat = nat)"))
    assert(eColl.getMessage.contains("collides"), eColl.getMessage)
    eng.execute("DELETE VIEW mvj")
    Seq("jf", "jd", "jd2").foreach(c => eng.execute(s"DELETE CONTAINER $c"))
  }

  test("45b enrichment views generalize past two dims (positional stamps at N=3)") {
    eng.execute("CREATE CONTAINER tf3 ['id','a','b','c','v'] " +
      "[BIGINT, BIGINT, BIGINT, BIGINT, BIGINT]")
    Seq(("td_a", "a", "an"), ("td_b", "b", "bn"), ("td_c", "c", "cn"))
      .foreach { case (t, k, p) =>
        eng.execute(s"CREATE CONTAINER $t ['$k','$p'] [BIGINT, TEXT]")
        eng.execute(s"CREATE ROW ['$k','$p'] [1, '${p}1'] ON $t")
        eng.execute(s"COMMIT $t")
      }
    eng.execute("CREATE ROW ['id','a','b','c','v'] [1, 1, 1, 1, 7] ON tf3")
    eng.execute("COMMIT tf3")
    eng.execute("CREATE VIEW mv3 (SEARCH [an, bn, cn, sum(v)] ON tf3 " +
      "JOIN td_a ON a = a JOIN td_b ON b = b JOIN td_c ON c = c)")
    def row = searchRows("SEARCH [] ON mv3").map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getLong(4))).head
    assert(row == (("an1", "bn1", "cn1", 7L)))
    assert(graft.catalog.IncrementalView
      .stampedDimVersions(eng.catalog, "mv3").contains(Seq(1, 1, 1)))
    // drift on the MIDDLE dim reseeds and advances only its position
    eng.execute("EDIT ROW ['bn'] ['bn2'] ON td_b WHERE b = 1")
    eng.execute("COMMIT td_b")
    eng.execute("REFRESH VIEW mv3")
    assert(row == (("an1", "bn2", "cn1", 7L)))
    assert(graft.catalog.IncrementalView
      .stampedDimVersions(eng.catalog, "mv3").contains(Seq(1, 2, 1)))
    eng.execute("DELETE VIEW mv3")
    Seq("tf3", "td_a", "td_b", "td_c").foreach(c =>
      eng.execute(s"DELETE CONTAINER $c"))
  }

  test("46 set operations: EXCEPT/INTERSECT [ALL] between SEARCHes; strict schema agreement") {
    eng.execute("CREATE CONTAINER seta ['k','v'] [BIGINT, TEXT]")
    eng.execute("CREATE CONTAINER setb ['k','v'] [BIGINT, TEXT]")
    // a: (1,x) (1,x) (2,y) (3,z); b: (1,x) (3,z) (3,z) (4,w)
    Seq((1, "x"), (1, "x"), (2, "y"), (3, "z")).foreach { case (k, v) =>
      eng.execute(s"CREATE ROW ['k','v'] [$k, '$v'] ON seta") }
    Seq((1, "x"), (3, "z"), (3, "z"), (4, "w")).foreach { case (k, v) =>
      eng.execute(s"CREATE ROW ['k','v'] [$k, '$v'] ON setb") }
    eng.execute("COMMIT seta")
    eng.execute("COMMIT setb")
    def rows(aql: String): Seq[(Long, String)] =
      searchRows(aql).map(r => (r.getLong(0), r.getString(1)))
    // set semantics dedupe; ALL keeps multiset counts
    assert(rows("(SEARCH [] ON seta) EXCEPT (SEARCH [] ON setb)")
      == Seq((2L, "y")))
    assert(rows("(SEARCH [] ON seta) EXCEPT ALL (SEARCH [] ON setb)")
      .sorted == Seq((1L, "x"), (2L, "y")))
    assert(rows("(SEARCH [] ON seta) INTERSECT (SEARCH [] ON setb)")
      .sorted == Seq((1L, "x"), (3L, "z")))
    assert(rows("(SEARCH [] ON setb) INTERSECT ALL (SEARCH [] ON setb)")
      .sorted == Seq((1L, "x"), (3L, "z"), (3L, "z"), (4L, "w")).sorted)
    // UNION dedupes; UNION ALL concatenates (no shuffle at all)
    assert(rows("(SEARCH [] ON seta) UNION (SEARCH [] ON setb)")
      .sorted == Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")).sorted)
    assert(rows("(SEARCH [] ON seta) UNION ALL (SEARCH [] ON setb)")
      .length == 8)
    // sides compose with full SEARCH clauses (WHERE, projection)
    assert(rows("(SEARCH [k, v] ON seta WHERE k >= 2) EXCEPT " +
      "(SEARCH [k, v] ON setb WHERE v = 'z')") == Seq((2L, "y")))
    // strict schema agreement (quirk-Q8 stance): mismatched columns or
    // types are an error, never a positional silent answer
    val eCols = intercept[ParseException](eng.execute(
      "(SEARCH [k] ON seta) EXCEPT (SEARCH [v] ON setb)"))
    assert(eCols.getMessage.contains("mismatched schemas"), eCols.getMessage)
    // EXPLAIN composes like any read statement
    val ex = eng.execute(
      "EXPLAIN (SEARCH [] ON seta) INTERSECT (SEARCH [] ON setb)")
      .asInstanceOf[Engine.Done].message
    assert(ex.contains("Physical Plan"), ex.take(200))
    // a set-op result composes as a SEARCH source (WHERE/projection/
    // aggregation over it), like any subquery container
    assert(rows("SEARCH [] ON [((SEARCH [] ON seta) EXCEPT ALL " +
      "(SEARCH [] ON setb))] WHERE k <= 2").sorted
      == Seq((1L, "x"), (2L, "y")))
    // ...and as a SHOW OVERLAP side
    val ov = searchRows("SHOW OVERLAP ((SEARCH [] ON seta) INTERSECT " +
      "(SEARCH [] ON setb)) setb ON k").head
    assert((ov.getLong(3), ov.getLong(4)) == ((2L, 3L)), ov.toString)
    // ...and as an IN membership subquery (single column, semi-join)
    assert(rows("SEARCH [] ON seta WHERE k IN " +
      "((SEARCH [k] ON seta) EXCEPT (SEARCH [k] ON setb))").sorted
      == Seq((2L, "y")))
    // ...and as a JOIN side (k ∈ both = {1,3}; seta multiplies by its dups)
    assert(rows("SEARCH [k, v] ON seta JOIN ((SEARCH [k] ON setb) " +
      "INTERSECT (SEARCH [k] ON seta)) ON k = k").sorted
      == Seq((1L, "x"), (1L, "x"), (3L, "z")))
    // plan shape: UNION ALL is a pure concatenation — no exchange at all
    val rawPlan = eng.execute(
      "EXPLAIN (SEARCH [] ON seta) UNION ALL (SEARCH [] ON setb)")
      .asInstanceOf[Engine.Done].message
    assert(!rawPlan.contains("Exchange"),
      s"UNION ALL must stay shuffle-free:\n$rawPlan")
    Seq("seta", "setb").foreach(c => eng.execute(s"DELETE CONTAINER $c"))
  }

  test("46b recursive set-op sides: chains execute; AT VERSION reaches nested leaves") {
    Seq("sca", "scb", "scc").foreach(c =>
      eng.execute(s"CREATE CONTAINER $c ['k'] [BIGINT]"))
    Seq(1, 2, 3).foreach(k => eng.execute(s"CREATE ROW ['k'] [$k] ON sca"))
    Seq(3, 4).foreach(k => eng.execute(s"CREATE ROW ['k'] [$k] ON scb"))
    eng.execute("CREATE ROW ['k'] [2] ON scc")
    Seq("sca", "scb", "scc").foreach(c => eng.execute(s"COMMIT $c"))
    def ks(aql: String): Seq[Long] = searchRows(aql).map(_.getLong(0)).sorted
    // left-nested: ({1,2,3} ∪ {3,4}) − {2} = {1,3,4}
    assert(ks("((SEARCH [] ON sca) UNION (SEARCH [] ON scb)) EXCEPT " +
      "(SEARCH [] ON scc)") == Seq(1L, 3L, 4L))
    // right-nested: {1,2,3} − ({3,4} ∩ {2}) = {1,2,3}
    assert(ks("(SEARCH [] ON sca) EXCEPT ((SEARCH [] ON scb) INTERSECT " +
      "(SEARCH [] ON scc))") == Seq(1L, 2L, 3L))
    // depth 3 with ALL levels mixed
    assert(ks("(((SEARCH [] ON sca) UNION ALL (SEARCH [] ON scb)) EXCEPT " +
      "(SEARCH [] ON scc)) INTERSECT (SEARCH [] ON sca)") == Seq(1L, 3L))
    // a chain composes as a SEARCH source, IN subquery, and JOIN side
    assert(ks("SEARCH [] ON [(((SEARCH [] ON sca) UNION (SEARCH [] ON scb))" +
      " EXCEPT (SEARCH [] ON scc))] WHERE k <= 3") == Seq(1L, 3L))
    assert(ks("SEARCH [] ON sca WHERE k IN (((SEARCH [k] ON sca) UNION " +
      "(SEARCH [k] ON scb)) EXCEPT (SEARCH [k] ON scc))") == Seq(1L, 3L))
    // outer AT VERSION reaches EVERY leaf of the nested tree (v2 of sca
    // adds 9; the source pinned AT VERSION 1 must not see it)...
    eng.execute("CREATE ROW ['k'] [9] ON sca")
    eng.execute("COMMIT sca")
    assert(ks("SEARCH [] ON [(((SEARCH [] ON sca) UNION (SEARCH [] ON scb))" +
      " EXCEPT (SEARCH [] ON scc))] AT VERSION 1") == Seq(1L, 3L, 4L))
    // ...and an explicit INNER leaf version wins over the outer pin
    assert(ks("SEARCH [] ON [(((SEARCH [] ON sca AT VERSION 2) UNION " +
      "(SEARCH [] ON scb)) EXCEPT (SEARCH [] ON scc))] AT VERSION 1")
      == Seq(1L, 3L, 4L, 9L))
    // EXPLAIN composes over a chain
    val ex = eng.execute("EXPLAIN ((SEARCH [] ON sca) UNION " +
      "(SEARCH [] ON scb)) EXCEPT (SEARCH [] ON scc)")
      .asInstanceOf[Engine.Done].message
    assert(ex.contains("Physical Plan"), ex.take(200))
    Seq("sca", "scb", "scc").foreach(c => eng.execute(s"DELETE CONTAINER $c"))
  }

  test("45 multi-dim enrichment views: star-schema AQL lifecycle, per-dim reseed, guards") {
    eng.execute("CREATE CONTAINER sf2 ['id','nat','src','v'] [BIGINT, BIGINT, BIGINT, BIGINT]")
    eng.execute("CREATE CONTAINER sd1 ['nat','region'] [BIGINT, TEXT]")
    eng.execute("CREATE CONTAINER sd2 ['src','tier'] [BIGINT, TEXT]")
    eng.execute("CREATE ROW ['nat','region'] [1, 'EU'] ON sd1")
    eng.execute("CREATE ROW ['nat','region'] [2, 'US'] ON sd1")
    eng.execute("COMMIT sd1")
    eng.execute("CREATE ROW ['src','tier'] [10, 'web'] ON sd2")
    eng.execute("CREATE ROW ['src','tier'] [20, 'book'] ON sd2")
    eng.execute("COMMIT sd2")
    // nat = (id%2)+1, src = 10 or 20 by id<=2: (1,1,10) (2,2,10) (3,1,20) (4,2,20)
    (1 to 4).foreach(i => eng.execute(
      s"CREATE ROW ['id','nat','src','v'] [$i, ${(i % 2) + 1}, ${if (i <= 2) 10 else 20}, ${i * 10}] ON sf2"))
    eng.execute("COMMIT sf2")
    eng.execute("CREATE VIEW mvs (SEARCH [region, tier, sum(v)] ON sf2 " +
      "JOIN sd1 ON nat = nat JOIN sd2 ON src = src)")
    def rows: Map[(String, String), (Long, Long)] =
      searchRows("SEARCH [] ON mvs").map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows == Map(("US", "web") -> (1L, 10L), ("EU", "web") -> (1L, 20L),
      ("US", "book") -> (1L, 30L), ("EU", "book") -> (1L, 40L)))
    // the viewdef round-trips BOTH joins; a fact window folds through both
    eng.execute("CREATE ROW ['id','nat','src','v'] [5, 1, 20, 5] ON sf2")
    eng.execute("COMMIT sf2")
    eng.execute("REFRESH VIEW mvs")
    assert(rows(("EU", "book")) == ((2L, 45L)))
    // the stamp is positional over both dims
    assert(graft.catalog.IncrementalView
      .stampedDimVersions(eng.catalog, "mvs").contains(Seq(1, 1)))
    // a SECOND-dim commit reseeds on the next refresh; dim1's stamp stays
    eng.execute("EDIT ROW ['tier'] ['audio'] ON sd2 WHERE src = 20")
    eng.execute("COMMIT sd2")
    // SHOW VIEWS reports the worst dim lag BEFORE the refresh
    val lag = searchRows("SHOW VIEWS").find(_.getString(0) == "mvs").get
    assert(lag.getInt(5) == 1, s"expected dim_behind=1 pre-refresh, got $lag")
    eng.execute("REFRESH VIEW mvs")
    assert(rows == Map(("US", "web") -> (1L, 10L), ("EU", "web") -> (1L, 20L),
      ("US", "audio") -> (1L, 30L), ("EU", "audio") -> (2L, 45L)))
    assert(graft.catalog.IncrementalView
      .stampedDimVersions(eng.catalog, "mvs").contains(Seq(1, 2)))
    // a FIRST-dim commit reseeds too
    eng.execute("EDIT ROW ['region'] ['NA'] ON sd1 WHERE nat = 2")
    eng.execute("COMMIT sd1")
    eng.execute("REFRESH VIEW mvs")
    assert(rows == Map(("NA", "web") -> (1L, 10L), ("EU", "web") -> (1L, 20L),
      ("NA", "audio") -> (1L, 30L), ("EU", "audio") -> (2L, 45L)))
    assert(graft.catalog.IncrementalView
      .stampedDimVersions(eng.catalog, "mvs").contains(Seq(2, 2)))
    // vacuum floor: EACH dim's stamped version stays readable
    eng.execute("VACUUM sd2 1")
    assert(eng.catalog.readVersion("sd2", 2).count() == 2)
    // a content-neutral OPTIMIZE on ONE dim must not reseed the
    // multi-dim view: the first refresh restamps once (advancing only
    // that dim's position), later refreshes are no-ops
    eng.execute("OPTIMIZE sd2 1 USING [src]")
    val mvVerBefore = eng.catalog.currentVersion("mvs")
    val contentBefore = rows
    eng.execute("REFRESH VIEW mvs")
    val mvVerAfter = eng.catalog.currentVersion("mvs")
    assert(mvVerAfter <= mvVerBefore + 1,
      "neutral compaction of one dim must restamp at most once")
    assert(rows == contentBefore)
    eng.execute("REFRESH VIEW mvs")
    assert(eng.catalog.currentVersion("mvs") == mvVerAfter,
      "the advanced multi-dim stamp must make later refreshes no-ops")
    assert(graft.catalog.IncrementalView
      .stampedDimVersions(eng.catalog, "mvs").contains(Seq(2, 3)),
      "only the compacted dim's stamp position advances")
    // guards: joining one dim twice is ambiguous; a payload collision
    // BETWEEN dims and an ALTER creating one are clean rejects
    val eTwice = intercept[ParseException](eng.execute(
      "CREATE VIEW mvs2 (SEARCH [region, sum(v)] ON sf2 " +
        "JOIN sd1 ON nat = nat JOIN sd1 ON src = nat)"))
    assert(eTwice.getMessage.contains("joins twice"), eTwice.getMessage)
    eng.execute("CREATE CONTAINER sd3 ['src','region'] [BIGINT, TEXT]")
    val eXDim = intercept[ParseException](eng.execute(
      "CREATE VIEW mvs3 (SEARCH [region, sum(v)] ON sf2 " +
        "JOIN sd1 ON nat = nat JOIN sd3 ON src = src)"))
    assert(eXDim.getMessage.contains("collides between"), eXDim.getMessage)
    val eAlter = intercept[ParseException](
      eng.execute("ALTER CONTAINER sd1 ADD COLUMN ['tier'] [TEXT]"))
    assert(eAlter.getMessage.contains("collides across the join"), eAlter.getMessage)
    eng.execute("DELETE VIEW mvs")
    Seq("sf2", "sd1", "sd2", "sd3").foreach(c => eng.execute(s"DELETE CONTAINER $c"))
  }

  test("43b SHOW OVERLAP BY: per-group sketch pairs, one-sided groups, type rejects") {
    eng.execute("CREATE CONTAINER gov_a ['id','grp'] [BIGINT, TEXT]")
    eng.execute("CREATE CONTAINER gov_b ['id','grp'] [BIGINT, TEXT]")
    // a: x←{1,2,3}, y←{1,2}; b: x←{2,3,4}, z←{7}
    Seq(1 -> "x", 2 -> "x", 3 -> "x", 1 -> "y", 2 -> "y").foreach { case (i, g) =>
      eng.execute(s"CREATE ROW ['id','grp'] [$i, '$g'] ON gov_a") }
    Seq(2 -> "x", 3 -> "x", 4 -> "x", 7 -> "z").foreach { case (i, g) =>
      eng.execute(s"CREATE ROW ['id','grp'] [$i, '$g'] ON gov_b") }
    val rows = searchRows("SHOW OVERLAP gov_a gov_b ON id BY grp")
      .map(r => r.getString(3) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8)))
      .toMap
    assert(rows("x") == ((2L, 4L, 1L, 1L, 0.5)))
    // one-sided groups still report: overlap with an absent side is 0
    assert(rows("y") == ((0L, 2L, 2L, 0L, 0.0)))
    assert(rows("z") == ((0L, 1L, 0L, 1L, 0.0)))
    assert(rows.keySet == Set("x", "y", "z"))
    // metadata columns keep the ungrouped shape
    val head = searchRows("SHOW OVERLAP gov_a gov_b ON id BY grp").head
    assert((head.getString(0), head.getString(1), head.getString(2)) ==
      (("gov_a", "gov_b", "id")))
    // sides compose with subqueries in the grouped form too — the BY
    // column just has to survive the side's projection
    val sq = searchRows("SHOW OVERLAP (SEARCH [id, grp] ON gov_a WHERE id > 1) " +
      "gov_b ON id BY grp").map(r => r.getString(3) -> r.getLong(4)).toMap
    // a∩{id>1}: x←{2,3}, y←{2}; b: x←{2,3,4}, z←{7} → x ∩ = 2
    assert(sq("x") == 2L && sq("y") == 0L && sq("z") == 0L, sq.toString)
    // group TYPES must agree across the sides — clean reject
    eng.execute("CREATE CONTAINER gov_t ['id','grp'] [BIGINT, BIGINT]")
    val eg = intercept[ParseException](
      eng.execute("SHOW OVERLAP gov_a gov_t ON id BY grp"))
    assert(eg.getMessage.contains("group types must agree"), eg.getMessage)
    // unknown BY column is named with its container
    val eu = intercept[ParseException](
      eng.execute("SHOW OVERLAP gov_a gov_b ON id BY nope"))
    assert(eu.getMessage.contains("unknown column"), eu.getMessage)
    // EXPLAIN composes: the grouped plan shows the partial sketch aggs
    val exp = eng.execute("EXPLAIN SHOW OVERLAP gov_a gov_b ON id BY grp")
      .asInstanceOf[Engine.Done].message
    assert(exp.contains("Physical Plan") &&
      exp.contains("partial_theta_sketch_agg"), exp.take(300))
    // a BY column named like a fixed output column would emit a
    // duplicate-name result that only crashes at page fetch — upfront reject
    eng.execute("CREATE CONTAINER gov_j ['id','jaccard'] [BIGINT, TEXT]")
    val ej = intercept[ParseException](
      eng.execute("SHOW OVERLAP gov_j gov_j ON id BY jaccard"))
    assert(ej.getMessage.contains("fixed output column"), ej.getMessage)
    Seq("gov_a", "gov_b", "gov_t", "gov_j").foreach(c =>
      eng.execute(s"DELETE CONTAINER $c"))
  }

  test("43c SHOW OVERLAP matrix: N-way pairs, BY compose, subquery labels, guards") {
    Seq("mov_a", "mov_b", "mov_c").foreach(c =>
      eng.execute(s"CREATE CONTAINER $c ['id','grp'] [BIGINT, TEXT]"))
    // a = {1,2,3}, b = {2,3,4}, c = {3,4,5}
    Seq(1, 2, 3).foreach(i => eng.execute(s"CREATE ROW ['id','grp'] [$i, 'x'] ON mov_a"))
    Seq(2, 3, 4).foreach(i => eng.execute(s"CREATE ROW ['id','grp'] [$i, 'x'] ON mov_b"))
    Seq(3, 4, 5).foreach(i => eng.execute(s"CREATE ROW ['id','grp'] [$i, 'x'] ON mov_c"))
    // commit the base rows: the BY case below stages + rolls back an
    // extra row, which must not take the fixture with it
    Seq("mov_a", "mov_b", "mov_c").foreach(c => eng.execute(s"COMMIT $c"))
    val rows = searchRows("SHOW OVERLAP [mov_a, mov_b, mov_c] ON id")
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // upper triangle only, labels in list order
    assert(rows.keySet == Set(("mov_a", "mov_b"), ("mov_a", "mov_c"),
      ("mov_b", "mov_c")))
    assert(rows(("mov_a", "mov_b")) == ((2L, 4L, 1L, 1L)))
    assert(rows(("mov_a", "mov_c")) == ((1L, 5L, 2L, 2L)))
    assert(rows(("mov_b", "mov_c")) == ((2L, 4L, 1L, 1L)))
    // BY composes: per-(pair, group) rows; a group on ONE side of a
    // pair still reports its exclusives for that pair
    eng.execute("CREATE ROW ['id','grp'] [9, 'y'] ON mov_a")
    val byRows = searchRows("SHOW OVERLAP [mov_a, mov_b, mov_c] ON id BY grp")
      .map(r => (r.getString(0), r.getString(1), r.getString(3)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(byRows((("mov_a", "mov_b", "x"))) == ((2L, 4L, 1L, 1L)))
    assert(byRows((("mov_a", "mov_b", "y"))) == ((0L, 1L, 1L, 0L)))
    assert(byRows((("mov_a", "mov_c", "y"))) == ((0L, 1L, 1L, 0L)))
    assert(byRows.keySet.count(_._3 == "y") == 2, "y touches only mov_a's pairs")
    eng.execute("ROLLBACK mov_a")
    // subquery sides get POSITIONAL labels (a repeated '(subquery)'
    // would be ambiguous in a matrix)
    val sq = searchRows("SHOW OVERLAP [mov_a, (SEARCH [id] ON mov_b WHERE id > 2), " +
      "(SEARCH [id] ON mov_c WHERE id > 3)] ON id")
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(sq.keySet == Set(("mov_a", "(subquery 1)"), ("mov_a", "(subquery 2)"),
      ("(subquery 1)", "(subquery 2)")))
    assert(sq(("mov_a", "(subquery 1)")) == 1L, sq.toString) // {1,2,3} ∩ {3,4}
    assert(sq(("(subquery 1)", "(subquery 2)")) == 1L, sq.toString) // {3,4} ∩ {4,5}
    // guards: ≥2 sources; family and group-type agreement
    intercept[ParseException](eng.execute("SHOW OVERLAP [mov_a] ON id"))
    eng.execute("CREATE CONTAINER mov_t ['id','grp'] [TEXT, TEXT]")
    val ef = intercept[ParseException](
      eng.execute("SHOW OVERLAP [mov_a, mov_t] ON grp BY id"))
    assert(ef.getMessage.contains("group types must agree"), ef.getMessage)
    val eh = intercept[ParseException](
      eng.execute("SHOW OVERLAP [mov_a, mov_b, mov_t] ON id"))
    assert(eh.getMessage.contains("hash domains"), eh.getMessage)
    // EXPLAIN composes and shows one partial sketch agg per source
    val exp = eng.execute("EXPLAIN SHOW OVERLAP [mov_a, mov_b, mov_c] ON id")
      .asInstanceOf[Engine.Done].message
    assert(exp.contains("Physical Plan") &&
      exp.contains("partial_theta_sketch_agg"), exp.take(300))
    Seq("mov_a", "mov_b", "mov_c", "mov_t").foreach(c =>
      eng.execute(s"DELETE CONTAINER $c"))
  }

  test("43 SHOW OVERLAP: exact set algebra below sketch capacity; domain and type rejects") {
    eng.execute("CREATE CONTAINER ov_a ['id','tag'] [BIGINT, TEXT]")
    eng.execute("CREATE CONTAINER ov_b ['id','tag'] [BIGINT, TEXT]")
    // A = {1..6}, B = {4..9}: ∩ = {4,5,6}, ∪ = {1..9} — exact regime,
    // and STAGED rows count (the statement reads the session view)
    (1 to 6).foreach(i => eng.execute(s"CREATE ROW ['id','tag'] [$i, 't$i'] ON ov_a"))
    (4 to 9).foreach(i => eng.execute(s"CREATE ROW ['id','tag'] [$i, 't$i'] ON ov_b"))
    val r = searchRows("SHOW OVERLAP ov_a ov_b ON id").head
    assert((r.getString(0), r.getString(1), r.getString(2)) == (("ov_a", "ov_b", "id")))
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((3L, 9L, 3L, 3L)))
    assert(math.abs(r.getDouble(7) - 3.0 / 9.0) < 1e-12)
    // TEXT columns hash by their UTF-8 bytes — same algebra
    val t = searchRows("SHOW OVERLAP ov_a ov_b ON tag").head
    assert((t.getLong(3), t.getLong(4)) == ((3L, 9L)))
    // an EMPTY side: overlap with nothing is nothing, B's set survives
    eng.execute("CREATE CONTAINER ov_e ['id'] [BIGINT]")
    val e = searchRows("SHOW OVERLAP ov_e ov_b ON id").head
    assert((e.getLong(3), e.getLong(4), e.getLong(5), e.getLong(6),
      e.getDouble(7)) == ((0L, 6L, 0L, 6L, 0.0)))
    // a SUBQUERY side: filtered overlap without materializing anything —
    // A∩{id>3} = {4,5,6} against B = {4..9}
    val sq = searchRows(
      "SHOW OVERLAP (SEARCH [id] ON ov_a WHERE id > 3) ov_b ON id").head
    assert(sq.getString(0) == "(subquery)" && sq.getString(1) == "ov_b")
    assert((sq.getLong(3), sq.getLong(4), sq.getLong(5), sq.getLong(6)) ==
      ((3L, 6L, 0L, 3L)))
    // a VERSIONED side: churn between v1 (committed = {1..6}) and the
    // session view of b — time travel composes like any SEARCH source
    eng.execute("COMMIT ov_a"); eng.execute("COMMIT ov_b") // v1 each
    eng.execute("CREATE ROW ['id','tag'] [10, 't10'] ON ov_a")
    eng.execute("COMMIT ov_a") // v2 = {1..6, 10}
    val tt = searchRows(
      "SHOW OVERLAP (SEARCH [id] ON ov_a AT VERSION 1) ov_a ON id").head
    // v1 ⊂ v2: intersect 6, union 7, a_only 0, b_only 1
    assert((tt.getLong(3), tt.getLong(4), tt.getLong(5), tt.getLong(6)) ==
      ((6L, 7L, 0L, 1L)))
    // a CDC-feed side: ids TOUCHED between v1 and v2 ({10}) vs the
    // current ids — "how much of the corpus did this window touch"
    val fd = searchRows("SHOW OVERLAP (CHANGES ov_a 1 2) ov_a ON id").head
    assert((fd.getLong(3), fd.getLong(4), fd.getLong(5), fd.getLong(6)) ==
      ((1L, 7L, 0L, 6L)))
    // cross-family domains never collide — a clean reject, not silent 0
    eng.execute("CREATE CONTAINER ov_t ['id'] [TEXT]")
    val ex = intercept[ParseException](eng.execute("SHOW OVERLAP ov_a ov_t ON id"))
    assert(ex.getMessage.contains("hash domains"), ex.getMessage)
    // FLOAT columns are not theta-hashable — a clean reject
    eng.execute("CREATE CONTAINER ov_f ['id'] [FLOAT]")
    val ef = intercept[ParseException](eng.execute("SHOW OVERLAP ov_f ov_f ON id"))
    assert(ef.getMessage.contains("INT/BIGINT/TEXT/BYTES"), ef.getMessage)
    // unknown column is named with its container
    val eu = intercept[ParseException](eng.execute("SHOW OVERLAP ov_a ov_b ON nope"))
    assert(eu.getMessage.contains("unknown column"), eu.getMessage)
    Seq("ov_a", "ov_b", "ov_e", "ov_t", "ov_f").foreach(c =>
      eng.execute(s"DELETE CONTAINER $c"))
  }
}
