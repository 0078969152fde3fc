package graft.aql

import org.scalatest.funsuite.AnyFunSuite
import Ast._

class ParserSpec extends AnyFunSuite {

  test("CREATE CONTAINER with names and types") {
    val stmt = Parser.parse("CREATE CONTAINER users ['id','name'] [BIGINT, SMALL-STRING]")
    assert(stmt == CreateContainer("users", List("id", "name"),
      List(AlbaType.ABigint, AlbaType.AString("SMALL-STRING", 100))))
  }

  test("CREATE CONTAINER rejects duplicate and mismatched columns") {
    intercept[ParseException](
      Parser.parse("CREATE CONTAINER c ['a','a'] [INT, INT]"))
    intercept[ParseException](
      Parser.parse("CREATE CONTAINER c ['a','b'] [INT]"))
  }

  test("CREATE ROW positional form") {
    val stmt = Parser.parse("CREATE ROW ['id','name'] [1, 'ana'] ON users")
    assert(stmt == CreateRow("users", List("id", "name"),
      List(Token.IntLit(1), Token.Str("ana"))))
  }

  test("ALTER DROP/RENAME COLUMN forms") {
    assert(Parser.parse("ALTER CONTAINER c DROP COLUMN ['a','b']")
      == AlterDropColumn("c", List("a", "b")))
    assert(Parser.parse("ALTER CONTAINER c RENAME COLUMN ['old','new']")
      == AlterRenameColumn("c", "old", "new"))
    intercept[ParseException](
      Parser.parse("ALTER CONTAINER c DROP COLUMN []"))
    intercept[ParseException](
      Parser.parse("ALTER CONTAINER c RENAME COLUMN ['only']"))
  }

  test("CREATE/DELETE INDEX forms") {
    assert(Parser.parse("CREATE INDEX nd ON docs ['body']")
      == CreateIndex("docs", "nd", "body", "lsh"))
    assert(Parser.parse("CREATE INDEX nd ON docs ['body'] USING lsh")
      == CreateIndex("docs", "nd", "body", "lsh"))
    assert(Parser.parse("DELETE INDEX nd ON docs") == DeleteIndex("docs", "nd"))
    // composite column lists PARSE (comma-joined); the value kind accepts
    // them and every other kind rejects at create, where the kind is known
    assert(Parser.parse("CREATE INDEX cq ON docs ['a','b'] USING value")
      == CreateIndex("docs", "cq", "a,b", "value"))
    intercept[ParseException](Parser.parse("CREATE INDEX nd ON docs []"))
    // USING ivf <k> — the centroid-count knob (range-checked here,
    // ivf-only-ness checked at create where the kind is known)
    assert(Parser.parse("CREATE INDEX ann ON docs ['emb'] USING ivf 64")
      == CreateIndex("docs", "ann", "emb", "ivf", Some(64)))
    intercept[ParseException](
      Parser.parse("CREATE INDEX ann ON docs ['emb'] USING ivf 1"))
    intercept[ParseException](
      Parser.parse("CREATE INDEX ann ON docs ['emb'] USING ivf 5000"))
    // INT8 — the SQ8 quantized-list flag (round 14), trailing like SCORED;
    // composes with and without the k knob (ivf-only-ness checks at create)
    assert(Parser.parse("CREATE INDEX ann ON docs ['emb'] USING ivf 64 INT8")
      == CreateIndex("docs", "ann", "emb", "ivf", Some(64), int8 = true))
    assert(Parser.parse("CREATE INDEX ann ON docs ['emb'] USING ivf int8")
      == CreateIndex("docs", "ann", "emb", "ivf", None, int8 = true))
    // directly after USING the word is an index KIND named int8 (rejected
    // at create as unknown), not the flag — the USING-slot rule SCORED uses
    assert(Parser.parse("CREATE INDEX x ON docs ['emb'] USING int8")
      == CreateIndex("docs", "x", "emb", "int8"))
    assert(Parser.parse("REBUILD INDEX nd ON docs") == RebuildIndex("docs", "nd"))
    // text options (round 15): ANALYZER and WITHOUT POSITIONS, any order,
    // each once (text-only-ness checks at create, where the kind is known)
    assert(Parser.parse("CREATE INDEX ft ON docs ['body'] USING text ANALYZER standard")
      == CreateIndex("docs", "ft", "body", "text", analyzer = Some("standard")))
    assert(Parser.parse(
      "CREATE INDEX ft ON docs ['body'] USING text WITHOUT POSITIONS")
      == CreateIndex("docs", "ft", "body", "text", noPositions = true))
    assert(Parser.parse("CREATE INDEX ft ON docs ['body'] USING text " +
      "ANALYZER standard WITHOUT POSITIONS")
      == CreateIndex("docs", "ft", "body", "text",
        analyzer = Some("standard"), noPositions = true))
    assert(Parser.parse("CREATE INDEX ft ON docs ['body'] USING text " +
      "WITHOUT POSITIONS analyzer Standard")
      == CreateIndex("docs", "ft", "body", "text",
        analyzer = Some("standard"), noPositions = true))
    intercept[ParseException](Parser.parse(
      "CREATE INDEX ft ON docs ['body'] USING text ANALYZER"))
    intercept[ParseException](Parser.parse(
      "CREATE INDEX ft ON docs ['body'] USING text WITHOUT"))
    intercept[ParseException](Parser.parse(
      "CREATE INDEX ft ON docs ['body'] USING text ANALYZER a ANALYZER b"))
  }

  test("MERGE ROWS forms (bulk upsert extension)") {
    val s = Parser.parse("MERGE ROWS ['id','n'] (SEARCH [id, n] ON src WHERE id < 3) ON dst")
    assert(s.isInstanceOf[MergeRows])
    val m = s.asInstanceOf[MergeRows]
    assert(m.container == "dst" && m.colNames == List("id", "n"))
    assert(m.query.containers.nonEmpty)
    intercept[ParseException](
      Parser.parse("MERGE ROWS [] (SEARCH [] ON s) ON dst"))
    intercept[ParseException](
      Parser.parse("MERGE ROWS ['a','a'] (SEARCH [] ON s) ON dst"))
    intercept[ParseException](
      Parser.parse("MERGE ROWS ['a'] (COMMIT) ON dst"))
  }

  test("MATCH forms (full-text search extension)") {
    assert(Parser.parse("MATCH ['dup','vector'] ON docs")
      == Match("docs", List("dup", "vector"), None, 20))
    assert(Parser.parse("MATCH ['dup'] ON docs USING ft LIMIT 5")
      == Match("docs", List("dup"), Some("ft"), 5))
    assert(Parser.parse("MATCH ['dup'] ON docs AT VERSION 2 USING ft")
      == Match("docs", List("dup"), Some("ft"), 20, Some(2)))
    assert(Parser.parse("SIMILAR 1 ON docs AT VERSION 3")
      == Similar("docs", Token.IntLit(1), None, 20, Some(3)))
    intercept[ParseException](Parser.parse("MATCH ['x'] ON docs AT 2"))
    intercept[ParseException](Parser.parse("MATCH [] ON docs"))
    // MATCH ALL (round 14) — the conjunctive flag, unreserved like PROBE
    assert(Parser.parse("MATCH ALL ['a','b'] ON docs LIMIT 5")
      == Match("docs", List("a", "b"), None, 5, None, all = true))
    assert(Parser.parse("match all ['a'] ON docs")
      == Match("docs", List("a"), None, 20, None, all = true))
    intercept[ParseException](Parser.parse("MATCH ALL [] ON docs"))
    // MATCH PHRASE (round 14) — ONE quoted phrase, split to ordered
    // lowercase tokens at parse time
    assert(Parser.parse("MATCH PHRASE ['Merge  Key'] ON docs LIMIT 5")
      == Match("docs", List("merge", "key"), None, 5, None, phrase = true))
    intercept[ParseException](Parser.parse("MATCH PHRASE ['a','b'] ON docs"))
    intercept[ParseException](Parser.parse("MATCH PHRASE ['single'] ON docs"))
    intercept[ParseException](Parser.parse("MATCH PHRASE [] ON docs"))
    intercept[ParseException](Parser.parse("MATCH ['x'] ON docs LIMIT 0"))
    intercept[ParseException](Parser.parse("MATCH ['x'] ON docs EXTRA"))
  }

  test("EXPORT/IMPORT forms (corpus interchange extension)") {
    assert(Parser.parse("EXPORT docs TO '/tmp/x'") == Export("docs", "/tmp/x", "jsonl"))
    assert(Parser.parse("EXPORT docs TO '/tmp/x' USING csv") == Export("docs", "/tmp/x", "csv"))
    assert(Parser.parse("IMPORT '/tmp/x' INTO docs USING orc") == Import("/tmp/x", "docs", "orc"))
    intercept[ParseException](Parser.parse("EXPORT docs TO '/tmp/x' USING xml"))
  }

  test("CLONE CONTAINER form (shallow clone extension)") {
    assert(Parser.parse("CLONE CONTAINER a b") == CloneContainer("a", "b"))
    intercept[ParseException](Parser.parse("CLONE CONTAINER a"))
  }

  test("multi-argument scalar functions parse with validated literals") {
    val s = Parser.parse("SEARCH [a, substr(t 1 20), replace(t 'x' 'y'), round(n 2)] ON c")
      .asInstanceOf[Search]
    assert(s.fns.map(f => (f.fn, f.args.length)) ==
      List(("substr", 2), ("replace", 2), ("round", 1)))
    intercept[ParseException](Parser.parse("SEARCH [substr(t 1)] ON c"))
    intercept[ParseException](Parser.parse("SEARCH [substr(t 0 5)] ON c"))
    intercept[ParseException](Parser.parse("SEARCH [replace(t 'x' 1)] ON c"))
    intercept[ParseException](Parser.parse("SEARCH [round(n 99)] ON c"))
    intercept[ParseException](Parser.parse("SEARCH [lower(t 'x')] ON c"))
    assert(Parser.parse("SEARCH [coalesce(t 'none')] ON c").asInstanceOf[Search]
      .fns.head.args == List(Token.Str("none")))
    intercept[ParseException](Parser.parse("SEARCH [coalesce(t)] ON c"))
  }

  test("literal IN list predicates (list-membership extension)") {
    val s = Parser.parse("SEARCH [a] ON c WHERE a IN [1, 2] AND b NOT IN ['x']")
      .asInstanceOf[Search]
    val w = s.where.get
    assert(w.atoms.map(_.op) == List("IN LIST", "NOT IN LIST"))
    assert(w.atoms.head.value == Token.Group(List(Token.IntLit(1), Token.IntLit(2))))
    // the subquery form still parses as the join-lowered op
    val sub = Parser.parse("SEARCH [a] ON c WHERE a IN (SEARCH [a] ON d)")
      .asInstanceOf[Search]
    assert(sub.where.get.atoms.head.op == "IN")
  }

  test("OPTIMIZE ... USING forms (z-order extension)") {
    assert(Parser.parse("OPTIMIZE c USING [a, b]") == Optimize("c", None, List("a", "b")))
    assert(Parser.parse("OPTIMIZE c 8 USING [a, b]")
      == Optimize("c", Some(8), List("a", "b")))
    intercept[ParseException](Parser.parse("OPTIMIZE c 0 USING [a, b]"))
  }

  test("RESTORE CONTAINER form (version restore extension)") {
    assert(Parser.parse("RESTORE CONTAINER a TO VERSION 3") == RestoreContainer("a", 3))
    intercept[ParseException](Parser.parse("RESTORE CONTAINER a"))
    intercept[ParseException](Parser.parse("RESTORE CONTAINER a TO VERSION 0"))
    intercept[ParseException](Parser.parse("RESTORE CONTAINER a VERSION 3"))
  }

  test("SIMILAR forms (index candidate extension)") {
    assert(Parser.parse("SIMILAR 45 ON docs")
      == Similar("docs", Token.IntLit(45), None, 20))
    assert(Parser.parse("SIMILAR 'k1' ON docs USING nd LIMIT 5")
      == Similar("docs", Token.Str("k1"), Some("nd"), 5))
    // round 12: a group of numeric literals is a LITERAL query vector
    // (query-by-embedding); int components coerce to double
    assert(Parser.parse("SIMILAR [0.5, 1, 0.25] ON docs USING ann LIMIT 3")
      == Similar("docs",
        Token.Group(List(Token.FloatLit(0.5), Token.IntLit(1), Token.FloatLit(0.25))),
        Some("ann"), 3, None, Some(List(0.5, 1.0, 0.25))))
    intercept[ParseException](Parser.parse("SIMILAR [] ON docs"))
    intercept[ParseException](Parser.parse("SIMILAR ['x', 0.5] ON docs"))
    intercept[ParseException](Parser.parse("SIMILAR (SEARCH [] ON a) ON docs"))
    intercept[ParseException](Parser.parse("SIMILAR 1 ON docs LIMIT 0"))
    // PROBE p — the ivf multiprobe knob, between USING and LIMIT
    assert(Parser.parse("SIMILAR [0.5, 1] ON docs USING ann PROBE 2 LIMIT 3")
      == Similar("docs",
        Token.Group(List(Token.FloatLit(0.5), Token.IntLit(1))),
        Some("ann"), 3, None, Some(List(0.5, 1.0)), Some(2)))
    assert(Parser.parse("SIMILAR 7 ON docs PROBE 3")
      == Similar("docs", Token.IntLit(7), None, 20, None, None, Some(3)))
    intercept[ParseException](Parser.parse("SIMILAR 1 ON docs PROBE 0"))
    // the parse cap matches the `USING ivf <k>` DDL ceiling (4096);
    // execution validates PROBE ≤ the index's trained k
    assert(Parser.parse("SIMILAR 1 ON docs PROBE 4096")
      == Similar("docs", Token.IntLit(1), None, 20, None, None, Some(4096)))
    intercept[ParseException](Parser.parse("SIMILAR 1 ON docs PROBE 4097"))
    // PROBE is SIMILAR-only: after MATCH it's an unexpected trailer
    intercept[ParseException](Parser.parse("MATCH ['x'] ON docs PROBE 2"))
    // SCORED — the trailing exact-rerank flag, composing with everything
    assert(Parser.parse("SIMILAR [0.5] ON docs USING ann PROBE 2 LIMIT 3 SCORED")
      == Similar("docs", Token.Group(List(Token.FloatLit(0.5))),
        Some("ann"), 3, None, Some(List(0.5)), Some(2), scored = true))
    assert(Parser.parse("SIMILAR 7 ON docs SCORED")
      == Similar("docs", Token.IntLit(7), None, 20, None, None, None,
        scored = true))
    // ...but only trailing: mid-statement it's an unexpected token
    intercept[ParseException](Parser.parse("SIMILAR 7 ON docs SCORED LIMIT 3"))
    intercept[ParseException](Parser.parse("MATCH ['x'] ON docs SCORED"))
    // an index NAMED 'scored' stays referenceable: directly after USING
    // the word fills the index slot, with the flag still readable after
    assert(Parser.parse("SIMILAR 7 ON docs USING scored")
      == Similar("docs", Token.IntLit(7), Some("scored"), 20))
    assert(Parser.parse("SIMILAR 7 ON docs USING scored SCORED")
      == Similar("docs", Token.IntLit(7), Some("scored"), 20, None, None,
        None, scored = true))
    // WHERE (round 14 — filtered ANN): the predicate slots between
    // PROBE and LIMIT, same grammar as SEARCH, and composes with SCORED
    val fw = Parser.parse(
      "SIMILAR 7 ON docs USING ann WHERE lang = 'en' AND n > 3 LIMIT 5 SCORED")
      .asInstanceOf[Similar]
    assert(fw.scored && fw.limit == 5 &&
      fw.where.exists(w => w.atoms.size == 2 && w.gates == List('a')), fw.toString)
    val fv = Parser.parse("SIMILAR [0.5] ON docs USING ann PROBE 2 WHERE tag = 'x'")
      .asInstanceOf[Similar]
    assert(fv.probe == Some(2) && fv.where.isDefined && fv.limit == 20)
    // an empty WHERE is a loud parse error
    intercept[ParseException](Parser.parse("SIMILAR 7 ON docs WHERE"))
    // MATCH carries the same filtered-retrieval WHERE (round 14),
    // composing with ALL and PHRASE
    val mw = Parser.parse("MATCH ['x'] ON docs WHERE lang = 'en' LIMIT 5")
      .asInstanceOf[Match]
    assert(mw.where.isDefined && mw.limit == 5 && !mw.all)
    val mwa = Parser.parse("MATCH ALL ['x','y'] ON docs WHERE n > 3")
      .asInstanceOf[Match]
    assert(mwa.all && mwa.where.isDefined)
    val mwp = Parser.parse("MATCH PHRASE ['x y'] ON docs WHERE n > 3")
      .asInstanceOf[Match]
    assert(mwp.phrase && mwp.where.isDefined)
    intercept[ParseException](Parser.parse("MATCH ['x'] ON docs WHERE"))
  }

  test("CHANGES forms (CDC feed extension)") {
    assert(Parser.parse("CHANGES docs 3") == Changes("docs", 3, None))
    assert(Parser.parse("CHANGES docs 0 2") == Changes("docs", 0, Some(2)))
    intercept[ParseException](Parser.parse("CHANGES docs 2 1"))
    intercept[ParseException](Parser.parse("CHANGES docs"))
    // no silent toInt wrap above 2^31-1 (same stance as LIMIT)
    intercept[ParseException](Parser.parse("CHANGES docs 4294967296"))
    intercept[ParseException](Parser.parse("CHANGES docs 1 4294967296"))
  }

  test("(CHANGES …) parses as a SEARCH source and a JOIN side") {
    val s = Parser.parse("SEARCH ['id'] ON [(CHANGES docs 1 2)] WHERE _change_type = 'insert'")
      .asInstanceOf[Search]
    assert(s.containers == List(Container.Feed(Changes("docs", 1, Some(2)))))
    val j = Parser.parse("SEARCH [] ON other JOIN (CHANGES docs 1) ON id = doc_id")
      .asInstanceOf[Search]
    assert(j.joins.head.container == Container.Feed(Changes("docs", 1, None)))
  }

  test("view statements: CREATE VIEW (SEARCH …) / REFRESH / DELETE") {
    val cv = Parser.parse("CREATE VIEW v (SEARCH [grp, count(id)] ON src)")
      .asInstanceOf[CreateView]
    assert(cv.name == "v" && cv.query.projection == List("grp") &&
      cv.query.aggs == List(AggProj("count", "id")))
    assert(Parser.parse("REFRESH VIEW v") == RefreshView("v"))
    assert(Parser.parse("DELETE VIEW v") == DeleteView("v"))
    intercept[ParseException](Parser.parse("CREATE VIEW v (CHANGES src 1)"))
  }

  test("introspection forms: SHOW CONTAINERS / INDEXES / VERSIONS, DESCRIBE") {
    assert(Parser.parse("SHOW CONTAINERS") == ShowContainers)
    assert(Parser.parse("SHOW INDEXES docs") == ShowIndexes("docs"))
    assert(Parser.parse("SHOW VERSIONS docs") == ShowVersions("docs"))
    assert(Parser.parse("DESCRIBE docs") == Describe("docs"))
    intercept[ParseException](Parser.parse("SHOW docs"))
  }

  test("MERGE ROW parses like CREATE ROW (upsert extension)") {
    val stmt = Parser.parse("MERGE ROW ['id','name'] [1, 'ana'] ON users")
    assert(stmt == MergeRow("users", List("id", "name"),
      List(Token.IntLit(1), Token.Str("ana"))))
    intercept[ParseException](
      Parser.parse("MERGE ROW ['id','name'] [1] ON users"))
  }

  test("EDIT ROW with WHERE chain") {
    val stmt = Parser.parse("EDIT ROW ['name'] ['bo'] ON users WHERE id = 1 AND name != 'x'")
    val e = stmt.asInstanceOf[EditRow]
    assert(e.container == "users")
    assert(e.where.atoms == List(
      Cond("id", "=", Token.IntLit(1)), Cond("name", "!=", Token.Str("x"))))
    assert(e.where.gates == List('a'))
  }

  test("DELETE ROW with and without WHERE; DELETE CONTAINER") {
    assert(Parser.parse("DELETE ROW ON users") == DeleteRow("users", None))
    val d = Parser.parse("DELETE ROW ON users WHERE id > 5").asInstanceOf[DeleteRow]
    assert(d.where.get.atoms.head.op == ">")
    assert(Parser.parse("DELETE CONTAINER users") == DeleteContainer("users"))
  }

  test("SEARCH with projection, multi-container, subquery, WHERE") {
    val stmt = Parser.parse(
      "SEARCH ['id'] ON [users, (SEARCH ['id'] ON admins)] WHERE id >= 10 OR id &> '1'")
    val s = stmt.asInstanceOf[Search]
    assert(s.projection == List("id"))
    assert(s.containers.head == Container.Real("users"))
    val sub = s.containers(1).asInstanceOf[Container.Virtual].query
    assert(sub.containers == List(Container.Real("admins")))
    assert(s.where.get.gates == List('o'))
  }

  test("COMMIT / ROLLBACK with optional container") {
    assert(Parser.parse("COMMIT") == Commit(None))
    assert(Parser.parse("COMMIT users") == Commit(Some("users")))
    assert(Parser.parse("ROLLBACK users") == Rollback(Some("users")))
  }

  test("cursor control statements") {
    assert(Parser.parse("QYCNNXT abc") == CursorNext("abc"))
    assert(Parser.parse("QYCNPVS abc") == CursorPrevious("abc"))
    assert(Parser.parse("QYCNEXT abc") == CursorExit("abc"))
  }

  test("? argument substitution recurses into groups (parser.rs:591-652)") {
    val stmt = Parser.parse("CREATE ROW ['id','name'] [?, ?] ON users",
      args = Seq("7", "'zoe'"))
    assert(stmt == CreateRow("users", List("id", "name"),
      List(Token.IntLit(7), Token.Str("zoe"))))
  }

  test("argument count mismatches rejected") {
    intercept[ParseException](Parser.parse("SEARCH [] ON u WHERE a = ?", Nil))
    intercept[ParseException](Parser.parse("SEARCH [] ON u WHERE a = 1", Seq("2")))
  }

  test("garbage rejected") {
    intercept[ParseException](Parser.parse("FLY ME TO the moon"))
  }

  test("ORDER BY list with per-column direction, default ASC") {
    val s = Parser.parse(
      "SEARCH ['id','score'] ON users WHERE id > 3 ORDER BY [score DESC, id]")
      .asInstanceOf[Search]
    assert(s.orderBy == List(SortItem("score", asc = false), SortItem("id", asc = true)))
    assert(s.limit.isEmpty)
    assert(s.where.get.atoms.head == Cond("id", ">", Token.IntLit(3)))
  }

  test("LIMIT with and without ORDER BY; after HAVING") {
    assert(Parser.parse("SEARCH [] ON u LIMIT 5").asInstanceOf[Search].limit == Some(5))
    val s = Parser.parse(
      "SEARCH [lang, count(id)] ON u HAVING count_id > 2 ORDER BY [count_id DESC] LIMIT 3")
      .asInstanceOf[Search]
    assert(s.having.isDefined && s.orderBy == List(SortItem("count_id", asc = false))
      && s.limit == Some(3))
  }

  test("count(DISTINCT col): parses to a distinct AggProj; other fns reject DISTINCT") {
    val s = Parser.parse("SEARCH [lang, count(DISTINCT src)] ON docs")
      .asInstanceOf[Search]
    assert(s.aggs == List(AggProj("count", "src", distinct = true)))
    assert(Parser.parse("SEARCH [count(src)] ON docs").asInstanceOf[Search]
      .aggs == List(AggProj("count", "src")))
    intercept[ParseException](
      Parser.parse("SEARCH [sum(DISTINCT src)] ON docs"))
  }

  test("aggregate over arithmetic: sum(a * b) parses; count(expr) rejected") {
    val s = Parser.parse("SEARCH [flag, sum(price * disc), min(qty + 2)] ON t")
      .asInstanceOf[Search]
    assert(s.aggs.map(_.fn) == List("sum", "min"))
    assert(s.aggs.map(_.column) == List("price_mul_disc", "qty_plus_2"))
    assert(s.aggs.forall(_.expr.isDefined))
    // one spelling only: count(expr) = count(leaf) under non-null inputs
    intercept[ParseException](Parser.parse("SEARCH [count(a * b)] ON t"))
    // malformed arithmetic inside the subcommand fails loudly
    intercept[ParseException](Parser.parse("SEARCH [sum(a *)] ON t"))
  }

  test("window items: rank(col DESC) PER [keys] parses; missing PER rejected") {
    val s = Parser.parse("SEARCH [lang, rank(n_chars DESC) PER [lang], " +
      "row_number(doc_id) PER []] ON docs").asInstanceOf[Search]
    assert(s.wins == List(WinProj("rank", "n_chars", asc = false, List("lang")),
      WinProj("row_number", "doc_id", asc = true, Nil)))
    intercept[ParseException](Parser.parse("SEARCH [rank(n_chars)] ON docs"))
    intercept[ParseException](
      Parser.parse("SEARCH [rank(n_chars sideways) PER [lang]] ON docs"))
    // a bare COLUMN that happens to share a window-fn name stays a column
    val bare = Parser.parse("SEARCH [id, rank, lag] ON t").asInstanceOf[Search]
    assert(bare.projection == List("id", "rank", "lag") && bare.wins.isEmpty)
  }

  test("SEARCH DISTINCT: parses, composes with later clauses, rejects aggregates") {
    val s = Parser.parse("SEARCH DISTINCT ['lang'] ON docs WHERE n > 2 LIMIT 5")
      .asInstanceOf[Search]
    assert(s.distinct && s.limit == Some(5) && s.where.isDefined)
    assert(!Parser.parse("SEARCH ['lang'] ON docs").asInstanceOf[Search].distinct)
    // grouping already dedupes keys — DISTINCT over aggregates is an error
    intercept[ParseException](
      Parser.parse("SEARCH DISTINCT [lang, count(id)] ON docs"))
    // in a subquery position
    val sub = Parser.parse(
      "SEARCH [] ON [(SEARCH DISTINCT ['lang'] ON docs)]").asInstanceOf[Search]
    assert(sub.containers.head.asInstanceOf[Container.Virtual].query.distinct)
  }

  test("ORDER/LIMIT keywords in VALUE position stay bare-word values") {
    val s = Parser.parse("SEARCH [] ON u WHERE kind = order AND x = limit")
      .asInstanceOf[Search]
    assert(s.where.get.atoms.map(_.value) ==
      List(Token.Keyword("ORDER"), Token.Keyword("LIMIT")))
    assert(s.orderBy.isEmpty && s.limit.isEmpty)
  }

  test("ORDER BY: bare desc is a direction, quoted 'desc' is a column (reserved-word rule)") {
    val bare = Parser.parse("SEARCH [] ON u ORDER BY [a desc]").asInstanceOf[Search]
    assert(bare.orderBy == List(SortItem("a", asc = false)))
    val quoted = Parser.parse("SEARCH [] ON u ORDER BY [a, 'desc']").asInstanceOf[Search]
    assert(quoted.orderBy ==
      List(SortItem("a", asc = true), SortItem("desc", asc = true)))
  }

  test("malformed ORDER BY / LIMIT rejected") {
    intercept[ParseException](Parser.parse("SEARCH [] ON u ORDER [x]"))     // missing BY
    intercept[ParseException](Parser.parse("SEARCH [] ON u ORDER BY []"))   // empty list
    intercept[ParseException](Parser.parse("SEARCH [] ON u LIMIT 0"))       // non-positive
    intercept[ParseException](Parser.parse("SEARCH [] ON u LIMIT x"))       // non-integer
    intercept[ParseException](Parser.parse("SEARCH [] ON u LIMIT 3 extra")) // trailing
  }

  test("JOIN clause: single, chained, qualified names, every later clause composes") {
    val s = Parser.parse("SEARCH [a, b] ON u JOIN v ON a = b WHERE a > 1")
      .asInstanceOf[Search]
    assert(s.joins == List(JoinSpec(Container.Real("v"), "a", "b")))
    assert(s.where.get.atoms.head == Cond("a", ">", Token.IntLit(1)))
    // chained joins, qualified condition names, == alias
    val c = Parser.parse("SEARCH [x] ON u JOIN v ON u.a = v.b JOIN w ON w.c == x")
      .asInstanceOf[Search]
    assert(c.joins == List(
      JoinSpec(Container.Real("v"), "u.a", "v.b"),
      JoinSpec(Container.Real("w"), "w.c", "x")))
    // virtual right side + ORDER BY/LIMIT after the join
    val v = Parser.parse(
      "SEARCH [x] ON u JOIN (SEARCH [b] ON v) ON a = b ORDER BY [x] LIMIT 2")
      .asInstanceOf[Search]
    assert(v.joins.head.container.isInstanceOf[Container.Virtual])
    assert(v.limit.contains(2))
    // aggregates compose over the joined source
    val g = Parser.parse("SEARCH [lang, count(b)] ON u JOIN v ON a = b")
      .asInstanceOf[Search]
    assert(g.aggs == List(AggProj("count", "b")) && g.joins.nonEmpty)
  }

  test("malformed JOIN rejected") {
    intercept[ParseException](Parser.parse("SEARCH [] ON u JOIN v"))            // no ON
    intercept[ParseException](Parser.parse("SEARCH [] ON u JOIN v ON a"))       // no condition
    intercept[ParseException](Parser.parse("SEARCH [] ON u JOIN v ON a > b"))   // non-equi
    intercept[ParseException](Parser.parse("SEARCH [] ON u JOIN v ON a = "))    // half condition
    intercept[ParseException](Parser.parse("SEARCH [] ON u LEFT v ON a = b"))   // LEFT sans JOIN
  }

  test("LEFT JOIN parses with joinType left; chains mix with inner") {
    val s = Parser.parse("SEARCH [x] ON u LEFT JOIN v ON a = b JOIN w ON c = d")
      .asInstanceOf[Search]
    assert(s.joins == List(
      JoinSpec(Container.Real("v"), "a", "b", "left"),
      JoinSpec(Container.Real("w"), "c", "d", "inner")))
  }

  test("WHERE arithmetic: precedence, column words, malformed forms") {
    import Operand._
    def whereOf(aql: String) = Parser.parse(aql).asInstanceOf[Search].where.get
    // * binds tighter than +: q * 1000 + 500 = (q*1000)+500
    val w = whereOf("SEARCH [] ON t WHERE p > q * 1000 + 500")
    assert(w.atoms.head.rhs.contains(
      Bin(Bin(Leaf(Token.Str("q")), '*', Leaf(Token.IntLit(1000))),
        '+', Leaf(Token.IntLit(500)))))
    // left-assoc chains: a - b + c = (a-b)+c
    val w2 = whereOf("SEARCH [] ON t WHERE p = a - b + c")
    assert(w2.atoms.head.rhs.contains(
      Bin(Bin(Leaf(Token.Str("a")), '-', Leaf(Token.Str("b"))),
        '+', Leaf(Token.Str("c")))))
    // single-token RHS keeps the reference triple shape (rhs empty)
    assert(whereOf("SEARCH [] ON t WHERE p > 5").atoms.head.rhs.isEmpty)
    // arithmetic composes with gates and later clauses
    val w3 = whereOf("SEARCH [] ON t WHERE p > q * 2 AND r = 1")
    assert(w3.atoms.length == 2 && w3.gates == List('a'))
    val s4 = Parser.parse("SEARCH [] ON t WHERE p > q + 1 ORDER BY [p] LIMIT 3")
      .asInstanceOf[Search]
    assert(s4.orderBy.nonEmpty && s4.limit.contains(3))
    // dangling operator rejected
    intercept[ParseException](Parser.parse("SEARCH [] ON t WHERE p > q +"))
    intercept[ParseException](Parser.parse("SEARCH [] ON t WHERE p > q + AND r = 1"))
  }

  test("computed projection items: generated names, precedence, guards") {
    import Operand._
    val s = Parser.parse("SEARCH [a, b * 2 + c] ON t").asInstanceOf[Search]
    assert(s.projection == List("a"))
    assert(s.exprs == List(ExprProj("b_mul_2_plus_c",
      Bin(Bin(Leaf(Token.Str("b")), '*', Leaf(Token.IntLit(2))),
        '+', Leaf(Token.Str("c"))))))
    // exprs-only projection: no plain columns
    val only = Parser.parse("SEARCH [p / 4] ON t").asInstanceOf[Search]
    assert(only.projection.isEmpty && only.exprs.map(_.name) == List("p_div_4"))
    // computed items + aggregates parse: the expr becomes a GROUP BY key
    val grouped = Parser.parse("SEARCH [sum(a), b * 2] ON t").asInstanceOf[Search]
    assert(grouped.aggs.map(_.fn) == List("sum") &&
      grouped.exprs.map(_.name) == List("b_mul_2"))
    // window items + aggregates stay rejected
    intercept[ParseException](
      Parser.parse("SEARCH [sum(a), rank(b) PER []] ON t"))
  }

  test("ALTER CONTAINER ADD COLUMN parses; malformed forms rejected") {
    val a = Parser.parse("ALTER CONTAINER c ADD COLUMN ['x','y'] [INT, TEXT]")
      .asInstanceOf[AlterContainer]
    assert(a.name == "c" && a.colNames == List("x", "y"))
    assert(a.colTypes.map(_.name) == List("INT", "TEXT"))
    intercept[ParseException](
      Parser.parse("ALTER CONTAINER c ADD COLUMN [] []"))          // empty
    intercept[ParseException](
      Parser.parse("ALTER CONTAINER c ADD COLUMN ['x','X'] [INT, INT]")) // dup (ci)
    intercept[ParseException](
      Parser.parse("ALTER CONTAINER c ADD COLUMN ['x'] [INT, TEXT]"))    // arity
    intercept[ParseException](
      Parser.parse("ALTER CONTAINER c ADD ['x'] [INT]"))           // missing COLUMN
  }

  test("SHOW OVERLAP a b ON col parses; malformed forms rejected") {
    val o = Parser.parse("SHOW OVERLAP train bench ON gram")
      .asInstanceOf[ShowOverlap]
    assert(o.a == Container.Real("train") && o.b == Container.Real("bench")
      && o.column == "gram")
    // OVERLAP is matched case-insensitively like STATS/TAILS
    assert(Parser.parse("show overlap a b on c").isInstanceOf[ShowOverlap])
    // a side composes with any SEARCH source — subquery, versioned
    val v = Parser.parse(
      "SHOW OVERLAP (SEARCH [doc_id] ON docs AT VERSION 1) docs ON doc_id")
      .asInstanceOf[ShowOverlap]
    assert(v.a.isInstanceOf[Container.Virtual] && v.b == Container.Real("docs"))
    assert(v.a.asInstanceOf[Container.Virtual].query.atVersion.contains(1))
    // BY gcol: the grouped (overlap-matrix) form
    val g = Parser.parse("SHOW OVERLAP train bench ON gram BY source")
      .asInstanceOf[ShowOverlap]
    assert(g.column == "gram" && g.by.contains("source"))
    assert(o.by.isEmpty, "the ungrouped form carries no BY column")
    // N-way MATRIX form: a source LIST before ON (round 12)
    val m = Parser.parse("SHOW OVERLAP [a, b, (SEARCH [x] ON c)] ON x BY g")
      .asInstanceOf[ShowOverlapMatrix]
    assert(m.sources.take(2) == List(Container.Real("a"), Container.Real("b"))
      && m.sources(2).isInstanceOf[Container.Virtual]
      && m.column == "x" && m.by.contains("g"))
    intercept[ParseException](Parser.parse("SHOW OVERLAP [a] ON c"))   // <2 sources
    intercept[ParseException](Parser.parse("SHOW OVERLAP [a, b] ON c EXTRA"))
    intercept[ParseException](Parser.parse("SHOW OVERLAP a ON c"))     // one container
    intercept[ParseException](Parser.parse("SHOW OVERLAP a b c"))      // missing ON
    intercept[ParseException](Parser.parse("SHOW OVERLAP a b ON"))     // missing col
    intercept[ParseException](Parser.parse("SHOW OVERLAP a b ON c BY"))   // missing gcol
    intercept[ParseException](Parser.parse("SHOW OVERLAP a b ON c BY g h")) // trailing
    intercept[ParseException](                                          // non-source subquery
      Parser.parse("SHOW OVERLAP (COMMIT x) b ON c"))
    // matrix side labels (round 13): `AS name` after any source, mixing
    // labeled and unlabeled sides; AS is case-insensitive like OVERLAP
    val al = Parser.parse(
      "SHOW OVERLAP [a AS lefty, (SEARCH [x] ON b) as mid, c] ON x")
      .asInstanceOf[ShowOverlapMatrix]
    assert(al.sources.size == 3 && al.aliases ==
      List(Some("lefty"), Some("mid"), None))
    // a trailing AS with no label is a parse error (round 14): the typo
    // must not read as an unlabeled source literally named `as` and
    // surface later as a container-lookup failure
    intercept[ParseException](Parser.parse("SHOW OVERLAP [a AS] ON x"))
    intercept[ParseException](Parser.parse("SHOW OVERLAP [a AS lefty, b AS] ON x"))
    assert(Parser.parse("SHOW OVERLAP [a, b] ON x")
      .asInstanceOf[ShowOverlapMatrix].aliases == List(None, None))
  }

  test("FUSE parses MATCH/SIMILAR sides with K and LIMIT knobs") {
    val f = Parser.parse("FUSE [(MATCH ['x'] ON docs), " +
      "(SIMILAR 7 ON docs USING ann SCORED)] K 30 LIMIT 5")
      .asInstanceOf[Fuse]
    assert(f.k == 30 && f.limit == 5 && f.sides.size == 2)
    assert(f.sides.head == Match("docs", List("x"), None, 20))
    assert(f.sides(1) == Similar("docs", Token.IntLit(7), Some("ann"), 20,
      None, None, None, scored = true))
    // defaults: k = 60 (the RRF paper constant), limit = 20
    val d = Parser.parse("FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)]")
      .asInstanceOf[Fuse]
    assert(d.k == 60 && d.limit == 20)
    // three-plus sides compose
    assert(Parser.parse("FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b), " +
      "(SIMILAR 1 ON c SCORED)]").asInstanceOf[Fuse].sides.size == 3)
    // FUSE is case-insensitive and unreserved
    assert(Parser.parse("fuse [(MATCH ['x'] ON a), (MATCH ['y'] ON b)]")
      .isInstanceOf[Fuse])
    intercept[ParseException](Parser.parse("FUSE [(MATCH ['x'] ON a)]")) // <2
    intercept[ParseException](                                 // non-ranked side
      Parser.parse("FUSE [(SEARCH [x] ON a), (MATCH ['y'] ON b)]"))
    intercept[ParseException](                                 // bare container
      Parser.parse("FUSE [a, b]"))
    intercept[ParseException](
      Parser.parse("FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)] K 0"))
    intercept[ParseException](
      Parser.parse("FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)] LIMIT 0"))
    intercept[ParseException](
      Parser.parse("FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)] EXTRA"))
    // WEIGHTS — weighted RRF, positional, one positive weight per side
    val wf = Parser.parse("FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)] " +
      "WEIGHTS [0.7, 0.3] K 10 LIMIT 5").asInstanceOf[Fuse]
    assert(wf.weights.contains(List(0.7, 0.3)) && wf.k == 10 && wf.limit == 5)
    intercept[ParseException](Parser.parse(
      "FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)] WEIGHTS [0.7]"))
    intercept[ParseException](Parser.parse(
      "FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)] WEIGHTS [0.7, 0]"))
    intercept[ParseException](Parser.parse(
      "FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)] WEIGHTS ['a', 'b']"))
    // (FUSE …) composes as a SEARCH source
    val s = Parser.parse("SEARCH [] ON [(FUSE [(MATCH ['x'] ON a), " +
      "(MATCH ['y'] ON b)])] WHERE rrf > 0.01").asInstanceOf[Search]
    assert(s.containers.head.isInstanceOf[Container.Fused])
    // EXPLAIN covers FUSE
    assert(Parser.parse("EXPLAIN FUSE [(MATCH ['x'] ON a), (MATCH ['y'] ON b)]")
      .asInstanceOf[Explain].query.isInstanceOf[Fuse])
  }

  test("SHOW DEDUP parses USING and THRESHOLD knobs") {
    assert(Parser.parse("SHOW DEDUP docs")
      == ShowDedup("docs", None, None))
    assert(Parser.parse("SHOW DEDUP docs USING nd")
      == ShowDedup("docs", Some("nd"), None))
    assert(Parser.parse("SHOW DEDUP docs USING nd THRESHOLD 0.3")
      == ShowDedup("docs", Some("nd"), Some(0.3)))
    // an integer literal coerces (THRESHOLD 1 = exact-match-only verify)
    assert(Parser.parse("SHOW DEDUP docs THRESHOLD 1")
      == ShowDedup("docs", None, Some(1.0)))
    // DEDUP is case-insensitive and unreserved, like STATS/TAILS
    assert(Parser.parse("show dedup docs").isInstanceOf[ShowDedup])
    // AT VERSION — the funnel time-travels like every lookup
    assert(Parser.parse("SHOW DEDUP docs AT VERSION 2 USING nd THRESHOLD 0.5")
      == ShowDedup("docs", Some("nd"), Some(0.5), Some(2)))
    intercept[ParseException](Parser.parse("SHOW DEDUP docs AT VERSION 0"))
    intercept[ParseException](Parser.parse("SHOW DEDUP docs AT 2"))
    // trailing CLUSTERS flag (unreserved): the per-cluster detail view
    assert(Parser.parse("SHOW DEDUP docs USING nd THRESHOLD 0.5 CLUSTERS")
      == ShowDedup("docs", Some("nd"), Some(0.5), None, clusters = true))
    assert(Parser.parse("SHOW DEDUP docs clusters")
      == ShowDedup("docs", None, None, None, clusters = true))
    // directly after USING the word names an INDEX (the SCORED stance)
    assert(Parser.parse("SHOW DEDUP docs USING clusters")
      == ShowDedup("docs", Some("clusters"), None, None))
    assert(Parser.parse("SHOW DEDUP docs USING clusters CLUSTERS")
      == ShowDedup("docs", Some("clusters"), None, None, clusters = true))
    intercept[ParseException](Parser.parse("SHOW DEDUP docs THRESHOLD 0"))
    intercept[ParseException](Parser.parse("SHOW DEDUP docs THRESHOLD 1.5"))
    intercept[ParseException](Parser.parse("SHOW DEDUP docs THRESHOLD 'x'"))
    intercept[ParseException](Parser.parse("SHOW DEDUP docs EXTRA 1"))
    // EXPLAIN covers SHOW DEDUP
    assert(Parser.parse("EXPLAIN SHOW DEDUP docs")
      .asInstanceOf[Explain].query.isInstanceOf[ShowDedup])
  }

  test("SHOW DEDUP / DEDUP AGAINST — the cross-container forms (round 15)") {
    assert(Parser.parse("SHOW DEDUP corp AGAINST ref")
      == ShowDedupAgainst("corp", "ref", None, None))
    assert(Parser.parse("SHOW DEDUP corp AGAINST ref USING nd THRESHOLD 0.3")
      == ShowDedupAgainst("corp", "ref", Some("nd"), Some(0.3)))
    assert(Parser.parse("SHOW DEDUP corp AGAINST ref DOCS")
      == ShowDedupAgainst("corp", "ref", None, None, docs = true))
    assert(Parser.parse("show dedup corp against ref using nd docs")
      == ShowDedupAgainst("corp", "ref", Some("nd"), None, docs = true))
    // directly after USING the word names an INDEX (the SCORED stance)
    assert(Parser.parse("SHOW DEDUP corp AGAINST ref USING docs")
      == ShowDedupAgainst("corp", "ref", Some("docs"), None))
    assert(Parser.parse("DEDUP corp AGAINST ref")
      == DedupAgainst("corp", "ref", None, None))
    assert(Parser.parse("DEDUP corp AGAINST ref USING nd THRESHOLD 0.9")
      == DedupAgainst("corp", "ref", Some("nd"), Some(0.9)))
    // a container NAMED 'against' stays addressable in the within form
    assert(Parser.parse("DEDUP against USING nd")
      == DedupContainer("against", Some("nd"), None))
    intercept[ParseException](
      Parser.parse("DEDUP corp AGAINST ref THRESHOLD 0"))
    intercept[ParseException](
      Parser.parse("SHOW DEDUP corp AGAINST ref EXTRA"))
    // the mutation takes no DOCS (only the SHOW form reports)
    intercept[ParseException](Parser.parse("DEDUP corp AGAINST ref DOCS"))
    // EXPLAIN covers the cross form
    assert(Parser.parse("EXPLAIN SHOW DEDUP corp AGAINST ref")
      .asInstanceOf[Explain].query.isInstanceOf[ShowDedupAgainst])
    // round 16: AT VERSION pins the reference; PROBE widens the ivf
    // cross assignment (cross forms only)
    assert(Parser.parse("SHOW DEDUP corp AGAINST ref AT VERSION 3 USING nd")
      == ShowDedupAgainst("corp", "ref", Some("nd"), None, atVersion = Some(3)))
    assert(Parser.parse("SHOW DEDUP corp AGAINST ref USING nd PROBE 2 THRESHOLD 0.9")
      == ShowDedupAgainst("corp", "ref", Some("nd"), Some(0.9), probe = Some(2)))
    assert(Parser.parse("DEDUP corp AGAINST ref AT VERSION 2 USING nd PROBE 4")
      == DedupAgainst("corp", "ref", Some("nd"), None, atVersion = Some(2),
        probe = Some(4)))
    intercept[ParseException](
      Parser.parse("SHOW DEDUP corp AGAINST ref PROBE 0"))
    intercept[ParseException](
      Parser.parse("SHOW DEDUP corp AGAINST ref AT VERSION 0"))
    // round 17: FROM VERSION a TO b — the incremental gating window
    assert(Parser.parse("DEDUP corp AGAINST ref FROM VERSION 1 TO 2 USING nd")
      == DedupAgainst("corp", "ref", Some("nd"), None,
        window = Some((1, 2))))
    assert(Parser.parse(
      "SHOW DEDUP corp AGAINST ref FROM VERSION 3 TO 5 USING nd DOCS")
      == ShowDedupAgainst("corp", "ref", Some("nd"), None, docs = true,
        window = Some((3, 5))))
    // composes after AT VERSION (reference pin + window, both optional)
    assert(Parser.parse(
      "DEDUP corp AGAINST ref AT VERSION 4 FROM VERSION 1 TO 2")
      == DedupAgainst("corp", "ref", None, None, atVersion = Some(4),
        window = Some((1, 2))))
    intercept[ParseException]( // a > b refuses
      Parser.parse("DEDUP corp AGAINST ref FROM VERSION 3 TO 1"))
    intercept[ParseException]( // malformed window
      Parser.parse("DEDUP corp AGAINST ref FROM VERSION 1"))
    // the within-container forms take no PROBE (no probe geometry)
    intercept[ParseException](Parser.parse("DEDUP corp USING nd PROBE 2"))
  }

  test("SIMILAR c1 AGAINST c2 — the batch k-NN join grammar (round 16)") {
    assert(Parser.parse("SIMILAR corp AGAINST ref LIMIT 5")
      == SimilarAgainst("corp", "ref", None, None, 5))
    assert(Parser.parse("SIMILAR corp AGAINST ref USING nd LIMIT 3 SCORED")
      == SimilarAgainst("corp", "ref", Some("nd"), None, 3, scored = true))
    assert(Parser.parse("similar corp against ref using nd probe 4 limit 2 scored")
      == SimilarAgainst("corp", "ref", Some("nd"), Some(4), 2, scored = true))
    assert(Parser.parse("SIMILAR corp AGAINST ref AT VERSION 2 USING nd LIMIT 5")
      == SimilarAgainst("corp", "ref", Some("nd"), None, 5,
        atVersion = Some(2)))
    // default limit mirrors the MATCH/SIMILAR tail
    assert(Parser.parse("SIMILAR corp AGAINST ref")
      == SimilarAgainst("corp", "ref", None, None, 20))
    // directly after USING the word names an INDEX (the SCORED stance)
    assert(Parser.parse("SIMILAR corp AGAINST ref USING scored SCORED")
      == SimilarAgainst("corp", "ref", Some("scored"), None, 20, scored = true))
    // the pk form keeps winning when ON is present
    assert(Parser.parse("SIMILAR 5 ON against LIMIT 3")
      .isInstanceOf[Similar])
    intercept[ParseException](
      Parser.parse("SIMILAR corp AGAINST ref PROBE 0 LIMIT 5"))
    intercept[ParseException](
      Parser.parse("SIMILAR corp AGAINST ref LIMIT 0"))
    intercept[ParseException](
      Parser.parse("SIMILAR corp AGAINST ref EXTRA"))
    assert(Parser.parse("EXPLAIN SIMILAR corp AGAINST ref LIMIT 5 SCORED")
      .asInstanceOf[Explain].query.isInstanceOf[SimilarAgainst])
    // round 17: the FROM VERSION window (incremental k-NN join),
    // composing with AT VERSION in either order; duplicates refuse
    assert(Parser.parse(
      "SIMILAR corp AGAINST ref FROM VERSION 1 TO 2 USING nd LIMIT 3 SCORED")
      == SimilarAgainst("corp", "ref", Some("nd"), None, 3, scored = true,
        window = Some((1, 2))))
    assert(Parser.parse(
      "SIMILAR corp AGAINST ref AT VERSION 4 FROM VERSION 1 TO 2 LIMIT 5")
      == SimilarAgainst("corp", "ref", None, None, 5, atVersion = Some(4),
        window = Some((1, 2))))
    assert(Parser.parse(
      "SIMILAR corp AGAINST ref FROM VERSION 1 TO 2 AT VERSION 4 LIMIT 5")
      == SimilarAgainst("corp", "ref", None, None, 5, atVersion = Some(4),
        window = Some((1, 2))))
    intercept[ParseException](Parser.parse(
      "SIMILAR corp AGAINST ref AT VERSION 1 FROM VERSION 1 TO 2 AT VERSION 3"))
    intercept[ParseException](Parser.parse(
      "SIMILAR corp AGAINST ref FROM VERSION 2 TO 1"))
  }

  test("DELETE ROWS parses a (SEARCH …) subquery onto a container") {
    val s = Parser.parse("DELETE ROWS (SEARCH [id] ON a WHERE v > 3) ON c")
      .asInstanceOf[DeleteRows]
    assert(s.container == "c" && s.query.projection == List("id"))
    intercept[ParseException](Parser.parse("DELETE ROWS (COMMIT x) ON c"))
    intercept[ParseException](Parser.parse("DELETE ROWS (SEARCH [id] ON a) ON c EXTRA"))
  }

  test("DEDUP (apply) parses the shared USING/THRESHOLD knobs") {
    assert(Parser.parse("DEDUP docs") == DedupContainer("docs", None, None))
    assert(Parser.parse("DEDUP docs USING nd THRESHOLD 0.5")
      == DedupContainer("docs", Some("nd"), Some(0.5)))
    assert(Parser.parse("dedup docs").isInstanceOf[DedupContainer])
    intercept[ParseException](Parser.parse("DEDUP docs THRESHOLD 0"))
    intercept[ParseException](Parser.parse("DEDUP docs THRESHOLD 1.5"))
    intercept[ParseException](Parser.parse("DEDUP docs EXTRA"))
    // the mutation takes no AT VERSION (only the SHOW form time-travels)
    intercept[ParseException](Parser.parse("DEDUP docs AT VERSION 1"))
  }

  test("DECONTAMINATE and its SHOW twin parse AGAINST/ON/THRESHOLD") {
    assert(Parser.parse("DECONTAMINATE corp AGAINST eval ON body")
      == Decontaminate("corp", "eval", "body", None))
    assert(Parser.parse("decontaminate corp against eval ON body THRESHOLD 0.8")
      == Decontaminate("corp", "eval", "body", Some(0.8)))
    assert(Parser.parse("SHOW DECONTAMINATE corp AGAINST eval ON body")
      == ShowDecontaminate("corp", "eval", "body", None))
    assert(Parser.parse("SHOW DECONTAMINATE corp AGAINST eval ON body THRESHOLD 1")
      == ShowDecontaminate("corp", "eval", "body", Some(1.0)))
    // trailing DOCS — the per-doc decision detail, composing with THRESHOLD
    assert(Parser.parse("SHOW DECONTAMINATE corp AGAINST eval ON body DOCS")
      == ShowDecontaminate("corp", "eval", "body", None, docs = true))
    assert(Parser.parse(
      "SHOW DECONTAMINATE corp AGAINST eval ON body THRESHOLD 0.9 docs")
      == ShowDecontaminate("corp", "eval", "body", Some(0.9), docs = true))
    // a column NAMED like the TEXT type keyword stays addressable — the
    // keyword uppercases in the AST and lowering resolves columns
    // case-insensitively (the fixture documents column is literally
    // called 'text')
    assert(Parser.parse("DECONTAMINATE corp AGAINST eval ON text")
      == Decontaminate("corp", "eval", "TEXT", None))
    intercept[ParseException](Parser.parse("DECONTAMINATE corp"))
    intercept[ParseException](Parser.parse("DECONTAMINATE corp AGAINST eval"))
    intercept[ParseException](
      Parser.parse("DECONTAMINATE corp AGAINST eval ON text THRESHOLD 0"))
    intercept[ParseException](
      Parser.parse("DECONTAMINATE corp AGAINST eval ON text EXTRA"))
  }

  test("DECONTAMINATE GRAMS / USING SPANS knobs (round 15)") {
    assert(Parser.parse("DECONTAMINATE corp AGAINST eval ON body GRAMS 8")
      == Decontaminate("corp", "eval", "body", None, grams = Some(8)))
    // GRAMS and THRESHOLD compose, in either order
    assert(Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body GRAMS 8 THRESHOLD 0.3")
      == Decontaminate("corp", "eval", "body", Some(0.3), grams = Some(8)))
    assert(Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body THRESHOLD 0.3 GRAMS 8")
      == Decontaminate("corp", "eval", "body", Some(0.3), grams = Some(8)))
    assert(Parser.parse("DECONTAMINATE corp AGAINST eval ON body USING SPANS 50")
      == Decontaminate("corp", "eval", "body", None, spans = Some(50)))
    assert(Parser.parse(
      "SHOW DECONTAMINATE corp AGAINST eval ON body GRAMS 6 DOCS")
      == ShowDecontaminate("corp", "eval", "body", None, docs = true,
        grams = Some(6)))
    assert(Parser.parse(
      "SHOW DECONTAMINATE corp AGAINST eval ON body USING SPANS 8 DOCS")
      == ShowDecontaminate("corp", "eval", "body", None, docs = true,
        spans = Some(8)))
    // round 17: the FROM VERSION window — the incremental gating form
    assert(Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body FROM VERSION 1 TO 2 THRESHOLD 0.3")
      == Decontaminate("corp", "eval", "body", Some(0.3),
        window = Some((1, 2))))
    assert(Parser.parse(
      "SHOW DECONTAMINATE corp AGAINST eval ON body AT VERSION 3 " +
        "FROM VERSION 1 TO 2 DOCS")
      == ShowDecontaminate("corp", "eval", "body", None, docs = true,
        atVersion = Some(3), window = Some((1, 2))))
    intercept[ParseException](Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body FROM VERSION 2 TO 1"))
    // bounds: GRAMS in [2, 32], SPANS in [2, 256]
    intercept[ParseException](
      Parser.parse("DECONTAMINATE corp AGAINST eval ON body GRAMS 1"))
    intercept[ParseException](
      Parser.parse("DECONTAMINATE corp AGAINST eval ON body GRAMS 33"))
    intercept[ParseException](
      Parser.parse("DECONTAMINATE corp AGAINST eval ON body USING SPANS 1"))
    intercept[ParseException](
      Parser.parse("DECONTAMINATE corp AGAINST eval ON body USING SPANS 257"))
    // SPANS replaces the fraction measure — THRESHOLD/GRAMS don't compose
    intercept[ParseException](Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body USING SPANS 8 THRESHOLD 0.5"))
    intercept[ParseException](Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body GRAMS 4 USING SPANS 8"))
    // duplicate knobs are rejected, not last-wins
    intercept[ParseException](Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body GRAMS 4 GRAMS 8"))
    // ANALYZER knob (round 15): composes with every other knob, any
    // order; name validation happens at lowering (the CREATE INDEX stance)
    assert(Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body ANALYZER standard")
      == Decontaminate("corp", "eval", "body", None,
        analyzer = Some("standard")))
    assert(Parser.parse(
      "SHOW DECONTAMINATE corp AGAINST eval ON body GRAMS 8 " +
        "ANALYZER Standard THRESHOLD 0.3 DOCS")
      == ShowDecontaminate("corp", "eval", "body", Some(0.3), docs = true,
        grams = Some(8), analyzer = Some("standard")))
    assert(Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body USING SPANS 8 ANALYZER standard")
      == Decontaminate("corp", "eval", "body", None, spans = Some(8),
        analyzer = Some("standard")))
    intercept[ParseException](Parser.parse(
      "DECONTAMINATE corp AGAINST eval ON body ANALYZER a ANALYZER b"))
  }

  test("set operations: (SEARCH) EXCEPT/INTERSECT [ALL] (SEARCH)") {
    val l = Search(List(Container.Real("a")), List("x"), None)
    val r = Search(List(Container.Real("b")), List("x"), None)
    assert(Parser.parse("(SEARCH [x] ON a) EXCEPT (SEARCH [x] ON b)")
      == SetOp("except", all = false, l, r))
    assert(Parser.parse("(SEARCH [x] ON a) INTERSECT ALL (SEARCH [x] ON b)")
      == SetOp("intersect", all = true, l, r))
    assert(Parser.parse("(SEARCH [x] ON a) except all (SEARCH [x] ON b)")
      == SetOp("except", all = true, l, r), "operators are case-insensitive")
    assert(Parser.parse("(SEARCH [x] ON a) UNION (SEARCH [x] ON b)")
      == SetOp("union", all = false, l, r))
    assert(Parser.parse("(SEARCH [x] ON a) UNION ALL (SEARCH [x] ON b)")
      == SetOp("union", all = true, l, r))
    // both sides must be SEARCH subqueries, and nothing may trail
    intercept[ParseException](
      Parser.parse("(SEARCH [x] ON a) EXCEPT (CHANGES b 1)"))
    intercept[ParseException](
      Parser.parse("(CHANGES b 1) INTERSECT (SEARCH [x] ON a)"))
    intercept[ParseException](
      Parser.parse("(SEARCH [x] ON a) EXCEPT (SEARCH [x] ON b) LIMIT 3"))
    intercept[ParseException](Parser.parse("(SEARCH [x] ON a) EXCEPT"))
    // EXPLAIN accepts the new read statements
    assert(Parser.parse("EXPLAIN (SEARCH [x] ON a) EXCEPT (SEARCH [x] ON b)")
      == Explain(SetOp("except", all = false, l, r), analyze = false))
    assert(Parser.parse("EXPLAIN SHOW OVERLAP a b ON c BY g")
      == Explain(ShowOverlap(Container.Real("a"), Container.Real("b"),
        "c", Some("g")), analyze = false))
  }

  test("recursive set-op sides: explicit parens only, both positions, any depth") {
    val a = Search(List(Container.Real("a")), List("x"), None)
    val b = Search(List(Container.Real("b")), List("x"), None)
    val c = Search(List(Container.Real("c")), List("x"), None)
    // left-nested chain
    assert(Parser.parse(
      "((SEARCH [x] ON a) UNION (SEARCH [x] ON b)) EXCEPT (SEARCH [x] ON c)")
      == SetOp("except", all = false, SetOp("union", all = false, a, b), c))
    // right-nested and ALL at both levels
    assert(Parser.parse(
      "(SEARCH [x] ON a) UNION ALL ((SEARCH [x] ON b) INTERSECT ALL (SEARCH [x] ON c))")
      == SetOp("union", all = true, a, SetOp("intersect", all = true, b, c)))
    // depth 3
    assert(Parser.parse(
      "(((SEARCH [x] ON a) UNION (SEARCH [x] ON b)) EXCEPT (SEARCH [x] ON c)) " +
        "INTERSECT (SEARCH [x] ON a)")
      == SetOp("intersect", all = false,
        SetOp("except", all = false, SetOp("union", all = false, a, b), c), a))
    // NO implicit precedence or associativity: an unparenthesized chain
    // is a parse error, never a silent left-fold
    intercept[ParseException](Parser.parse(
      "(SEARCH [x] ON a) UNION (SEARCH [x] ON b) EXCEPT (SEARCH [x] ON c)"))
    // a nested side must still be a SEARCH or set op, not another read
    intercept[ParseException](Parser.parse(
      "((SEARCH [x] ON a) UNION (CHANGES b 1)) EXCEPT (SEARCH [x] ON c)"))
    // nested chains compose as a source and under EXPLAIN
    assert(Parser.parse(
      "SEARCH [x] ON [(((SEARCH [x] ON a) UNION (SEARCH [x] ON b)) EXCEPT (SEARCH [x] ON c))]")
      == Search(List(Container.Combo(
        SetOp("except", all = false, SetOp("union", all = false, a, b), c))),
        List("x"), None))
    assert(Parser.parse(
      "EXPLAIN ((SEARCH [x] ON a) UNION (SEARCH [x] ON b)) EXCEPT (SEARCH [x] ON c)")
      == Explain(SetOp("except", all = false,
        SetOp("union", all = false, a, b), c), analyze = false))
  }
}
