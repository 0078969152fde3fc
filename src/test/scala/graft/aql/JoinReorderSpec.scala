package graft.aql

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Stats-driven join REORDERING: a SEARCH join chain executes as written
  * unless every joined side carries a usable stats price — then the
  * chain runs greedy smallest-build-first, narrated in EXPLAIN's Access
  * Path, with row-identity to the as-written execution pinned here (the
  * same correctness-neutrality stance as the join-side pins).
  */
class JoinReorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-reorder-$tag")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    import spark.implicits._
    eng.execute("CREATE CONTAINER f ['id','v'] [BIGINT, BIGINT]")
    cat.overwrite("f", (0L until 4000L).map(i => (i, i % 11)).toDF("id", "v"))
    // mid-size side: 800 rows; small side: 12 rows — written big-first
    eng.execute("CREATE CONTAINER mid ['mk','mval'] [BIGINT, BIGINT]")
    cat.overwrite("mid", (0L until 800L).map(i => (i * 5, i % 7)).toDF("mk", "mval"))
    eng.execute("CREATE CONTAINER dim ['dk','dname'] [BIGINT, TEXT]")
    cat.overwrite("dim", (0L until 12L).map(i => (i * 5, s"d$i")).toDF("dk", "dname"))
    (eng, cat)
  }

  private def rows(eng: Engine, aql: String): Set[Seq[Any]] =
    eng.orderedResult(eng.execute(aql).asInstanceOf[Engine.ResultSet].cursorId)
      .get.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  private def plan(eng: Engine, aql: String): String =
    eng.execute(s"EXPLAIN $aql").asInstanceOf[Engine.Done].message

  private val chain = "SEARCH [id, mval, dname] ON f " +
    "JOIN mid ON id = mk JOIN dim ON id = dk WHERE v < 8"

  test("pessimal written order reorders smallest-first once every side prices") {
    val (eng, cat) = fixture("basic")
    // no stats: as written, no narration
    assert(!plan(eng, chain).contains("reordered"),
      "without stats the chain must run as written")
    val asWritten = rows(eng, chain)
    eng.execute("ANALYZE CONTAINER mid")
    // ONE priced side is not enough — partial stats defer entirely
    assert(!plan(eng, chain).contains("reordered"),
      "a partially priced chain must not reorder")
    eng.execute("ANALYZE CONTAINER dim")
    val p = plan(eng, chain)
    assert(p.contains("join chain reordered from stats") &&
      p.replaceAll("(?s).*reordered from stats: ", "").startsWith("dim("),
      s"smallest build (dim) must join first:\n$p")
    // row identity with the as-written execution and a plain Spark join
    assert(rows(eng, chain) == asWritten)
    assert(asWritten == cat.read("f").filter(col("v") < 8)
      .join(cat.read("mid"), col("id") === col("mk"))
      .join(cat.read("dim"), col("id") === col("dk"))
      .select(col("id"), col("mval"), col("dname"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet)
  }

  test("a dependent ON condition pins its prerequisite ahead, whatever the prices") {
    val (eng, cat) = fixture("dep")
    import spark.implicits._
    // link joins THROUGH mid's column: it can only bind after mid
    eng.execute("CREATE CONTAINER link ['lk','lname'] [BIGINT, TEXT]")
    cat.overwrite("link", (0L until 7L).map(i => (i, s"l$i")).toDF("lk", "lname"))
    Seq("mid", "link").foreach(c => eng.execute(s"ANALYZE CONTAINER $c"))
    val dep = "SEARCH [id, lname] ON f JOIN mid ON id = mk JOIN link ON mval = lk"
    // link (7 rows) prices below mid (800), but its ON references mval —
    // the greedy order must keep mid first, i.e. no reorder to narrate
    assert(!plan(eng, dep).contains("reordered"),
      s"dependency must override price:\n${plan(eng, dep)}")
    assert(rows(eng, dep) == cat.read("f")
      .join(cat.read("mid"), col("id") === col("mk"))
      .join(cat.read("link"), col("mval") === col("lk"))
      .select(col("id"), col("lname"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet)
  }

  test("left joins move behind the inner prefix; virtual inner sides never reorder") {
    val (eng, cat) = fixture("outer")
    Seq("f", "mid", "dim").foreach(c => eng.execute(s"ANALYZE CONTAINER $c"))
    // (f LEFT mid) INNER dim ≡ (f INNER dim) LEFT mid when dim's ON binds
    // on f alone — the reorder shrinks f BEFORE paying the left join
    val leftChain = "SEARCH [id, mval, dname] ON f " +
      "LEFT JOIN mid ON id = mk JOIN dim ON id = dk"
    val p = plan(eng, leftChain)
    assert(p.contains("join chain reordered from stats") &&
      p.replaceAll("(?s).*reordered from stats: ", "").startsWith("dim("),
      s"the inner join must be pulled ahead of the left join:\n$p")
    assert(rows(eng, leftChain) == cat.read("f")
      .join(cat.read("mid"), col("id") === col("mk"), "left")
      .join(cat.read("dim"), col("id") === col("dk"))
      .select(col("id"), col("mval"), col("dname"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet)
    val virtChain = "SEARCH [id, mval, dname] ON f " +
      "JOIN (SEARCH [mk, mval] ON mid) ON id = mk JOIN dim ON id = dk"
    assert(!plan(eng, virtChain).contains("reordered"),
      "an unpriceable virtual side must defer to written order")
    // both still answer correctly
    assert(rows(eng, virtChain).nonEmpty)
  }

  test("an inner ON needing the left side's column pins written order") {
    val (eng, cat) = fixture("leftdep")
    import spark.implicits._
    eng.execute("CREATE CONTAINER link ['lk','lname'] [BIGINT, TEXT]")
    cat.overwrite("link", (0L until 7L).map(i => (i, s"l$i")).toDF("lk", "lname"))
    Seq("f", "mid", "link").foreach(c => eng.execute(s"ANALYZE CONTAINER $c"))
    // link's ON references mval — it cannot bind before the LEFT join
    // supplies it, so the inners-first order is unbuildable → written
    val dep = "SEARCH [id, lname] ON f LEFT JOIN mid ON id = mk " +
      "JOIN link ON mval = lk"
    assert(!plan(eng, dep).contains("reordered"),
      s"an inner join dependent on the left side must stay written:\n${plan(eng, dep)}")
    assert(rows(eng, dep) == cat.read("f")
      .join(cat.read("mid"), col("id") === col("mk"), "left")
      .join(cat.read("link"), col("mval") === col("lk"))
      .select(col("id"), col("lname"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet)
  }

  test("a left ON referencing a later container errors identically under stats") {
    val (eng, _) = fixture("lefterr")
    // dname lives in dim, which joins AFTER the left join — invalid as
    // written. The reorder (which moves lefts behind the inner prefix,
    // widening the bound column set) must not make query validity depend
    // on ANALYZE freshness: same error before and after stats.
    val bad = "SEARCH [id, dname] ON f LEFT JOIN mid ON dname = mk " +
      "JOIN dim ON id = dk"
    def msg: String = intercept[Exception](rows(eng, bad)).getMessage
    val noStats = msg
    assert(noStats.contains("dname"), s"expected the bind error, got: $noStats")
    Seq("f", "mid", "dim").foreach(c => eng.execute(s"ANALYZE CONTAINER $c"))
    assert(msg == noStats,
      "stats freshness must not change which statements error")
  }

  test("property: shuffled priced 4-chains stay row-identical to the Spark reference") {
    val (eng, cat) = fixture("prop")
    import spark.implicits._
    val rng = new scala.util.Random(41)
    eng.execute("CREATE CONTAINER p1 ['k1','x1'] [BIGINT, BIGINT]")
    eng.execute("CREATE CONTAINER p2 ['k2','x2'] [BIGINT, BIGINT]")
    // keys overlap densely on multiples of 5 up to 55 so the property
    // pins a NON-TRIVIAL row set (a lone surviving row would let a
    // wrong-key reorder pass)
    cat.overwrite("p1", (0L until 450L).map(i => (i, i % 5)).toDF("k1", "x1"))
    cat.overwrite("p2", (0L until 40L).map(i => (i * 5, i % 3)).toDF("k2", "x2"))
    Seq("f", "mid", "dim", "p1", "p2").foreach(c =>
      eng.execute(s"ANALYZE CONTAINER $c"))
    val expected = cat.read("f").filter(col("v") < 9)
      .join(cat.read("mid"), col("id") === col("mk"))
      .join(cat.read("dim"), col("id") === col("dk"))
      .join(cat.read("p1"), col("id") === col("k1"))
      .join(cat.read("p2"), col("id") === col("k2"))
      .select(col("id"), col("mval"), col("dname"), col("x1"), col("x2"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet
    assert(expected.size >= 5, s"the pin needs a non-trivial row set, got ${expected.size}")
    for (i <- 1 to 5) {
      val joins = rng.shuffle(List("JOIN mid ON id = mk", "JOIN dim ON id = dk",
        "JOIN p1 ON id = k1", "JOIN p2 ON id = k2"))
      val q = "SEARCH [id, mval, dname, x1, x2] ON f " +
        joins.mkString(" ") + " WHERE v < 9"
      assert(rows(eng, q) == expected, s"permutation $i: ${joins.mkString(" ")}")
    }
  }

  test("reordered USING-style same-named keys stay row-identical") {
    val (eng, cat) = fixture("using")
    import spark.implicits._
    // both sides carry the key under the SAME name (USING semantics)
    eng.execute("CREATE CONTAINER u1 ['id','a'] [BIGINT, BIGINT]")
    cat.overwrite("u1", (0L until 900L).map(i => (i * 4, i)).toDF("id", "a"))
    eng.execute("CREATE CONTAINER u2 ['id','b'] [BIGINT, TEXT]")
    cat.overwrite("u2", (0L until 9L).map(i => (i * 400, s"b$i")).toDF("id", "b"))
    Seq("u1", "u2").foreach(c => eng.execute(s"ANALYZE CONTAINER $c"))
    val q = "SEARCH [id, a, b] ON f JOIN u1 ON id = id JOIN u2 ON id = id"
    assert(plan(eng, q).contains("reordered"), plan(eng, q))
    assert(rows(eng, q) == cat.read("f")
      .join(cat.read("u1"), Seq("id")).join(cat.read("u2"), Seq("id"))
      .select(col("id"), col("a"), col("b"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet)
  }
}
