package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): random RECURSIVE set-operation trees executed
  * through the full AQL path must match an independent in-memory multiset
  * evaluator implementing standard SQL bag/set semantics —
  *   UNION            dedup(a ⊎ b)
  *   UNION ALL        a ⊎ b
  *   EXCEPT           dedup(a) − set(b)       (set difference)
  *   EXCEPT ALL       per-value max(0, cnt_a − cnt_b)
  *   INTERSECT        set(a) ∩ set(b)
  *   INTERSECT ALL    per-value min(cnt_a, cnt_b)
  * — the same algebra Spark's except/intersect[All]/distinct implement,
  * so a drift in the lowering (or in a future rewrite of lowerSetOp)
  * surfaces as a value diff, not just a shape change. Trees go to depth
  * 3 with leaf WHEREs, so association explicitly matters (the evaluator
  * follows the parse tree, never a left-fold).
  */
class SetOpPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(271828)

  // three leaf containers with OVERLAPPING multiset contents: duplicate
  // values are the whole point (ALL vs set semantics only diverge on
  // them), so values repeat both within and across containers
  private val contents: Map[String, Vector[Int]] = Map(
    "soa" -> Vector.fill(40)(rng.nextInt(12)),
    "sob" -> Vector.fill(40)(rng.nextInt(12)),
    "soc" -> Vector.fill(25)(rng.nextInt(8)))

  private lazy val eng: Engine = {
    val dir = java.nio.file.Files.createTempDirectory("graft-setop-prop")
    val e = new Engine(spark, dir.toString)
    contents.foreach { case (c, vs) =>
      e.execute(s"CREATE CONTAINER $c ['v'] [BIGINT]")
      vs.foreach(v => e.execute(s"CREATE ROW ['v'] [$v] ON $c"))
      e.execute(s"COMMIT $c")
    }
    e
  }

  private sealed trait Tree {
    def aql: String
    def eval: Vector[Long] // multiset of v values (order-free)
  }
  private case class Leaf(c: String, minV: Option[Int]) extends Tree {
    def aql: String =
      s"(SEARCH [v] ON $c${minV.map(m => s" WHERE v >= $m").getOrElse("")})"
    def eval: Vector[Long] = contents(c).collect {
      case v if minV.forall(v >= _) => v.toLong
    }
  }
  private case class Node(op: String, all: Boolean, l: Tree, r: Tree) extends Tree {
    def aql: String = s"(${l.aql} ${op.toUpperCase}${if (all) " ALL" else ""} ${r.aql})"
    def eval: Vector[Long] = {
      val (a, b) = (l.eval, r.eval)
      def counts(xs: Vector[Long]) = xs.groupBy(identity).view.mapValues(_.size).toMap
      (op, all) match {
        case ("union", true) => a ++ b
        case ("union", false) => (a ++ b).distinct
        case ("except", false) => a.distinct.filterNot(b.toSet)
        case ("except", true) =>
          val cb = counts(b)
          counts(a).toVector.flatMap { case (v, n) =>
            Vector.fill(math.max(0, n - cb.getOrElse(v, 0)))(v) }
        case ("intersect", false) => a.distinct.filter(b.toSet)
        case ("intersect", true) =>
          val cb = counts(b)
          counts(a).toVector.flatMap { case (v, n) =>
            Vector.fill(math.min(n, cb.getOrElse(v, 0)))(v) }
        case other => sys.error(s"unknown op $other")
      }
    }
  }

  private def randomTree(depth: Int): Tree =
    if (depth == 0 || rng.nextInt(3) == 0)
      Leaf(contents.keys.toVector(rng.nextInt(3)),
        if (rng.nextBoolean()) Some(rng.nextInt(10)) else None)
    else {
      val op = Vector("union", "except", "intersect")(rng.nextInt(3))
      Node(op, rng.nextBoolean(), randomTree(depth - 1), randomTree(depth - 1))
    }

  test("40 random set-op trees (depth ≤ 3, ALL mixed) ≡ the multiset model") {
    var nontrivial = 0
    for (i <- 1 to 40) {
      val t = randomTree(3) match {
        // a bare leaf isn't a set-op statement — wrap it once
        case l: Leaf => Node("union", all = true, l, l)
        case n => n
      }
      // the statement form drops the OUTERMOST parens
      val stmt = t.aql.stripPrefix("(").stripSuffix(")")
      val got = eng.execute(stmt).asInstanceOf[Engine.ResultSet]
        .df.collect().map(_.getLong(0)).toVector.sorted
      val expect = t.eval.sorted
      assert(got == expect,
        s"tree #$i: $stmt\n got ${got.take(50)}\n expect ${expect.take(50)}")
      if (expect.nonEmpty) nontrivial += 1
    }
    assert(nontrivial >= 25, s"only $nontrivial non-empty results — fixture too sparse")
  }

  test("the same trees compose as SEARCH sources with an outer WHERE") {
    for (_ <- 1 to 10) {
      val t = Node("except", all = true, randomTree(2), randomTree(2))
      val got = eng.execute(s"SEARCH [] ON [${t.aql}] WHERE v <= 6")
        .asInstanceOf[Engine.ResultSet]
        .df.collect().map(_.getLong(0)).toVector.sorted
      assert(got == t.eval.filter(_ <= 6L).sorted)
    }
  }
}
