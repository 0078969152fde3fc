package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): random AND/OR predicate chains executed through
  * the full AQL path must match an independent in-memory evaluator that
  * implements standard SQL semantics (AND binds tighter than OR,
  * left-to-right within a run) — SURVEY.md §5's random-predicate plan.
  */
class PredicatePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(1234)

  private case class R(id: Int, qty: Int, name: String, ok: Boolean)

  private val rows: Vector[R] = Vector.tabulate(80) { i =>
    R(i, rng.nextInt(50), Vector("apple", "pear", "plum", "kiwi", "fig")(rng.nextInt(5)),
      rng.nextBoolean())
  }

  private lazy val eng: Engine = {
    val dir = java.nio.file.Files.createTempDirectory("graft-prop")
    val e = new Engine(spark, dir.toString)
    e.execute("CREATE CONTAINER props ['id','qty','name','ok'] [INT, INT, SMALL-STRING, BOOL]")
    rows.foreach(r => e.execute(
      s"CREATE ROW ['id','qty','name','ok'] [${r.id}, ${r.qty}, '${r.name}', ${r.ok}] ON props"))
    e.execute("COMMIT props")
    e
  }

  private sealed trait Atom { def eval(r: R): Boolean; def aql: String }
  private case class QtyCmp(op: String, v: Int) extends Atom {
    def eval(r: R): Boolean = op match {
      case "=" => r.qty == v; case "!=" => r.qty != v
      case ">" => r.qty > v; case "<" => r.qty < v
      case ">=" => r.qty >= v; case "<=" => r.qty <= v
    }
    def aql = s"qty $op $v"
  }
  private case class NameEq(v: String, neg: Boolean) extends Atom {
    def eval(r: R): Boolean = if (neg) r.name != v else r.name == v
    def aql = s"name ${if (neg) "!=" else "="} '$v'"
  }
  private case class NameContains(v: String) extends Atom {
    def eval(r: R): Boolean = r.name.contains(v)
    def aql = s"name &> '$v'"
  }
  private case class OkIs(v: Boolean) extends Atom {
    def eval(r: R): Boolean = r.ok == v
    def aql = s"ok = $v"
  }

  private def randomAtom(): Atom = rng.nextInt(4) match {
    case 0 => QtyCmp(Vector("=", "!=", ">", "<", ">=", "<=")(rng.nextInt(6)), rng.nextInt(50))
    case 1 => NameEq(Vector("apple", "pear", "plum", "kiwi", "fig")(rng.nextInt(5)), rng.nextBoolean())
    case 2 => NameContains(Vector("p", "l", "i", "app", "z")(rng.nextInt(5)))
    case 3 => OkIs(rng.nextBoolean())
  }

  /** SQL precedence: OR of AND-runs. */
  private def evalChain(atoms: Vector[Atom], gates: Vector[Char])(r: R): Boolean = {
    val runs = Vector.newBuilder[Vector[Atom]]
    var cur = Vector(atoms.head)
    gates.zip(atoms.tail).foreach { case (g, a) =>
      if (g == 'a') cur :+= a else { runs += cur; cur = Vector(a) }
    }
    runs += cur
    runs.result().exists(_.forall(_.eval(r)))
  }

  test("30 random predicate chains match the in-memory evaluator") {
    (1 to 30).foreach { trial =>
      val n = 1 + rng.nextInt(5)
      val atoms = Vector.fill(n)(randomAtom())
      val gates = Vector.fill(math.max(0, n - 1))(if (rng.nextBoolean()) 'a' else 'o')
      val whereAql = atoms.head.aql + gates.zip(atoms.tail).map {
        case (g, a) => s" ${if (g == 'a') "AND" else "OR"} ${a.aql}"
      }.mkString
      val got = eng.execute(s"SEARCH ['id'] ON props WHERE $whereAql")
        .asInstanceOf[Engine.ResultSet].df.collect().map(_.getInt(0)).toSet
      val expected = rows.filter(evalChain(atoms, gates)).map(_.id).toSet
      assert(got == expected, s"trial $trial: WHERE $whereAql")
    }
  }
}
