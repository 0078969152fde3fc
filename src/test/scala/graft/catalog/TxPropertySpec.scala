package graft.catalog

import graft.TestSpark
import graft.aql.Engine
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property test: random insert/edit/delete/commit/rollback
  * interleavings executed through the engine must leave exactly the state
  * an in-memory sequential model predicts — both the committed base and
  * the live MVCC view (SURVEY.md §5: commit/rollback interleavings
  * preserve committed-state invariants).
  */
class TxPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(7)

  private sealed trait Op
  private case class Ins(k: Int, v: String) extends Op
  private case class Edit(k: Int, v: String) extends Op
  private case class Del(k: Int) extends Op
  private case class Merge(k: Int, v: String) extends Op
  private case object RestoreAny extends Op
  private case object Commit extends Op
  private case object Rollback extends Op

  private def randomOp(): Op = rng.nextInt(12) match {
    case 0 | 1 | 2 | 3 => Ins(rng.nextInt(6), s"v${rng.nextInt(100)}")
    case 4 | 5 => Edit(rng.nextInt(6), s"e${rng.nextInt(100)}")
    case 6 => Del(rng.nextInt(6))
    case 7 | 8 => Commit
    case 9 => Rollback
    case 10 => Merge(rng.nextInt(6), s"m${rng.nextInt(100)}")
    case 11 => RestoreAny
  }

  /** The model: committed rows + staged ops replayed sequentially, plus
    * the version history (grows on staged-commit and on restore — the
    * same moments the engine publishes a version). */
  private final class Model {
    var committed: Vector[(Int, String)] = Vector.empty
    var history: Vector[Vector[(Int, String)]] = Vector.empty
    private var staged: Vector[Op] = Vector.empty
    def stagedEmpty: Boolean = staged.isEmpty
    def apply(op: Op): Unit = op match {
      case Commit =>
        if (staged.nonEmpty) {
          committed = view; history :+= committed; staged = Vector.empty
        }
      case Rollback => staged = Vector.empty
      // MERGE ROW probes the SESSION VIEW: hit stages an edit, miss an
      // insert — the engine's documented pk-upsert decomposition
      case Merge(k, v) =>
        staged :+= (if (view.exists(_._1 == k)) Edit(k, v) else Ins(k, v))
      case RestoreAny => () // resolved by the driver loop (needs history)
      case o => staged :+= o
    }
    def restore(i: Int): Unit = { committed = history(i); history :+= committed }
    def view: Vector[(Int, String)] = staged.foldLeft(committed) { (rows, op) =>
      op match {
        case Ins(k, v) => rows :+ (k, v)
        case Edit(k, v) => rows.map { case (rk, rv) => (rk, if (rk == k) v else rv) }
        case Del(k) => rows.filterNot(_._1 == k)
        case _ => rows
      }
    }
  }

  test("8 random 14-op interleavings match the sequential model") {
    (1 to 8).foreach { trial =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-txprop$trial")
      val eng = new Engine(spark, dir.toString)
      eng.execute("CREATE CONTAINER txp ['k','v'] [INT, SMALL-STRING]")
      val model = new Model
      val ops = Vector.fill(14)(randomOp()) :+ Commit
      ops.foreach { op =>
        op match {
          case Ins(k, v) => eng.execute(s"CREATE ROW ['k','v'] [$k,'$v'] ON txp")
          case Edit(k, v) => eng.execute(s"EDIT ROW ['v'] ['$v'] ON txp WHERE k = $k")
          case Del(k) => eng.execute(s"DELETE ROW ON txp WHERE k = $k")
          case Merge(k, v) => eng.execute(s"MERGE ROW ['k','v'] [$k,'$v'] ON txp")
          case Commit => eng.execute("COMMIT txp")
          case Rollback => eng.execute("ROLLBACK txp")
          case RestoreAny => // valid only version-ful and unstaged
            if (model.stagedEmpty && model.history.nonEmpty) {
              val i = rng.nextInt(model.history.size)
              eng.execute(s"RESTORE CONTAINER txp TO VERSION ${i + 1}")
              model.restore(i)
            }
        }
        model.apply(op)
      }
      def sortedRows(rows: Seq[(Int, String)]) = rows.sorted
      // committed base equals the model
      val base = eng.catalog.read("txp").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(sortedRows(base) == sortedRows(model.committed),
        s"trial $trial: base mismatch after ops $ops")
      // and the live view (add ops without committing) also matches
      val extra = Vector.fill(4)(randomOp())
        .filterNot(o => o == Commit || o == Rollback || o == RestoreAny)
      extra.foreach { op =>
        op match {
          case Ins(k, v) => eng.execute(s"CREATE ROW ['k','v'] [$k,'$v'] ON txp")
          case Edit(k, v) => eng.execute(s"EDIT ROW ['v'] ['$v'] ON txp WHERE k = $k")
          case Del(k) => eng.execute(s"DELETE ROW ON txp WHERE k = $k")
          case Merge(k, v) => eng.execute(s"MERGE ROW ['k','v'] [$k,'$v'] ON txp")
          case _ =>
        }
        model.apply(op)
      }
      val view = eng.execute("SEARCH [] ON txp")
        .asInstanceOf[Engine.ResultSet].df.collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(sortedRows(view) == sortedRows(model.view),
        s"trial $trial: view mismatch after extra ops $extra")
    }
  }

  test("6 random interleavings over TWO containers with group COMMITs match per-container models") {
    // the bare `COMMIT` (all staged containers) takes the atomic group
    // path when both logs are non-empty; its observable semantics must
    // stay exactly the sequential per-container fold
    (1 to 6).foreach { trial =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-txpg$trial")
      val eng = new Engine(spark, dir.toString)
      eng.execute("CREATE CONTAINER ga ['k','v'] [INT, SMALL-STRING]")
      eng.execute("CREATE CONTAINER gb ['k','v'] [INT, SMALL-STRING]")
      val models = Map("ga" -> new Model, "gb" -> new Model)
      val ops: Vector[(String, Op)] =
        Vector.fill(16) {
          val c = if (rng.nextBoolean()) "ga" else "gb"
          randomOp() match {
            // commits/rollbacks sometimes drop the qualifier → group path
            case Commit | Rollback =>
              (if (rng.nextBoolean()) "*" else c,
                if (rng.nextBoolean()) Commit else Rollback)
            case o => (c, o)
          }
        } :+ (("*", Commit))
      ops.foreach { case (c, op) =>
        (c, op) match {
          case ("*", Commit) => eng.execute("COMMIT"); models.values.foreach(_.apply(Commit))
          case ("*", Rollback) => eng.execute("ROLLBACK"); models.values.foreach(_.apply(Rollback))
          case (cn, Ins(k, v)) =>
            eng.execute(s"CREATE ROW ['k','v'] [$k,'$v'] ON $cn"); models(cn).apply(op)
          case (cn, Edit(k, v)) =>
            eng.execute(s"EDIT ROW ['v'] ['$v'] ON $cn WHERE k = $k"); models(cn).apply(op)
          case (cn, Del(k)) =>
            eng.execute(s"DELETE ROW ON $cn WHERE k = $k"); models(cn).apply(op)
          case (cn, Merge(k, v)) =>
            eng.execute(s"MERGE ROW ['k','v'] [$k,'$v'] ON $cn"); models(cn).apply(op)
          case (cn, RestoreAny) =>
            if (models(cn).stagedEmpty && models(cn).history.nonEmpty) {
              val i = rng.nextInt(models(cn).history.size)
              eng.execute(s"RESTORE CONTAINER $cn TO VERSION ${i + 1}")
              models(cn).restore(i)
            }
          case (cn, Commit) => eng.execute(s"COMMIT $cn"); models(cn).apply(Commit)
          case (cn, Rollback) => eng.execute(s"ROLLBACK $cn"); models(cn).apply(Rollback)
        }
      }
      Seq("ga", "gb").foreach { cn =>
        val base = eng.catalog.read(cn).collect()
          .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
        assert(base == models(cn).committed.sorted,
          s"trial $trial: $cn base mismatch after $ops")
      }
    }
  }
}
