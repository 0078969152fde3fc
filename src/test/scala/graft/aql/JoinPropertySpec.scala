package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): AQL JOIN / LEFT JOIN executed through the full
  * engine path must match an independent in-memory nested-loop evaluator
  * implementing textbook join semantics — key collisions, key misses,
  * duplicate keys on both sides (row multiplication), and NULL-extension
  * for LEFT all arise from the random data.
  */
class JoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(4321)

  // small key domain → guaranteed collisions AND misses; duplicates on
  // both sides → multiplicities matter, so compare as multisets
  private case class L(lid: Int, k: Int, tag: String)
  private case class Rr(rid: Int, rk: Int, label: String)
  private val left: Vector[L] = Vector.tabulate(40)(i =>
    L(i, rng.nextInt(12), Vector("a", "b", "c")(rng.nextInt(3))))
  private val right: Vector[Rr] = Vector.tabulate(30)(i =>
    Rr(1000 + i, rng.nextInt(12), Vector("x", "y")(rng.nextInt(2))))

  private lazy val eng: Engine = {
    val dir = java.nio.file.Files.createTempDirectory("graft-joinprop")
    val e = new Engine(spark, dir.toString)
    e.execute("CREATE CONTAINER jl ['lid','k','tag'] [INT, INT, SMALL-STRING]")
    e.execute("CREATE CONTAINER jr ['rid','rk','label'] [INT, INT, SMALL-STRING]")
    left.foreach(l => e.execute(
      s"CREATE ROW ['lid','k','tag'] [${l.lid}, ${l.k}, '${l.tag}'] ON jl"))
    right.foreach(r => e.execute(
      s"CREATE ROW ['rid','rk','label'] [${r.rid}, ${r.rk}, '${r.label}'] ON jr"))
    e.execute("COMMIT jl"); e.execute("COMMIT jr")
    e
  }

  private def viaAql(aql: String): Seq[(Int, Option[Int])] =
    eng.execute(aql).asInstanceOf[Engine.ResultSet].df.collect().toSeq
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))

  private def multiset[T](xs: Seq[T]): Map[T, Int] =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  test("inner join matches the nested-loop reference (multiplicities included)") {
    val got = viaAql("SEARCH ['lid','rid'] ON jl JOIN jr ON k = rk")
      .map { case (a, b) => (a, b.get) }
    val want = for (l <- left; r <- right; if l.k == r.rk) yield (l.lid, r.rid)
    assert(multiset(got) == multiset(want))
    assert(got.nonEmpty, "fixture should produce collisions")
  }

  test("left join matches, incl. NULL-extension for unmatched keys") {
    val got = viaAql("SEARCH ['lid','rid'] ON jl LEFT JOIN jr ON k = rk")
    val want = left.flatMap { l =>
      val ms = right.filter(_.rk == l.k)
      if (ms.isEmpty) Seq((l.lid, None))
      else ms.map(r => (l.lid, Some(r.rid)))
    }
    assert(multiset(got) == multiset(want))
    assert(got.exists(_._2.isEmpty), "fixture should produce unmatched left rows")
  }

  test("WHERE over the joined row filters the reference product identically") {
    val got = viaAql(
      "SEARCH ['lid','rid'] ON jl JOIN jr ON k = rk WHERE tag = 'a' AND label = 'x'")
      .map { case (a, b) => (a, b.get) }
    val want = for (l <- left; r <- right;
                    if l.k == r.rk && l.tag == "a" && r.label == "x")
      yield (l.lid, r.rid)
    assert(multiset(got) == multiset(want))
  }

  test("chained join over three containers matches the double product") {
    // a second right-side container joined on the same key domain
    eng.execute("CREATE CONTAINER jm ['mid','mk'] [INT, INT]")
    (0 until 10).foreach(i => eng.execute(
      s"CREATE ROW ['mid','mk'] [${2000 + i}, ${rng.nextInt(12)}] ON jm"))
    eng.execute("COMMIT jm")
    val mids = eng.execute("SEARCH [] ON jm").asInstanceOf[Engine.ResultSet]
      .df.collect().map(r => (r.getInt(0), r.getInt(1))).toVector
    val got = viaAql("SEARCH ['lid','mid'] ON jl JOIN jr ON k = rk JOIN jm ON mk = rk")
      .map { case (a, b) => (a, b.get) }
    val want = for (l <- left; r <- right; m <- mids;
                    if l.k == r.rk && m._2 == r.rk) yield (l.lid, m._1)
    assert(multiset(got) == multiset(want))
  }
}
