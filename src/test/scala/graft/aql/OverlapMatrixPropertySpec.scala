package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): the N-way SHOW OVERLAP matrix against an
  * independent driver-side set-algebra model, under randomized source
  * contents — grouped and ungrouped. Every sketch stays far below the
  * 2^12 exact threshold, so theta estimates are EXACT and equality (not
  * a tolerance band) is the assertion. The model follows the statement's
  * contract: one row per upper-triangle pair (per group with BY, for
  * groups present on EITHER side of that pair), intersection / union /
  * exclusives / jaccard over the DISTINCT value sets.
  */
class OverlapMatrixPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(314159)

  // four sources of (id, grp) rows: overlapping id subsets, group values
  // deliberately NOT present in every source (one-sided groups are the
  // fiddly path of the full-outer pair fan-out), duplicates included
  // (the sketch counts DISTINCT values — the model must too)
  private val groups = Vector("g0", "g1", "g2")
  private val contents: Map[String, Vector[(Int, String)]] =
    (0 until 4).map { s =>
      val myGroups = groups.filter(_ => rng.nextInt(4) > 0) match {
        case v if v.isEmpty => Vector(groups(s % 3))
        case v => v
      }
      s"omp$s" -> Vector.fill(60)(
        (rng.nextInt(40), myGroups(rng.nextInt(myGroups.size))))
    }.toMap

  private lazy val eng: Engine = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ovmx-prop")
    val e = new Engine(spark, dir.toString)
    contents.foreach { case (c, rows) =>
      e.execute(s"CREATE CONTAINER $c ['id','grp'] [BIGINT, TEXT]")
      rows.foreach { case (i, g) =>
        e.execute(s"CREATE ROW ['id','grp'] [$i, '$g'] ON $c") }
      e.execute(s"COMMIT $c")
    }
    e
  }

  private def stats(a: Set[Long], b: Set[Long]) = {
    val inter = (a & b).size.toLong; val uni = (a | b).size.toLong
    (inter, uni, (a -- b).size.toLong, (b -- a).size.toLong,
      if (uni > 0) inter.toDouble / uni else 0.0)
  }

  test("random 3-source matrices ≡ exact pair set algebra (10 draws)") {
    val names = contents.keys.toVector.sorted
    for (_ <- 1 to 10) {
      val srcs = rng.shuffle(names).take(3)
      val got = eng.execute(s"SHOW OVERLAP [${srcs.mkString(", ")}] ON id")
        .asInstanceOf[Engine.ResultSet].df.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))))
        .toMap
      val sets = srcs.map(s => s -> contents(s).map(_._1.toLong).toSet).toMap
      val expect = (for {
        i <- srcs.indices; j <- (i + 1) until srcs.size
      } yield (srcs(i), srcs(j)) -> stats(sets(srcs(i)), sets(srcs(j)))).toMap
      assert(got == expect, s"sources $srcs:\n got $got\n expect $expect")
    }
  }

  test("random grouped matrices ≡ exact per-(pair, group) algebra (10 draws)") {
    val names = contents.keys.toVector.sorted
    for (_ <- 1 to 10) {
      val srcs = rng.shuffle(names).take(3)
      val got = eng.execute(s"SHOW OVERLAP [${srcs.mkString(", ")}] ON id BY grp")
        .asInstanceOf[Engine.ResultSet].df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(3)) ->
          ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8))))
        .toMap
      def grouped(s: String): Map[String, Set[Long]] =
        contents(s).groupBy(_._2).view
          .mapValues(_.map(_._1.toLong).toSet).toMap
      val expect = (for {
        i <- srcs.indices; j <- (i + 1) until srcs.size
        ga = grouped(srcs(i)); gb = grouped(srcs(j))
        g <- ga.keySet ++ gb.keySet // EITHER side's groups report
      } yield (srcs(i), srcs(j), g) -> stats(
        ga.getOrElse(g, Set.empty), gb.getOrElse(g, Set.empty))).toMap
      assert(got == expect, s"sources $srcs:\n got ${got.size} rows, " +
        s"expect ${expect.size}\n diff ${(got.toSet diff expect.toSet).take(5)}")
    }
  }
}
