package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components properties the fixture cannot exercise: dup
  * clusters from banded LSH are near-cliques (diameter ≤ 3-4), so the
  * pointer-jumping convergence claim — O(log diameter) rounds — needs a
  * synthetic long chain; correctness on arbitrary topologies needs random
  * graphs against a union-find reference.
  */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(9876)

  test("a 300-node path graph converges within the 20-round cap " +
    "(plain min-label propagation would need ~300 rounds)") {
    import spark.implicits._
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = TextDedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 300)
    assert(labels.forall(_._2 == 0L), "every chain vertex must take label 0")
  }

  test("TEXT-labeled chains converge correctly (convergence must not assume numeric labels)") {
    // a TEXT-pk container is legal for the dedup surfaces (the band
    // kinds constrain only the indexed column), so component labels can
    // be strings. The former label-SUM convergence check crashed Sum
    // under ANSI (and with ANSI off summed strings to NULL, declaring
    // convergence after ONE round — any chain deeper than a hop
    // mislabeled). The anti-join check is typed: a 6-node string chain
    // must fully collapse to its lexicographic minimum.
    import spark.implicits._
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f")
      .toDF("id_a", "id_b")
    val labels = TextDedup.connectedComponents(chain).collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(labels.length == 6)
    assert(labels.forall(_._2 == "a"),
      s"every chain vertex must take label 'a', got ${labels.toSeq.sorted}")
  }

  test("random graphs match a union-find reference") {
    import spark.implicits._
    for (trial <- 1 to 6) {
      val n = 20 + rng.nextInt(60)
      val edges = (0 until n).map { _ =>
        val a = rng.nextInt(n).toLong
        val b = rng.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // union-find reference over the same edges
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = vertices.map { v =>
          // component label = min vertex id in the component
          val root = find(v)
          v -> vertices.filter(u => find(u) == root).min
        }.toMap

        val got = TextDedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial: components diverge")
      }
    }
  }
}
