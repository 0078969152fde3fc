package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full Lloyd k-means loop built from the two oracle-verified halves
  * (Similarity.assign + per-cluster mean update). Centroids live on the
  * driver between iterations — k×64 doubles, the same layout Spark MLlib
  * uses — while assignment and update stay fully distributed.
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.Tables.load(spark, dir, "embeddings")

  private def inertia(assigned: DataFrame): Double =
    assigned.agg(sum(col("d2"))).head.getDouble(0)

  private def meanCentroids(assigned: DataFrame): DataFrame = {
    val dims = (1 to 64).map(i =>
      avg(element_at(col("embedding"), i).cast("double")))
    assigned.groupBy(col("cluster").as("sid"))
      .agg(array(dims: _*).as("semb"))
  }

  test("Lloyd iterations: inertia is monotonically non-increasing") {
    val e = emb
    var assigned = Similarity.assignToSeeds(e).cache()
    var prev = inertia(assigned)
    for (it <- 1 to 3) {
      val next = Similarity.assign(e, meanCentroids(assigned)).cache()
      val cur = inertia(next)
      // d2 is rounded to 6 decimals inside assign, so allow that much slack
      assert(cur <= prev + 1e-5 * next.count(),
        s"iteration $it raised inertia: $prev -> $cur")
      assigned.unpersist()
      assigned = next
      prev = cur
    }
    assigned.unpersist()
  }

  test("assignment is a nearest-centroid argmin (spot-check vs local math)") {
    val seeds = emb.orderBy(col("vec_id")).limit(8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val rows = Similarity.assignToSeeds(emb).collect()
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dist2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.take(50).foreach { r =>
      val (id, cluster, d2) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val best = seeds.map { case (sid, s) =>
        (BigDecimal(dist2(vecs(id), s)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, sid)
      }.min
      assert(best._2 == cluster, s"vec $id assigned $cluster, local argmin ${best._2}")
      assert(math.abs(best._1 - d2) < 1e-6, s"vec $id d2 $d2 vs local ${best._1}")
    }
  }

  test("every cluster in the update is non-empty and counts sum to corpus") {
    val upd = graft.SparkEntry.queries("km_lloyd_update")(spark, dir).collect()
    assert(upd.map(_.getLong(1)).sum == emb.count())
    assert(upd.forall(_.getLong(1) > 0))
  }
}
