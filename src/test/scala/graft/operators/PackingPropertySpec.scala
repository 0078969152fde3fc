package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): random corpora through the exact t_seq_packing
  * plan must match an independent in-memory packer — including documents
  * longer than the window budget (multi-window spans), single-token docs,
  * sparse doc_ids, and sources of one document.
  */
class PackingPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(4321)

  test("random corpora pack identically to an in-memory reference packer") {
    import spark.implicits._
    for (trial <- 1 to 12) {
      val budget = Seq(7, 32, 128)(rng.nextInt(3))
      val nSources = 1 + rng.nextInt(4)
      val corpus = (0 until (1 + rng.nextInt(40))).map { i =>
        val nTok = 1 + rng.nextInt(3 * budget) // up to 3 windows long
        (i.toLong * (1 + rng.nextInt(3)), // sparse, strictly increasing ids
          s"src${rng.nextInt(nSources)}",
          Seq.fill(nTok)("w").mkString(" "))
      }.groupBy(_._1).map(_._2.head).toSeq // ids unique after scaling
      val df = corpus.toDF("doc_id", "source", "text")

      val got = TextDedup.seqPacking(df, budget).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getInt(5)))

      // reference packer: per source in doc_id order, running token start
      val expected = corpus.map { case (id, src, text) =>
        (id, src, text.split(" ").length.toLong)
      }.groupBy(_._2).flatMap { case (src, ds) =>
        var start = 0L
        ds.sortBy(_._1).map { case (id, _, nTok) =>
          val row = (id, src, nTok, start / budget, start % budget,
            if (start % budget + nTok > budget) 1 else 0)
          start += nTok
          row
        }
      }.toSet

      assert(got.toSet == expected,
        s"trial $trial (budget $budget): plan disagrees with reference packer")
      // windows tile: within each source, offsets restart exactly where
      // the previous doc ended (mod budget)
      got.groupBy(_._2).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._1)
        sorted.zip(sorted.tail).foreach { case (a, b) =>
          assert((a._4 * budget + a._5 + a._3) == (b._4 * budget + b._5),
            s"gap between doc ${a._1} and ${b._1}")
        }
      }
    }
  }
}
