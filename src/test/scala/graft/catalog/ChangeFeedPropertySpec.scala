package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the CDC feed: for ANY committed history, applying the
  * feed between two versions to the from-snapshot must reconstruct the
  * to-snapshot exactly (multiset semantics):
  *
  *   toV = fromV ∖ (delete ∪ update_preimage) ⊎ (insert ∪ update_postimage)
  *
  * Random insert/edit/delete/optimize sequences drive the history, so the
  * invariant covers compaction interleavings (all-fresh file names) and
  * multi-op commits, not just the hand-picked spec cases.
  */
class ChangeFeedPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(11)

  private def applyFeed(from: DataFrame, feed: DataFrame): DataFrame = {
    val cols = from.columns.toSeq
    val dropped = feed.filter(col("_change_type").isin("delete", "update_preimage"))
      .select(cols.map(col): _*)
    val added = feed.filter(col("_change_type").isin("insert", "update_postimage"))
      .select(cols.map(col): _*)
    from.exceptAll(dropped).unionAll(added)
  }

  private def rows(df: DataFrame): Map[(Int, String), Long] =
    df.collect().map(r => (r.getInt(0), Option(r.getString(1)).getOrElse("∅")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("6 random histories: feed(a,b) applied to version a reconstructs version b") {
    (1 to 6).foreach { trial =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cdcprop$trial")
      val cat = new Catalog(spark, dir.toString)
      cat.create("c", List("id" -> graft.aql.AlbaType.of("INT"),
        "v" -> graft.aql.AlbaType.of("SMALL-STRING")))
      val tx = new Tx(cat)
      // 5 commits of 1-3 random ops each, with an occasional OPTIMIZE
      (1 to 5).foreach { _ =>
        (0 until 1 + rng.nextInt(3)).foreach { _ =>
          rng.nextInt(6) match {
            case 0 | 1 | 2 =>
              tx.stageInsert("c", Seq(org.apache.spark.sql.Row(
                rng.nextInt(8), s"v${rng.nextInt(50)}")))
            case 3 | 4 =>
              tx.stageEdit("c", col("id") === rng.nextInt(8),
                Seq("v" -> s"e${rng.nextInt(50)}"))
            case 5 =>
              tx.stageDelete("c", Some(col("id") === rng.nextInt(8)))
          }
        }
        if (tx.stagedOps("c") > 0) tx.commit(Some("c"))
        if (rng.nextInt(4) == 0 && cat.currentVersion("c") > 0)
          cat.optimize("c", Some(2))
        // occasional RESTORE to a random older version: the feed must
        // classify the revert like any other commit (rows reappearing as
        // inserts, reverted edits as updates) — restore adds history, it
        // never rewrites it
        if (rng.nextInt(5) == 0 && cat.versions("c").size > 1) {
          val vs = cat.versions("c")
          cat.restore("c", vs(rng.nextInt(vs.size)))
        }
      }
      val vs = cat.versions("c")
      // every adjacent pair AND the full span must reconstruct
      val windows = vs.zip(vs.tail) :+ (vs.head, vs.last)
      windows.foreach { case (a, b) =>
        val reconstructed = rows(applyFeed(
          cat.readVersion("c", a), cat.changes("c", a, Some(b))))
        val target = rows(cat.readVersion("c", b))
        assert(reconstructed == target,
          s"trial $trial window v$a->v$b: got $reconstructed, want $target")
      }
      // and from genesis: feed(0, latest) is exactly the latest snapshot
      assert(rows(cat.changes("c", 0).filter(col("_change_type") === "insert")
          .select(col("id"), col("v"))) == rows(cat.read("c")))
    }
  }
}
