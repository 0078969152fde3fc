package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `value` index kind: plain value→pk secondary index over any
  * TEXT/INT/BIGINT column — the generalization of the reference's
  * first-column-only chunk index (`/root/reference/src/indexing.rs`) to
  * arbitrary columns, commit-maintained like every derived index and
  * served through the same literal-key bucket/stat-pruned scan shape.
  */
class ValueIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-vix-$tag")
    val cat = new Catalog(spark, dir.toString)
    cat.create("t", List("id" -> graft.aql.AlbaType.of("BIGINT"),
      "grp" -> graft.aql.AlbaType.of("TEXT"),
      "n" -> graft.aql.AlbaType.of("INT")))
    import spark.implicits._
    val base = (0L until 40L).map(i => (i, s"g${i % 5}", (i % 7).toInt))
      .toDF("id", "grp", "n")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    cat.overwrite("t", base) // v1
    (cat, dir)
  }

  test("create + lookup: candidates are exactly the rows holding the value") {
    val (cat, _) = fixture("basic")
    val idef = cat.createIndex("t", "vg", "value", "grp")
    val ids = Index.valueLookup(cat, "t", idef, Seq("g2"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 40L).filter(_ % 5 == 2).toSet)
    // typed equality on an INT column too
    val idef2 = cat.createIndex("t", "vn", "value", "n")
    val ids2 = Index.valueLookup(cat, "t", idef2, Seq(3))
      .collect().map(_.getLong(0)).toSet
    assert(ids2 == (0L until 40L).filter(_ % 7 == 3).toSet)
    // a float/bytes column is rejected
    intercept[IllegalArgumentException] {
      val c2 = new Catalog(spark, java.nio.file.Files
        .createTempDirectory("graft-vix-rej").toString)
      c2.create("x", List("id" -> graft.aql.AlbaType.of("BIGINT"),
        "f" -> graft.aql.AlbaType.of("FLOAT")))
      c2.createIndex("x", "vf", "value", "f")
    }
  }

  test("commit maintains the index: inserts appear, edits re-derive, no rebuild") {
    val (cat, _) = fixture("maint")
    val idef = cat.createIndex("t", "vg", "value", "grp")
    val tx = new Tx(cat)
    tx.stageInsert("t", Seq(org.apache.spark.sql.Row(100L, "g2", 1)))
    tx.stageEdit("t", col("id") === 7L, Seq("grp" -> "zz"))
    tx.commit(Some("t"))
    val ids = Index.valueLookup(cat, "t", idef, Seq("g2"))
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(100L), "committed insert must be index-visible")
    assert(!ids.contains(7L), "edited-away value must leave the index")
    assert(Index.valueLookup(cat, "t", idef, Seq("zz"))
      .collect().map(_.getLong(0)).toSet == Set(7L))
    // time travel: v1's index still serves the pre-edit state
    assert(Index.valueLookup(cat, "t", idef, Seq("zz"), at = Some(1)).count() == 0)
  }
}
