package graft.catalog

import graft.TestSpark
import graft.operators.FullText
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `text` index kind: commit-maintained inverted postings with
  * per-file corpus-stats sentinel rows, serving BM25 top-k searches whose
  * answers are bit-equal to the full-scan baseline (`operators/FullText`).
  * An index changes where rows come from, never what they are — pinned
  * here across backfill, insert, delete, and OPTIMIZE.
  */
class FullTextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def textA(i: Int) = s"quick brown fox likes the brown fox den $i"
  private def textB(i: Int) = s"liquor jugs pack a dozen box crates $i"

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ft-$tag")
    val cat = new Catalog(spark, dir.toString)
    cat.create("docs", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "body" -> graft.aql.AlbaType.of("TEXT")))
    import spark.implicits._
    val base = ((0L until 8L).map(i => (i, textA(i.toInt)))
      ++ (8L until 16L).map(i => (i, textB(i.toInt))))
      .toDF("doc_id", "body")
      .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
    cat.overwrite("docs", base) // v1, 4 pk-range-clustered files
    (cat, dir)
  }

  /** Full-scan BM25 over the container's CURRENT rows — the oracle the
    * index-served path must reproduce exactly. */
  private def baseline(cat: Catalog, terms: Seq[String], k: Int = 20) = {
    val d = cat.read("docs").select(col("doc_id"), col("body").as("text"))
    FullText.bm25TopK(
      FullText.postingsOf(d).filter(col("term").isin(terms: _*)),
      FullText.statsOf(d), k)
  }

  private def served(cat: Catalog, terms: Seq[String], k: Int = 20) =
    cat.textSearch("docs", "ft", terms, k)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

  test("backfill: postings + one stats sentinel per src file; search equals full scan") {
    val (cat, _) = fixture("backfill")
    cat.createIndex("docs", "ft", "text", "body")
    val ix = cat.readIndex("docs", "ft")
    assert(ix.columns.toSet == Set("id", "term", "tf", "dl", "pos", "src"))

    val sent = ix.filter(col("term") === FullText.StatsTerm)
    assert(sent.count() == 4, "one stats sentinel per data file")
    assert(sent.agg(sum("tf")).collect()(0).getLong(0) == 16L, "N over sentinels")
    // textA docs have 9 tokens, textB docs 8
    assert(sent.agg(sum("dl")).collect()(0).getDouble(0) == 8.0 * 9 + 8.0 * 8,
      "Σdl over sentinels")
    assert(ix.filter(col("term") === "fox").count() == 8, "df(fox) = textA family")

    val q = Seq("fox", "jugs")
    assert(rows(served(cat, q)) == rows(baseline(cat, q)),
      "index-served BM25 must equal the full-scan baseline")
    // textA docs rank on 'fox' (tf=2), textB on 'jugs' (tf=1): both families
    // present, and every returned doc matched ≥1 term
    val got = rows(served(cat, q))
    assert(got.size == 16 && got.forall(_._3 >= 1L))
  }

  test("insert + COMMIT: new doc searchable; sentinel N/Σdl maintained incrementally") {
    val (cat, _) = fixture("insert")
    cat.createIndex("docs", "ft", "text", "body")
    val tx = new Tx(cat)
    tx.stageInsert("docs", Seq(org.apache.spark.sql.Row(99L, "fox fox fox den")))
    tx.commit(Some("docs"))
    assert(cat.currentVersion("docs") == 2)

    val sent = cat.readIndex("docs", "ft").filter(col("term") === FullText.StatsTerm)
    assert(sent.agg(sum("tf")).collect()(0).getLong(0) == 17L, "N counts the insert")
    assert(sent.agg(sum("dl")).collect()(0).getDouble(0) == 8.0 * 9 + 8.0 * 8 + 4)

    val got = rows(served(cat, Seq("fox")))
    assert(got.map(_._1).contains(99L), "committed doc is immediately searchable")
    // tf=3 in the shortest doc → top score
    assert(got.head._1 == 99L, s"highest-tf shortest doc ranks first, got $got")
    assert(rows(served(cat, Seq("fox"))) == rows(baseline(cat, Seq("fox"))))
  }

  test("delete + COMMIT: postings and stats drop the doc; search equals full scan") {
    val (cat, _) = fixture("delete")
    cat.createIndex("docs", "ft", "text", "body")
    val tx = new Tx(cat)
    tx.stageDelete("docs", Some(col("doc_id") === 3L))
    tx.commit(Some("docs"))

    val ix = cat.readIndex("docs", "ft")
    assert(!ix.filter(col("term") =!= FullText.StatsTerm)
      .select("id").collect().map(_.getLong(0)).contains(3L))
    val sent = ix.filter(col("term") === FullText.StatsTerm)
    assert(sent.agg(sum("tf")).collect()(0).getLong(0) == 15L, "N drops with the doc")
    assert(rows(served(cat, Seq("fox", "jugs"))) ==
      rows(baseline(cat, Seq("fox", "jugs"))))
  }

  test("OPTIMIZE compacts; stats re-derive over the compacted layout, search unchanged") {
    val (cat, _) = fixture("optimize")
    cat.createIndex("docs", "ft", "text", "body")
    val before = rows(served(cat, Seq("fox", "jugs")))
    cat.optimize("docs", targetFiles = Some(1))
    val sent = cat.readIndex("docs", "ft").filter(col("term") === FullText.StatsTerm)
    assert(sent.count() == 1, "one compacted file, one sentinel")
    assert(sent.agg(sum("tf")).collect()(0).getLong(0) == 16L)
    assert(rows(served(cat, Seq("fox", "jugs"))) == before)
  }

  test("guards: term-less lookup, non-text column, wrong dispatcher") {
    val (cat, _) = fixture("guards")
    cat.createIndex("docs", "ft", "text", "body")
    intercept[IllegalArgumentException](cat.textSearch("docs", "ft", Seq("")))
    intercept[RuntimeException](cat.createIndex("docs", "bad", "text", "doc_id"))
    // the band/ANN dispatcher refuses a text index with a pointer to textSearch
    import spark.implicits._
    val e = intercept[RuntimeException](
      cat.indexLookup("docs", "ft", Seq((0L, "x")).toDF("doc_id", "body")))
    assert(e.getMessage.contains("textSearch"))
    // query terms are lowercased and deduped; unknown terms yield empty
    assert(cat.textSearch("docs", "ft", Seq("FOX", "fox")).count() ==
      cat.textSearch("docs", "ft", Seq("fox")).count())
    assert(cat.textSearch("docs", "ft", Seq("zzz")).count() == 0)
  }
}
