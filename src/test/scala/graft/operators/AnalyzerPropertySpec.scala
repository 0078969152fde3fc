package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Analyzer's THREE spellings must tokenize identically — the
  * Spark column expression builds the postings, the driver-side twin
  * analyzes MATCH query literals, and the DuckDB expression recomputes
  * oracles. A divergence between the first two would make a query term
  * silently miss the postings it should probe (the worst failure mode:
  * no error, wrong recall). Fuzzed over a punctuation/digit/unicode
  * char soup, seeded: deterministic forever once green. (Spark↔DuckDB
  * parity is pinned separately by the analyzer oracle rows, which hash-
  * compare full BM25 rankings across the engines.)
  */
class AnalyzerPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(1618033)

  // letters (ascii + accented + CJK), digits, punctuation, runs of
  // spaces — every class both analyzers must agree on
  private val soup =
    "abcXYZ 0189 .,;:!?-_/()[]'\"«»…éÉüÜñÑçÇøØ中文カナ  \t" // incl. tab + double space

  private def randText(): String =
    (0 until 1 + rng.nextInt(40)).map(_ => soup(rng.nextInt(soup.length)))
      .mkString

  test("driver twin == Spark expression, both analyzers, 200 fuzzed strings") {
    val texts = (0 until 200).map(i => (i.toLong, randText())) :+
      (200L, "") :+ (201L, "   ") :+ (202L, "Word, word-word 3.14 N°5")
    import spark.implicits._
    val df = texts.toDF("id", "text")
    for (an <- Analyzer.Names) {
      val sparkSide = df
        .select(col("id"), Analyzer.tokens(col("text"), an).as("tk"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      texts.foreach { case (id, t) =>
        val driverSide = Analyzer.tokensOf(t, an).toList
        assert(sparkSide(id) == driverSide,
          s"analyzer '$an' diverged on ${t.take(60).mkString}: " +
            s"spark=${sparkSide(id)} driver=$driverSide")
      }
    }
  }

  test("standard strips every punctuation class; whitespace preserves it") {
    val s = "End. Mid-dash, (paren) 'quote' 99x"
    assert(Analyzer.tokensOf(s, Analyzer.Standard)
      == Seq("end", "mid", "dash", "paren", "quote", "99x"))
    assert(Analyzer.tokensOf(s, Analyzer.Whitespace)
      == Seq("end.", "mid-dash,", "(paren)", "'quote'", "99x"))
    // unknown names refuse everywhere
    intercept[IllegalArgumentException](Analyzer.requireValid("german"))
    intercept[IllegalArgumentException](Analyzer.tokensOf("x", "german"))
  }

  test("english = standard tokens − stop words, Porter-stemmed (round 16)") {
    val s = "The runners were running; a dog runs into THE parks."
    // standard keeps everything (lowercased, punctuation-stripped)
    assert(Analyzer.tokensOf(s, Analyzer.Standard)
      == Seq("the", "runners", "were", "running", "a", "dog", "runs",
        "into", "the", "parks"))
    // english drops the/a/into (stop set), stems the rest; 'were' is NOT
    // in the 33-word Lucene default set and survives as itself
    assert(Analyzer.tokensOf(s, Analyzer.English)
      == Seq("runner", "were", "run", "dog", "run", "park"))
    // stemming is 1:1 per surviving token: dl under english == the
    // stop-filtered standard count — the BM25 length-normalization
    // invariant the DuckDB sublayer oracle relies on
    val stopFiltered = Analyzer.tokensOf(s, Analyzer.Standard)
      .filterNot(Analyzer.StopWords.contains)
    assert(Analyzer.tokensOf(s, Analyzer.English).size == stopFiltered.size)
    // non-ASCII and digit-bearing tokens pass the stemmer unchanged
    assert(Analyzer.tokensOf("café 99x naïve", Analyzer.English)
      == Seq("café", "99x", "naïve"))
  }
}
