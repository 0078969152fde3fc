package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `word_grams` bit-equal to the declarative spellings it replaced
  * (round 18): the gramsArrN CASE/transform/array_join form for any n,
  * and withShingles' `element_at ||` 3-gram form — over random token
  * arrays (seeded) plus the edge cases (empty, shorter than n, exactly
  * n, repeated tokens, empty-string tokens, NULL array, NULL elements).
  */
class WordGramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def oldGrams(n: Int): String =
    s"CASE WHEN size(tk) >= $n THEN transform(sequence(1, size(tk)-${n - 1}), " +
      s"i -> array_join(slice(tk, i, $n), ' ')) ELSE array() END"

  private val oldShingles =
    "CASE WHEN size(tk) >= 3 THEN transform(sequence(1, size(tk)-2), " +
      "i -> element_at(tk,i) || ' ' || element_at(tk,i+1) || ' ' || element_at(tk,i+2)) " +
      "ELSE array() END"

  private val vocab = Vector("alpha", "beta", "gamma", "", "x", "delta9",
    "epsilon", "zeta", "longertokenhere", "q")

  test("word_grams ≡ the transform/array_join spelling for n in 2..5 " +
      "over seeded random token arrays") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val len = rng.nextInt(12) // includes 0- and 1-token docs
      Tuple1((0 until len).map(_ => vocab(rng.nextInt(vocab.size))))
    } :+ Tuple1(Seq("a", "b")) :+ Tuple1(Seq("a")) :+ Tuple1(Seq.empty[String])
    import spark.implicits._
    val df = rows.toDF("tk")
    for (n <- 2 to 5) {
      val bad = df
        .withColumn("new", WordGrams.wordGrams(col("tk"), n))
        .withColumn("old", expr(oldGrams(n)))
        .filter(!(col("new") <=> col("old")))
        .count()
      assert(bad == 0, s"n=$n: word_grams diverged from the old spelling")
    }
  }

  test("word_grams ≡ the element_at|| 3-gram spelling on null-free tokens, " +
      "and handles NULL array / NULL elements like array_join") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c", "d"), Seq("a", "b", "c"), Seq("a", "b"), Seq("")
    ).toDF("tk")
    val bad = df
      .withColumn("new", WordGrams.wordGrams(col("tk"), 3))
      .withColumn("old", expr(oldShingles))
      .filter(!(col("new") <=> col("old"))).count()
    assert(bad == 0, "word_grams diverged from the shingle spelling")

    // NULL array → empty array (the CASE-ELSE contract under ANSI)
    val nullArr = spark.sql("SELECT CAST(NULL AS array<string>) AS tk")
      .select(WordGrams.wordGrams(col("tk"), 3).as("g")).collect().head
    assert(nullArr.getSeq[String](0) == Seq.empty)

    // NULL element: skipped inside its grams, array_join's rule
    val withNull = spark.sql("SELECT array('a', CAST(NULL AS string), 'b', 'c') AS tk")
    val got = withNull.select(WordGrams.wordGrams(col("tk"), 3).as("g"))
      .collect().head.getSeq[String](0)
    val viaJoin = withNull.select(expr(oldGrams(3)).as("g"))
      .collect().head.getSeq[String](0)
    assert(got == viaJoin, s"$got vs array_join's $viaJoin")
  }
}
