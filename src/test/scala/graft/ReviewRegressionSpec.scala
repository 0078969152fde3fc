package graft

import graft.aql.{AlbaType, Engine, Lexer, ParseException, Token}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Regressions for the round-1 self-review findings. */
class ReviewRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multi-column EDIT whose WHERE references a set column updates ALL columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rr-edit")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER e ['a','b'] [INT, INT]")
    eng.execute("CREATE ROW ['a','b'] [1, 0] ON e")
    eng.execute("COMMIT e")
    // sets a (the predicate column) AND b — b must still be updated
    eng.execute("EDIT ROW ['a','b'] [2, 99] ON e WHERE a = 1")
    val row = eng.execute("SEARCH [] ON e").asInstanceOf[Engine.ResultSet]
      .df.collect().head
    assert(row.getInt(0) == 2 && row.getInt(1) == 99)
  }

  test("dedup pipelines survive documents with fewer than 3 tokens") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rr-short")
    Seq(
      (1L, "one two", "en", "s", 7L),
      (2L, "solo", "en", "s", 4L),
      (3L, "three tokens here exactly matching more words for shingles", "en", "s", 58L),
      (4L, "three tokens here exactly matching more words for shingles", "en", "s", 58L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // must not throw (previously: sequence(1,0) descending → element_at(tk,0))
    val pairs = SparkEntry.queries("dd_minhash_lsh")(spark, dir.toString).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((3L, 4L)))
    SparkEntry.queries("t_ngram_frequency")(spark, dir.toString).collect()
  }

  test("integral string coercion is exact, never through double") {
    intercept[AlbaType.CoercionException](
      AlbaType.coerce(AlbaType.AInt, "9999999999")) // would saturate via toDouble
    assert(AlbaType.coerce(AlbaType.ABigint, "9007199254740993") == 9007199254740993L)
    assert(AlbaType.coerce(AlbaType.AInt, "42.7") == 42) // decimal forms still work
  }

  test("cosine_sim accepts double arrays and rejects non-numeric arrays") {
    import spark.implicits._
    val d = Seq((Array(1.0, 2.0), Array(2.0, 4.0))).toDF("a", "b")
    val v = d.select(graft.functions.CosineSimilarity.cosineSim(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    val bad = Seq((Array("x"), Array("y"))).toDF("a", "b")
    intercept[Exception](
      bad.select(graft.functions.CosineSimilarity.cosineSim(col("a"), col("b"))).collect())
  }

  test("cosine_sim returns NULL on null array elements") {
    import spark.implicits._
    val d = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    val out = d.select(graft.functions.CosineSimilarity.cosineSim(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("lexer: trailing exponent markers are bare words, not crashes") {
    assert(Lexer.lex("1e") == List(Token.Str("1e")))
    assert(Lexer.lex("1e3") == List(Token.FloatLit(1000.0)))
  }

  test("CREATE ROW / EDIT ROW reject duplicate column names") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rr-dup")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER dup ['k','v'] [INT, INT]")
    intercept[ParseException](eng.execute("CREATE ROW ['k','k'] [1,2] ON dup"))
    intercept[ParseException](eng.execute("EDIT ROW ['v','v'] [1,2] ON dup WHERE k = 1"))
  }

  test("DELETE keeps rows whose predicate evaluates NULL (three-valued logic)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rr-null")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER n3 ['k','x'] [INT, INT]")
    eng.execute("CREATE ROW ['k','x'] [1, 10] ON n3")
    eng.execute("CREATE ROW ['k'] [2] ON n3") // x is NULL
    eng.execute("DELETE ROW ON n3 WHERE x > 5")
    val kept = eng.execute("SEARCH ['k'] ON n3").asInstanceOf[Engine.ResultSet]
      .df.collect().map(_.getInt(0)).toSet
    assert(kept == Set(2), "NULL-predicate row must survive the delete")
  }

  test("BIGINT string coercion rejects values beyond Long range") {
    intercept[AlbaType.CoercionException](
      AlbaType.coerce(AlbaType.ABigint, "9223372036854775808")) // Long.MaxValue+1
    assert(AlbaType.coerce(AlbaType.ABigint, Long.MinValue.toString) == Long.MinValue)
  }

  test("EDIT works on a container that has a __edit_match column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rr-marker")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER mk ['k','__edit_match'] [INT, BOOL]")
    eng.execute("CREATE ROW ['k','__edit_match'] [1, true] ON mk")
    eng.execute("EDIT ROW ['k'] [2] ON mk WHERE k = 1")
    eng.execute("COMMIT mk")
    val row = eng.execute("SEARCH [] ON mk").asInstanceOf[Engine.ResultSet]
      .df.collect().head
    assert(row.getInt(0) == 2 && row.getBoolean(1)) // user column intact
  }

  test("container versions do not collide across dotted names") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rr-dot")
    val eng = new Engine(spark, dir.toString)
    eng.execute("CREATE CONTAINER a ['k'] [INT]")
    eng.execute("CREATE CONTAINER a.v2 ['k'] [INT]")
    eng.execute("CREATE ROW ['k'] [1] ON a.v2")
    eng.execute("COMMIT a.v2") // creates data dir "a.v2.v1"
    assert(eng.catalog.versions("a").isEmpty)
    eng.execute("DELETE CONTAINER a") // must NOT touch a.v2's data
    assert(eng.catalog.read("a.v2").count() == 1)
  }
}
