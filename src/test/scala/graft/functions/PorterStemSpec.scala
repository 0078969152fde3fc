package graft.functions

import graft.TestSpark
import graft.operators.Porter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Porter stemmer against the PUBLISHED example vocabulary (Porter
  * 1980 — the per-step examples printed in the paper), plus the native
  * expression's codegen/eval parity with the pure function. The stemmer
  * is the one analyzer stage the DuckDB oracle cannot recompute, so its
  * correctness evidence lives here: paper pins + fuzz parity
  * (AnalyzerPropertySpec covers the three-spelling token-stream parity).
  */
class PorterStemSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Pins built from the paper's example vocabulary (§2–§6), traced
  // through the FULL algorithm — the paper prints PER-STEP outputs
  // (e.g. RELATIONAL → RELATE at step 2), but stem() keeps going
  // (relate → relat at step 5a), so each expected value below is the
  // end-to-end result.
  private val paperPins = Seq(
    // words that finish at step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+ its cleanup rules)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // words entering step 2 (then finishing through 4/5)
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    // words entering step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr",
    "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "homologou" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // the paper's worked multi-step examples
    "generalizations" -> "gener", "oscillators" -> "oscil",
    // retrieval sanity: the family the english analyzer must collapse
    "running" -> "run", "runs" -> "run", "runner" -> "runner")

  test("paper vocabulary pins") {
    paperPins.foreach { case (w, want) =>
      assert(Porter.stem(w) == want, s"stem($w) = ${Porter.stem(w)}, want $want")
    }
  }

  test("short words, digits and non-ASCII pass through unchanged") {
    Seq("a", "be", "is", "99", "x1y", "café", "中文", "", "tr33s").foreach { w =>
      assert(Porter.stem(w) == w, s"$w must pass through")
    }
  }

  test("native expression: codegen result == pure function, NULL-safe") {
    import spark.implicits._
    val words = paperPins.map(_._1) ++ Seq("", "a", "zzzz")
    // drive through a Range source: a local relation of literals would
    // constant-fold the whole projection and never exercise the
    // generated code
    val arr = array(words.map(lit): _*)
    val df = spark.range(words.size)
      .select(element_at(arr, (col("id") + 1).cast("int")).as("w"))
      .select(col("w"), PorterStem.porterStem(col("w")).as("st"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach(w => assert(got(w) == Porter.stem(w),
      s"expression diverged from Porter.stem on '$w'"))
    // NULL in → NULL out
    val n = Seq((1L, Option.empty[String])).toDF("id", "w")
      .select(PorterStem.porterStem(col("w"))).collect().head
    assert(n.isNullAt(0))
    // the projection stays inside whole-stage codegen: the `*(n)`
    // prefix marks codegen'd operators in the plan render, and the
    // stemming Project must carry it (no CodegenFallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [w#") && plan.contains("porterstem"),
      plan)
  }
}
