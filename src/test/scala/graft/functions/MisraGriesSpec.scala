package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Misra-Gries guarantees (the noOracle contract for
  * t_heavy_hitters, like x_approx_distinct's 2% HLL bound):
  * for a stream of n tokens summarized with k counters,
  *   (1) every token with true count > n/(k+1) appears in the summary, and
  *   (2) every reported count c̃ satisfies c - n/(k+1) ≤ c̃ ≤ c.
  * Both must hold under ANY partitioning/merge order.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def checkBounds(tokens: org.apache.spark.sql.Dataset[String], k: Int): Unit = {
    val n = tokens.count()
    val bound = n.toDouble / (k + 1)
    val exact = tokens.groupBy(col("value").as("token")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val summary = tokens.select(MisraGries.summary(k).name("mg"))
      .select(explode(col("mg")).as(Seq("token", "c"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.size <= k)
    // (1) completeness above the threshold
    for ((t, c) <- exact if c > bound)
      assert(summary.contains(t), s"heavy hitter '$t' (count $c > $bound) missing")
    // (2) per-count error bound
    for ((t, est) <- summary) {
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth, s"'$t' overcounted: $est > $truth")
      assert(est >= truth - bound, s"'$t' undercounted past the bound: $est < $truth - $bound")
    }
  }

  test("hand-built stream: planted heavy hitters survive, counts stay bounded") {
    import spark.implicits._
    val stream = Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
      (1 to 200).map(i => s"noise$i")
    checkBounds(spark.createDataset(stream).as[String], k = 16)
  }

  test("documents token stream at sf0.001 honors both bounds (k = 256)") {
    import spark.implicits._
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("value")).as[String]
    checkBounds(toks, k = 256)
  }

  test("bounds hold regardless of partitioning (merge-order robustness)") {
    import spark.implicits._
    val stream = Seq.fill(500)("hot") ++ (1 to 3000).map(i => s"cold${i % 700}")
    for (parts <- Seq(1, 3, 13))
      checkBounds(spark.createDataset(stream).repartition(parts).as[String], k = 64)
  }

  test("heavyHittersTop returns ranked hitters") {
    val df = graft.operators.TextDedup.heavyHittersTop(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // ranked: non-increasing approx counts
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted(Ordering[Long].reverse))
  }

  test("documents BIGRAM stream honors both bounds under multiple partitionings (k = 256)") {
    // the t_heavy_transitions contract: the MG guarantee family holds
    // over adjacent-pair transitions exactly as over tokens, whatever
    // the merge order — the exact sibling is t_bigram_logppl's counts
    import spark.implicits._
    val tk = split(lower(col("text")), " ")
    val bigrams = graft.Tables.load(spark, dir, "documents")
      .select(tk.as("tk")).filter(size(col("tk")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("tk")) - 1), i =>
        concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
        .as("value")).as[String]
    for (parts <- Seq(1, 7))
      checkBounds(bigrams.repartition(parts), k = 256)
  }

  test("heavyTransitionsTop returns ranked transitions of two tokens each") {
    val rows = graft.operators.TextDedup.heavyTransitionsTop(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted(Ordering[Long].reverse))
    assert(rows.forall(_.getString(0).split(" ").length == 2),
      "every transition renders as 'w1 w2'")
  }
}
