package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): DECONTAMINATE / SHOW DECONTAMINATE against an
  * INDEPENDENT Scala model of the measure — per-doc distinct 4-gram
  * sets, the eval union, overlap fraction rounded to 6 (the engine's
  * round), removal at ≥ threshold. Random corpora with PLANTED
  * contamination (some docs are verbatim eval texts, some are eval
  * prefixes plus fresh tails, some unrelated, some too short to
  * measure) so every code path draws non-trivially. Seeded:
  * deterministic forever once green.
  */
class DecontaminatePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(3141592)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def sentence(n: Int): String =
    (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")

  /** The engine's measure, independently: distinct 4-gram sets over the
    * lowercased whitespace tokenization, fraction rounded to 6. */
  private def grams(text: String): Set[String] = {
    val tk = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (tk.length < 4) Set.empty
    else (0 to tk.length - 4).map(i => tk.slice(i, i + 4).mkString(" ")).toSet
  }
  private def frac(doc: Set[String], eval: Set[String]): Double =
    BigDecimal(doc.intersect(eval).size.toDouble / doc.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("random planted corpora: report and removal match the independent model") {
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-dcp-$trial")
      val eng = new Engine(spark, dir.toString)
      // eval container: 3 distinct sentences
      val evalTexts = (0 until 3).map(_ => sentence(6 + rng.nextInt(4)))
      eng.execute("CREATE CONTAINER dpe ['eid','body'] [BIGINT, TEXT]")
      import spark.implicits._
      eng.catalog.overwrite("dpe",
        evalTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("eid", "body"))
      // corpus: verbatim eval copies, eval-prefix + fresh tail, fresh,
      // and sub-4-token (unmeasurable) docs
      val docs = (0L until 24L).map { i =>
        val t = rng.nextInt(4) match {
          case 0 => evalTexts(rng.nextInt(3))
          case 1 => evalTexts(rng.nextInt(3)) + " " + sentence(3 + rng.nextInt(4))
          case 2 => sentence(8 + rng.nextInt(5))
          case _ => sentence(1 + rng.nextInt(3))
        }
        (i, t)
      }
      eng.execute("CREATE CONTAINER dpc ['doc_id','body'] [BIGINT, TEXT]")
      eng.catalog.overwrite("dpc", docs.toDF("doc_id", "body"))

      val evalGrams = evalTexts.map(grams).reduce(_ ++ _)
      val measured = docs.map { case (i, t) => i -> grams(t) }
        .filter(_._2.nonEmpty)
      val fracs = measured.map { case (i, g) => i -> frac(g, evalGrams) }
      val thr = Seq(0.3, 0.5, 1.0)(rng.nextInt(3))
      val expectRemoved = fracs.filter(_._2 >= thr).map(_._1).toSet

      // the dry-run report vs the model
      val rep = eng.execute(
        s"SHOW DECONTAMINATE dpc AGAINST dpe ON body THRESHOLD $thr")
        .asInstanceOf[Engine.ResultSet].df.collect().head
      assert(rep.getLong(0) == 24L, s"trial $trial: n_docs ${rep.getLong(0)}")
      assert(rep.getLong(1) == measured.size.toLong,
        s"trial $trial: measured ${rep.getLong(1)} vs ${measured.size}")
      assert(rep.getLong(2) == expectRemoved.size.toLong,
        s"trial $trial thr=$thr: contaminated ${rep.getLong(2)} vs ${expectRemoved.size}")
      val maxModel =
        if (fracs.isEmpty) 0.0
        else BigDecimal(fracs.map(_._2).max)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rep.getDouble(3) - maxModel) < 2e-6,
        s"trial $trial: max ${rep.getDouble(3)} vs $maxModel")

      // the applied removal vs the model's kept set
      eng.execute(s"DECONTAMINATE dpc AGAINST dpe ON body THRESHOLD $thr")
      val kept = eng.execute("SEARCH [doc_id] ON dpc")
        .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
      val expectKept = docs.map(_._1).toSet -- expectRemoved
      assert(kept == expectKept,
        s"trial $trial thr=$thr: kept $kept vs $expectKept")

      eng.execute("DELETE CONTAINER dpc")
      eng.execute("DELETE CONTAINER dpe")
    }
  }
}
