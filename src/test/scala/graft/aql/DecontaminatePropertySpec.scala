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

  /** The engine's measure, independently: distinct n-gram sets over the
    * lowercased empty-filtered whitespace tokenization, fraction rounded
    * to 6. */
  private def gramsAt(text: String, n: Int): Set[String] = {
    val tk = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (tk.length < n) Set.empty
    else (0 to tk.length - n).map(i => tk.slice(i, i + n).mkString(" ")).toSet
  }
  private def grams(text: String): Set[String] = gramsAt(text, 4)
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

  test("USING SPANS n: planted contiguous spans drive the any-hit rule") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dcp-spans")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    // one long eval sentence whose token runs we plant from
    val evalToks = (0 until 20).map(i => vocab(i % vocab.size) + i)
    val evalText = evalToks.mkString(" ")
    eng.execute("CREATE CONTAINER spe ['eid','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("spe", Seq((0L, evalText)).toDF("eid", "body"))
    // corpus: (0) an exact 8-token eval run mid-document — REMOVED;
    // (1) a 7-token eval run (one under the span) — KEPT; (2) 8 eval
    // tokens in scrambled (non-contiguous) order — KEPT; (3) fresh —
    // KEPT; (4) the whole eval text verbatim — REMOVED. Planted tokens
    // are vocab+index strings, so fresh sentences (plain vocab words)
    // can never collide with an eval gram by accident.
    val docs = Seq(
      0L -> s"${sentence(5)} ${evalToks.slice(4, 12).mkString(" ")} ${sentence(5)}",
      1L -> s"${sentence(5)} ${evalToks.slice(4, 11).mkString(" ")} ${sentence(5)}",
      2L -> s"${sentence(3)} ${evalToks.slice(4, 12).reverse.mkString(" ")}",
      3L -> sentence(16),
      4L -> evalText)
    eng.execute("CREATE CONTAINER spc ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("spc", docs.toDF("doc_id", "body"))

    // the independent model: any shared 8-gram = a shared 8-token span
    val eg = gramsAt(evalText, 8)
    val expectRemoved = docs.filter { case (_, t) =>
      gramsAt(t, 8).exists(eg.contains) }.map(_._1).toSet
    assert(expectRemoved == Set(0L, 4L),
      s"plant sanity: $expectRemoved") // the plant must mean what it says

    // DOCS detail lists exactly the removal set
    val detail = eng.execute(
      "SHOW DECONTAMINATE spc AGAINST spe ON body USING SPANS 8 DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
    assert(detail.map(_.getLong(0)).toSet == expectRemoved)
    // every listed doc shows >= 1 contaminated gram, BELOW-threshold
    // fractions included (doc 0's fraction is far under 0.5)
    assert(detail.forall(_.getLong(2) >= 1L))

    // report counts from the same rule
    val rep = eng.execute(
      "SHOW DECONTAMINATE spc AGAINST spe ON body USING SPANS 8")
      .asInstanceOf[Engine.ResultSet].df.collect().head
    assert(rep.getLong(0) == 5L && rep.getLong(2) == expectRemoved.size.toLong)

    // applied removal equals the model's kept set
    eng.execute("DECONTAMINATE spc AGAINST spe ON body USING SPANS 8")
    val kept = eng.execute("SEARCH [doc_id] ON spc")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == docs.map(_._1).toSet -- expectRemoved)
  }

  test("GRAMS n: statement, SHOW report and the streaming gate agree at n=8") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dcp-grams")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    val evalTexts = (0 until 3).map(_ => sentence(10 + rng.nextInt(4)))
    eng.execute("CREATE CONTAINER gpe ['eid','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("gpe",
      evalTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("eid", "body"))
    val docs = (0L until 20L).map { i =>
      val t = rng.nextInt(4) match {
        case 0 => evalTexts(rng.nextInt(3))
        case 1 => evalTexts(rng.nextInt(3)) + " " + sentence(2 + rng.nextInt(4))
        case 2 => sentence(9 + rng.nextInt(4))
        case _ => sentence(3 + rng.nextInt(4)) // under 8 tokens: unmeasured
      }
      (i, t)
    }
    // model at n = 8, threshold 0.5
    val eg = evalTexts.map(gramsAt(_, 8)).reduce(_ ++ _)
    val fracs = docs.map { case (i, t) => i -> gramsAt(t, 8) }
      .filter(_._2.nonEmpty)
      .map { case (i, g) => i -> frac(g, eg) }
    val expectRemoved = fracs.filter(_._2 >= 0.5).map(_._1).toSet

    // the statement's report at GRAMS 8
    eng.execute("CREATE CONTAINER gpc ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("gpc", docs.toDF("doc_id", "body"))
    val rep = eng.execute(
      "SHOW DECONTAMINATE gpc AGAINST gpe ON body GRAMS 8")
      .asInstanceOf[Engine.ResultSet].df.collect().head
    assert(rep.getLong(1) == fracs.size.toLong,
      s"measured ${rep.getLong(1)} vs ${fracs.size}")
    assert(rep.getLong(2) == expectRemoved.size.toLong,
      s"contaminated ${rep.getLong(2)} vs ${expectRemoved.size}")

    // the STREAMING GATE at the same n admits exactly the complement
    // (statement/gate agreement at the same knob — one shared funnel)
    eng.execute("CREATE CONTAINER ggate ['doc_id','body'] [BIGINT, TEXT]")
    graft.streaming.DocumentStreams.decontBatch(
      docs.toDF("doc_id", "body"), eng.catalog, "ggate", "gpe", "body",
      threshold = 0.5, grams = 8)
    val landed = eng.execute("SEARCH [doc_id] ON ggate")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(landed == docs.map(_._1).toSet -- expectRemoved,
      s"gate landed $landed")

    // ...and the applied statement removes the same docs the gate refused
    eng.execute("DECONTAMINATE gpc AGAINST gpe ON body GRAMS 8")
    val kept = eng.execute("SEARCH [doc_id] ON gpc")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == landed)
  }

  test("ANALYZER standard: punctuated corpus text decontaminates against " +
      "a clean eval suite (round 15)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dcp-an")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    val cleanEval = "alpha beta gamma delta epsilon zeta eta theta"
    eng.execute("CREATE CONTAINER ape ['eid','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("ape", Seq((0L, cleanEval)).toDF("eid", "body"))
    // doc 1: the eval text with punctuation/casing on every token —
    // ZERO whitespace grams collide, every standard gram does;
    // doc 2: genuinely fresh text
    val punct = "Alpha, beta; GAMMA! delta? epsilon: zeta. eta... theta!"
    eng.execute("CREATE CONTAINER apc ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("apc", Seq(
      (1L, punct),
      (2L, "iota kappa lambda mu iota kappa lambda mu"))
      .toDF("doc_id", "body"))

    def contaminated(knobs: String): Long = eng.execute(
      s"SHOW DECONTAMINATE apc AGAINST ape ON body$knobs")
      .asInstanceOf[Engine.ResultSet].df.collect().head.getLong(2)
    assert(contaminated("") == 0L, "whitespace grams must not collide")
    assert(contaminated(" ANALYZER standard") == 1L,
      "standard grams must collide across punctuation")
    // an unknown analyzer is a statement error, not a silent default
    // ('english' became valid in round 16 — probe with a name that
    // stays unknown)
    intercept[ParseException](eng.execute(
      "SHOW DECONTAMINATE apc AGAINST ape ON body ANALYZER german"))

    // the streaming gate at the same analyzer refuses the punctuated
    // copy and admits the fresh doc (statement/gate agreement)
    eng.execute("CREATE CONTAINER apg ['doc_id','body'] [BIGINT, TEXT]")
    graft.streaming.DocumentStreams.decontBatch(
      Seq((1L, punct), (2L, "iota kappa lambda mu iota kappa lambda mu"))
        .toDF("doc_id", "body"),
      eng.catalog, "apg", "ape", "body", threshold = 0.5,
      analyzer = "standard")
    val landed = eng.execute("SEARCH [doc_id] ON apg")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(landed == Set(2L), s"gate landed $landed")

    // the applied statement removes exactly the punctuated copy
    eng.execute("DECONTAMINATE apc AGAINST ape ON body ANALYZER standard")
    val kept = eng.execute("SEARCH [doc_id] ON apc")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("decont_broadcast_cap: an oversized eval set degrades to a plan " +
      "without the broadcast hint, same answer") {
    import spark.implicits._
    // default-cap engine: the baseline report
    val d1 = java.nio.file.Files.createTempDirectory("graft-dcp-bc1")
    val e1 = new Engine(spark, d1.toString)
    // capped engine: decont_broadcast_cap 1 forces the fallback for ANY
    // real eval set (the settings file is read at engine boot)
    val d2 = java.nio.file.Files.createTempDirectory("graft-dcp-bc2")
    java.nio.file.Files.writeString(d2.resolve("settings.yaml"),
      graft.catalog.Settings.default.copy(decontBroadcastCap = 1).toYaml)
    val e2 = new Engine(spark, d2.toString)
    assert(e2.settings.decontBroadcastCap == 1)

    val evalTexts = (0 until 3).map(_ => sentence(12))
    val docs = (0L until 12L).map { i =>
      (i, if (i % 3 == 0) evalTexts((i % 3).toInt) else sentence(10))
    }
    for (e <- Seq(e1, e2)) {
      e.execute("CREATE CONTAINER bce ['eid','body'] [BIGINT, TEXT]")
      e.catalog.overwrite("bce",
        evalTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("eid", "body"))
      e.execute("CREATE CONTAINER bcc ['doc_id','body'] [BIGINT, TEXT]")
      e.catalog.overwrite("bcc", docs.toDF("doc_id", "body"))
    }
    val r1 = e1.execute("SHOW DECONTAMINATE bcc AGAINST bce ON body")
      .asInstanceOf[Engine.ResultSet].df.collect().toSeq
    val r2 = e2.execute("SHOW DECONTAMINATE bcc AGAINST bce ON body")
      .asInstanceOf[Engine.ResultSet].df.collect().toSeq
    assert(r1 == r2, s"fallback must not change the answer: $r1 vs $r2")

    // the capped engine's EXPLAIN pins the degraded access path...
    val ex2 = e2.execute("EXPLAIN SHOW DECONTAMINATE bcc AGAINST bce ON body")
      .asInstanceOf[Engine.Done].message
    assert(ex2.contains("decont_broadcast_cap 1"), ex2.takeRight(400))
    assert(ex2.contains("broadcast hint dropped"), ex2.takeRight(400))
    // ...and the default engine's does not fire the guard
    val ex1 = e1.execute("EXPLAIN SHOW DECONTAMINATE bcc AGAINST bce ON body")
      .asInstanceOf[Engine.Done].message
    assert(!ex1.contains("broadcast hint dropped"))
  }

  test("ANALYZER english: stemming + stop removal unify the measure's " +
      "grams across morphology (round 16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dc-en")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    // corpus doc phrases the eval suite in a DIFFERENT surface form:
    // stop words injected, inflections changed — whitespace and even
    // standard grams never collide, english grams do
    eng.execute("CREATE CONTAINER enc ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("enc", Seq(
      (1L, "the dogs were running quickly across a wide field today"),
      (2L, "unrelated words about spark catalyst planner rules here"))
      .toDF("doc_id", "body"))
    eng.execute("CREATE CONTAINER ene ['doc_id','body'] [BIGINT, TEXT]")
    // english-analyzed eval stream: [dog were run quickli across wide]
    // — 'dog were run quickli' is a shared 4-gram with doc 1's
    // [dog were run quickli across wide field todai]
    eng.catalog.overwrite("ene",
      Seq((10L, "dog were run quickli across wide")).toDF("doc_id", "body"))
    def contaminated(knobs: String): Long = eng.execute(
      s"SHOW DECONTAMINATE enc AGAINST ene ON body$knobs")
      .asInstanceOf[Engine.ResultSet].df.collect().head.getLong(2)
    assert(contaminated("") == 0L, "surface-form grams must not collide")
    assert(contaminated(" ANALYZER standard") == 0L,
      "standard grams keep stop words and inflections — no collision")
    assert(contaminated(" ANALYZER english") == 1L,
      "stemmed stop-free grams must collide")
    // the driver-twin recompute agrees: doc 1's english gram set
    // contains the eval suite's first 4-gram
    val docGrams = graft.operators.Analyzer
      .tokensOf("the dogs were running quickly across a wide field today",
        graft.operators.Analyzer.English)
      .sliding(4).map(_.mkString(" ")).toSet
    val evalGrams = graft.operators.Analyzer
      .tokensOf("dog were run quickli across wide",
        graft.operators.Analyzer.English)
      .sliding(4).map(_.mkString(" ")).toSet
    assert(docGrams.intersect(evalGrams).nonEmpty,
      s"model disagrees: $docGrams vs $evalGrams")
  }

  test("AT VERSION pins the eval container: grams an eval suite gains " +
      "later are invisible to the pinned run (round 16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dc-atv")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    eng.execute("CREATE CONTAINER avc ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("avc", Seq(
      (1L, "alpha beta gamma delta"), // contaminated only by the v2 eval
      (2L, "epsilon zeta eta theta")) // never contaminated
      .toDF("doc_id", "body"))
    eng.execute("CREATE CONTAINER ave ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("ave",
      Seq((10L, "iota kappa lambda mu")).toDF("doc_id", "body")) // v1
    val v1 = eng.catalog.currentVersion("ave")
    def contaminated(stmt: String): Long =
      eng.execute(stmt).asInstanceOf[Engine.ResultSet].df
        .collect().head.getLong(2)
    assert(contaminated("SHOW DECONTAMINATE avc AGAINST ave ON body") == 0L)
    // the eval suite GROWS: v2 gains doc 1's exact text
    eng.catalog.append("ave",
      Seq((11L, "alpha beta gamma delta")).toDF("doc_id", "body")) // v2
    assert(contaminated("SHOW DECONTAMINATE avc AGAINST ave ON body") == 1L,
      "current run must see the grown eval suite")
    assert(contaminated(
      s"SHOW DECONTAMINATE avc AGAINST ave ON body AT VERSION $v1") == 0L,
      "pinned run drifted with the eval container")
    // the APPLIED statement honors the pin: nothing removed at v1
    val msg = eng.execute(
      s"DECONTAMINATE avc AGAINST ave ON body AT VERSION $v1")
      .asInstanceOf[Engine.Done].message
    assert(msg.contains("nothing removed"), msg)
    // uncommitted versions refuse loudly
    intercept[ParseException](eng.execute(
      "SHOW DECONTAMINATE avc AGAINST ave ON body AT VERSION 99"))
  }

  test("FROM VERSION a TO b: only the window's arrivals are measured " +
      "and removable (round 17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dc-win")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    eng.execute("CREATE CONTAINER wve ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("wve",
      Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "body"))
    eng.execute("CREATE CONTAINER wvc ['doc_id','body'] [BIGINT, TEXT]")
    // v1: a fully contaminated doc that PREDATES the window
    eng.catalog.overwrite("wvc", Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "body"))
    // v2 gains another contaminated doc and a clean one
    eng.catalog.append("wvc", Seq(
      (3L, "alpha beta gamma delta"),
      (4L, "iota kappa lambda mu epsilon")).toDF("doc_id", "body"))
    // the windowed SHOW scopes every count to the window's arrivals
    val rep = eng.execute("SHOW DECONTAMINATE wvc AGAINST wve ON body " +
      "FROM VERSION 1 TO 2").asInstanceOf[Engine.ResultSet].df
      .collect().head
    assert(rep.getLong(0) == 2L, s"windowed n_docs ${rep.getLong(0)}")
    assert(rep.getLong(2) == 1L, s"contaminated ${rep.getLong(2)}")
    // applied: doc 3 (gained, contaminated) is removed; doc 1 — the
    // same text, but pre-window — survives
    val msg = eng.execute("DECONTAMINATE wvc AGAINST wve ON body " +
      "FROM VERSION 1 TO 2").asInstanceOf[Engine.Done].message
    assert(msg.contains("1"), msg)
    val kept = eng.execute("SEARCH [doc_id] ON wvc")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L), s"kept $kept")
  }
}
