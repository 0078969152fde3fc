package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SHOW DEDUP c1 AGAINST c2 / DEDUP c1 AGAINST c2 (round 15): the
  * cross-container near-dup funnel — c1's rows band through c2's
  * committed lsh/simhash index, candidates verify with the family's
  * exact measure, removal touches c1 only. Oracle rows cover the
  * fixture corpus; this spec pins the semantics and guards on a
  * synthetic corpus where the expected decision is hand-derivable.
  */
class CrossDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val refText =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val nearText = // one-word edit: Jaccard well above 0.2
    "the quick brown fox jumps over the sleepy dog near the quiet river bank today"
  private val otherText =
    "pack my box with five dozen liquor jugs before noon arrives with friends waiting"

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-xd-$tag")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    eng.execute("CREATE CONTAINER ref ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("ref",
      Seq((100L, refText), (101L, otherText + " extra tail words here"))
        .toDF("doc_id", "text"))
    eng.execute("CREATE INDEX nd ON ref ['text'] USING lsh")
    eng.execute("CREATE CONTAINER corp ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("corp", Seq(
      (1L, refText), // verbatim copy of a ref doc -> score 1 match
      (2L, nearText), // near-dup of ref 100
      (3L, "completely unrelated content about spark catalyst planning"),
      (4L, otherText + " extra tail words here")) // verbatim of ref 101
      .toDF("doc_id", "text"))
    eng
  }

  test("report, DOCS detail and applied removal agree; c2 untouched") {
    val eng = fixture("main")
    val rep = eng.execute("SHOW DEDUP corp AGAINST ref USING nd")
      .asInstanceOf[Engine.ResultSet].df.collect().head
    assert(rep.getLong(0) == 4L, s"n_docs ${rep.getLong(0)}")
    // docs 1, 2, 4 must verify (verbatim + near-dup); doc 3 must not
    assert(rep.getLong(2) == 3L, s"matched_docs ${rep.getLong(2)}")
    assert(rep.getLong(1) >= rep.getLong(2), "candidates cover matches")

    val detail = eng.execute("SHOW DEDUP corp AGAINST ref USING nd DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
    assert(detail.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    // verbatim copies carry best_score 1.0 and rank first
    assert(detail.take(2).forall(_.getDouble(2) == 1.0))
    assert(detail.forall(_.getLong(1) >= 1L))

    // a tightened threshold drops the near-dup, keeps the verbatims
    val tight = eng.execute(
      "SHOW DEDUP corp AGAINST ref USING nd THRESHOLD 1 DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
    assert(tight.map(_.getLong(0)).toSet == Set(1L, 4L))

    // the decision applied: exactly the DOCS list disappears from c1
    val msg = eng.execute("DEDUP corp AGAINST ref USING nd")
      .asInstanceOf[Engine.Done].message
    assert(msg.contains("removed 3"), msg)
    val kept = eng.execute("SEARCH [doc_id] ON corp")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    // c2 is never touched
    assert(eng.execute("SEARCH [doc_id] ON ref")
      .asInstanceOf[Engine.ResultSet].df.count() == 2L)
    // re-running is an honest no-op (no matches remain)
    val again = eng.execute("DEDUP corp AGAINST ref USING nd")
      .asInstanceOf[Engine.Done].message
    assert(again.contains("nothing removed"), again)
  }

  test("guards: self-AGAINST, missing column, no band index, staged ops") {
    val eng = fixture("guards")
    import spark.implicits._
    val e1 = intercept[ParseException](
      eng.execute("SHOW DEDUP corp AGAINST corp"))
    assert(e1.getMessage.contains("within-container"), e1.getMessage)
    // c1 lacking the indexed column name fails with the pointer
    eng.execute("CREATE CONTAINER nocol ['doc_id','body'] [BIGINT, TEXT]")
    eng.catalog.overwrite("nocol", Seq((1L, refText)).toDF("doc_id", "body"))
    val e2 = intercept[ParseException](
      eng.execute("SHOW DEDUP nocol AGAINST ref USING nd"))
    assert(e2.getMessage.contains("has no column 'text'"), e2.getMessage)
    // a c2 without a band index names the fix
    val e3 = intercept[ParseException](
      eng.execute("SHOW DEDUP corp AGAINST nocol"))
    assert(e3.getMessage.contains("USING lsh|simhash"), e3.getMessage)
    // an UNVERSIONED external c2 refuses upfront — its index reads
    // empty, so "no matches" would be a wrong answer wearing an honest
    // face (the within-container DEDUP trap, closed for AGAINST too)
    val ext = java.nio.file.Files.createTempDirectory("graft-xd-ext")
    val pq = ext.resolve("ext.parquet")
    Seq((1L, refText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(pq.toString)
    eng.execute("CREATE CONTAINER extc ['doc_id','text'] [BIGINT, TEXT]")
    java.nio.file.Files.deleteIfExists(eng.catalog.dataPath("extc"))
    java.nio.file.Files.createSymbolicLink(eng.catalog.dataPath("extc"), pq)
    val e5 = intercept[IllegalArgumentException](
      eng.execute("SHOW DEDUP corp AGAINST extc"))
    assert(e5.getMessage.contains("unversioned external"), e5.getMessage)
    // staged ops on c1 refuse the mutation (the DEDUP discipline)
    eng.execute("CREATE ROW ['doc_id','text'] [99, 'staged doc'] ON corp")
    val e4 = intercept[IllegalArgumentException](
      eng.execute("DEDUP corp AGAINST ref USING nd"))
    assert(e4.getMessage.contains("staged"), e4.getMessage)
    eng.execute("ROLLBACK corp")
    // ...but the read-only SHOW still serves (committed snapshot)
    assert(eng.execute("SHOW DEDUP corp AGAINST ref USING nd")
      .asInstanceOf[Engine.ResultSet].df.count() == 1L)
  }

  test("ivf AGAINST: vector corpora cross-match through frozen centroids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xd-ivf")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    def pack(v: Seq[Float]) = graft.functions.Float32Unpack.pack(v.toIndexedSeq)
    eng.execute("CREATE CONTAINER vref ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    eng.catalog.overwrite("vref", Seq(
      (100L, pack(Seq(1f, 0f, 0f, 0f))),
      (101L, pack(Seq(0f, 0f, 1f, 0f)))).toDF("vid", "emb"))
    eng.execute("CREATE INDEX annv ON vref ['emb'] USING ivf 2")
    eng.execute("CREATE CONTAINER vcorp ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    eng.catalog.overwrite("vcorp", Seq(
      (1L, pack(Seq(1f, 0f, 0f, 0f))), // byte copy of ref 100 -> cosine 1
      (2L, pack(Seq(0.995f, 0.0999f, 0f, 0f))), // near ref 100, > 0.99
      (3L, pack(Seq(0f, 1f, 0f, 0f)))) // orthogonal: candidate, no match
      .toDF("vid", "emb"))

    val detail = eng.execute("SHOW DEDUP vcorp AGAINST vref USING annv DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
    assert(detail.map(_.getLong(0)).toSet == Set(1L, 2L),
      s"ivf cross matches: ${detail.map(_.getLong(0)).toSet}")
    assert(detail.head.getLong(0) == 1L && detail.head.getDouble(2) == 1.0)

    eng.execute("DEDUP vcorp AGAINST vref USING annv")
    val kept = eng.execute("SEARCH [vid] ON vcorp")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))

    // type guard: a TEXT column can't probe an ivf index
    eng.execute("CREATE CONTAINER tcorp ['vid','emb'] [BIGINT, TEXT]")
    eng.catalog.overwrite("tcorp", Seq((1L, "not a vector")).toDF("vid", "emb"))
    val e = intercept[ParseException](
      eng.execute("SHOW DEDUP tcorp AGAINST vref USING annv"))
    assert(e.getMessage.contains("packed-float32"), e.getMessage)
  }

  test("ANALYZER standard on a band index: near-dup detection survives " +
      "punctuation (round 15)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xd-an")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    val clean = "the quick brown fox jumps over the lazy dog tonight"
    // the same document with punctuation/casing on most tokens: under
    // the standard analyzer the token streams are IDENTICAL (Jaccard 1);
    // under whitespace only 2 tokens survive equal — no 3-token run, so
    // ZERO shared shingles
    val punct = "The quick, brown fox; jumps! over? the, lazy. dog; tonight!"
    eng.execute("CREATE CONTAINER band ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("band", Seq(
      (1L, clean), (2L, punct),
      (3L, "pack my box with five dozen liquor jugs right now ok"))
      .toDF("doc_id", "text"))
    eng.execute("CREATE INDEX nds ON band ['text'] USING lsh ANALYZER standard")
    eng.execute("CREATE INDEX ndw ON band ['text'] USING lsh")

    // definitions + SHOW surface round-trip
    assert(eng.catalog.indexDefs("band").find(_.ix == "nds").get.analyzer
      == "standard")
    val shown = eng.execute("SHOW INDEXES band")
      .asInstanceOf[Engine.ResultSet].df.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown("nds") == "lsh standard" && shown("ndw") == "lsh")

    // the standard funnel verifies the punctuated twin; whitespace can't
    def report(ix: String) = eng.execute(s"SHOW DEDUP band USING $ix")
      .asInstanceOf[Engine.ResultSet].df.collect().head
    assert(report("nds").getLong(3) == 2L, // verified_dup_docs
      s"standard funnel must verify the punctuated pair: ${report("nds")}")
    assert(report("ndw").getLong(3) == 0L,
      s"whitespace funnel must not: ${report("ndw")}")

    // the query-by-text probe analyzes through the index too: a clean
    // literal finds the punctuated corpus doc on the standard index
    val probeHits = eng.execute(
      s"SIMILAR '$clean' ON band USING nds SCORED")
      .asInstanceOf[Engine.ResultSet].df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(probeHits.get(2L).contains(1.0),
      s"standard probe must score the punctuated twin 1.0: $probeHits")

    // REBUILD preserves the analyzer (content-defining)
    eng.execute("REBUILD INDEX nds ON band")
    assert(eng.catalog.indexDefs("band").find(_.ix == "nds").get.analyzer
      == "standard")
    assert(report("nds").getLong(3) == 2L)

    // DEDUP applies the standard decision: keeper = longest text
    // (the punctuated twin is longer), loser removed
    eng.execute("DEDUP band USING nds")
    val kept = eng.execute("SEARCH [doc_id] ON band")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"kept $kept")
  }

  test("EXPLAIN plans the served report shape with the access-path note") {
    val eng = fixture("explain")
    val ex = eng.execute("EXPLAIN SHOW DEDUP corp AGAINST ref USING nd")
      .asInstanceOf[Engine.Done].message
    assert(ex.contains("dedup against"), ex.takeRight(300))
    assert(ex.contains("shuffle-hash") || ex.contains("ShuffledHashJoin"),
      "the band join must pin shuffle-hash")
  }

  test("ANALYZER english on a band index: stop-word noise and " +
      "morphology vanish from the cross funnel (round 16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xd-en")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    val refT = "dogs were running quickly across wide fields today near rivers banks here ok"
    // the corpus twin differs ONLY by injected stop words — its english
    // token stream (stop-filtered, stemmed) is IDENTICAL to refT's, so
    // the english funnel sees a verbatim match at Jaccard 1.0
    val corpT = "the dogs were running quickly across a wide fields today near the rivers banks here ok"
    eng.execute("CREATE CONTAINER eref ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("eref", Seq((100L, refT)).toDF("doc_id", "text"))
    eng.execute("CREATE INDEX nde ON eref ['text'] USING lsh ANALYZER english")
    eng.execute("CREATE INDEX ndw ON eref ['text'] USING lsh") // whitespace
    eng.execute("CREATE CONTAINER ecorp ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("ecorp", Seq(
      (1L, corpT),
      (2L, "unrelated text about catalyst planner rules and codegen paths ok"))
      .toDF("doc_id", "text"))
    // sanity: the two analyzed streams really are identical
    assert(graft.operators.Analyzer.tokensOf(refT,
        graft.operators.Analyzer.English)
      == graft.operators.Analyzer.tokensOf(corpT,
        graft.operators.Analyzer.English))
    val en = eng.execute("SHOW DEDUP ecorp AGAINST eref USING nde DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(en.toSeq == Seq((1L, 1.0)), s"english funnel: ${en.toSeq}")
    // the whitespace index on the SAME reference sees different
    // shingles ('the dogs were' vs 'dogs were running') — the near-dup
    // may still collide on some band, but never at score 1
    val ws = eng.execute("SHOW DEDUP ecorp AGAINST eref USING ndw DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(ws.forall(_._2 < 1.0), s"whitespace must not see a verbatim: ${ws.toSeq}")
  }

  test("PROBE widens the ivf cross assignment: a near-dup in the " +
      "ADJACENT cell is reachable only at PROBE 2 (round 16, r15 advisor)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xd-probe")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    def vec(x: Float, y: Float): Array[Byte] =
      graft.functions.Float32Unpack.pack(Seq(x, y))
    // c2: two seed cells — (1,0) and (0,1) — plus a row at (0.8, 0.6)
    // that ASSIGNS to cell A (d2 0.4 vs 0.8) while the probe below
    // assigns to cell B
    eng.execute("CREATE CONTAINER vr ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    eng.catalog.overwrite("vr", Seq(
      (0L, vec(1f, 0f)), (1L, vec(0f, 1f)), (2L, vec(0.8f, 0.6f)))
      .toDF("vid", "emb"))
    eng.execute("CREATE INDEX axx ON vr ['emb'] USING ivf 2")
    // c1: one probe at (0.6, 0.8) — cell B (d2 0.4 to (0,1) vs 0.8 to
    // (1,0)); cosine to row 2 is 0.96, to row 1 is 0.8
    eng.execute("CREATE CONTAINER vq ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    eng.catalog.overwrite("vq", Seq((10L, vec(0.6f, 0.8f))).toDF("vid", "emb"))
    def matched(stmt: String): Long =
      eng.execute(stmt).asInstanceOf[Engine.ResultSet].df
        .collect().head.getLong(2)
    // PROBE 1 (default): only cell B's row 1 is a candidate — cosine
    // 0.8 < 0.95, no match; the EXPLAIN states the recall bound
    assert(matched("SHOW DEDUP vq AGAINST vr USING axx THRESHOLD 0.95") == 0L)
    val ex = eng.execute("EXPLAIN SHOW DEDUP vq AGAINST vr USING axx " +
      "THRESHOLD 0.95").asInstanceOf[Engine.Done].message
    assert(ex.contains("1 nearest-centroid cell"), ex.takeRight(400))
    // PROBE 2: the adjacent cell's row 2 verifies at 0.96 >= 0.95
    assert(matched(
      "SHOW DEDUP vq AGAINST vr USING axx PROBE 2 THRESHOLD 0.95") == 1L)
    // the applied decision honors the widened probe
    eng.execute("DEDUP vq AGAINST vr USING axx PROBE 2 THRESHOLD 0.95")
    assert(eng.execute("SEARCH [vid] ON vq")
      .asInstanceOf[Engine.ResultSet].df.count() == 0L)
    // PROBE past the trained cell count refuses; PROBE on a band index
    // refuses at the funnel (covered by SimilarAgainstSpec's guard)
    intercept[ParseException](eng.execute(
      "SHOW DEDUP vq AGAINST vr USING axx PROBE 3 THRESHOLD 0.95"))
  }

  test("AT VERSION pins the reference: rows c2 gains after the pinned " +
      "version are invisible to report, DOCS and apply (round 16)") {
    val eng = fixture("xver")
    val v1 = eng.catalog.currentVersion("ref")
    def matched(stmt: String): Long =
      eng.execute(stmt).asInstanceOf[Engine.ResultSet].df
        .collect().head.getLong(2)
    val pinned1 = matched(s"SHOW DEDUP corp AGAINST ref AT VERSION $v1 USING nd")
    assert(pinned1 == 3L, s"baseline matched_docs $pinned1")
    // ref gains a verbatim copy of corp doc 3's text — the current
    // report sees 4 matches, the pinned one must stay at 3
    eng.execute("CREATE ROW ['doc_id','text'] [102, 'completely unrelated " +
      "content about spark catalyst planning'] ON ref")
    eng.execute("COMMIT ref")
    assert(matched("SHOW DEDUP corp AGAINST ref USING nd") == 4L)
    assert(matched(s"SHOW DEDUP corp AGAINST ref AT VERSION $v1 USING nd") == 3L,
      "pinned report drifted with the reference")
    // the DOCS detail at the pin excludes doc 3 too
    val docs = eng.execute(
      s"SHOW DEDUP corp AGAINST ref AT VERSION $v1 USING nd DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(docs == Set(1L, 2L, 4L), docs.toString)
    // the APPLIED decision honors the pin: doc 3 survives
    eng.execute(s"DEDUP corp AGAINST ref AT VERSION $v1 USING nd")
    val kept = eng.execute("SEARCH [doc_id] ON corp")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), kept.toString)
    // uncommitted versions refuse loudly
    intercept[ParseException](eng.execute(
      "SHOW DEDUP corp AGAINST ref AT VERSION 99 USING nd"))
  }

  test("verify computes ∝ candidates: each side semi-joins to the pair " +
      "ids BELOW the shingle derivation (round 16, r15 judge #3)") {
    val eng = fixture("prune")
    // the DOCS detail serves the verified (scored) funnel — its
    // OPTIMIZED plan must place a LeftSemi join on the corpus scans
    // BEFORE any shingle/signature projection, so the verify stage's
    // derivation work is bounded by the candidate id set, not the corpus
    val df = eng.execute("SHOW DEDUP corp AGAINST ref USING nd DOCS")
      .asInstanceOf[Engine.ResultSet].df
    val plan = df.queryExecution.optimizedPlan
    // every Generate/posexplode-free shingle derivation sits above a
    // LeftSemi: walk the plan — each node computing `sg` must have a
    // LeftSemi join somewhere BENEATH it
    def hasSemiBelow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }.nonEmpty
    val shingleNodes = plan.collect {
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          if pr.projectList.exists(p => p.name == "sg_a" || p.name == "sg_b"
            || p.name == "sg") => pr
    }
    assert(shingleNodes.nonEmpty, s"no shingle projection found:\n$plan")
    val bad = shingleNodes.filterNot(hasSemiBelow)
    assert(bad.isEmpty,
      s"a verify-side shingle derivation runs over an un-pruned corpus:\n" +
        bad.map(_.toString).mkString("\n----\n"))
    // and the decision is unchanged by the pruning
    val detail = eng.execute("SHOW DEDUP corp AGAINST ref USING nd DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
    assert(detail.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  test("FROM VERSION a TO b gates only the window's arrivals: pre-window " +
      "verbatim matches survive (round 17, r16 judge #8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xd-win")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    eng.execute("CREATE CONTAINER ref ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("ref",
      Seq((100L, refText), (101L, otherText + " extra tail words here"))
        .toDF("doc_id", "text"))
    eng.execute("CREATE INDEX nd ON ref ['text'] USING lsh")
    eng.execute("CREATE CONTAINER corp ['doc_id','text'] [BIGINT, TEXT]")
    // v1: a verbatim ref copy (would be removed unwindowed) + an
    // unrelated doc
    eng.catalog.overwrite("corp", Seq(
      (1L, refText),
      (3L, "completely unrelated content about spark catalyst planning"))
      .toDF("doc_id", "text"))
    // v2 gains a near-dup and a second verbatim copy
    eng.catalog.append("corp", Seq(
      (2L, nearText),
      (4L, otherText + " extra tail words here"))
      .toDF("doc_id", "text"))

    // the SHOW twin with the window reports only the gained rows
    val det = eng.execute(
      "SHOW DEDUP corp AGAINST ref FROM VERSION 1 TO 2 USING nd DOCS")
      .asInstanceOf[Engine.ResultSet].df.collect()
    assert(det.map(_.getLong(0)).toSet == Set(2L, 4L),
      s"window DOCS: ${det.toSeq}")

    // the windowed SHOW summary's n_docs is the PROBED population (the
    // window's arrivals), so matched_docs/n_docs reads as the window's
    // rate — never corpus-diluted
    val winRep = eng.execute(
      "SHOW DEDUP corp AGAINST ref FROM VERSION 1 TO 2 USING nd")
      .asInstanceOf[Engine.ResultSet].df.collect().head
    assert(winRep.getLong(0) == 2L, s"windowed n_docs ${winRep.getLong(0)}")

    // applied: only the window's verified arrivals are removed — doc 1,
    // a verbatim match that PREDATES the window, survives
    val msg = eng.execute(
      "DEDUP corp AGAINST ref FROM VERSION 1 TO 2 USING nd")
      .asInstanceOf[Engine.Done].message
    assert(msg.contains("removed 2"), msg)
    val kept = eng.execute("SEARCH [doc_id] ON corp")
      .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"kept $kept")

    // an unwindowed re-run still sees doc 1 (the window was the only
    // thing protecting it)
    val msg2 = eng.execute("DEDUP corp AGAINST ref USING nd")
      .asInstanceOf[Engine.Done].message
    assert(msg2.contains("removed 1"), msg2)
    assert(eng.execute("SEARCH [doc_id] ON corp")
      .asInstanceOf[Engine.ResultSet].df.collect()
      .map(_.getLong(0)).toSet == Set(3L))

    // a row EDITED inside the window re-gates on its post-image: the
    // CHANGES feed labels updates 'update_postimage' (r17 code review
    // caught the funnel filtering on a literal that never matched —
    // this case pins the contract "a row edited in the window gates on
    // its current content")
    eng.execute("CREATE CONTAINER corpe ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("corpe", Seq(
      (7L, "some entirely innocuous starting text right here today"),
      (8L, "another unrelated document body for padding the corpus"))
      .toDF("doc_id", "text"))
    eng.execute(s"EDIT ROW ['text'] ['$refText'] ON corpe WHERE doc_id = 7")
    eng.execute("COMMIT corpe")
    val msgE = eng.execute(
      "DEDUP corpe AGAINST ref FROM VERSION 1 TO 2 USING nd")
      .asInstanceOf[Engine.Done].message
    assert(msgE.contains("removed 1"), msgE)
    assert(eng.execute("SEARCH [doc_id] ON corpe")
      .asInstanceOf[Engine.ResultSet].df.collect()
      .map(_.getLong(0)).toSet == Set(8L))

    // guards: a window over missing versions refuses loudly; a window
    // on a container with no committed history refuses via CHANGES
    intercept[Exception](eng.execute(
      "SHOW DEDUP corp AGAINST ref FROM VERSION 1 TO 99 USING nd"))
  }

  test("the candidate-pair fan-out runs banding + index join ONCE: " +
      "ReusedExchange serves every second pairs consumer (round 17, " +
      "r16 judge #3)") {
    val eng = fixture("reuse")
    // the summary report consumes the pairs subtree TWICE (candidate
    // count + the verified funnel's pair source) — within the one
    // served plan, Spark's exchange reuse must hand the second
    // consumer the FIRST consumer's shuffle output: the c1 banding
    // exchange (id_a, band, bk) and the index-rows exchange
    // (id_b, band, bk) each execute once per statement, never once
    // per consumer. (A round-17 A/B REJECTED checkpointing the pairs
    // here instead: single-action AGAINST plans already share through
    // exchange reuse, and the checkpoint job tripled job count —
    // measured SIMILAR AGAINST lanes +0.2-0.4 s at sf0.1.)
    // Round 17 strengthened the pin: the verify sides' candidate-id
    // sets derive distinct-THEN-project, so every embedded pairs copy
    // is canonically equal to the spine and reuses the POST-DISTINCT
    // pairs exchange (id_a, id_b) — the whole banding + index join now
    // provably executes once per statement. The direct evidence is the
    // banding `Generate` (the shingle→band explode) appearing exactly
    // ONCE in the executed plan; before the fix, column pruning
    // de-canonicalized the B-side copy and the probe corpus banded
    // twice per statement.
    def audit(aql: String): (Int, Seq[Seq[String]]) = {
      val df = eng.execute(aql).asInstanceOf[Engine.ResultSet].df
      df.collect() // AQE: the final physical plan exists only post-run
      var generates = 0
      val reused = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      df.queryExecution.executedPlan.foreach {
        case _: org.apache.spark.sql.execution.GenerateExec =>
          generates += 1
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          reused += r.output.map(_.name)
        case _ => ()
      }
      (generates, reused.toSeq)
    }
    val (gens, reused) = audit("SHOW DEDUP corp AGAINST ref USING nd")
    assert(gens == 1,
      s"banding explode must execute once per statement, found $gens")
    assert(reused.exists(o => o.contains("id_a") && o.contains("id_b")),
      s"post-distinct pairs exchange not reused — the pair join would " +
        s"run per consumer; reused: $reused")

    // the batch k-NN join (SIMILAR AGAINST SCORED) fans pairs out to
    // the candidate semi-joins AND the scored rerank — same contract
    val (sGens, sReused) =
      audit("SIMILAR corp AGAINST ref USING nd LIMIT 2 SCORED")
    assert(sGens == 1,
      s"SIMILAR AGAINST: banding explode must execute once, found $sGens")
    assert(sReused.count(o => o.contains("id_a") && o.contains("id_b")) >= 2,
      s"SIMILAR AGAINST: both verify sides must reuse the pairs " +
        s"exchange; reused: $sReused")
  }
}
