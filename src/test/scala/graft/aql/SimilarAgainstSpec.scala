package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SIMILAR c1 AGAINST c2 (round 16): the batch k-NN join — for every c1
  * row, the top-k nearest c2 rows through c2's committed band/ivf
  * index. Oracle rows cover the fixture corpus; this spec pins the
  * semantics, the AT VERSION reference pin, the guards, and the
  * no-all-pairs plan shape on a synthetic corpus where the expected
  * decision is hand-derivable.
  */
class SimilarAgainstSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val refText =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val nearText = // one-word edit: Jaccard well above 0
    "the quick brown fox jumps over the sleepy dog near the quiet river bank today"
  private val otherText =
    "pack my box with five dozen liquor jugs before noon arrives with friends waiting"

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-sa-$tag")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    eng.execute("CREATE CONTAINER ref ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("ref",
      Seq((100L, refText), (101L, otherText + " extra tail words here"))
        .toDF("doc_id", "text"))
    eng.execute("CREATE INDEX nd ON ref ['text'] USING lsh")
    eng.execute("CREATE CONTAINER corp ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("corp", Seq(
      (1L, refText), // verbatim copy of ref 100 -> score 1
      (2L, nearText), // near-dup of ref 100
      (3L, "completely unrelated content about spark catalyst planning"),
      (4L, otherText + " extra tail words here")) // verbatim of ref 101
      .toDF("doc_id", "text"))
    eng
  }

  private def rows(eng: Engine, stmt: String) =
    eng.execute(stmt).asInstanceOf[Engine.ResultSet].df.collect()

  test("SCORED: per-probe exact-measure top-k; verbatim copies at 1.0") {
    val eng = fixture("scored")
    val got = rows(eng, "SIMILAR corp AGAINST ref USING nd LIMIT 2 SCORED")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // doc 3 has no band collisions -> absent; verbatims rank 1 at 1.0
    val byDoc = got.groupBy(_._1)
    assert(!byDoc.contains(3L), s"unrelated doc must be absent: $got")
    assert(byDoc(1L).head == ((1L, 100L, 1.0, 1)), byDoc(1L).toString)
    assert(byDoc(4L).head == ((4L, 101L, 1.0, 1)), byDoc(4L).toString)
    // the near-dup's best match is ref 100 with 0 < jaccard < 1
    val near = byDoc(2L).head
    assert(near._2 == 100L && near._3 > 0.0 && near._3 < 1.0 && near._4 == 1,
      near.toString)
    // output is (pk, rank)-ordered and ranks are 1..n per probe
    assert(got.sortBy(r => (r._1, r._4)).toSeq == got.toSeq)
  }

  test("unscored: first k candidate ids per probe, no measure computed") {
    val eng = fixture("unscored")
    val got = rows(eng, "SIMILAR corp AGAINST ref USING nd LIMIT 5")
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // candidate sets: band collisions only — doc 3 absent, others hit
    // their verbatim/near ref docs
    assert(got.forall(_._3 >= 1))
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!byDoc.contains(3L))
    assert(byDoc(1L).contains(100L) && byDoc(4L).contains(101L))
    assert(byDoc(2L).contains(100L))
  }

  test("AT VERSION pins the reference: rows c2 gains later are invisible " +
      "to the pinned run (round 16, r15 judge #4)") {
    val eng = fixture("atversion")
    val v1 = eng.catalog.currentVersion("ref")
    val pinned1 = rows(eng,
      s"SIMILAR corp AGAINST ref AT VERSION $v1 USING nd LIMIT 5 SCORED")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // c2 gains a verbatim copy of corp doc 3's text -> current runs see
    // a new match, the pinned run must not
    eng.execute("CREATE ROW ['doc_id','text'] [102, 'completely unrelated " +
      "content about spark catalyst planning'] ON ref")
    eng.execute("COMMIT ref")
    val current = rows(eng, "SIMILAR corp AGAINST ref USING nd LIMIT 5 SCORED")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(current.contains((3L, 102L)), s"current must see the new ref row: $current")
    val pinned2 = rows(eng,
      s"SIMILAR corp AGAINST ref AT VERSION $v1 USING nd LIMIT 5 SCORED")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pinned2 == pinned1, s"pinned run drifted: $pinned2 vs $pinned1")
    assert(!pinned2.contains((3L, 102L)))
    // an uncommitted version refuses loudly
    intercept[ParseException](rows(eng,
      "SIMILAR corp AGAINST ref AT VERSION 99 USING nd LIMIT 5"))
  }

  test("ivf: PROBE widens the cross assignment; exact-cosine ranking") {
    val eng = fixture("ivf")
    import spark.implicits._
    def oneHot(axis: Int): Array[Byte] =
      graft.functions.Float32Unpack.pack(
        (0 until 4).map(a => if (a == axis) 1f else 0f))
    eng.execute("CREATE CONTAINER vref ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    // 8 rows on axes 0..3 (two per axis) — seeds = 4 lowest pks = one
    // per axis, so cells are exactly the axes (k-means fixed point)
    eng.catalog.overwrite("vref",
      (0L until 8L).map(i => (i, oneHot((i % 4).toInt))).toDF("vid", "emb"))
    eng.execute("CREATE INDEX annr ON vref ['emb'] USING ivf 4")
    eng.execute("CREATE CONTAINER vq ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    eng.catalog.overwrite("vq",
      Seq((10L, oneHot(0)), (11L, oneHot(3))).toDF("vid", "emb"))
    // PROBE 1: each query sees only its own axis cell (2 rows, cosine 1)
    val p1 = rows(eng, "SIMILAR vq AGAINST vref USING annr LIMIT 10 SCORED")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(p1.filter(_._1 == 10L).map(_._2).toSet == Set(0L, 4L), p1.toSeq.toString)
    assert(p1.filter(_._1 == 11L).map(_._2).toSet == Set(3L, 7L), p1.toSeq.toString)
    assert(p1.forall(_._3 == 1.0))
    // PROBE 4 (full): every vref row is a candidate — orthogonal axes
    // rank at cosine 0 below the same-axis pair
    val p4 = rows(eng,
      "SIMILAR vq AGAINST vref USING annr PROBE 4 LIMIT 10 SCORED")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(p4.count(_._1 == 10L) == 8, p4.toSeq.toString)
    val q10 = p4.filter(_._1 == 10L).sortBy(_._4)
    assert(q10.take(2).map(_._2).toSet == Set(0L, 4L) &&
      q10.take(2).forall(_._3 == 1.0), q10.toSeq.toString)
    assert(q10.drop(2).forall(_._3 == 0.0), q10.toSeq.toString)
    // PROBE past the trained cell count refuses
    intercept[ParseException](rows(eng,
      "SIMILAR vq AGAINST vref USING annr PROBE 5 LIMIT 10 SCORED"))
  }

  test("WHERE binds to the reference: filtered batch k-NN gates matches " +
      "before each probe's top-k (round 16)") {
    val eng = fixture("where")
    // WHERE doc_id > 100 keeps only ref 101: doc 1/2 lose their only
    // match (ref 100) and drop out entirely; doc 4 keeps ref 101
    val got = rows(eng,
      "SIMILAR corp AGAINST ref USING nd WHERE doc_id > 100 LIMIT 5 SCORED")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == Seq((4L, 101L, 1.0, 1)), got.toSeq.toString)
    // rank is dense WITHIN the filtered set (re-ranked, not gapped)
    assert(got.forall(_._4 == 1))
    // the unscored form filters the candidate join the same way
    val uf = rows(eng,
      "SIMILAR corp AGAINST ref USING nd WHERE doc_id > 100 LIMIT 5")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uf == Set((4L, 101L)), uf.toString)
    // the Access Path names the no-widening recall bound
    val ex = eng.execute("EXPLAIN SIMILAR corp AGAINST ref USING nd " +
      "WHERE doc_id > 100 LIMIT 5 SCORED")
      .asInstanceOf[Engine.Done].message
    assert(ex.contains("no per-probe widening"), ex.takeRight(400))
    // a predicate over a column c2 lacks refuses loudly
    intercept[Exception](rows(eng,
      "SIMILAR corp AGAINST ref USING nd WHERE nosuch = 1 LIMIT 5"))
  }

  test("int8 reference index: cross candidates from the quantized cells, " +
      "scores EXACT from the payloads (round 16)") {
    val eng = fixture("int8")
    import spark.implicits._
    def vec(fs: Float*): Array[Byte] =
      graft.functions.Float32Unpack.pack(fs.toIndexedSeq)
    // values OFF the 256-step grid: an approx (dequantized) score would
    // differ from exact cosine, so equality with the float-index twin
    // proves the cross verify reads payloads, not codes
    eng.execute("CREATE CONTAINER v8 ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    eng.catalog.overwrite("v8", Seq(
      (0L, vec(1f, 0.003f)), (1L, vec(0.002f, 1f)),
      (2L, vec(0.71f, 0.707f))).toDF("vid", "emb"))
    eng.execute("CREATE INDEX a8 ON v8 ['emb'] USING ivf 2 INT8")
    eng.execute("CREATE INDEX af ON v8 ['emb'] USING ivf 2")
    eng.execute("CREATE CONTAINER q8 ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    eng.catalog.overwrite("q8",
      Seq((10L, vec(0.009f, 0.998f))).toDF("vid", "emb"))
    def run(ix: String) = rows(eng,
      s"SIMILAR q8 AGAINST v8 USING $ix PROBE 2 LIMIT 3 SCORED")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val viaInt8 = run("a8")
    val viaFloat = run("af")
    assert(viaInt8 == viaFloat,
      s"int8 cross scores must be exact:\n int8 $viaInt8\n float $viaFloat")
    assert(viaInt8.nonEmpty && viaInt8.head._2 == 1L && viaInt8.head._4 == 1,
      viaInt8.toString)
  }

  test("FROM VERSION window: only the window's arrivals are enriched " +
      "(round 17 — the incremental k-NN join)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sa-win")
    val eng = new Engine(spark, dir.toString)
    import spark.implicits._
    eng.execute("CREATE CONTAINER ref ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("ref",
      Seq((100L, refText), (101L, otherText + " extra tail words here"))
        .toDF("doc_id", "text"))
    eng.execute("CREATE INDEX nd ON ref ['text'] USING lsh")
    eng.execute("CREATE CONTAINER corp ['doc_id','text'] [BIGINT, TEXT]")
    // v1: a verbatim copy that must NOT be re-enriched by the window
    eng.catalog.overwrite("corp",
      Seq((1L, refText)).toDF("doc_id", "text"))
    // v2 gains a near-dup and a verbatim of ref 101
    eng.catalog.append("corp", Seq(
      (2L, nearText), (4L, otherText + " extra tail words here"))
      .toDF("doc_id", "text"))
    val got = rows(eng,
      "SIMILAR corp AGAINST ref FROM VERSION 1 TO 2 USING nd LIMIT 2 SCORED")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byDoc = got.groupBy(_._1)
    assert(!byDoc.contains(1L),
      s"pre-window row must not be enriched: $got")
    assert(byDoc(2L).head._2 == 100L && byDoc(2L).head._4 == 1)
    assert(byDoc(4L).head == ((4L, 101L, 1.0, 1)), byDoc(4L).toString)
    // the unwindowed statement still enriches everything
    val full = rows(eng, "SIMILAR corp AGAINST ref USING nd LIMIT 2 SCORED")
      .map(_.getLong(0)).toSet
    assert(full == Set(1L, 2L, 4L), full.toString)
  }

  test("guards + plan shape: no all-pairs exchange, bounded-heap top-k") {
    val eng = fixture("plan")
    // PROBE on a band index refuses (no cell geometry) — even an
    // explicit PROBE 1 (r16 code review: the pk form errors, so the
    // batch form must not silently ignore the same knob)
    intercept[ParseException](rows(eng,
      "SIMILAR corp AGAINST ref USING nd PROBE 2 LIMIT 5"))
    intercept[ParseException](rows(eng,
      "SIMILAR corp AGAINST ref USING nd PROBE 1 LIMIT 5"))
    // self-AGAINST refuses
    intercept[ParseException](rows(eng, "SIMILAR corp AGAINST corp LIMIT 5"))
    // plan: shuffle-hash pinned candidate join, TopKPerGroup operator,
    // and NO cartesian product anywhere
    val ex = eng.execute(
      "EXPLAIN SIMILAR corp AGAINST ref USING nd LIMIT 3 SCORED")
      .asInstanceOf[Engine.Done].message
    assert(ex.contains("ShuffledHashJoin") || ex.contains("shuffle-hash"),
      ex.takeRight(400))
    assert(ex.contains("TopKPerGroup"), "bounded-heap top-k must serve")
    assert(!ex.contains("CartesianProduct"), "no all-pairs exchange")
    assert(ex.contains("similar against"), ex.takeRight(400))
  }
}
