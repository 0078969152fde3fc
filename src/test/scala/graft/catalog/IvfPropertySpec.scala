package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): IVF index candidates against an independent
  * driver-side model under ARBITRARY random geometry (the fixture specs
  * use one-hot vectors; this pins the semantics where no structure
  * helps). The model replicates the contract exactly:
  *  - centroids = the k lowest-pk vectors, frozen at create (raw seeds —
  *    training happens only at REBUILD);
  *  - assignment = argmin d2 with d2 ROUNDED to 6 (HALF_UP) and seed-id
  *    tie-break — the distributed assignment's exact arithmetic;
  *  - pk-probe candidates at PROBE p = members of the probe row's p
  *    nearest cells, minus the row itself;
  *  - vector-probe candidates = members of the literal vector's p
  *    nearest cells, NO self-exclusion.
  * Random draws with a fixed seed: deterministic forever once green.
  */
class IvfPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(662607)

  private val dims = 6
  private def randVec(): Array[Float] =
    Array.fill(dims)((rng.nextDouble() * 2 - 1).toFloat)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def d2(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    round6(s)
  }

  /** The model's nearest-p cells of `q` given centroids in seed order. */
  private def nearestCells(q: Seq[Float],
      cents: Seq[(Int, Array[Float])], p: Int): Seq[Int] =
    cents.map { case (sid, c) => (sid, d2(q, c.toIndexedSeq)) }
      .sortBy { case (sid, d) => (d, sid) }.take(p).map(_._1)

  test("random corpora: pk and vector probes match the model for k in {3, 5}, probe in {1, 2}") {
    for (k <- Seq(3, 5)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ivf-prop-$k")
      val cat = new Catalog(spark, dir.toString)
      cat.create("pv", List("vid" -> graft.aql.AlbaType.of("BIGINT"),
        "e" -> graft.aql.AlbaType.of("MEDIUM-BYTES")))
      val vecs: Map[Long, Array[Float]] =
        (0L until 30L).map(i => i -> randVec()).toMap
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      vecs.toSeq.sortBy(_._1).foreach { case (i, v) => rows.add(
        org.apache.spark.sql.Row(i, graft.functions.Float32Unpack.pack(v.toIndexedSeq))) }
      cat.overwrite("pv", spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vid",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("e",
            org.apache.spark.sql.types.BinaryType, nullable = false)))))
      cat.createIndex("pv", "ann", "ivf", "e", Some(k))

      // the model's centroids ARE the k lowest-pk vectors
      val cents = (0 until k).map(i => i -> vecs(i.toLong))
      val persisted = Index.centroids(cat, "pv", "ann")
      assert(persisted.size == k)
      persisted.foreach { case (sid, c) =>
        assert(c.toSeq == cents(sid)._2.toSeq, s"seed $sid centroid drifted") }
      val cell: Map[Long, Int] = vecs.map { case (i, v) =>
        i -> nearestCells(v.toIndexedSeq, cents, 1).head }

      val eng = new graft.aql.Engine(spark, dir.toString)
      def served(aql: String): Set[Long] = eng.execute(aql)
        .asInstanceOf[graft.aql.Engine.ResultSet].df
        .collect().map(_.getLong(0)).toSet

      for (p <- Seq(1, 2); trial <- 1 to 3) {
        // pk probe: a random committed row
        val pk = rng.nextInt(30).toLong
        val pkCells = nearestCells(vecs(pk).toIndexedSeq, cents, p).toSet
        val pkExpect = vecs.keySet.filter(i => pkCells(cell(i))) - pk
        assert(served(s"SIMILAR $pk ON pv PROBE $p LIMIT 50") == pkExpect,
          s"k=$k p=$p trial=$trial pk=$pk")
        // vector probe: a fresh random vector, no self-exclusion
        val q = randVec()
        val qCells = nearestCells(q.toIndexedSeq, cents, p).toSet
        val qExpect = vecs.keySet.filter(i => qCells(cell(i)))
        // Locale.ROOT: a comma-decimal default locale would mis-tokenize
        // the group literal (top-level commas split elements)
        def fmt(x: Float): String =
          String.format(java.util.Locale.ROOT, "%.6f", Double.box(x.toDouble))
        val qLit = q.map(fmt).mkString("[", ", ", "]")
        // the literal round-trips through the parser as a double and
        // re-packs to float32: feed the model the SAME rounded floats
        val qParsed = q.map(x => fmt(x).toDouble.toFloat)
        val qCells2 = nearestCells(qParsed.toIndexedSeq, cents, p).toSet
        val qExpect2 = vecs.keySet.filter(i => qCells2(cell(i)))
        assert(served(s"SIMILAR $qLit ON pv PROBE $p LIMIT 50") == qExpect2,
          s"k=$k p=$p trial=$trial vector probe")
        assert(qExpect2 == qExpect || qCells2 != qCells,
          "sanity: rounding only matters when it moves the cell pick")
      }
      eng.execute("DELETE CONTAINER pv")
    }
  }

  test("duplicate-pk corpora serve each pk ONCE, with a deterministic emb pick") {
    // duplicate index rows for one pk arise across COMMITS (each commit
    // derives its own files' assignments): pk 1 lands in two different
    // cells. A probe covering both cells must emit pk 1 once — unscored
    // AND scored (the rerank picks the min emb, deterministically).
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-duppk")
    val cat = new Catalog(spark, dir.toString)
    cat.create("dp", List("vid" -> graft.aql.AlbaType.of("BIGINT"),
      "e" -> graft.aql.AlbaType.of("MEDIUM-BYTES")))
    def onehot(a: Int): Array[Byte] = graft.functions.Float32Unpack.pack(
      (0 until 4).map(d => if (d == a) 1f else 0f))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    // seeds 0..1 pin centroids to axes 0 and 1; 4..5 pad cell 1
    Seq(0L -> 0, 1L -> 1, 4L -> 0, 5L -> 1).foreach { case (i, a) =>
      rows.add(org.apache.spark.sql.Row(i, onehot(a))) }
    cat.overwrite("dp", spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vid",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("e",
          org.apache.spark.sql.types.BinaryType, nullable = false)))))
    cat.createIndex("dp", "ann", "ivf", "e", Some(2))
    // commit pk 4 AGAIN with an axis-1 vector: two index rows for vid 4
    val tx = new Tx(cat)
    tx.stageInsert("dp", Seq(org.apache.spark.sql.Row(4L, onehot(1))))
    tx.commit(Some("dp"))
    assert(cat.readIndex("dp", "ann")
      .filter(col("id") === 4L).count() == 2, "fixture needs the dup rows")
    val eng = new graft.aql.Engine(spark, dir.toString)
    // a probe spanning BOTH cells sees vid 4's two rows — served once
    val plain = eng.execute("SIMILAR [0.7, 0.7, 0.0, 0.0] ON dp PROBE 2")
      .asInstanceOf[graft.aql.Engine.ResultSet].df
      .collect().map(_.getLong(0)).toSeq
    assert(plain.count(_ == 4L) == 1, s"pk 4 must serve once, got $plain")
    assert(plain.sorted == Seq(0L, 1L, 4L, 5L), plain.toString)
    val scored = eng.execute("SIMILAR [0.7, 0.7, 0.0, 0.0] ON dp PROBE 2 SCORED")
      .asInstanceOf[graft.aql.Engine.ResultSet].df
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(scored.map(_._1).count(_ == 4L) == 1,
      s"scored pk 4 must serve once, got $scored")
  }

  test("sample-bounded rebuild (n > 256·k): training reads exactly the bound, deterministically; sampled centroids separate the blobs and serving matches the model") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-sample")
    val cat = new Catalog(spark, dir.toString)
    cat.create("sv", List("vid" -> graft.aql.AlbaType.of("BIGINT"),
      "e" -> graft.aql.AlbaType.of("MEDIUM-BYTES")))
    // 600 rows in TWO separated blobs (axis by pk parity, small jitter):
    // with k=2 the sample bound is 512 < 600, so the Lloyd rebuild MUST
    // train on the 512-row hash sample — the blob structure then checks
    // the sampled training still finds the real clusters
    val n = 600
    val vecs: Map[Long, Array[Float]] = (0L until n).map { i =>
      val axis = (i % 2).toInt
      i -> Array.tabulate(dims)(d =>
        (if (d == axis) 1f else 0f) + 0.05f * (rng.nextFloat() - 0.5f))
    }.toMap
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    vecs.toSeq.sortBy(_._1).foreach { case (i, v) => rows.add(
      org.apache.spark.sql.Row(i, graft.functions.Float32Unpack.pack(v.toIndexedSeq))) }
    cat.overwrite("sv", spark.createDataFrame(rows, schema))
    cat.createIndex("sv", "ann", "ivf", "e", Some(2))
    // the training sample is min(256·k, n) DISTINCT rows, an order
    // statistic over xxhash64(pk) — bounded and rerun-identical
    def sampleIds() = Index.trainingSample(cat, "sv", "e", 2)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    val s1 = sampleIds()
    assert(s1.size == 512 && s1.distinct.size == 512,
      s"sample must be the 512-row bound, got ${s1.size}")
    assert(s1 == sampleIds(), "the sample must be deterministic")
    // ...and bounded corpora sample to themselves (k=2 bound ≥ 30 rows)
    cat.create("tiny", List("vid" -> graft.aql.AlbaType.of("BIGINT"),
      "e" -> graft.aql.AlbaType.of("MEDIUM-BYTES")))
    cat.overwrite("tiny", spark.createDataFrame(
      new java.util.ArrayList(rows.subList(0, 30)), schema))
    assert(Index.trainingSample(cat, "tiny", "e", 2).count() == 30,
      "a corpus under the bound samples to itself")

    cat.rebuildIndex("sv", "ann") // Lloyd over the 512-row sample only
    val cents = Index.centroids(cat, "sv", "ann")
    assert(cents.size == 2)
    // recall floor: the sampled training must still separate the blobs —
    // every probe's parity-mates live in its own cell
    val cell: Map[Long, Int] = vecs.map { case (i, v) =>
      i -> nearestCells(v.toIndexedSeq, cents, 1).head }
    for (parity <- 0 to 1) {
      val members = vecs.keySet.filter(_ % 2 == parity)
      val cellsOf = members.map(cell)
      assert(cellsOf.size == 1,
        s"parity-$parity blob must land in ONE trained cell, got $cellsOf")
    }
    assert(cell.values.toSet.size == 2, "the two blobs must use BOTH cells")
    // the serving contract is training-independent: probes match the
    // nearest-cell model derived from the PERSISTED centroids
    val eng = new graft.aql.Engine(spark, dir.toString)
    def served(aql: String): Set[Long] = eng.execute(aql)
      .asInstanceOf[graft.aql.Engine.ResultSet].df
      .collect().map(_.getLong(0)).toSet
    for (trial <- 1 to 3) {
      val pk = rng.nextInt(n).toLong
      val pkCells = nearestCells(vecs(pk).toIndexedSeq, cents, 1).toSet
      val expect = vecs.keySet.filter(i => pkCells(cell(i))) - pk
      assert(served(s"SIMILAR $pk ON sv LIMIT $n") == expect,
        s"trial=$trial pk=$pk")
    }
  }
}
