package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (ArrayType(FloatType),
  * 64-dim) — north-star extension, no reference analogue.
  *
  * Cosine is computed in DOUBLE with an identical left-to-right summation
  * in both engines (zip-multiply-sum over the 64 elements), and the output
  * similarity is rounded to 6 decimals with a vec_id tie-break so top-k
  * ordering is engine-independent.
  *
  * Scale design (100 TB):
  *  - Brute force: query side is tiny → broadcast; each executor streams
  *    its partition of the corpus once and reduces it with the custom
  *    bounded-heap operator (graft.plans.TopKPerGroup) to ≤k rows per
  *    (partition, query) before any exchange — no corpus shuffle, no sort.
  *    This is the correctness baseline.
  *  - IVF-style ANN: the corpus is pre-partitioned into coarse cells (here
  *    the `label` column stands in for a k-means cell assignment, which at
  *    scale is a periodic batch job); a probe scans only the query's cell —
  *    a partition-pruned fraction of the corpus. Bucketing the parquet
  *    dataset by cell id makes the probe a file-skipping scan.
  */
object Similarity {
  /** The vector read: the 32-file pk-range-clustered compacted layout
    * (a vec_id-bucketed projection was measured and rejected — same
    * result as TextDedup.docs: the bucketed scan's per-task scheduling
    * cost exceeded what the avoided exchanges saved).
    */
  private def emb(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")

  /** Double-precision dot product of two float-array columns, summation in
    * element order (matches the DuckDB oracle's list_sum over
    * list_transform).
    */
  private def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** DuckDB equivalent: dot(a,b) via range-indexed list_transform (1-based),
    * left-to-right list_sum. */
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  /** Cross-cell near-dup pairs: candidates from BOTH hash families (IVF
    * cell equi-join ∪ 8-plane hyperplane-bucket equi-join — OR
    * amplification, so pairs straddling a cell boundary are still found),
    * verified by exact cosine > 0.35. Shared by sim_neardup_multiprobe and
    * sim_dup_clusters. Both joins are equi-joins on bounded keys; the
    * verification touches only bucket-colliding pairs.
    */
  private def multiprobePairs(s: SparkSession, dir: String): DataFrame = {
    val keyed = emb(s, dir).select(col("vec_id"), col("label"),
      Advanced.sparkBucket("embedding").as("hp"))
    val a = keyed.select(col("vec_id").as("ia"), col("label").as("cell_a"),
      col("hp").as("hp_a"))
    val b = keyed.select(col("vec_id").as("ib"), col("label").as("cell_b"),
      col("hp").as("hp_b"))
    // candidates are BARE ID PAIRS: the OR-amplification union + distinct
    // moves integers only — embedding payloads are joined back just for
    // the surviving candidates (also sidesteps a DuckDB quirk where WITH
    // RECURSIVE changes plain-UNION dedup over rows carrying float lists)
    val byCell = a.join(b, col("cell_a") === col("cell_b") && col("ia") < col("ib"))
    val byPlane = a.join(b, col("hp_a") === col("hp_b") && col("ia") < col("ib"))
    val cand = byCell.select(col("ia"), col("ib"))
      .union(byPlane.select(col("ia"), col("ib")))
      .distinct()
    val ea = emb(s, dir).select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val eb = emb(s, dir).select(col("vec_id").as("ib"), col("embedding").as("eb"))
    cand.join(ea, Seq("ia")).join(eb, Seq("ib"))
      .withColumn("cs", cosine(col("ea"), col("eb")))
      .filter(col("cs") > 0.35)
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        round(col("cs"), 6).as("cos_sim"))
  }

  // RECURSIVE unconditionally (same convention as TextDedup.duckLshPairs):
  // harmless for the non-recursive consumers because every UNION here
  // dedupes integer id pairs only, required by sim_dup_clusters' walk.
  private def duckMultiprobeCtes: String =
    s"""WITH RECURSIVE keyed AS (
       |  SELECT vec_id, label, ${Advanced.duckBucket("embedding")} AS hp
       |  FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT ia, ib FROM (
       |    SELECT a.vec_id AS ia, b.vec_id AS ib
       |    FROM keyed a JOIN keyed b ON a.label = b.label AND a.vec_id < b.vec_id
       |    UNION ALL
       |    SELECT a.vec_id, b.vec_id
       |    FROM keyed a JOIN keyed b ON a.hp = b.hp AND a.vec_id < b.vec_id) u),
       |pairs AS (
       |  SELECT ia AS id_a, ib AS id_b,
       |         round(${duckCos("x.embedding", "y.embedding")}, 6) AS cos_sim
       |  FROM cand JOIN embeddings x ON x.vec_id = ia
       |            JOIN embeddings y ON y.vec_id = ib
       |  WHERE ${duckCos("x.embedding", "y.embedding")} > 0.35)""".stripMargin

  /** Oracle for the probe-1 IVF search over the Lloyd cell assignment —
    * shared verbatim by `sim_ann_ivf_kmeans` (assignment recomputed in the
    * plan) and `sim_ann_ivf_persisted` (assignment probed from the
    * persisted bucketed index): the index must change WHERE the rows come
    * from, never WHAT they are.
    */
  private lazy val duckIvfProbe1Sql: String =
    s"""WITH seeds AS (SELECT vec_id AS sid, embedding AS semb
       |               FROM embeddings ORDER BY vec_id LIMIT 8),
       |a AS (SELECT e.vec_id, e.embedding, s.sid,
       |        round(${duckD2("e.embedding", "s.semb")}, 6) AS d2
       |      FROM embeddings e CROSS JOIN seeds s),
       |r AS (SELECT vec_id, embedding, sid, d2,
       |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn
       |      FROM a),
       |cells AS (SELECT vec_id, embedding, sid AS cluster FROM r WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, cluster AS qcell, embedding AS qe
       |       FROM cells WHERE vec_id < 5),
       |scored AS (
       |  SELECT qs.qid, c.vec_id AS nid,
       |         round(${duckCos("qs.qe", "c.embedding")}, 6) AS cos_sim
       |  FROM qs JOIN cells c ON c.cluster = qs.qcell AND c.vec_id <> qs.qid),
       |ranked AS (
       |  SELECT qid, nid, cos_sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** The persisted IVF index: the Lloyd cell assignment materialized once
    * per fixture as a parquet table hash-bucketed + sorted by cluster id
    * (`Tables.bucketedDerived`). A probe filters on literal cluster ids,
    * so the scan is bucket-pruned (`SelectedBucketsCount k out of 8`,
    * pinned by IvfIndexSpec) — the serving-path shape where queries read
    * ~nprobe/k of the corpus and never recompute the assignment.
    * Deterministic across builds: the assignment rounds d2 to 6 digits
    * and ties break on sid.
    */
  def ivfCells(s: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val build = assignToSeeds(emb(s, dir))
      .select(col("vec_id"), col("embedding"), col("cluster"))
    if (!src.isFile) build // directory-layout fixture: unpersisted fallback
    else Tables.bucketedDerived(s, src, "ivf_cells", "cluster", 8)(build)
  }

  val defs: Seq[Q] = Seq(

    // Vector norms — the scalar building block, verified on its own.
    Q("sim_vector_norms",
      s"""SELECT vec_id, round(sqrt(${duckDot("embedding", "embedding")}), 6) AS l2_norm
         |FROM embeddings ORDER BY vec_id""".stripMargin) {
      (s, dir) =>
        emb(s, dir).select(col("vec_id"),
          round(sqrt(dotD(col("embedding"), col("embedding"))), 6).as("l2_norm"))
          .orderBy(col("vec_id"))
    },

    // Brute-force cosine top-10 for 5 query vectors (the exact baseline).
    Q("sim_bruteforce_topk",
      s"""WITH qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT qs.qid, e.vec_id AS nid,
         |         round(${duckCos("qs.qe", "e.embedding")}, 6) AS cos_sim
         |  FROM qs JOIN embeddings e ON e.vec_id <> qs.qid),
         |ranked AS (
         |  SELECT qid, nid, cos_sim,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin, bench = true) {
      (s, dir) => {
        val e = emb(s, dir)
        val qs = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val scored = e.join(broadcast(qs), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
        // per-query top-10 via the custom bounded-heap operator: the corpus
        // is reduced to ≤10 rows per (partition, qid) BEFORE any exchange —
        // at 100 TB nothing but the winners ever shuffles. The rank column
        // is then a window over the ≤50 surviving rows, not the corpus.
        val top = graft.plans.TopK.perGroup(scored,
          Seq("qid"), Seq("cos_sim" -> false, "nid" -> true), 10)
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        top.withColumn("rank", row_number().over(w))
          .orderBy(col("qid"), col("rank"))
      }
    },

    // Same brute-force top-k through the native codegen'd Catalyst
    // expression (graft.functions.CosineSimilarity): one fused pass, no
    // intermediate arrays. Same oracle — DuckDB verifies the native
    // expression's values match the declarative semantics exactly.
    Q("sim_bruteforce_topk_native",
      s"""WITH qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT qs.qid, e.vec_id AS nid,
         |         round(${duckCos("qs.qe", "e.embedding")}, 6) AS cos_sim
         |  FROM qs JOIN embeddings e ON e.vec_id <> qs.qid),
         |ranked AS (
         |  SELECT qid, nid, cos_sim,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin, bench = true) {
      (s, dir) => {
        // native expression when the session carries GraftExtensions;
        // value-identical declarative fallback otherwise (a foreign
        // driver session must still get correct results)
        val cosFn: (Column, Column) => Column =
          if (s.catalog.functionExists("cosine_sim"))
            graft.functions.CosineSimilarity.cosineSim
          else cosine
        val e = emb(s, dir)
        val qs = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val scored = e.join(broadcast(qs), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosFn(col("qe"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .orderBy(col("qid"), col("rank"))
      }
    },

    // IVF-style ANN: probe only the query's coarse cell (label = cell id).
    // Same result shape as brute force but scans 1/n_cells of the corpus.
    Q("sim_ann_ivf_probe",
      s"""WITH qs AS (SELECT vec_id AS qid, label AS qcell, embedding AS qe
         |            FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT qs.qid, e.vec_id AS nid,
         |         round(${duckCos("qs.qe", "e.embedding")}, 6) AS cos_sim
         |  FROM qs JOIN embeddings e ON e.label = qs.qcell AND e.vec_id <> qs.qid),
         |ranked AS (
         |  SELECT qid, nid, cos_sim,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val qs = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("label").as("qcell"), col("embedding").as("qe"))
        val scored = e.join(broadcast(qs),
            col("label") === col("qcell") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .orderBy(col("qid"), col("rank"))
      }
    },

    // Pairwise all-pairs similarity restricted to one cell — the "join side"
    // of embedding-based near-dup detection (embedding-cosine dedup): pairs
    // above a similarity threshold within a coarse cell.
    Q("sim_cell_neardup_pairs",
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos_sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${duckCos("a.embedding", "b.embedding")} > 0.35
         |ORDER BY id_a, id_b""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val a = e.select(col("vec_id").as("id_a"), col("label").as("cell_a"),
          col("embedding").as("emb_a"))
        val b = e.select(col("vec_id").as("id_b"), col("label").as("cell_b"),
          col("embedding").as("emb_b"))
        a.join(b, col("cell_a") === col("cell_b") && col("id_a") < col("id_b"))
          .withColumn("cs", cosine(col("emb_a"), col("emb_b")))
          .filter(col("cs") > 0.35)
          .select(col("id_a"), col("id_b"), round(col("cs"), 6).as("cos_sim"))
          .orderBy(col("id_a"), col("id_b"))
      }
    },

    // Cross-cell near-dup: OR-amplified candidate generation over TWO hash
    // families — same coarse cell OR same 8-plane hyperplane bucket
    // (Advanced.sparkBucket). A pair straddling a cell boundary is still
    // caught when the planes agree, which for near-identical vectors they
    // almost surely do (each plane separates a θ-apart pair with
    // probability θ/π). Both families are equi-joins — no all-pairs blowup;
    // the exact cosine verify touches only candidate pairs. Oracle is the
    // identical declarative recompute.
    Q("sim_neardup_multiprobe",
      s"""$duckMultiprobeCtes
         |SELECT id_a, id_b, cos_sim FROM pairs
         |ORDER BY id_a, id_b""".stripMargin) {
      (s, dir) => multiprobePairs(s, dir).orderBy(col("id_a"), col("id_b"))
    },

    // Duplicate clusters over the embedding near-dup graph — the embedding
    // twin of dd_dup_clusters: connected components via min-label
    // propagation + pointer jumping (O(log diameter) rounds), so the
    // "which vectors are the same content" question gets a transitive
    // answer, not just pairs. Oracle = DuckDB recursive CTE over the same
    // verified pairs.
    Q("sim_dup_clusters",
      s"""$duckMultiprobeCtes,
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS v FROM e),
         |walk(v, l) AS (
         |  SELECT v, v FROM nodes
         |  UNION
         |  SELECT e.b, w.l FROM walk w JOIN e ON e.a = w.v),
         |comp AS (SELECT v, min(l) AS l FROM walk GROUP BY v)
         |SELECT v AS vec_id, CAST(l AS BIGINT) AS cluster_id FROM comp
         |ORDER BY vec_id""".stripMargin) {
      (s, dir) => TextDedup.connectedComponents(
          multiprobePairs(s, dir).select(col("id_a"), col("id_b")))
        .select(col("v").as("vec_id"), col("l").as("cluster_id"))
        .orderBy(col("vec_id"))
    },

    // Centroid stats per cell: element-wise mean of the first 4 dims — the
    // reduce step of the k-means iteration that maintains IVF cells.
    Q("sim_cell_centroids",
      """SELECT label, count(*) AS n,
        |       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c1,
        |       round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c2,
        |       round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS c3,
        |       round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS c4
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) {
      (s, dir) =>
        emb(s, dir).groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("c1"),
            round(avg(element_at(col("embedding"), 2).cast("double")), 6).as("c2"),
            round(avg(element_at(col("embedding"), 3).cast("double")), 6).as("c3"),
            round(avg(element_at(col("embedding"), 4).cast("double")), 6).as("c4"))
          .orderBy(col("label"))
    },

    // IVF-ANN with a REAL k-means coarse quantizer: the cell table is the
    // Lloyd assignment (km_lloyd_assign) rather than the fixture label —
    // build + probe of an IVF index end to end. At scale `cells` is a
    // materialized index table bucketed by cluster id (probe = one
    // file-skipping bucket scan of ~1/k of the corpus); the query side is
    // broadcast. Everything below composes the two oracle-verified halves,
    // and the oracle recomputes the identical declarative plan.
    // (sim_ann_ivf_persisted runs the SAME probe against the PERSISTED
    // bucketed index — identical oracle.)
    Q("sim_ann_ivf_kmeans", duckIvfProbe1Sql) {
      (s, dir) => {
        val cells = assignToSeeds(emb(s, dir))
          .select(col("vec_id"), col("embedding"), col("cluster"))
        val qs = cells.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("cluster").as("qcell"),
            col("embedding").as("qe"))
        val scored = cells.join(broadcast(qs),
            col("cluster") === col("qcell") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .orderBy(col("qid"), col("rank"))
      }
    },

    // The SAME probe-1 search served from the PERSISTED bucketed IVF index
    // (ivfCells): the probe list is computed per query against the 8-row
    // broadcast seed dimension (tiny driver-side metadata, the IVF serving
    // shape), then the index scan filters on those LITERAL cluster ids —
    // bucket-pruned to nprobe/k of the files, no assignment recompute.
    // Identical oracle to sim_ann_ivf_kmeans: an index may only change
    // where rows come from, never what they are.
    Q("sim_ann_ivf_persisted", duckIvfProbe1Sql) {
      (s, dir) => {
        val cells = ivfCells(s, dir)
        val qs = assignToSeeds(emb(s, dir)).filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("cluster").as("qcell"),
            col("embedding").as("qe"))
        // nprobe=1 probe list: ≤5 cluster ids — bounded per-query metadata
        val probed = qs.select(col("qcell")).distinct().collect().map(_.getLong(0))
        val scan = cells.filter(col("cluster").isin(probed.toIndexedSeq: _*))
        val scored = scan.join(broadcast(qs),
            col("cluster") === col("qcell") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .orderBy(col("qid"), col("rank"))
      }
    },

    // IVF multiprobe: each query probes its 2 NEAREST Lloyd cells instead
    // of 1 — the standard IVF recall/probe-count knob (sim_ann_recall
    // measures why probe-1 tops out ≈0.55 on this fixture). The probe
    // list is a per-query top-2 over the 8-row seed dimension (broadcast
    // both ways); candidate cells stay disjoint, so no dedup is needed.
    // At scale: probes = tiny per-query metadata, candidates = 2/k of the
    // corpus via cell-pruned (bucketBy-ready) scans.
    Q("sim_ann_ivf_multiprobe",
      s"""WITH seeds AS (SELECT vec_id AS sid, embedding AS semb
         |               FROM embeddings ORDER BY vec_id LIMIT 8),
         |a AS (SELECT e.vec_id, e.embedding, s.sid,
         |        round(${duckD2("e.embedding", "s.semb")}, 6) AS d2
         |      FROM embeddings e CROSS JOIN seeds s),
         |r AS (SELECT vec_id, embedding, sid, d2,
         |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn
         |      FROM a),
         |cells AS (SELECT vec_id, embedding, sid AS cluster FROM r WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |pq AS (SELECT q.qid, q.qe, s.sid,
         |         row_number() OVER (PARTITION BY q.qid
         |           ORDER BY round(${duckD2("q.qe", "s.semb")}, 6), s.sid) AS prn
         |       FROM q CROSS JOIN seeds s),
         |probes AS (SELECT qid, qe, sid FROM pq WHERE prn <= 2),
         |scored AS (
         |  SELECT p.qid, c.vec_id AS nid,
         |         round(${duckCos("p.qe", "c.embedding")}, 6) AS cos_sim
         |  FROM probes p JOIN cells c ON c.cluster = p.sid AND c.vec_id <> p.qid),
         |ranked AS (
         |  SELECT qid, nid, cos_sim,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val seeds = e.orderBy(col("vec_id")).limit(8)
          .select(col("vec_id").as("sid"), col("embedding").as("semb"))
        val cells = assignToSeeds(e).select(col("vec_id"), col("embedding"), col("cluster"))
        val pw = Window.partitionBy(col("qid")).orderBy(col("qd2"), col("sid"))
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
          .crossJoin(broadcast(seeds))
          .withColumn("qd2", round(d2(col("qe"), col("semb")), 6))
          .withColumn("prn", row_number().over(pw))
          .filter(col("prn") <= 2)
          .select(col("qid"), col("qe"), col("sid"))
        val scored = cells.join(broadcast(probes),
            col("cluster") === col("sid") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .orderBy(col("qid"), col("rank"))
      }
    },

    // Int8 scalar quantization — the standard 4× vector-compression step
    // before ANN serving (each dimension affinely mapped to 0..255 by its
    // corpus-wide min/max). The per-dimension bounds are a 64-row
    // aggregate (a broadcast dimension); codes are exact integers, so the
    // oracle needs no float rounding at all. Output: the first four codes
    // + the code sum as an exact whole-vector checksum. Reconstruction
    // error is bounded in QuantizeSpec (≤ half a quantization step per
    // dimension). Scale shape: explode → partial-agg bounds → broadcast
    // join → single-scan projection; the corpus never shuffles.
    Q("sim_quantize_int8",
      """WITH v AS (SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS val
        |           FROM embeddings, range(1, 65) AS t(i)),
        |b AS (SELECT dim, min(val) AS mn, max(val) AS mx FROM v GROUP BY dim),
        |q AS (SELECT vec_id, v.dim,
        |        CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
        |             ELSE CAST(round(255.0 * (val - mn) / (mx - mn), 0) AS BIGINT)
        |        END AS code
        |      FROM v JOIN b ON v.dim = b.dim)
        |SELECT vec_id,
        |       CAST(sum(CASE WHEN dim = 1 THEN code END) AS BIGINT) AS q1,
        |       CAST(sum(CASE WHEN dim = 2 THEN code END) AS BIGINT) AS q2,
        |       CAST(sum(CASE WHEN dim = 3 THEN code END) AS BIGINT) AS q3,
        |       CAST(sum(CASE WHEN dim = 4 THEN code END) AS BIGINT) AS q4,
        |       CAST(sum(code) AS BIGINT) AS code_sum
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin) {
      (s, dir) => {
        val v = emb(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "f")))
          .select(col("vec_id"), (col("pos") + 1).as("dim"), col("f").cast("double").as("val"))
        val b = v.groupBy(col("dim")).agg(min(col("val")).as("mn"), max(col("val")).as("mx"))
        // constant dimension (mx == mn) → code 0: Spark's x/0 yields NULL
        // while DuckDB yields ±inf, so the degenerate case must be guarded
        // identically in both engines
        val q = v.join(broadcast(b), Seq("dim"))
          .select(col("vec_id"), col("dim"),
            when(col("mx") === col("mn"), lit(0L))
              .otherwise(
                round(lit(255.0) * (col("val") - col("mn")) / (col("mx") - col("mn")), 0)
                  .cast("long")).as("code"))
        q.groupBy(col("vec_id"))
          .agg(sum(when(col("dim") === 1, col("code"))).as("q1"),
            sum(when(col("dim") === 2, col("code"))).as("q2"),
            sum(when(col("dim") === 3, col("code"))).as("q3"),
            sum(when(col("dim") === 4, col("code"))).as("q4"),
            sum(col("code")).as("code_sum"))
          .orderBy(col("vec_id"))
      }
    },

    // Quantize-then-rerank: the production serving recipe for memory-bound
    // ANN — score the corpus on int8-dequantized vectors (4× less memory
    // traffic than float32; here the reconstruction arithmetic is exact in
    // both engines), keep the approximate top-100, then rerank JUST those
    // candidates with exact float cosine to the final top-10. Fully
    // oracle-checkable end to end because the int8 code book is
    // deterministic (sim_quantize_int8) and ties break on nid at both
    // ranking stages. Scale shape: the rerank depth (100) bounds the
    // exact-scoring cost per query regardless of corpus size; candidates
    // are broadcast back onto the corpus scan for the float fetch.
    Q("sim_ann_int8_rerank",
      s"""WITH v AS (SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS val
         |           FROM embeddings, range(1, 65) AS t(i)),
         |b AS (SELECT dim, min(val) AS mn, max(val) AS mx FROM v GROUP BY dim),
         |rv AS (SELECT vec_id, v.dim,
         |         CASE WHEN mx = mn THEN mn
         |              ELSE mn + round(255.0 * (val - mn) / (mx - mn), 0)
         |                   * (mx - mn) / 255.0 END AS rv
         |       FROM v JOIN b ON v.dim = b.dim),
         |recon AS (SELECT vec_id, list(rv ORDER BY dim) AS rl FROM rv GROUP BY vec_id),
         |qr AS (SELECT vec_id AS qid, rl AS qrl FROM recon WHERE vec_id < 5),
         |ap AS (SELECT qid, r.vec_id AS nid,
         |         round(${duckCos("qrl", "rl")}, 6) AS acos
         |       FROM qr JOIN recon r ON r.vec_id <> qid),
         |top AS (SELECT qid, nid FROM (
         |          SELECT qid, nid,
         |                 row_number() OVER (PARTITION BY qid ORDER BY acos DESC, nid) AS rn
         |          FROM ap) WHERE rn <= 100),
         |er AS (SELECT t.qid, t.nid,
         |         round(${duckCos("q.embedding", "n.embedding")}, 6) AS cos_sim
         |       FROM top t JOIN embeddings q ON q.vec_id = t.qid
         |                  JOIN embeddings n ON n.vec_id = t.nid),
         |ranked AS (SELECT qid, nid, cos_sim,
         |             row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |           FROM er)
         |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val recon = int8Recon(e)
        val qR = recon.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("recon").as("qrecon"))
        val approx = recon.join(broadcast(qR), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosine(col("qrecon"), col("recon")), 6).as("acos"))
        // bounded-heap top-100 per query: only ≤100 rows per (partition,
        // qid) reach the exchange — the rerank-depth knob
        val top100 = graft.plans.TopK.perGroup(approx, Seq("qid"),
          Seq("acos" -> false, "nid" -> true), 100)
          .select(col("qid"), col("nid"))
        val scored = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
          .join(broadcast(top100), Seq("nid"))
          .join(broadcast(e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("qid"), col("embedding").as("qe"))), Seq("qid"))
          .select(col("qid"), col("nid"),
            round(cosine(col("qe"), col("ne")), 6).as("cos_sim"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .orderBy(col("qid"), col("rank"))
      }
    },

    // One Lloyd iteration of k-means, assignment half: nearest of k=8
    // deterministic seed centroids (the k lowest vec_ids), squared L2 in
    // double with element-order summation, round-6 before the argmin so
    // both engines break ties identically (distance, then seed id).
    // Scale shape: centroids are ALWAYS a broadcast dimension (k rows, by
    // construction — Spark MLlib's own k-means keeps them on the driver
    // between iterations); the corpus side is a single scan, no shuffle at
    // all for assignment. Full Lloyd iterations = this assignment + the
    // partial-agg mean update below, looped (KMeansSpec runs the loop and
    // pins the monotone-inertia invariant).
    Q("km_lloyd_assign",
      s"""WITH seeds AS (SELECT vec_id AS sid, embedding AS semb
         |               FROM embeddings ORDER BY vec_id LIMIT 8),
         |a AS (SELECT e.vec_id, s.sid,
         |        round(${duckD2("e.embedding", "s.semb")}, 6) AS d2
         |      FROM embeddings e CROSS JOIN seeds s),
         |r AS (SELECT vec_id, sid, d2,
         |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn
         |      FROM a)
         |SELECT vec_id, sid AS cluster, d2 FROM r WHERE rn = 1
         |ORDER BY vec_id""".stripMargin) {
      (s, dir) =>
        assignToSeeds(emb(s, dir))
          .select(col("vec_id"), col("cluster"), col("d2"))
          .orderBy(col("vec_id"))
    },

    // The matching Lloyd update half: per-cluster member count, mean
    // squared distance (the cluster's inertia share), and the first four
    // coordinates of the recomputed mean centroid — a partial-agg group-by
    // on the assignment, one (cluster)-keyed shuffle of k×dims doubles.
    Q("km_lloyd_update",
      s"""WITH seeds AS (SELECT vec_id AS sid, embedding AS semb
         |               FROM embeddings ORDER BY vec_id LIMIT 8),
         |a AS (SELECT e.vec_id, e.embedding, s.sid,
         |        round(${duckD2("e.embedding", "s.semb")}, 6) AS d2
         |      FROM embeddings e CROSS JOIN seeds s),
         |r AS (SELECT vec_id, embedding, sid, d2,
         |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn
         |      FROM a)
         |SELECT sid AS cluster, count(*) AS n, round(avg(d2), 6) AS mean_d2,
         |       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c1,
         |       round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c2,
         |       round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS c3,
         |       round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS c4
         |FROM r WHERE rn = 1 GROUP BY sid ORDER BY cluster""".stripMargin) {
      (s, dir) =>
        assignToSeeds(emb(s, dir))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n"), round(avg(col("d2")), 6).as("mean_d2"),
            round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("c1"),
            round(avg(element_at(col("embedding"), 2).cast("double")), 6).as("c2"),
            round(avg(element_at(col("embedding"), 3).cast("double")), 6).as("c3"),
            round(avg(element_at(col("embedding"), 4).cast("double")), 6).as("c4"))
          .orderBy(col("cluster"))
    }
  )

  /** Squared L2 distance in double, element-order summation (the Spark
    * twin of duckD2).
    */
  def d2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  private def duckD2(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  /** Nearest-centroid assignment against an explicit centroid set
    * (sid, semb). Centroids are k rows — a true broadcast dimension.
    */
  def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("sid"))
    e.crossJoin(broadcast(centroids))
      .withColumn("d2", round(d2(col("embedding"), col("semb")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("sid").as("cluster"), col("d2"))
  }

  /** Assignment to the deterministic k=8 seed centroids (lowest vec_ids). */
  def assignToSeeds(e: DataFrame): DataFrame =
    assign(e, e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("sid"), col("embedding").as("semb")))

  /** int8-dequantized embeddings: each dimension quantized to the 256-step
    * grid of its per-dimension [min,max] (the same affine code book as
    * sim_quantize_int8) and reconstructed back to doubles — the vectors an
    * int8 ANN scan actually compares. Deterministic arithmetic in both
    * engines, so rerank pipelines built on it stay oracle-checkable.
    * Scale shape: explode → 64-row broadcast bounds → single-scan
    * projection; reassembly is a per-vector sort of 64 structs.
    */
  def int8Recon(e: DataFrame): DataFrame = {
    val v = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "f")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        col("f").cast("double").as("val"))
    val b = v.groupBy(col("dim")).agg(min(col("val")).as("mn"), max(col("val")).as("mx"))
    v.join(broadcast(b), Seq("dim"))
      .select(col("vec_id"), col("dim"),
        when(col("mx") === col("mn"), col("mn")).otherwise(
          col("mn") + round(lit(255.0) * (col("val") - col("mn"))
              / (col("mx") - col("mn")), 0)
            * (col("mx") - col("mn")) / lit(255.0)).as("rv"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("rv")))),
        s => s.getField("rv")).as("recon"))
  }
}
