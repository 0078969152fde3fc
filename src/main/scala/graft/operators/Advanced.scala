package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced scale-path operators: hyperplane-LSH ANN, salted skew joins,
  * sketches, statistical aggregates, n-gram frequencies.
  *
  * The salted join and hyperplane-ANN queries are deliberately written so
  * their RESULTS equal a plain declarative form the DuckDB oracle can
  * express — the exotic machinery must be a pure execution-strategy change,
  * and the oracle proves it.
  */
object Advanced {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Deterministic ±1 hyperplanes over 64 dims (seed 42). The first 8 are
    * the oracle-shared planes of `sim_ann_hyperplane_lsh` (row-major fill:
    * extending the pool leaves them bit-identical); the full 32 feed the
    * banded-LSH configuration of the recall surface (8 bands × 4 bits),
    * which needs no SQL twin.
    */
  private val Planes32: Array[Array[Int]] = {
    val rng = new scala.util.Random(42)
    Array.fill(32, 64)(if (rng.nextBoolean()) 1 else -1)
  }
  private val Planes: Array[Array[Int]] = Planes32.take(8)

  /** Signed sum: dot(embedding, plane) with the plane as a literal array —
    * one zip-multiply-sum loop per plane instead of a 64-term expression
    * tree (8 planes × 64 terms would blow past codegen method limits).
    */
  private def sparkPlaneDot(embCol: String, plane: Array[Int]): Column = {
    val planeArr = array(plane.map(v => lit(v.toDouble)).toIndexedSeq: _*)
    aggregate(
      zip_with(col(embCol), planeArr, (x, p) => x.cast("double") * p),
      lit(0.0), (acc, v) => acc + v)
  }

  private def duckPlaneDot(embCol: String, plane: Array[Int]): String =
    plane.zipWithIndex.map { case (sign, d) =>
      val e = s"CAST($embCol[${d + 1}] AS DOUBLE)"
      if (sign > 0) s"+$e" else s"-$e"
    }.mkString("(", " ", ")")

  /** 8-bit LSH bucket via the NATIVE fused expression (one codegen'd
    * pass over the vector; the per-plane declarative form ran
    * interpreted at ~0.5 ms/row and dominated the ANN pipeline CPU).
    * coalesce keeps the declarative form's NULL contract (a NULL vector
    * buckets to 0, matching the oracle's CASE sums). The declarative
    * [[sparkPlaneDot]] remains the per-plane building block for
    * [[bandKeys32]] and the value-equivalence spec.
    */
  private[graft] def sparkBucket(embCol: String): Column =
    coalesce(graft.functions.HyperplaneBucket.hyperplaneBucket(col(embCol), Planes),
      lit(0))

  /** The declarative per-plane form sparkBucket replaced — kept as the
    * in-engine reference for HyperplaneBucketSpec's value-equivalence
    * pin (the oracle's CASE-sum twin). */
  private[graft] def sparkBucketDeclarative(embCol: String): Column =
    Planes.zipWithIndex.map { case (p, i) =>
      when(sparkPlaneDot(embCol, p) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  private[operators] def duckBucket(embCol: String): String =
    Planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${duckPlaneDot(embCol, p)} > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** 8 band keys from the 32-plane pool (4 sign bits each) for banded
    * OR-amplified LSH — recall-surface only, no SQL twin needed. */
  private def bandKeys32(embCol: String): Column = {
    val bits = Planes32.map(p =>
      when(sparkPlaneDot(embCol, p) > 0, lit(1)).otherwise(lit(0)))
    array((0 until 8).map { b =>
      struct(lit(b).as("band"),
        (0 until 4).map(i => bits(4 * b + i) * lit(1 << i)).reduce(_ + _).as("key"))
    }: _*)
  }

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  /** Per-group HLL estimate alongside the exact distinct count — the rich
    * surface OperatorsSpec pins at 2% and the `x_approx_distinct` oracle
    * row reduces to a 5% `within_tol` boolean. */
  def approxDistinctDetail(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy(col("l_returnflag"))

  /** Per-group GK quantile estimates at accuracy 1000 — the rich surface
    * OperatorsSpec pins against exact order statistics and the
    * `x_approx_percentile` oracle row reduces to rank-band booleans. */
  def approxPercentileDetail(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(1000)).as("qs"))
      .select(col("l_returnflag"),
        element_at(col("qs"), 1).as("p25"),
        element_at(col("qs"), 2).as("p50"),
        element_at(col("qs"), 3).as("p75"),
        element_at(col("qs"), 4).as("p95"))
      .orderBy(col("l_returnflag"))

  /** ANN recall/scan-cost grid: per-method avg/min recall@10 against the
    * exact brute-force top-10 plus average candidate-set size — the rich
    * surface AnnRecallSpec pins (orderings, floors, monotonicity) and the
    * `sim_ann_recall` oracle row reduces to per-method booleans. */
  def annRecallDetail(s: SparkSession, dir: String): DataFrame = {
        val k = 10
        val e = t(s, dir, "embeddings")
        def topkIds(scored: DataFrame): DataFrame =
          graft.plans.TopK.perGroup(scored, Seq("qid"),
            Seq("cos_sim" -> false, "nid" -> true), k).select(col("qid"), col("nid"))
        def score(candidates: DataFrame): DataFrame = candidates
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding")).as("cos_sim"))
        def cellCands(cells: DataFrame, cellCol: String): DataFrame = {
          val qs = cells.filter(col("vec_id") < 20)
            .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              col(cellCol).as("qcell"))
          cells.join(broadcast(qs),
            col(cellCol) === col("qcell") && col("vec_id") =!= col("qid"))
        }
        // exact ground truth: full corpus per query
        val qsAll = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val exact = topkIds(score(e.join(broadcast(qsAll), col("vec_id") =!= col("qid"))))
        // candidate set per index structure --------------------------------
        val kmeansCells = Similarity.assignToSeeds(e)
          .select(col("vec_id"), col("embedding"), col("cluster"))
        // probe-2: each query also scans its second-nearest cell — the
        // knob sim_ann_ivf_multiprobe implements, measured here
        val seeds = e.orderBy(col("vec_id")).limit(8)
          .select(col("vec_id").as("sid"), col("embedding").as("semb"))
        val pw = Window.partitionBy(col("qid")).orderBy(col("qd2"), col("sid"))
        val probes2 = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
          .crossJoin(broadcast(seeds))
          .withColumn("qd2", Similarity.d2(col("qe"), col("semb")))
          .withColumn("prn", row_number().over(pw))
          .filter(col("prn") <= 2).select(col("qid"), col("qe"), col("sid"))
        val bucketed = e.withColumn("bucket", sparkBucket("embedding"))
        // multiprobe: each query also probes the 8 Hamming-distance-1
        // buckets (flip one sign bit) — exploded on the broadcast side only
        val qb = bucketed.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            explode(array((lit(-1) +: (0 until 8).map(lit(_))): _*)).as("flip"),
            col("bucket"))
          .select(col("qid"), col("qe"),
            when(col("flip") < 0, col("bucket"))
              .otherwise(col("bucket").bitwiseXOR(expr("shiftleft(1, flip)")))
              .as("qbucket"))
        // banded LSH, 8 bands × 4 bits (32 planes): candidate on ANY band
        // match — the OR-amplification that actually recalls on
        // near-orthogonal vectors, at a visible scan-cost premium
        val banded = e.select(col("vec_id"), col("embedding"),
          explode(bandKeys32("embedding")).as("bb"))
          .select(col("vec_id"), col("embedding"),
            col("bb.band").as("band"), col("bb.key").as("key"))
        val qBand = banded.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("band").as("qband"), col("key").as("qkey"))
        // quantize-then-rerank: int8-dequantized scan picks each query's
        // approximate top-100, and ONLY those 100 get exact float scoring
        // — avg_scanned below reports the float-rerank depth (the
        // candidates this surface scores exactly), the knob that bounds
        // per-query exact-compute regardless of corpus size; the int8
        // pre-pass touches every code at 1/4 the bytes of float32.
        val recon = Similarity.int8Recon(e)
        val qRecon = recon.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("recon").as("qrecon"))
        val approxTop = graft.plans.TopK.perGroup(
          recon.join(broadcast(qRecon), col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id").as("nid"),
              round(cosine(col("qrecon"), col("recon")), 6).as("acos")),
          Seq("qid"), Seq("acos" -> false, "nid" -> true), 100)
          .select(col("qid"), col("nid").as("vec_id"))
        val int8Cand = e.join(broadcast(approxTop), Seq("vec_id"))
          .join(broadcast(qsAll), Seq("qid"))
        val methods: Seq[(String, DataFrame)] = Seq(
          "int8_rerank100" -> int8Cand,
          "ivf_label_probe1" -> cellCands(e, "label"),
          "ivf_kmeans_probe1" -> cellCands(kmeansCells, "cluster"),
          "ivf_kmeans_probe2" -> kmeansCells.join(broadcast(probes2),
            col("cluster") === col("sid") && col("vec_id") =!= col("qid")),
          "lsh_8bit_probe1" -> cellCands(bucketed, "bucket"),
          "lsh_8bit_multiprobe1" -> bucketed.join(broadcast(qb),
            col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
            .dropDuplicates("qid", "vec_id"),
          "lsh_4bit_8band" -> banded.join(broadcast(qBand),
            col("band") === col("qband") && col("key") === col("qkey")
              && col("vec_id") =!= col("qid"))
            .dropDuplicates("qid", "vec_id"))
        // per-(method, query): top-k hits vs ground truth AND scan cost —
        // recall without its candidate-set size is half a benchmark
        val hits = methods.map { case (m, cand) =>
          topkIds(score(cand)).withColumn("method", lit(m)) }
          .reduce(_ unionByName _)
          .join(exact, Seq("qid", "nid"))
          .groupBy(col("method"), col("qid")).agg(count(lit(1)).as("n_hits"))
        val scans = methods.map { case (m, cand) =>
          cand.select(col("qid"), col("vec_id")).dropDuplicates("qid", "vec_id")
            .groupBy(col("qid")).agg(count(lit(1)).as("n_scanned"))
            .withColumn("method", lit(m)) }
          .reduce(_ unionByName _)
        val methodDim = { import s.implicits._
          methods.map(_._1).toDF("method") }
        val grid = qsAll.select(col("qid")).crossJoin(broadcast(methodDim))
        grid.join(hits, Seq("method", "qid"), "left")
          .join(scans, Seq("method", "qid"), "left")
          .withColumn("recall", coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble))
          .withColumn("scanned", coalesce(col("n_scanned"), lit(0L)))
          .groupBy(col("method"))
          .agg(count(lit(1)).as("n_queries"),
            round(avg(col("recall")), 4).as("avg_recall"),
            round(min(col("recall")), 4).as("min_recall"),
            round(avg(col("scanned")), 1).as("avg_scanned"))
          .orderBy(col("method"))
  }

  val defs: Seq[Q] = Seq(

    // Random-hyperplane LSH ANN: 8 sign bits → 256 buckets; a probe scans
    // only its bucket (~1/256 of the corpus at scale; bucket id is a
    // partition/bucketBy key on a real deployment). Oracle recomputes the
    // same literal planes declaratively.
    Q("sim_ann_hyperplane_lsh",
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding, ${duckBucket("embedding")} AS bucket FROM embeddings),
         |qs AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb
         |       FROM bucketed WHERE vec_id < 20),
         |scored AS (
         |  SELECT qs.qid, e.vec_id AS nid,
         |         round(${duckCos("qs.qe", "e.embedding")}, 6) AS cos_sim
         |  FROM qs JOIN bucketed e ON e.bucket = qs.qb AND e.vec_id <> qs.qid),
         |ranked AS (SELECT qid, nid, cos_sim,
         |                  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |           FROM scored)
         |SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin, bench = true) {
      (s, dir) => {
        // corpus reads through the vec_id-bucketed projection: the plane
        // dots are the CPU of this query, and the flat layout's split
        // packing ran them ~5-wide on 32 cores (same starvation the
        // minhash hash stage had — one scan partition per bucket fixes
        // it with zero exchange). Pair scoring uses the NATIVE fused
        // cosine (value-identical to the declarative form by its spec).
        val bucketed = graft.Tables.bucketed(s, dir, "embeddings", "vec_id")
          .withColumn("bucket", sparkBucket("embedding"))
        val qs = bucketed.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket").as("qb"))
        val scored = bucketed.join(broadcast(qs),
            col("bucket") === col("qb") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(graft.functions.CosineSimilarity.cosineSim(
              col("qe"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .orderBy(col("qid"), col("rank"))
      }
    },

    // ANN quality surface: recall@10 of each approximate index against the
    // exact brute-force top-10 — THE production ANN metric (an index with
    // fast probes and unmeasured recall is not shippable). Four methods
    // spanning the quality spectrum the fixture exposes: probe-1 over the
    // fixture's arbitrary label (a near-random partition of the vectors —
    // the baseline a real quantizer must beat), probe-1 over the LEARNED
    // Lloyd cells (sim_ann_ivf_kmeans's quantizer), single-probe 8-bit
    // hyperplane LSH, and 1-bit-flip multiprobe LSH (9 buckets/query —
    // OR-amplification trading probe count for recall). The oracle row is
    // assertion-style (recall floors + scan-fraction ceilings as booleans
    // a VALUES relation re-asserts); the orderings live in AnnRecallSpec.
    //
    // Scale shape: the exact baseline is the one expensive pass (broadcast
    // query side, per-group bounded heap — winners-only shuffle); each
    // index's candidates come from a bucket equi-join (multiprobe explodes
    // the BROADCAST query side 9×, never the corpus); the final
    // method×query grid is a bounded dimension. Missing candidates (empty
    // cell/bucket) count as recall 0 for that query, not a dropped row.
    Q("sim_ann_recall",
      """WITH q AS (SELECT count(*) AS n_queries FROM embeddings
        |           WHERE vec_id < 20)
        |SELECT method, n_queries, TRUE AS recall_ok, TRUE AS scan_frac_ok
        |FROM q, (VALUES ('int8_rerank100'), ('ivf_kmeans_probe1'),
        |  ('ivf_kmeans_probe2'), ('ivf_label_probe1'), ('lsh_4bit_8band'),
        |  ('lsh_8bit_multiprobe1'), ('lsh_8bit_probe1')) AS m(method)
        |ORDER BY method""".stripMargin) {
      (s, dir) => {
        // Per-method recall floors and scan-FRACTION ceilings, reduced to
        // booleans DuckDB's VALUES relation re-asserts. Floors sit at
        // ~60-70% of the worst observed fixture value (sf0.001 and sf0.01
        // both measured; the 500-vector geometry is SF-stable), ceilings
        // ~1.5x the observed candidate fraction — loud on a broken index
        // or an accidental full scan, quiet across fixture reseeds.
        // Orderings (learned beats arbitrary, more probes recall more)
        // stay in AnnRecallSpec over annRecallDetail.
        val floors: Column = typedLit(Map(
          "int8_rerank100" -> 0.95, "ivf_kmeans_probe1" -> 0.30,
          "ivf_kmeans_probe2" -> 0.40, "ivf_label_probe1" -> 0.05,
          "lsh_4bit_8band" -> 0.45, "lsh_8bit_multiprobe1" -> 0.02,
          "lsh_8bit_probe1" -> 0.0))
        val ceilings: Column = typedLit(Map(
          "int8_rerank100" -> 0.21, "ivf_kmeans_probe1" -> 0.25,
          "ivf_kmeans_probe2" -> 0.40, "ivf_label_probe1" -> 0.25,
          "lsh_4bit_8band" -> 0.60, "lsh_8bit_multiprobe1" -> 0.15,
          "lsh_8bit_probe1" -> 0.10))
        val corpusN = t(s, dir, "embeddings").agg(count(lit(1)).as("corpus_n"))
        annRecallDetail(s, dir)
          .crossJoin(broadcast(corpusN))
          .select(col("method"), col("n_queries"),
            (col("avg_recall") >= element_at(floors, col("method")))
              .as("recall_ok"),
            (col("avg_scanned") / col("corpus_n")
              <= element_at(ceilings, col("method"))).as("scan_frac_ok"))
          .orderBy(col("method"))
      }
    },

    // Salted join: the fact side is salted 8 ways and the dim side
    // replicated 8x, so one hot key spreads over 8 reducers — the manual
    // skew treatment for pre-AQE engines and extreme skew. The oracle is
    // the PLAIN join: salting must not change results.
    Q("x_join_salted",
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) => {
        val salts = 8
        val fact = t(s, dir, "lineitem")
          .withColumn("salt", (pmod(hash(col("l_orderkey"), col("l_linenumber"), col("l_quantity")), lit(salts))))
        val dim = t(s, dir, "orders")
          .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
        fact.join(dim,
            fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderpriority"))
      }
    },

    // HLL sketch cardinality — ASSERTION-style oracle: the estimate itself
    // is engine-specific, so the Spark side emits whether it lands within
    // 5% of the exact distinct count (computed alongside — the exact agg
    // is the verification harness, not the serving path), and DuckDB's
    // exact re-count says that must be TRUE for every group while
    // exact_orders stays hash-exact. HLL at rsd=0.01 runs ~1% error, so
    // the 5% band has real margin yet fails loudly on a broken sketch.
    // The tighter 2% pin lives in OperatorsSpec over approxDistinctDetail.
    Q("x_approx_distinct",
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |       TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      bench = true) {
      (s, dir) =>
        approxDistinctDetail(s, dir)
          .select(col("l_returnflag"), col("exact_orders"),
            (abs(col("approx_orders") - col("exact_orders"))
              <= col("exact_orders").cast("double") * 0.05).as("within_tol"))
          .orderBy(col("l_returnflag"))
    },

    // Quantile sketch (Greenwald-Khanna style, Spark's percentile_approx)
    // — the bounded-memory companion to x_percentiles' exact sort-rank
    // form: the sketch carries O(accuracy·log n) entries per group through
    // the partial agg instead of every value, the 100 TB default for
    // monitoring-grade quantiles. ASSERTION-style oracle: the estimates
    // are engine-specific, so the Spark side joins them back to the data
    // and emits whether each one honors GK's published rank guarantee
    // |rank(est) − q·n| ≤ n/accuracy (+1 for tie granularity: the
    // estimate is an actual data value) — the same bound OperatorsSpec
    // pins driver-side over approxPercentileDetail. DuckDB's exact
    // re-count says every boolean must be TRUE with n hash-exact.
    Q("x_approx_percentile",
      """SELECT l_returnflag, count(*) AS n, TRUE AS ok_p25, TRUE AS ok_p50,
        |       TRUE AS ok_p75, TRUE AS ok_p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) => {
        val est = approxPercentileDetail(s, dir)
        val vals = t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
        // one partial-agg pass over the data against the broadcast
        // estimates: the estimate is an actual data value, so with m
        // duplicates its rank is ANY of [count(v < est)+1, count(v <=
        // est)] — check that this rank INTERVAL intersects the GK band
        // [q·n − n/1000, q·n + n/1000] instead of pinning the max rank
        // (a tie run near a boundary would overshoot count(v <= est) by
        // up to m−1 and flake the row even when the sketch is in spec)
        val ranked = vals.join(broadcast(est), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            Seq("p25", "p50", "p75", "p95").flatMap(p => Seq(
              sum(when(col("v") <= col(p), 1L).otherwise(0L)).as(s"le_$p"),
              sum(when(col("v") < col(p), 1L).otherwise(0L)).as(s"lt_$p"))): _*)
        def ok(p: String, q: Double) = {
          val band = col("n").cast("double") / 1000.0 + 1.0
          ((col(s"lt_$p") + 1.0 <= lit(q) * col("n") + band) &&
            (col(s"le_$p") >= lit(q) * col("n") - band)).as(s"ok_$p")
        }
        ranked.select(col("l_returnflag"), col("n"),
            ok("p25", 0.25), ok("p50", 0.50), ok("p75", 0.75), ok("p95", 0.95))
          .orderBy(col("l_returnflag"))
      }
    },

    // Statistical moments (round 6 absorbs summation-order jitter).
    Q("x_stats_moments",
      """SELECT l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_qty,
        |       round(stddev_samp(l_quantity), 6) AS sd_qty,
        |       round(var_samp(l_quantity), 6) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem").groupBy(col("l_returnflag"))
          .agg(round(avg(col("l_quantity")), 6).as("mean_qty"),
            round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
            round(var_samp(col("l_quantity")), 6).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"))
          .orderBy(col("l_returnflag"))
    },

    // Interpolated percentiles (both engines: continuous quantile).
    // Exact quantiles need a total order per group; Spark's `percentile`
    // aggregate buffers EVERY group value in the agg buffer (OOM on a
    // 100 TB group). This form instead sorts once (distributed, spills),
    // ranks with row_number, and reduces the two rank-adjacent values per
    // quantile with a conditional sum — identical interpolated result,
    // no value buffering. At extreme single-group skew the sort partition
    // spills rather than OOMs; approx_percentile remains the sketch
    // alternative where a documented error bound is acceptable.
    Q("x_percentiles",
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) => {
        // quantile_cont ignores NULLs — exclude them from both the ranks
        // and the counts or every rank above a NULL shifts
        val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity"))
          .filter(col("l_quantity").isNotNull)
        val counts = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
        val ranked = li.withColumn("rn", row_number().over(w))
          .join(broadcast(counts), "l_returnflag")
        // continuous quantile: p = (n-1)q, v = (1-frac)·v[⌊p⌋+1] + frac·v[⌊p⌋+2]
        def quant(q: Double): Column = {
          val p = (col("n") - 1) * lit(q)
          val lower = floor(p)
          val frac = p - lower
          sum(when(col("rn") === lower + 1, (lit(1.0) - frac) * col("l_quantity"))
            .when(col("rn") === lower + 2, frac * col("l_quantity"))
            .otherwise(lit(0.0)))
        }
        ranked.groupBy(col("l_returnflag"))
          .agg(round(quant(0.5), 6).as("median_qty"),
            round(quant(0.9), 6).as("p90_qty"))
          .orderBy(col("l_returnflag"))
      }
    },

    // Percent-of-total: each order-priority's share of global revenue.
    // The unpartitioned sum-over-() window runs on the AGGREGATED output
    // (5 rows), never the fact table — the aggregate reduces first, so the
    // single-partition window is free at any corpus scale.
    Q("x_percent_of_total",
      """WITH a AS (SELECT o_orderpriority, sum(o_totalprice) AS rev
        |           FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, round(rev, 2) AS rev,
        |       round(100 * rev / sum(rev) OVER (), 6) AS pct
        |FROM a ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) => {
        val a = t(s, dir, "orders").groupBy(col("o_orderpriority"))
          .agg(sum(col("o_totalprice")).as("rev"))
        a.select(col("o_orderpriority"), round(col("rev"), 2).as("rev"),
            round(lit(100) * col("rev")
              / sum(col("rev")).over(Window.partitionBy()), 6).as("pct"))
          .orderBy(col("o_orderpriority"))
      }
    },

    // Winsorization: clamp per-group outliers to the group's [p10, p90] —
    // the standard robust-cleaning step before computing means over heavy
    // tails. Quantiles use the same buffer-free sort-rank interpolation as
    // x_percentiles (no per-group value buffering → no OOM on a 100 TB
    // group); the 5-row bounds table broadcasts back onto the fact rows,
    // which never shuffle for the clamp.
    Q("x_winsorize",
      """WITH b AS (SELECT l_returnflag,
        |             quantile_cont(l_extendedprice, 0.1) AS lo,
        |             quantile_cont(l_extendedprice, 0.9) AS hi
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, l.l_returnflag,
        |       round(least(greatest(l_extendedprice, lo), hi), 6) AS price_w
        |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
        |WHERE l_extendedprice IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l.l_returnflag, price_w""".stripMargin) {
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_extendedprice"))
          // NULL prices are excluded from the OUTPUT as well as the bounds
          // (both engines: the oracle's WHERE mirrors this filter) — a
          // NULL-price row has no meaningful winsorized value
          .filter(col("l_extendedprice").isNotNull)
        val counts = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
        val ranked = li.withColumn("rn", row_number().over(w))
          .join(broadcast(counts), "l_returnflag")
        def quant(q: Double): Column = {
          val p = (col("n") - 1) * lit(q)
          val lower = floor(p)
          val frac = p - lower
          sum(when(col("rn") === lower + 1, (lit(1.0) - frac) * col("l_extendedprice"))
            .when(col("rn") === lower + 2, frac * col("l_extendedprice"))
            .otherwise(lit(0.0)))
        }
        val bounds = ranked.groupBy(col("l_returnflag"))
          .agg(quant(0.1).as("lo"), quant(0.9).as("hi"))
        li.join(broadcast(bounds), Seq("l_returnflag"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            round(least(greatest(col("l_extendedprice"), col("lo")), col("hi")), 6)
              .as("price_w"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("price_w"))
      }
    },

    // Equi-width histogram (fixed literal bounds, so one scan suffices —
    // a data-dependent min/max would force a second pass; production
    // profilers use known bounds or a prior sketch). Bucket arithmetic is
    // integer-exact in both engines: floor(price/5000) clamped to the top
    // bucket. Pure partial-agg group-by — the exchange carries ≤ 25 rows.
    Q("x_histogram_price",
      """SELECT least(CAST(floor(l_extendedprice / 5000) AS BIGINT), CAST(24 AS BIGINT))
        |         AS bucket,
        |       count(*) AS n,
        |       round(sum(l_extendedprice), 2) AS total
        |FROM lineitem
        |GROUP BY 1 ORDER BY bucket""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(least(floor(col("l_extendedprice") / 5000).cast("long"), lit(24L))
            .as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("total"))
          .orderBy(col("bucket"))
    },

    // Ordered string aggregation.
    Q("x_group_concat",
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "nation").groupBy(col("n_regionkey"))
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy(col("n_regionkey"))
    },

    // Pivot (conditional aggregation into columns).
    Q("x_pivot_status",
      """SELECT o_orderpriority,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .count()
          .na.fill(0L, Seq("F", "O", "P"))
          .orderBy(col("o_orderpriority"))
    },

    // Unpivot (melt) — the inverse of x_pivot_status: wide pricing columns
    // → long (metric, amount) rows. Spark's unpivot lowers to a single
    // Expand over one scan (no self-union, no re-read per metric); the
    // oracle spells the same relation as a portable UNION ALL.
    Q("x_unpivot",
      """SELECT l_orderkey, l_linenumber, metric, amount FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS amount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber, metric, amount""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 1000)
          .unpivot(
            ids = Array(col("l_orderkey"), col("l_linenumber")),
            values = Array(col("l_discount"), col("l_extendedprice"), col("l_tax")),
            variableColumnName = "metric",
            valueColumnName = "amount")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("amount"))
    },

    // Corpus-level n-gram frequency: top 20 3-shingles with tie-break.
    Q("t_ngram_frequency",
      """WITH toks AS (SELECT doc_id, string_split(lower(text),' ') tk FROM documents),
        |shing AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(tk)-1), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS sg
        |  FROM toks)
        |SELECT sg, count(*) AS n FROM shing GROUP BY sg
        |ORDER BY n DESC, sg LIMIT 20""".stripMargin) {
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("tk", split(lower(col("text")), " "))
          // size guard: sequence(1, n) turns descending for n < 1 (short docs)
          .withColumn("sg", explode(expr(
            "CASE WHEN size(tk) >= 3 THEN transform(sequence(1, size(tk)-2), " +
              "i -> element_at(tk,i) || ' ' || element_at(tk,i+1) || ' ' || element_at(tk,i+2)) " +
              "ELSE array() END")))
          .groupBy(col("sg")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("sg")).limit(20)
    }
  )
}
