package graft.streaming

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Streaming pipelines verified against their DuckDB-checked batch twins
  * over the same fixture files (memory sink + processAllAvailable).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("windowed aggregation stream matches the batch twin (e_daily_by_type)") {
    val q = EventStreams.dailyByType(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("daily_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("daily_out")
      .select(col("day"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = graft.SparkEntry.queries("e_daily_by_type")(spark, dir)
      .select(col("day"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
  }

  test("sliding-window stream matches the same window() computed in batch") {
    val q = EventStreams.slidingByType(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sliding_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = EventStreams.slidingByType(graft.Tables.events(spark, dir))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    // sanity: overlapping windows double-count each event across the corpus
    val total = spark.table("sliding_out")
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    assert(total == 2 * graft.Tables.events(spark, dir).count())
  }

  test("stream-static join enrichment matches the batch join") {
    import org.apache.spark.sql.functions.expr
    // static dimension: users bucketed into two cohorts
    val userDim = graft.Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .withColumn("cohort", expr("CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END"))
    userDim.cache().count()

    val q = EventStreams.enrichedCounts(EventStreams.readEvents(spark, dir), userDim)
      .writeStream.outputMode("complete")
      .format("memory").queryName("enriched_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("enriched_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStreams.enrichedCounts(graft.Tables.events(spark, dir), userDim)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-stream interval join matches the batch range join (e_range_join)") {
    val q = EventStreams.purchaseClicks30m(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try q.processAllAvailable() finally q.stop()

    // per-purchase click counts from the streamed pairs must equal the
    // batch range join's counts for every purchase with >= 1 click
    val streamed = spark.table("ssjoin_out")
      .groupBy(col("p_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.SparkEntry.queries("e_range_join")(spark, dir)
      .filter(col("clicks_30m") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming exact dedup matches the batch twin (dd_exact)") {
    val q = DocumentStreams.exactDedupCounts(DocumentStreams.readDocuments(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("dedup_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.SparkEntry.queries("dd_exact")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  /** Stage the documents fixture as TWO parquet files in one dir +
    * `maxFilesPerTrigger=1`, so sketch/summary state serializes into the
    * state store after trigger 1 and MERGES with trigger 2's partial —
    * the cross-trigger property a single-batch run never exercises.
    * (Two sequential appends into one directory: no subdir/move dance.) */
  private def twoTriggerDocStream(): org.apache.spark.sql.DataFrame = {
    val docsAll = graft.Tables.load(spark, dir, "documents")
    val stage = java.nio.file.Files.createTempDirectory("graft-2trig-stage")
    docsAll.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(stage.toString)
    docsAll.filter(col("doc_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(stage.toString)
    spark.readStream.schema(docsAll.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage.toString)
  }

  test("streaming heavy hitters honor the Misra-Gries bounds vs exact counts") {
    val k = 256
    val stream = twoTriggerDocStream()
    val q = DocumentStreams.heavyHitters(stream, k)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected the corpus to arrive across >= 2 triggers")

    val summary = spark.table("hh_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
    val n = toks.count()
    val bound = n.toDouble / (k + 1)
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.nonEmpty && summary.size <= k)
    for ((t, c) <- exact if c > bound)
      assert(summary.contains(t), s"heavy hitter '$t' ($c > $bound) missing from stream state")
    for ((t, est) <- summary) {
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth && est >= truth - bound, s"'$t': est $est vs true $truth ± $bound")
    }
  }

  test("streaming approx-distinct sketches merge across triggers ≡ one-shot batch estimate") {
    val docsAll = graft.Tables.load(spark, dir, "documents")
    val stream = twoTriggerDocStream()
    val q = DocumentStreams.approxDistinctByLang(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected the corpus to arrive across >= 2 triggers")
    val streamed = spark.table("hll_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the merged-across-triggers sketch must equal the ONE-SHOT batch
    // sketch estimate (same DataSketches algorithm, union-merge exact)
    val batch = DocumentStreams.approxDistinctByLang(docsAll).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    // and within tolerance of exact distinct (sanity on the estimate)
    val exactNd = docsAll.groupBy("lang").agg(countDistinct(col("text")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, nd) <- exactNd)
      assert(math.abs(streamed(l) - nd) <= math.max(2L, (nd * 0.05).toLong),
        s"lang $l: estimate ${streamed(l)} vs exact $nd")
  }

  test("streaming approx-median sketches merge across triggers ≡ exact order statistic") {
    val docsAll = graft.Tables.load(spark, dir, "documents")
    val stream = twoTriggerDocStream()
    val q = DocumentStreams.approxMedianByLang(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("kll_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected the corpus to arrive across >= 2 triggers")
    val streamed = spark.table("kll_out").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // below sketch capacity the KLL retains every value, so the merged
    // estimate is DETERMINISTIC: the exact inclusive order statistic
    // v⌈n/2⌉ per group, whatever the trigger boundaries. Verify the
    // fixture is in that regime, then pin exact equality — to the order
    // statistic AND to the one-shot batch run.
    val perLang = docsAll.select(col("lang"), col("n_chars")).collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        l -> rs.map(_.getLong(1)).sorted.toVector }
    assert(perLang.values.forall(_.length <= graft.functions.KllSketch.DefaultK),
      "fixture group outgrew sketch capacity — the exact pin no longer applies")
    val exact = perLang.map { case (l, vs) =>
      l -> vs((vs.length + 1) / 2 - 1).toDouble }
    assert(streamed == exact, s"streamed $streamed != order statistic $exact")
    val batch = DocumentStreams.approxMedianByLang(docsAll).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(batch == exact, s"one-shot batch $batch != order statistic $exact")
    // the same state rendered at rank 0.9 — the rank picks the rendering
    // only, so the p90 twin is exact in the same regime
    val p90 = DocumentStreams.approxQuantileByLang(docsAll, 0.9).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact90 = perLang.map { case (l, vs) =>
      l -> vs(math.ceil(0.9 * vs.length).toInt.max(1) - 1).toDouble }
    assert(p90 == exact90, s"p90 twin $p90 != order statistic $exact90")
  }

  test("streaming approx-top-k sketches merge across triggers ≡ exact top-k rendering") {
    val docsAll = graft.Tables.load(spark, dir, "documents")
    val stream = twoTriggerDocStream()
    val q = DocumentStreams.approxTopKByLang(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("freq_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected the corpus to arrive across >= 2 triggers")
    val streamed = spark.table("freq_out").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // while a group's distincts fit the counter map the sketch never
    // purges (exact counts, getMaximumError == 0), so the merged-across-
    // triggers rendering is DETERMINISTIC: the exact top-3 in (count
    // DESC, item ASC) order. Verify the fixture is in that regime, then
    // pin string equality — to the exact rendering AND the one-shot run.
    val perLang = docsAll.select(col("lang"), col("source")).collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        l -> rs.groupBy(_.getString(1)).map { case (s, xs) => s -> xs.length.toLong } }
    assert(perLang.values.forall(_.size <=
      graft.functions.FreqSketch.DefaultMaxMapSize * 3 / 4),
      "fixture group outgrew the sketch's exact regime — the pin no longer applies")
    val exact = perLang.map { case (l, counts) =>
      l -> counts.toSeq
        .sortWith { case ((ia, na), (ib, nb)) => if (na != nb) na > nb else ia < ib }
        .take(3).map { case (i, n) => s"$i:$n" }.mkString(",") }
    assert(streamed == exact, s"streamed $streamed != exact top-3 $exact")
    val batch = DocumentStreams.approxTopKByLang(docsAll).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(batch == exact, s"one-shot batch $batch != exact top-3 $exact")
  }

  test("streaming grouped overlap: sketch pairs merge across triggers ≡ batch ≡ exact set algebra") {
    // the SHOW OVERLAP … BY twin: one stream carries both memberships
    // (side A = doc_id % 3 ≠ 0, side B = doc_id % 2 ≠ 0 — the AQL
    // fixture's subsets), state = one theta PAIR per lang. doc_id < 3000
    // keeps every sketch in the exact regime, so the merged-across-
    // triggers stats are DETERMINISTIC and equal the exact per-group
    // set algebra — and the one-shot batch run — whatever the trigger
    // boundaries. (The two-trigger split is doc_id parity, so side B
    // arrives ENTIRELY in one trigger — the asymmetric-arrival case.)
    val docsAll = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 3000)
    def overlap(df: org.apache.spark.sql.DataFrame) =
      DocumentStreams.overlapByGroup(df.filter(col("doc_id") < 3000),
        col("doc_id") % 3 =!= 0, col("doc_id") % 2 =!= 0,
        col("doc_id"), col("lang"))
    val q = overlap(twoTriggerDocStream())
      .writeStream.outputMode("complete")
      .format("memory").queryName("ovg_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected the corpus to arrive across >= 2 triggers")
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val streamed = asMap(spark.table("ovg_out").collect())
    // exact per-group set algebra, driver-side over the bounded fixture
    val exact = docsAll.select(col("lang"), col("doc_id")).collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        val ids = rs.map(_.getLong(1)).toSet
        val a = ids.filter(_ % 3 != 0); val b = ids.filter(_ % 2 != 0)
        val inter = (a & b).size.toLong; val uni = (a | b).size.toLong
        l -> ((inter, uni, (a -- b).size.toLong, (b -- a).size.toLong,
          if (uni > 0) inter.toDouble / uni else 0.0))
      }
    assert(streamed == exact, s"streamed $streamed != exact $exact")
    val batch = asMap(overlap(docsAll).collect())
    assert(batch == exact, s"one-shot batch $batch != exact $exact")
  }

  test("streaming centroid assignment agrees with the batch Lloyd assignment") {
    val seeds = Tables.load(spark, dir, "embeddings")
      .orderBy(col("vec_id")).limit(8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = EmbeddingStreams.assignToCentroids(
        EmbeddingStreams.readEmbeddings(spark, dir), seeds.toSeq)
      .writeStream.outputMode("append")
      .format("memory").queryName("km_stream").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("km_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.SparkEntry.queries("km_lloyd_assign")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming contamination hits reproduce the batch decontamination counts") {
    val docsAll = Tables.load(spark, dir, "documents")
    val bench = graft.operators.TextDedup.grams4(
        docsAll.filter(col("source") === "src0"))
      .select(col("g")).distinct()
    val stream = DocumentStreams.readDocuments(spark, dir)
      .filter(col("source") =!= "src0")
    val q = DocumentStreams.contaminationHits(stream, bench)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_hits").start()
    try q.processAllAvailable() finally q.stop()

    // append-mode hit events, deduplicated per (doc, gram) downstream —
    // must equal the oracle-verified batch n_contaminated per doc
    val streamed = spark.table("decon_hits")
      .select(col("doc_id"), col("g")).distinct()
      .groupBy(col("doc_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.SparkEntry.queries("t_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        .filter(_._2 > 0)
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("first-seen streaming dedup keeps exactly one doc per content hash") {
    val q = DocumentStreams.firstSeen(DocumentStreams.readDocuments(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("firstseen_out").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("firstseen_out").collect()
    val batchHashes = graft.Tables.load(spark, dir, "documents")
      .select(md5(col("text"))).distinct().collect().map(_.getString(0)).toSet
    // one emitted row per distinct hash, and the emitted ids are real docs
    assert(out.map(_.getString(1)).toSet == batchHashes)
    assert(out.length == batchHashes.size)
  }

  test("streaming PII scrub emits exactly the batch operator's redactions") {
    val q = DocumentStreams.piiScrubbed(DocumentStreams.readDocuments(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("pii_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("pii_out")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val batch = graft.operators.TextDedup
      .piiScrub(graft.Tables.load(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming quality scoring at ingest equals the batch operator") {
    val q = DocumentStreams.qualityAtIngest(DocumentStreams.readDocuments(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("quality_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("quality_out").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(3))).toMap
    val batch = graft.operators.TextDedup
      .qualitySignals(graft.Tables.load(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(3))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming context-window chunking at ingest equals the batch operator") {
    val q = DocumentStreams.chunkAtIngest(DocumentStreams.readDocuments(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("chunk_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    val batch = graft.operators.TextDedup
      .chunkWindows(graft.Tables.load(spark, dir, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming ingest lands micro-batches as indexed, time-travelable COW commits") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-cat")
    val cat = new graft.catalog.Catalog(spark, root.toString)
    cat.create("sdocs", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "text" -> graft.aql.AlbaType.of("TEXT")))
    cat.createIndex("sdocs", "nd", "lsh", "text")
    cat.createIndex("sdocs", "ft", "text", "text")

    // two parquet files in one source dir + maxFilesPerTrigger=1 → the
    // stream arrives as two micro-batches → two insert-only commits
    val src = java.nio.file.Files.createTempDirectory("graft-ingest-src")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 40)
    docs.filter(col("doc_id") < 20).coalesce(1)
      .write.mode("append").parquet(src.toString)
    docs.filter(col("doc_id") >= 20).coalesce(1)
      .write.mode("append").parquet(src.toString)

    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = DocumentStreams.ingestToCatalog(stream, cat, "sdocs")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()

    assert(cat.currentVersion("sdocs") == 2, "one commit per micro-batch")
    assert(cat.read("sdocs").count() == 40)
    assert(cat.readVersion("sdocs", 1).count() == 20, "batch 1 is its own version")
    // insert-only commits: every v1 data file carried into v2 as a link
    def parts(v: Int): Set[String] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(
          root.resolve("data").resolve(s"sdocs@v$v"))) { s =>
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
      }
    }
    assert(parts(1).subsetOf(parts(2)), "append must carry base files over")
    // the index updated inside each commit: querying doc 5's own text
    // must surface doc 5 as a candidate, with no rebuild
    val q5 = docs.filter(col("doc_id") === 5L)
      .select(lit(999L).as("doc_id"), col("text"))
    val cands = cat.indexLookup("sdocs", "nd", q5).collect().map(_.getLong(1))
    assert(cands.contains(5L), s"ingested doc must be indexed, got ${cands.toSeq}")

    // the text index updated inside the same commits: BM25 search over
    // the streamed corpus equals the full-scan baseline, and the per-file
    // stats sentinels sum to the streamed doc count
    val sent = cat.readIndex("sdocs", "ft")
      .filter(col("term") === graft.operators.FullText.StatsTerm)
    assert(sent.agg(sum("tf")).collect()(0).getLong(0) == 40L,
      "stats sentinels must cover every streamed doc")
    val terms = Seq("dup", "vector", "merge")
    val streamed = cat.read("sdocs").select(col("doc_id"), col("text"))
    val expected = graft.operators.FullText.bm25TopK(
        graft.operators.FullText.postingsOf(streamed)
          .filter(col("term").isin(terms: _*)),
        graft.operators.FullText.statsOf(streamed), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = cat.textSearch("sdocs", "ft", terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == expected,
      "index-served BM25 over streamed ingest must equal the full-scan baseline")
  }

  test("CDC-driven continuous MV maintenance over streamed ingest, exactly-once across restart") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-cdcmv-cat")
    val cat = new graft.catalog.Catalog(spark, root.toString)
    cat.create("cdocs", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "lang" -> graft.aql.AlbaType.of("TEXT")))
    cat.create("cmv", List("lang" -> graft.aql.AlbaType.of("TEXT"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT")))
    def view() = new graft.catalog.IncrementalView(cat, "cdocs", "cmv", Seq("lang"))
    def tail() = new graft.catalog.ChangeTail(cat, "cdocs", root.resolve("cmv.ckpt"))
    view().seed(tail())

    def mv(): Map[String, Long] = cat.read("cmv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def expect(): Map[String, Long] = cat.read("cdocs").groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def eventually(cond: => Boolean, hint: String): Unit =
      graft.TestWait.eventually(cond, hint)

    // the source stream: files arrive one per micro-batch, each landing
    // as its own COW commit, each commit a CDC window the resident
    // maintainer folds — MV updates ride the change feed, the source is
    // never re-aggregated
    val src = java.nio.file.Files.createTempDirectory("graft-cdcmv-src")
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("lang"))
    docs.filter(col("doc_id") < 20).coalesce(1).write.mode("append").parquet(src.toString)
    docs.filter(col("doc_id") >= 20 && col("doc_id") < 40).coalesce(1)
      .write.mode("append").parquet(src.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcmv-ckpt")
    def stream() = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("lang", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(src.toString)

    @volatile var stop = false
    val t1 = new Thread(() => view().maintain(tail(), 20L, () => stop))
    t1.start()
    val q1 = DocumentStreams.ingestToCatalog(stream(), cat, "cdocs")
      .option("checkpointLocation", ckpt.toString).start()
    try q1.processAllAvailable() finally q1.stop()
    assert(cat.currentVersion("cdocs") == 2, "one commit per micro-batch")
    eventually(mv() == expect(), s"maintainer must fold both commits: ${mv()} vs ${expect()}")
    stop = true; t1.join(30000)

    // restart BOTH halves: a third file arrives, the stream resumes from
    // its checkpoint, a fresh maintainer resumes from the tail checkpoint
    // — the counts stay exact (any replayed window would inflate them)
    docs.filter(col("doc_id") >= 40 && col("doc_id") < 60).coalesce(1)
      .write.mode("append").parquet(src.toString)
    stop = false
    val t2 = new Thread(() => view().maintain(tail(), 20L, () => stop))
    t2.start()
    val q2 = DocumentStreams.ingestToCatalog(stream(), cat, "cdocs")
      .option("checkpointLocation", ckpt.toString).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(cat.currentVersion("cdocs") == 3, "restart must not re-commit batches 1-2")
    eventually(mv() == expect(), s"restarted maintainer must fold exactly the missed window")
    assert(mv().values.sum == 60L, "exactly-once: 60 streamed docs, 60 counted")
    stop = true; t2.join(30000)
  }

  test("streaming upsert ingest merges per key; replay converges to the same state") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-upsert-cat")
    val cat = new graft.catalog.Catalog(spark, root.toString)
    cat.create("ud", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "rev" -> graft.aql.AlbaType.of("BIGINT"),
      "text" -> graft.aql.AlbaType.of("TEXT")))
    import spark.implicits._
    cat.overwrite("ud", Seq((1L, 0L, "seed1"), (2L, 0L, "seed2"))
      .toDF("doc_id", "rev", "text")) // v1

    // two micro-batches: batch 1 updates key 1 + inserts 10 (with an
    // intra-batch duplicate on key 10 — rev 2 must win); batch 2 updates
    // key 10 again and inserts 11
    val src = java.nio.file.Files.createTempDirectory("graft-upsert-src")
    Seq((1L, 1L, "one-v1"), (10L, 1L, "ten-v1"), (10L, 2L, "ten-v2"))
      .toDF("doc_id", "rev", "text").coalesce(1)
      .write.mode("append").parquet(src.toString)
    Seq((10L, 3L, "ten-v3"), (11L, 1L, "eleven"))
      .toDF("doc_id", "rev", "text").coalesce(1)
      .write.mode("append").parquet(src.toString)

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("rev", LongType), StructField("text", StringType)))
    def run(ckpt: java.nio.file.Path): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
      val q = DocumentStreams.upsertIngestToCatalog(stream, cat, "ud", Some("rev"))
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    run(java.nio.file.Files.createTempDirectory("graft-upsert-ckpt"))

    def state() = cat.read("ud").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val expected = Map(
      1L -> (1L, "one-v1"), 2L -> (0L, "seed2"),
      10L -> (3L, "ten-v3"), 11L -> (1L, "eleven"))
    assert(state() == expected, "per-key last-rev-wins merge state")
    val vAfter = cat.currentVersion("ud")
    assert(vAfter == 3, "one MERGE commit per micro-batch on top of the seed")

    // at-least-once REPLAY: a fresh checkpoint re-delivers every batch;
    // the upsert converges to the same state (same keys, same values)
    run(java.nio.file.Files.createTempDirectory("graft-upsert-ckpt2"))
    assert(state() == expected, "replayed upserts must converge")
  }

  test("streaming image decode equals the batch decode; corrupt payloads quarantined mid-stream") {
    import graft.operators.Multimodal
    // stage the synthesized real-image corpus plus corrupt rows as TWO
    // parquet files so the corrupt batch arrives as its own micro-batch
    val good = Multimodal.imageCorpus(spark, dir)
    val corrupt = Seq(
      Multimodal.MediaRecord(900001, "image/png",
        Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
          Array.fill[Byte](40)(0x11)),
      Multimodal.MediaRecord(900002, "text/plain", "not media".getBytes))
    val src = java.nio.file.Files.createTempDirectory("graft-media-stream")
    src.toFile.deleteOnExit()
    good.repartition(1).write.mode("overwrite").parquet(src.resolve("b1").toString)
    import spark.implicits._
    corrupt.toDS().repartition(1).write.mode("overwrite").parquet(src.resolve("b2").toString)
    def stage(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val part = scala.util.Using.resource(
        java.nio.file.Files.list(src.resolve(tag)))(_.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get)
      java.nio.file.Files.move(part, src.resolve(s"$tag.parquet"))
    }
    stage("b1"); stage("b2")

    val stream = spark.readStream.schema(good.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString + "/*.parquet")
      .as[Multimodal.MediaRecord]
    val q = DocumentStreams.decodeAtIngest(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("decode_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("decode_out").collect()
      .map(r => r.getLong(0) -> r.toString).toMap
    val batch = Multimodal.decodeImages(
        good.unionByName(corrupt.toDS()))
      .collect().map(d => d.media_id -> d).toMap
    assert(streamed.size == batch.size && streamed.nonEmpty)
    // every decoded row equals its batch twin, including real raster facts
    batch.foreach { case (id, d) =>
      assert(streamed(id).contains(d.status), s"status mismatch for $id")
    }
    val quarantined = spark.table("decode_out")
      .filter(col("status") === "undecodable").collect().map(_.getLong(0)).toSet
    assert(quarantined == Set(900001L), "corrupt image must be quarantined")
    val unsupported = spark.table("decode_out")
      .filter(col("status") === "unsupported").collect().map(_.getLong(0)).toSet
    assert(unsupported == Set(900002L))
    // good rows decoded despite sharing the stream with corrupt ones
    assert(spark.table("decode_out").filter(col("status") === "ok").count() ==
      good.count())
  }

  test("streaming audio decode equals the batch decode (stateless RIFF parse at ingest)") {
    import graft.operators.Multimodal
    import spark.implicits._
    val good = Multimodal.audioCorpus(spark, dir)
    val src = java.nio.file.Files.createTempDirectory("graft-audio-stream")
    src.toFile.deleteOnExit()
    good.repartition(2).write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(good.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
      .as[Multimodal.MediaRecord]
    val q = DocumentStreams.decodeAudioAtIngest(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("audio_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("audio_out").collect()
      .map(r => (r.getLong(0),
        (Option(r.get(2)), Option(r.get(5)), r.getString(6)))).toMap
    val batch = Multimodal.decodeAudio(good).collect()
      .map(d => (d.media_id,
        (d.sample_rate.map(x => x: Any), d.mean_abs.map(x => x: Any), d.status))).toMap
    assert(streamed.size == batch.size && streamed.nonEmpty)
    batch.foreach { case (id, v) => assert(streamed(id) == v, s"mismatch for $id") }
  }

  test("stateful sessionization matches the batch twin (e_session_stats)") {
    import spark.implicits._
    val evs = EventStreams.readEvents(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[EventStreams.Ev]
    val q = EventStreams.sessionize(evs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try q.processAllAvailable() finally q.stop()

    // the stream emits closed sessions plus the trailing open session per
    // user; the final state per (user, session) is the row with max count
    val streamed = spark.table("sess_out")
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = graft.SparkEntry.queries("e_session_stats")(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == batch)
  }

  test("watermarked event dedup drops redelivered event_ids exactly once") {
    // simulate an at-least-once source: every event delivered twice,
    // replayed copies arriving in a SECOND file (same event time, so
    // within any horizon) — the streamed output must equal the batch
    // distinct-by-event_id of the original fixture
    val evs = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val src = java.nio.file.Files.createTempDirectory("graft-dedup-src")
    def addFile(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory(s"graft-dedup-$tag")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, src.resolve(s"$tag.parquet"))
    }
    addFile(evs, "delivery-1")
    val stream = spark.readStream.schema(evs.schema).parquet(src.toString)
    val q = EventStreams.dedupEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      addFile(evs, "delivery-2") // full replay of every event
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("dedup_out")
      .select(col("event_id")).collect().map(_.getLong(0))
    val batch = evs.select(col("event_id")).distinct()
      .collect().map(_.getLong(0))
    assert(streamed.length == streamed.distinct.length, "an event_id was emitted twice")
    assert(streamed.toSet == batch.toSet, "dedup lost or invented events")
  }

  test("streaming minhash-band candidates equal the batch LSH collision set, " +
    "independent of arrival order (retroactive keeper demotion)") {
    import spark.implicits._
    // batch truth: docs that band-collide with a SMALLER doc id — exactly
    // the id_b side of the oracle-verified candidate pairs
    val batch = graft.SparkEntry.queries("dd_minhash_lsh")(spark, dir)
      .select(col("id_b")).distinct()
      .collect().map(_.getLong(0)).toSet

    // feed the UPPER half of doc ids first, then the lower half: bucket
    // keepers seen in batch 1 are demoted when smaller ids arrive in
    // batch 2, so the cross-batch state path is genuinely exercised
    val all = graft.Tables.load(spark, dir, "documents")
    val median = all.selectExpr("percentile_approx(doc_id, 0.5)").collect().head.get(0)
      .toString.toDouble.toLong
    val src = java.nio.file.Files.createTempDirectory("graft-mhb-src")
    def addHalf(half: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory(s"graft-mhb-$tag")
      half.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, src.resolve(s"$tag.parquet"))
    }
    addHalf(all.filter(col("doc_id") > median), "half-upper")
    val stream = spark.readStream.schema(all.schema).parquet(src.toString)
    val q = DocumentStreams.minhashBandCandidates(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("mhb_out").start()
    try {
      q.processAllAvailable()
      addHalf(all.filter(col("doc_id") <= median), "half-lower")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("mhb_out")
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} candidates, batch ${batch.size}")
  }

  test("event-time-timeout sessionization emits each session exactly once " +
    "(closed by successor or flushed by watermark)") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
    // two deliveries split at the median timestamp so the watermark
    // genuinely advances between batches and fires timeouts
    val splitUs = evs.selectExpr("percentile_approx(unix_micros(ts), 0.5)")
      .collect().head.getLong(0)
    val src = java.nio.file.Files.createTempDirectory("graft-sf-src")
    def addFile(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory(s"graft-sf-$tag")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, src.resolve(s"$tag.parquet"))
    }
    addFile(evs.filter(unix_micros(col("ts")) <= splitUs), "t1")
    // no caller-side withWatermark: sessionizeFinal applies its own
    val stream = spark.readStream.schema(evs.schema).parquet(src.toString)
      .as[EventStreams.EvT]
    val q = EventStreams.sessionizeFinal(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sf_out").start()
    try {
      q.processAllAvailable()
      addFile(evs.filter(unix_micros(col("ts")) > splitUs), "t2")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sf_out")
      .select(col("user_id"), col("session_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly-once: no session row may repeat
    assert(streamed.length == streamed.distinct.length, "a session was emitted twice")

    // expected: every batch session EXCEPT each user's last one, unless
    // the final watermark (global max ts, delay 0) passed its gap — those
    // flushed via timeout; later sessions are closed by their successor
    val maxUs = evs.selectExpr("max(unix_micros(ts))").collect().head.getLong(0)
    val sess = graft.SparkEntry.queries("e_session_stats")(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_micros(col("session_end")).as("end_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lastPerUser = sess.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = sess.collect {
      case (u, sid, n, end) if sid < lastPerUser(u) ||
        (end + EventStreams.GapUs) / 1000L < maxUs / 1000L => (u, sid, n)
    }
    assert(streamed.toSet == expected.toSet,
      s"streamed ${streamed.length} sessions, expected ${expected.length}")
  }

  test("sessionize recovers from its checkpoint: stop mid-stream, restart, no lost/duplicated sessions") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))

    // batch truth over the whole fixture (the e_session_stats oracle shape)
    val sessStats = graft.SparkEntry.queries("e_session_stats")(spark, dir)
    val batch = sessStats
      .select(col("user_id"), col("session_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // split the stream INSIDE the longest session, so the open session at
    // the stop point must be recovered from the checkpoint and extended —
    // a restart that lost state would split it (extra session, wrong ids)
    val longest = sessStats.orderBy(col("n_events").desc, col("user_id")).limit(1)
      .select(unix_micros(col("session_start")), unix_micros(col("session_end")))
      .collect().head
    val splitUs = (longest.getLong(0) + longest.getLong(1)) / 2

    val src = java.nio.file.Files.createTempDirectory("graft-ckpt-src")
    val out = java.nio.file.Files.createTempDirectory("graft-ckpt-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-chk")
    // stage each half as ONE flat file in the source dir (FileStreamSource
    // lists plain files; a later-arriving file is a new micro-batch)
    def addHalf(half: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory(s"graft-ckpt-stage-$tag")
      half.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, src.resolve(s"$tag.parquet"))
    }
    def startQuery() = {
      val stream = spark.readStream.schema(evs.schema).parquet(src.toString)
        .as[EventStreams.Ev]
      EventStreams.sessionize(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .format("parquet").option("path", out.toString)
        .start()
    }
    def maxPerSession() = spark.read.parquet(out.toString)
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    addHalf(evs.filter(col("ts_us") <= splitUs), "half-a")
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop() // stop mid-stream
    val phase1 = maxPerSession()

    addHalf(evs.filter(col("ts_us") > splitUs), "half-b")
    val q2 = startQuery() // fresh query object, same checkpoint dir
    try q2.processAllAvailable() finally q2.stop()
    val streamed = maxPerSession()

    // final result identical to the batch twin: nothing lost, nothing
    // duplicated, session numbering continued across the restart
    assert(streamed == batch)
    // and phase 2 genuinely EXTENDED recovered state: some session that
    // was open at the stop point grew without changing identity
    assert(phase1.exists { case (u, sid, n) =>
      streamed.exists { case (u2, sid2, n2) => u2 == u && sid2 == sid && n2 > n }
    }, s"no session bridged the restart (split=$splitUs)")
  }

  test("decontamination ingest gate: micro-batches drop eval-overlapping docs; replay appends nothing") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-decont-ingest")
    val cat = new graft.catalog.Catalog(spark, root.toString)
    cat.create("dgated", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "text" -> graft.aql.AlbaType.of("TEXT")))
    cat.create("deval", List("eid" -> graft.aql.AlbaType.of("BIGINT"),
      "text" -> graft.aql.AlbaType.of("TEXT")))
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    import spark.implicits._
    cat.overwrite("deval", Seq((1L, evalText)).toDF("eid", "text"))

    val src = java.nio.file.Files.createTempDirectory("graft-decont-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-decont-ckpt")
    def drain(checkpoint: java.nio.file.Path = ckpt): Unit = {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
        .parquet(src.toString)
      val q = DocumentStreams.decontIngestToCatalog(stream, cat, "dgated",
          "deval", "text")
        .option("checkpointLocation", checkpoint.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: a verbatim eval copy (1.0, dropped), an eval prefix plus
    // tail (5 of 8 grams = 0.625 ≥ 0.5, dropped), an unrelated doc
    // (kept), and a too-short doc (unmeasured, kept)
    Seq((1L, evalText), (2L, s"$evalText and three more"),
      (3L, "completely different content about query engines and parquet files"),
      (4L, "too short")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src.toString)
    drain()
    assert(cat.read("dgated").collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    val v1 = cat.currentVersion("dgated")
    // batch 2: another clean doc lands; a late eval copy still drops —
    // the gate re-reads the eval container's CURRENT version per batch
    Seq((5L, "fresh unrelated material describing minhash bands and buckets"),
      (6L, evalText)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src.toString)
    drain()
    assert(cat.read("dgated").collect().map(_.getLong(0)).toSet
      == Set(3L, 4L, 5L))
    assert(cat.currentVersion("dgated") == v1 + 1)
    // at-least-once replay: a fresh checkpoint redelivers EVERYTHING;
    // the pk-range anti-join drops the committed survivors and the
    // contamination gate the rest — nothing appends, no version burns
    val vBefore = cat.currentVersion("dgated")
    drain(java.nio.file.Files.createTempDirectory("graft-decont-ckpt2"))
    assert(cat.read("dgated").count() == 3 &&
      cat.currentVersion("dgated") == vBefore,
      "full replay must append nothing")
  }

  test("dedup ingest gate: each micro-batch drops exact + verified near-dups of the committed corpus") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-ingest")
    val cat = new graft.catalog.Catalog(spark, root.toString)
    cat.create("gated", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "text" -> graft.aql.AlbaType.of("TEXT")))
    cat.createIndex("gated", "nd", "lsh", "text")

    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val nearCopy = base.replace("today", "tonight") // high 3-gram overlap
    val distinctDoc = "completely different content about distributed query engines and parquet files"
    val anotherDoc = "yet another unrelated document describing minhash signatures and band buckets"

    // two deliveries, drained one at a time (the spec's deterministic
    // multi-batch idiom — file mtime ordering is not relied on):
    // delivery 1 = {base, base-exact-copy, distinct}  (within-batch exact dup)
    // delivery 2 = {near-copy of base (HISTORY near-dup), another distinct,
    //               intra-batch near-pair (40/41)}
    val src = java.nio.file.Files.createTempDirectory("graft-dedup-ingest-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ingest-ckpt")
    import spark.implicits._
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
        .parquet(src.toString)
      val q = DocumentStreams.dedupIngestToCatalog(stream, cat, "gated", "nd")
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    Seq((10L, base), (11L, base), (12L, distinctDoc)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src.toString)
    drain()
    val pairA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val pairB = pairA.replace("xi", "omicron")
    Seq((20L, nearCopy), (21L, anotherDoc), (40L, pairA), (41L, pairB))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src.toString)
    drain()

    val landed = cat.read("gated").collect().map(_.getLong(0)).toSet
    // 11 = exact dup within batch 1; 20 = near-dup of committed 10;
    // 41 = within-batch near-dup of 40 (lower pk kept)
    assert(landed == Set(10L, 12L, 21L, 40L),
      s"got $landed")
    // the gate dedups against HISTORY via the index maintained inside
    // each commit — two versions landed (one per micro-batch)
    assert(cat.currentVersion("gated") == 2)

    // the gate is index-kind-agnostic: a simhash-indexed container
    // dedups the token-level edit class through the same dispatch
    val cat2root = java.nio.file.Files.createTempDirectory("graft-dedup-sh")
    val cat2 = new graft.catalog.Catalog(spark, cat2root.toString)
    cat2.create("gated2", List("doc_id" -> graft.aql.AlbaType.of("BIGINT"),
      "text" -> graft.aql.AlbaType.of("TEXT")))
    cat2.createIndex("gated2", "sh", "simhash", "text")
    cat2.append("gated2", Seq((1L, base)).toDF("doc_id", "text"))
    DocumentStreams.dedupBatch(
      Seq((2L, nearCopy), (3L, distinctDoc)).toDF("doc_id", "text"),
      cat2, "gated2", "sh", threshold = 0.5)
    assert(cat2.read("gated2").collect().map(_.getLong(0)).toSet == Set(1L, 3L),
      "simhash-indexed gate must drop the near copy and keep the distinct doc")
    // WITHIN-batch coverage uses the index's banding too: a token-edit
    // pair arriving in one batch dedups the same as across batches
    val longA = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    DocumentStreams.dedupBatch(
      Seq((6L, longA), (7L, longA.replace("fourteen", "fifteen")))
        .toDF("doc_id", "text"),
      cat2, "gated2", "sh", threshold = 0.5)
    assert(cat2.read("gated2").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 6L),
      "within-batch simhash pair must keep only the lower pk")

    // REPLAY idempotence: a fresh checkpoint re-delivers everything; the
    // pk guard drops the already-committed rows, nothing double-appends
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-dedup-ingest-ckpt2")
    val stream2 = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(src.toString)
    val q2 = DocumentStreams.dedupIngestToCatalog(stream2, cat, "gated", "nd")
      .option("checkpointLocation", ckpt2.toString).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(cat.read("gated").count() == 4,
      "replayed rows must not re-append (pk guard)")
  }

  test("ANN ingest gate: micro-batches drop cosine near-dups via the ivf index; " +
      "replay and batching converge to the batch gate's set") {
    import org.apache.spark.sql.types._
    import graft.functions.Float32Unpack.pack
    def axis(a: Int): Array[Byte] =
      pack((0 until 8).map(i => if (i == a) 1f else 0f))
    def vec(vs: Float*): Array[Byte] = pack(vs.toIndexedSeq)
    def mkCat(tag: String): graft.catalog.Catalog = {
      val root = java.nio.file.Files.createTempDirectory(s"graft-ann-ingest-$tag")
      val cat = new graft.catalog.Catalog(spark, root.toString)
      cat.create("vgated", List("vec_id" -> graft.aql.AlbaType.of("BIGINT"),
        "emb" -> graft.aql.AlbaType.of("MEDIUM-BYTES")))
      // base corpus: the 8 axis unit vectors — ivf create seeds its 8
      // centroids from exactly these, so cells ARE the axes
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      (1L to 8L).foreach(i => rows.add(
        org.apache.spark.sql.Row(i, axis((i - 1).toInt % 8))))
      cat.append("vgated", spark.createDataFrame(rows, StructType(Seq(
        StructField("vec_id", LongType), StructField("emb", BinaryType)))))
      cat.createIndex("vgated", "ann", "ivf", "emb")
      cat
    }
    val cat = mkCat("s")
    // delivery 1: 10 = byte-exact twin of committed axis-0 (HISTORY dup,
    // cosine 1.0); 11 = genuinely new diagonal (cosine 0.707 to its
    // cell's members — kept); 20/21 byte-identical within the batch
    // (exact dedup keeps 20); 30/31 a same-cell cosine ≈ 0.99999
    // near-pair in the 4/5-plane, absent from the corpus (within-batch
    // verified, lower pk 30 kept; each is only cosine 0.8 to axis 4)
    val d1 = Seq(
      10L -> axis(0),
      11L -> vec(0.7071f, 0.7071f, 0, 0, 0, 0, 0, 0),
      20L -> vec(0, 0.6f, 0.8f, 0, 0, 0, 0, 0),
      21L -> vec(0, 0.6f, 0.8f, 0, 0, 0, 0, 0),
      30L -> vec(0, 0, 0, 0, 0.8f, 0.6f, 0, 0),
      31L -> vec(0, 0, 0, 0, 0.79f, 0.61f, 0, 0))
    // delivery 2: 12 = another byte-exact axis-0 twin (history dup via
    // the index the FIRST batch's commit maintained… here vs the base
    // corpus); 40 = a new 6/7-plane mix (cosine 0.8 to axis 7 — kept)
    val d2 = Seq(
      12L -> axis(0),
      40L -> vec(0, 0, 0, 0, 0, 0, 0.6f, 0.8f))
    val src = java.nio.file.Files.createTempDirectory("graft-ann-ingest-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-ingest-ckpt")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("emb", BinaryType)))
    def write(rows: Seq[(Long, Array[Byte])]): Unit = {
      val l = new java.util.ArrayList[org.apache.spark.sql.Row]()
      rows.foreach { case (id, e) => l.add(org.apache.spark.sql.Row(id, e)) }
      spark.createDataFrame(l, schema).coalesce(1)
        .write.mode("append").parquet(src.toString)
    }
    def drain(ck: java.nio.file.Path): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src.toString)
      val q = EmbeddingStreams.annIngestToCatalog(stream, cat, "vgated", "ann")
        .option("checkpointLocation", ck.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    write(d1); drain(ckpt)
    write(d2); drain(ckpt)
    val landed = cat.read("vgated").collect().map(_.getLong(0)).toSet
    assert(landed == (1L to 8L).toSet ++ Set(11L, 20L, 30L, 40L),
      s"got $landed")
    // replay from a fresh checkpoint: the pk guard drops every
    // already-committed row — nothing double-appends
    drain(java.nio.file.Files.createTempDirectory("graft-ann-ingest-ckpt2"))
    assert(cat.read("vgated").count() == 12, "replay must not re-append")
    // batching-invariance: ALL stream rows as ONE batch against a twin
    // catalog converge to the same near-dup set (10/12 collapse to one
    // byte-exact survivor first, which the history gate then drops)
    val catB = mkCat("b")
    val all = new java.util.ArrayList[org.apache.spark.sql.Row]()
    (d1 ++ d2).foreach { case (id, e) => all.add(org.apache.spark.sql.Row(id, e)) }
    EmbeddingStreams.annDedupBatch(spark.createDataFrame(all, schema),
      catB, "vgated", "ann", threshold = 0.99)
    assert(catB.read("vgated").collect().map(_.getLong(0)).toSet == landed,
      "one-batch gate must equal the streamed gate's set")

    // INT8 index (round 14): the gate's verify is EXACT cosine — on an
    // int8 index every candidate's true vector comes from the snapshot
    // (the quantized lists can't serve a near-threshold decision), so
    // the SAME deliveries against an int8-indexed twin land the SAME set
    val root8 = java.nio.file.Files.createTempDirectory("graft-ann-ingest-i8")
    val cat8 = new graft.catalog.Catalog(spark, root8.toString)
    cat8.create("vgated", List("vec_id" -> graft.aql.AlbaType.of("BIGINT"),
      "emb" -> graft.aql.AlbaType.of("MEDIUM-BYTES")))
    val baseRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    (1L to 8L).foreach(i => baseRows.add(
      org.apache.spark.sql.Row(i, axis((i - 1).toInt % 8))))
    cat8.append("vgated", spark.createDataFrame(baseRows, schema))
    cat8.createIndex("vgated", "ann", "ivf", "emb", int8 = true)
    EmbeddingStreams.annDedupBatch(spark.createDataFrame(all, schema),
      cat8, "vgated", "ann", threshold = 0.99)
    assert(cat8.read("vgated").collect().map(_.getLong(0)).toSet == landed,
      "the int8-indexed gate must land the same survivor set")
  }

  test("streaming k-NN enrichment equals the batch SIMILAR AGAINST " +
      "statement; results land as queryable commits (round 16)") {
    import org.apache.spark.sql.types._
    def vec(fs: Float*): Array[Byte] =
      graft.functions.Float32Unpack.pack(fs.toIndexedSeq)
    def oneHot(a: Int): Array[Byte] =
      graft.functions.Float32Unpack.pack((0 until 4).map(i => if (i == a) 1f else 0f))
    val root = java.nio.file.Files.createTempDirectory("graft-knn-enrich")
    val cat = new graft.catalog.Catalog(spark, root.toString)
    // reference corpus: 8 rows, two per axis — seeds (4 lowest pks) are
    // one per axis, so cells are exactly the axes
    cat.create("vref", List("vid" -> graft.aql.AlbaType.of("BIGINT"),
      "emb" -> graft.aql.AlbaType.of("MEDIUM-BYTES")))
    val schema = StructType(Seq(StructField("vid", LongType),
      StructField("emb", BinaryType)))
    val refRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    (0L until 8L).foreach(i => refRows.add(
      org.apache.spark.sql.Row(i, oneHot((i % 4).toInt))))
    cat.append("vref", spark.createDataFrame(refRows, schema))
    cat.createIndex("vref", "ann", "ivf", "emb", k = Some(4))
    // enrichment sink: a versioned container the stream appends into
    cat.create("enr", List("vid" -> graft.aql.AlbaType.of("BIGINT"),
      "match_id" -> graft.aql.AlbaType.of("BIGINT"),
      "score" -> graft.aql.AlbaType.of("FLOAT"),
      "rank" -> graft.aql.AlbaType.of("INT")))
    // two query files → two micro-batches (axis probes + one mixed
    // vector + one undecodable payload that must enrich to nothing)
    val src = java.nio.file.Files.createTempDirectory("graft-knn-src")
    def write(rows: Seq[(Long, Array[Byte])]): Unit = {
      val l = new java.util.ArrayList[org.apache.spark.sql.Row]()
      rows.foreach { case (id, e) => l.add(org.apache.spark.sql.Row(id, e)) }
      spark.createDataFrame(l, schema).coalesce(1)
        .write.mode("append").parquet(src.toString)
    }
    val q1 = Seq(100L -> oneHot(0), 101L -> oneHot(3))
    val q2 = Seq(102L -> vec(0.6f, 0.8f, 0f, 0f),
      103L -> Array[Byte](1, 2, 3)) // 3 bytes: undecodable
    write(q1); write(q2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-knn-ckpt")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val sq = EmbeddingStreams.knnEnrichToCatalog(stream, cat, "vref",
        "ann", sink = "enr", k = 3, nprobe = 4)
      .option("checkpointLocation", ckpt.toString).start()
    try sq.processAllAvailable() finally sq.stop()

    val got = cat.read("enr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    // the undecodable payload enriched to nothing
    assert(!got.exists(_._1 == 103L), got.toString)
    // axis probes: both same-axis reference rows at cosine 1, rank 1-2
    assert(got.filter(r => r._1 == 100L && r._4 <= 2).map(_._2)
      == Set(0L, 4L), got.toString)
    assert(got.filter(_._1 == 100L).forall(r => r._4 > 2 || r._3 == 1.0))
    // two micro-batches → two sink commits, each time-travelable
    assert(cat.currentVersion("enr") == 2)
    assert(cat.readVersion("enr", 1).select("vid").collect()
      .map(_.getLong(0)).toSet == Set(100L, 101L))

    // duplicate-pk replay WITHIN one batch (r16 code review): one
    // enrichment per pk with k DISTINCT matches — a duplicated probe
    // must not double the scored rows and burn top-k slots
    val dup = new java.util.ArrayList[org.apache.spark.sql.Row]()
    dup.add(org.apache.spark.sql.Row(200L, oneHot(1)))
    dup.add(org.apache.spark.sql.Row(200L, oneHot(1)))
    val dupEnr = EmbeddingStreams.knnEnrichBatch(
      spark.createDataFrame(dup, schema), cat, "vref", "ann", k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(dupEnr.length == 3 && dupEnr.map(_._2).distinct.length == 3,
      dupEnr.toSeq.toString)
    assert(dupEnr.map(_._3).sorted.toSeq == Seq(1, 2, 3))

    // agreement with the BATCH statement: the same queries committed as
    // a container and served by SIMILAR AGAINST produce the same rows
    val eng = new graft.aql.Engine(spark, root.toString)
    eng.execute("CREATE CONTAINER vq ['vid','emb'] [BIGINT, MEDIUM-BYTES]")
    val allQ = new java.util.ArrayList[org.apache.spark.sql.Row]()
    (q1 ++ q2).foreach { case (id, e) => allQ.add(org.apache.spark.sql.Row(id, e)) }
    eng.catalog.overwrite("vq", spark.createDataFrame(allQ, schema))
    val stmt = eng.execute(
      "SIMILAR vq AGAINST vref USING ann PROBE 4 LIMIT 3 SCORED")
      .asInstanceOf[graft.aql.Engine.ResultSet].df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(stmt == got,
      s"stream/batch disagree:\n stream $got\n batch $stmt")

    // cross-restart replay (round 17, r16 advisor): foreachBatch is
    // at-least-once — a fresh checkpoint redelivers EVERY file, the
    // worst replay a crash-before-offset-commit can produce. The
    // pk-guard must drop every already-enriched probe BEFORE the
    // pipeline runs, so the sink gains no rows and no versions (103's
    // undecodable payload re-enriches to nothing — side-effect free).
    val preRows = cat.read("enr").count()
    val preVer = cat.currentVersion("enr")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-knn-ckpt2")
    val sq2 = EmbeddingStreams.knnEnrichToCatalog(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src.toString),
        cat, "vref", "ann", sink = "enr", k = 3, nprobe = 4)
      .option("checkpointLocation", ckpt2.toString).start()
    try sq2.processAllAvailable() finally sq2.stop()
    assert(cat.read("enr").count() == preRows,
      "full replay must append no enrichment rows")
    assert(cat.currentVersion("enr") == preVer,
      "full replay must publish no sink version")

    // and the direct double-commit shape: committing the SAME batch
    // twice (crash after append, before offset commit) appends once
    val replayBatch = new java.util.ArrayList[org.apache.spark.sql.Row]()
    replayBatch.add(org.apache.spark.sql.Row(300L, oneHot(2)))
    EmbeddingStreams.knnEnrichCommitBatch(
      spark.createDataFrame(replayBatch, schema), cat, "vref", "ann",
      "enr", k = 3, nprobe = 4)
    val afterFirst = cat.read("enr").filter("vid = 300").count()
    assert(afterFirst == 3, s"expected 3 enrichment rows, got $afterFirst")
    EmbeddingStreams.knnEnrichCommitBatch(
      spark.createDataFrame(replayBatch, schema), cat, "vref", "ann",
      "enr", k = 3, nprobe = 4)
    assert(cat.read("enr").filter("vid = 300").count() == 3,
      "replayed commit must not duplicate (pk, match_id, rank) rows")
  }

  test("streaming BAND k-NN enrichment equals the batch SIMILAR AGAINST " +
      "USING lsh/simhash SCORED statement (round 17, r16 judge #4)") {
    val root = java.nio.file.Files.createTempDirectory("graft-band-enrich")
    val eng = new graft.aql.Engine(spark, root.toString)
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the " +
      "quiet river bank today with friends"
    val near = base.replace("lazy", "sleepy")
    val other = "pack my box with five dozen liquor jugs before noon " +
      "arrives carrying every spare part needed"
    // the reference corpus under BOTH band families
    eng.execute("CREATE CONTAINER tref ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("tref", Seq(
      (10L, base), (11L, near), (12L, other),
      (13L, other + " and more tail content to shift the signature"))
      .toDF("doc_id", "text"))
    eng.execute("CREATE INDEX nd ON tref ['text'] USING lsh")
    eng.execute("CREATE INDEX sh ON tref ['text'] USING simhash")
    // arriving documents: a verbatim copy, a near-dup, an unrelated doc
    val items = Seq(
      (100L, base), (101L, near + " now"),
      (102L, "completely unrelated text about catalyst query planning " +
        "and shuffle exchanges in a distributed engine"))
    val batch = items.toDF("doc_id", "text")
    // committed as a container, the SAME items serve the batch statement
    eng.execute("CREATE CONTAINER titems ['doc_id','text'] [BIGINT, TEXT]")
    eng.catalog.overwrite("titems", batch)
    for (ix <- Seq("nd", "sh")) {
      val streamed = EmbeddingStreams.knnEnrichBatch(
        batch, eng.catalog, "tref", ix, k = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val stmt = eng.execute(
        s"SIMILAR titems AGAINST tref USING $ix LIMIT 2 SCORED")
        .asInstanceOf[graft.aql.Engine.ResultSet].df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      assert(streamed == stmt,
        s"stream/batch disagree ($ix):\n stream $streamed\n batch $stmt")
      // sanity: the verbatim probe found its copy at score 1, rank 1
      assert(streamed.contains((100L, 10L, 1.0, 1)), streamed.toString)
    }
    // within-batch duplicate pks collapse to one probe (the replay
    // stance shared with the ivf path)
    val dup = (Seq((200L, base), (200L, base))).toDF("doc_id", "text")
    val dupEnr = EmbeddingStreams.knnEnrichBatch(
      dup, eng.catalog, "tref", "nd", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(dupEnr.length == 2 && dupEnr.map(_._2).distinct.length == 2,
      dupEnr.toSeq.toString)
    // PROBE refuses on a band reference, the statement's stance
    intercept[IllegalArgumentException] {
      EmbeddingStreams.knnEnrichBatch(
        batch, eng.catalog, "tref", "nd", k = 2, nprobe = 2)
    }
    // and the band enrichment drives the SINK with the same replay
    // guard: double-committing one batch appends once
    eng.execute("CREATE CONTAINER tenr ['doc_id','match_id','score','rank'] " +
      "[BIGINT, BIGINT, FLOAT, INT]")
    EmbeddingStreams.knnEnrichCommitBatch(batch, eng.catalog, "tref",
      "nd", "tenr", k = 2, nprobe = 1)
    val n1 = eng.catalog.read("tenr").count()
    assert(n1 > 0)
    EmbeddingStreams.knnEnrichCommitBatch(batch, eng.catalog, "tref",
      "nd", "tenr", k = 2, nprobe = 1)
    assert(eng.catalog.read("tenr").count() == n1,
      "band-enrichment replay must not duplicate sink rows")
  }
}
