package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Registry sanity at sf0.001 + semantic checks that the DuckDB oracle
  * can't express (LSH recall vs exact Jaccard, multimodal decode plumbing).
  * Full value-level correctness is enforced by Verify + the DuckDB compare.
  */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every registry query executes at sf0.001 and no name collides") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length, "duplicate query names")
    SparkEntry.registry.foreach { q =>
      val n = q.fn(spark, dir).count()
      assert(n >= 0, s"${q.name} failed")
    }
  }

  test("every oracle references only fixture tables") {
    val tables = graft.Tables.all.toSet
    SparkEntry.oracleSql.values.foreach { sql =>
      val lower = sql.toLowerCase
      assert(graft.Tables.all.exists(t => lower.contains(t)), s"no table in: $sql")
    }
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("minhash-LSH finds every exact-duplicate-bag pair (recall on bow dups)") {
    // ground truth: doc pairs whose 3-shingle Jaccard is very high must
    // collide in at least one of the 4 LSH bands with near-certainty
    val pairs = SparkEntry.queries("dd_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("dd_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    assert(exact.subsetOf(pairs), "high-jaccard pair missed by LSH")
  }

  test("IVF probe results are a subset of brute-force candidates' cells") {
    val ivf = SparkEntry.queries("sim_ann_ivf_probe")(spark, dir).collect()
    assert(ivf.nonEmpty)
    // rank must be dense 1..k per query
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
    }
  }

  test("multimodal decode pipeline: schema, determinism, batch plumbing") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaCorpus(spark, dir))
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(f => f.width >= 1 && f.width <= 1920))
    assert(rows.forall(f => f.height >= 1 && f.height <= 1080))
    assert(rows.forall(_.byte_len > 0))
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(Multimodal.mediaCorpus(spark, dir)).collect()
    assert(rows.map(_.sha_prefix).sorted.sameElements(again.map(_.sha_prefix).sorted))
  }

  test("real image decode: javax.imageio round-trips the synthesized corpus exactly") {
    val decoded = Multimodal.decodeImages(Multimodal.imageCorpus(spark, dir)).collect()
    assert(decoded.length == 500)
    assert(decoded.forall(_.status == "ok"), "every synthesized image must parse")
    decoded.foreach { d =>
      val id = d.media_id
      assert(d.modality == (if (id % 2 == 0) "image/png" else "image/jpeg"))
      // dims are exact for BOTH codecs (headers are lossless)
      assert(d.width.contains((8 + id % 24).toInt), s"width mismatch for $id")
      assert(d.height.contains((8 + (id * 7) % 24).toInt), s"height mismatch for $id")
      // pixel content exact for lossless PNG; within ±2 for JPEG's DCT trip
      if (id % 2 == 0) assert(d.mean_level.contains(id % 256))
      else assert(math.abs(d.mean_level.get - id % 256) <= 2,
        s"jpeg mean ${d.mean_level.get} too far from ${id % 256} for $id")
    }
  }

  test("corrupt image payloads route to the quarantine lane without failing the batch") {
    import spark.implicits._
    val good = Multimodal.imageCorpus(spark, dir).head(2)
    // image magic bytes with a garbage body, and a truncated real PNG
    val corruptMagic = Multimodal.MediaRecord(9001, "image/png",
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        Array.fill[Byte](32)(0x5a))
    val truncated = Multimodal.MediaRecord(9002, "image/png",
      good.head.payload.take(good.head.payload.length / 2))
    val notImage = Multimodal.MediaRecord(9003, "text/plain", "hello".getBytes)
    val out = Multimodal.decodeImages(
      (good.toSeq ++ Seq(corruptMagic, truncated, notImage)).toDS()).collect()
      .map(d => d.media_id -> d).toMap
    assert(out(9001).status == "undecodable" && out(9001).width.isEmpty)
    assert(out(9002).status == "undecodable")
    assert(out(9003).status == "unsupported")
    good.foreach(g => assert(out(g.media_id).status == "ok",
      "good rows must decode even when the batch carries corrupt ones"))
  }

  test("HLL sketch cardinality within 2% of exact (x_approx_distinct)") {
    val rows = SparkEntry.queries("x_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.02,
        s"approx $approx vs exact $exact")
    }
  }

  test("hyperplane-LSH probe: results come only from the query's bucket " +
    "and ranks are dense") {
    val rows = SparkEntry.queries("sim_ann_hyperplane_lsh")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("multimodal frame sampling + resize stages") {
    val corpus = Multimodal.mediaCorpus(spark, dir)
    val frames = Multimodal.sampleFrames(corpus, n = 4).collect()
    assert(frames.length == 500 * 4)
    frames.foreach(f => assert(f.frame_bytes.length <= 64 && f.frame_bytes.nonEmpty))
    val resized = Multimodal.resize(
      Multimodal.extractFeatures(corpus), maxW = 640, maxH = 480).collect()
    resized.foreach { f =>
      assert(f.width <= 640 && f.height <= 480 && f.width >= 1 && f.height >= 1)
    }
    // the oracle-verified mm_frame_plan offsets are the byte positions
    // sampleFrames actually slices at — tie the SQL twin to the Dataset path
    val planned = SparkEntry.queries("mm_frame_plan")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2).split(",").map(_.toLong).toSeq).toMap
    val sampledStarts = Multimodal.sampleFrames(corpus, n = 4).collect()
      .groupBy(_.media_id)
    val payloadLens = corpus.collect().map(r => r.media_id -> r.payload.length).toMap
    planned.foreach { case (id, offsets) =>
      val lens = sampledStarts(id).sortBy(_.frame_no)
        .map(_.frame_bytes.length)
      offsets.zipWithIndex.foreach { case (off, i) =>
        val expectLen = math.min(64L, payloadLens(id) - off)
        assert(lens(i) == expectLen,
          s"media $id frame $i: slice length ${lens(i)} != planned $expectLen")
      }
    }
  }

  test("benchQueries all exist in the registry") {
    val names = SparkEntry.queries.keySet
    SparkEntry.benchQueries.foreach(b => assert(names.contains(b)))
  }

  test("approx percentile honors the GK rank-error bound vs exact order stats") {
    val est = SparkEntry.queries("x_approx_percentile")(spark, dir).collect()
    val vals = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    est.foreach { r =>
      val flag = r.getString(0)
      val sortedVals = vals(flag)
      val n = sortedVals.length
      val tol = n / 1000.0 + 1
      Seq(0.25 -> 1, 0.5 -> 2, 0.75 -> 3, 0.95 -> 4).foreach { case (q, i) =>
        val v = r.getDouble(i)
        val rank = sortedVals.count(_ <= v)
        assert(math.abs(rank - q * n) <= tol,
          s"$flag p$q: rank $rank of est $v vs target ${q * n} ± $tol")
      }
    }
  }

  test("JSONL, CSV and ORC corpus round-trips preserve every row exactly") {
    val parquet = graft.Tables.load(spark, dir, "documents").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    Seq(
      "jsonl" -> graft.sources.CorpusFormats.readJsonl(spark, dir),
      "csv" -> graft.sources.CorpusFormats.readCsv(spark, dir),
      "orc" -> graft.sources.CorpusFormats.readOrc(spark, dir)
    ).foreach { case (fmt, df) =>
      val got = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSet
      assert(got == parquet, s"$fmt round-trip lost or corrupted rows")
    }
  }

  test("modality routing recognizes real magic bytes and falls back by printability") {
    import spark.implicits._
    def rec(id: Long, bytes: Array[Byte]) = Multimodal.MediaRecord(id, "x", bytes)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val jpg = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10).map(_.toByte)
    val wav = "RIFF----WAVEfmt ".getBytes("ISO-8859-1")
    val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypmp42".getBytes("ISO-8859-1")
    val txt = "plain old words".getBytes("UTF-8")
    val bin = Array[Byte](0x00, 0x01, 0x02, 0x7f.toByte, 0x80.toByte)
    val ds = Seq(rec(1, png), rec(2, jpg), rec(3, wav), rec(4, mp4),
      rec(5, txt), rec(6, bin)).toDS()
    val got = Multimodal.routeByMagic(ds).collect().toMap
    assert(got == Map(1L -> "image/png", 2L -> "image/jpeg", 3L -> "audio/wav",
      4L -> "video/mp4", 5L -> "text/plain", 6L -> "application/octet-stream"))
    // the fixture corpus is text payloads — everything routes to the text lane
    val fixture = Multimodal.routeByMagic(Multimodal.mediaCorpus(spark, dir)).collect()
    assert(fixture.nonEmpty && fixture.forall(_._2 == "text/plain"))
  }

  test("ordered funnel gates on strict stage order (synthetic adversarial cases)") {
    import spark.implicits._
    // (user, type, µs, event_id) — the fixture's users all reach stage 3,
    // so the ordering gates are only distinguishable on synthetic input
    val events = Seq(
      (1L, "click", 10L, 1L), (1L, "purchase", 20L, 2L),            // no view → 0
      (2L, "view", 10L, 3L),                                         // view only → 1
      (3L, "view", 10L, 4L), (3L, "purchase", 20L, 5L),              // no click → 1
      (4L, "click", 10L, 6L), (4L, "view", 20L, 7L),                 // click BEFORE view → 1
      (5L, "view", 10L, 8L), (5L, "click", 20L, 9L),
      (5L, "purchase", 30L, 10L),                                    // in order → 3
      (6L, "purchase", 10L, 11L), (6L, "view", 20L, 12L),
      (6L, "click", 30L, 13L),                                       // purchase too early → 2
      (7L, "view", 10L, 14L), (7L, "click", 10L, 15L),               // tie: click after view in
      (8L, "click", 10L, 17L), (8L, "view", 10L, 18L)                //  row order → 2; before → 1
    ).toDF("user_id", "event_type", "us", "event_id")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("event_id"))
    val got = Events.funnelStages(events)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 3, 6L -> 2,
      7L -> 2, 8L -> 1))
  }

  test("ordered funnel matches a per-user brute-force simulation") {
    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = events.groupBy(_._1).map { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._4))
      var stage = 0
      ordered.foreach { case (_, tpe, _, _) =>
        if (stage == 0 && tpe == "view") stage = 1
        else if (stage == 1 && tpe == "click") stage = 2
        else if (stage == 2 && tpe == "purchase") stage = 3
      }
      uid -> stage
    }
    val got = SparkEntry.queries("e_funnel_stages")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("int8 quantization codes reconstruct within half a quantization step") {
    val vecs = graft.Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val dims = 0 until 4
    val mins = dims.map(d => vecs.values.map(_(d)).min)
    val maxs = dims.map(d => vecs.values.map(_(d)).max)
    val rows = SparkEntry.queries("sim_quantize_int8")(spark, dir).collect()
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      dims.foreach { d =>
        val code = r.getLong(1 + d)
        assert(code >= 0 && code <= 255, s"vec $id dim $d code $code out of range")
        val step = (maxs(d) - mins(d)) / 255.0
        val decoded = mins(d) + code * step
        assert(math.abs(decoded - vecs(id)(d)) <= step / 2 + 1e-9,
          s"vec $id dim $d: decoded $decoded vs ${vecs(id)(d)} (step $step)")
      }
    }
  }

  test("decontamination: exact cross-source duplicates of the eval slice " +
    "score contamination 1.0, and no eval doc leaks into the output") {
    val d = graft.Tables.load(spark, dir, "documents")
    val out = SparkEntry.queries("t_decontaminate")(spark, dir).collect()
    val evalIds = d.filter(col("source") === "src0")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !evalIds.contains(r.getLong(0))), "eval doc in output")
    assert(out.forall { r =>
      val c = r.getDouble(3); c >= 0.0 && c <= 1.0
    })
    // any corpus doc whose full text equals an eval doc's text shares every
    // 4-gram with the benchmark → contamination must be exactly 1.0
    val evalTexts = d.filter(col("source") === "src0")
      .select(col("text")).collect().map(_.getString(0)).toSet
    val dupIds = d.filter(col("source") =!= "src0")
      .collect().filter(r => evalTexts.contains(r.getString(1)))
      .map(_.getLong(0)).toSet
    val byId = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    dupIds.foreach { id =>
      assert(byId.get(id).contains(1.0), s"exact eval duplicate $id not fully flagged")
    }
  }

  test("tfidf top terms: <= 3 unique terms per doc, scores non-increasing") {
    val rows = SparkEntry.queries("t_tfidf_top_terms")(spark, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.length <= 3, s"doc $id has ${rs.length} terms")
      assert(rs.map(_.getString(1)).distinct.length == rs.length)
      val scores = rs.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not sorted: ${scores.toSeq}")
    }
  }

  test("repetition filter flags degenerate docs and passes diverse ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x x x"),        // one token repeated: dup 5/6, bigram share 1.0
      (2L, "a b c d e f g h i j"), // all unique: dup 0, every bigram unique
      (3L, "spam ham spam ham spam ham"), // alternating bigram loop
      (4L, "w")                   // single token: no bigrams at all
    ).toDF("doc_id", "text")
    val got = TextDedup.repetitionFilter(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got(1L) == ((6L, round6(1 - 1.0 / 6), 1.0, false)))
    assert(got(2L) == ((10L, 0.0, round6(1.0 / 9), true)))
    // "spam ham"×3 + "ham spam"×2 of 5 bigrams → top share 0.6; dup 4/6
    assert(got(3L) == ((6L, round6(1 - 2.0 / 6), 0.6, false)))
    assert(got(4L) == ((1L, 0.0, 0.0, true)))
  }

  test("common spans: shared only across documents, within-doc repeats don't count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e", "s0"),                 // "a b c d" shared with doc 2
      (2L, "z z a b c d y", "s0"),
      (3L, "q r s t u", "s1"),                 // nothing shared
      (4L, "m n o p m n o p m n o p", "s1")    // self-repeated gram only → not shared
    ).toDF("doc_id", "text", "source")
    val got = TextDedup.commonSpans(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((4L, 1L, 0.25)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    // doc 4 has 9 positional grams but deduped distinct grams; none cross-doc
    assert(got(4L)._2 == 0L)
  }

  private def round6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("pii scrub: emails, phones and IPs are counted and redacted on crafted rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or alice@test.org today"),
      (2L, "call +1 555 123 4567 now"),
      (3L, "server at 192.168.0.1 and 10.0.0.254 responded"),
      (4L, "plain text with no sensitive content"),
      (5L, "mixed: a@b.io from 127.0.0.1")
    ).toDF("doc_id", "text")
    val got = TextDedup.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(1L) == ((2L, 0L, 0L, "contact <EMAIL> or <EMAIL> today")))
    assert(got(2L) == ((0L, 1L, 0L, "call <PHONE> now")))
    assert(got(3L) == ((0L, 0L, 2L, "server at <IP> and <IP> responded")))
    assert(got(4L) == ((0L, 0L, 0L, "plain text with no sensitive content")))
    assert(got(5L) == ((1L, 0L, 1L, "mixed: <EMAIL> from <IP>")))
  }

  test("cluster keepers: the keeper is the longest doc of its cluster " +
    "(ties to smallest id) and counts line up with dd_dup_clusters") {
    val clusters = SparkEntry.queries("dd_dup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(clusters.nonEmpty, "fixture should produce near-dup clusters")
    val chars = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = clusters.groupBy(_._2).map { case (cl, members) =>
      val best = members.map(_._1).minBy(id => (-chars(id), id))
      cl -> ((members.length.toLong, best, chars(best)))
    }
    val got = SparkEntry.queries("dd_cluster_keepers")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("z-score anomalies: every flagged row really exceeds its type's threshold") {
    val byType = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (t, vs) =>
        val xs = vs.map(_._2); val n = xs.length
        val m = xs.sum / n
        val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (n - 1))
        t -> ((m, sd))
      }
    val rows = SparkEntry.queries("e_anomaly_zscore")(spark, dir).collect()
    assert(rows.nonEmpty, "fixture should contain outliers")
    rows.foreach { r =>
      val (m, sd) = byType(r.getString(1))
      val z = (r.getDouble(2) - m) / sd
      assert(z > 2.5 - 1e-6, s"event ${r.getLong(0)} z=$z not above threshold")
      assert(math.abs(z - r.getDouble(3)) < 1e-4, s"reported z off: $z vs ${r.getDouble(3)}")
    }
  }

  test("sequence packing: offsets within budget, windows tile the per-source " +
    "token stream, crosses flag matches the arithmetic") {
    val rows = SparkEntry.queries("t_seq_packing")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (id, _, nTok, seqId, off, crosses) =>
        assert(off >= 0 && off < 128, s"doc $id offset $off out of window")
        assert(seqId == cum / 128, s"doc $id seq_id $seqId != ${cum / 128}")
        assert(off == cum % 128, s"doc $id offset $off != ${cum % 128}")
        val expectCross = if (off + nTok > 128) 1 else 0
        assert(crosses == expectCross, s"doc $id crosses $crosses != $expectCross")
        cum += nTok
      }
      assert(sorted.map(_._3).sum == cum, s"source $src token stream not tiled")
    }
  }
}
