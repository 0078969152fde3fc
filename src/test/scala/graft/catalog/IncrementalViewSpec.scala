package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized views over the CDC feed: folding each change
  * window into the aggregate must equal re-aggregating the source from
  * scratch — on hand-picked transitions and under random histories.
  */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(23)

  private def fixture(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-mv-$tag")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("sum", "val", "sum_val")))
    (cat, new Tx(cat), view,
      new ChangeTail(cat, "src", dir.resolve("mv.ckpt")))
  }

  private def mvRows(cat: Catalog): Map[String, (Long, Long)] =
    cat.read("mv").collect()
      .map(r => Option(r.getString(0)).getOrElse("∅") -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(cat: Catalog): Map[String, (Long, Long)] =
    cat.read("src").groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("val")), lit(0L)).as("s"))
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("∅") -> (r.getLong(1), r.getLong(2))).toMap

  test("inserts, group-moving edits, and deletes fold exactly; empty groups leave the MV") {
    val (cat, tx, view, tail) = fixture("basic")
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L),
      org.apache.spark.sql.Row(2, "a", 20L),
      org.apache.spark.sql.Row(3, "b", 5L)))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvRows(cat) == Map("a" -> (2L, 30L), "b" -> (1L, 5L)))

    // an edit that MOVES a row across groups: the update pair nets -a/+b
    tx.stageEdit("src", col("id") === 2, Seq("grp" -> "b"))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mvRows(cat) == Map("a" -> (1L, 10L), "b" -> (2L, 25L)))

    // deleting a group's last row removes the group from the MV
    tx.stageDelete("src", Some(col("grp") === "a"))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mvRows(cat) == Map("b" -> (2L, 25L)))
    // caught up: refresh is a no-op
    assert(view.refreshOnce(tail) == 0)
  }

  test("approx_distinct: insert windows union sketches (no double count), deletes recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-hll")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "approx_distinct_val" -> graft.aql.AlbaType.of("BIGINT"),
      "approx_distinct_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_distinct", "val", "approx_distinct_val")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    // fixture cardinalities stay far below the HLL coupon-mode promotion
    // (~hundreds at lgK=12), where the DataSketches estimate is EXACT —
    // so the spec can pin equality with count(DISTINCT), not a band
    def exact(): Map[String, Long] =
      cat.read("src").groupBy(col("grp"))
        .agg(countDistinct(col("val")).as("nd")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def mvEst(): Map[String, Long] =
      cat.read("mv").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
    tx.stageInsert("src", (1 to 60).map(i =>
      org.apache.spark.sql.Row(i, if (i % 2 == 0) "a" else "b", (i % 20).toLong)))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvEst() == exact())
    // the critical fold: a second window whose values OVERLAP the first —
    // an estimate+delta fold (no sketch) would double count these
    tx.stageInsert("src", (61 to 90).map(i =>
      org.apache.spark.sql.Row(i, if (i % 2 == 0) "a" else "b", (i % 25).toLong)))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvEst() == exact(), "overlapping insert window must union, not add")
    // deletes are not sketch-invertible: the group recomputes (dirty path)
    tx.stageDelete("src", Some(col("val") >= 15 && col("grp") === "a"))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvEst() == exact(), "a shrunken group must recompute its sketch")
    // group-moving edit: -a/+b pair dirties a, folds into b
    tx.stageEdit("src", col("id") === 1, Seq("grp" -> "a"))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvEst() == exact())
    assert(view.refreshOnce(tail) == 0)
  }

  test("a corrupt idempotency stamp degrades to the checkpoint path instead of wedging") {
    val (cat, tx, view, tail) = fixture("badstamp")
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L),
      org.apache.spark.sql.Row(2, "b", 5L)))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    // truncate the marker mid-value, as a crashed writer / disk fault would
    java.nio.file.Files.writeString(
      cat.versionPath("mv", cat.currentVersion("mv")).resolve(Catalog.TxnMarker),
      "cdc:src\t4x")
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(3, "a", 7L)))
    tx.commit(Some("src"))
    // an unparsable stamp must read as UNSTAMPED (no NumberFormatException);
    // the at-least-once checkpoint still delivers the new window exactly once
    assert(view.refreshOnce(tail) == 1)
    assert(mvRows(cat) == recompute(cat))
    assert(view.refreshOnce(tail) == 0)
  }

  test("random histories: the folded MV equals a from-scratch re-aggregation after every refresh") {
    val (cat, tx, view, tail) = fixture("prop")
    val groups = Vector("x", "y", "z")
    (1 to 6).foreach { _ =>
      (0 until 1 + rng.nextInt(3)).foreach { _ =>
        rng.nextInt(6) match {
          case 0 | 1 | 2 => tx.stageInsert("src", Seq(org.apache.spark.sql.Row(
            rng.nextInt(10), groups(rng.nextInt(3)), rng.nextInt(100).toLong)))
          case 3 => tx.stageEdit("src", col("id") === rng.nextInt(10),
            Seq("grp" -> groups(rng.nextInt(3))))
          case 4 => tx.stageEdit("src", col("id") === rng.nextInt(10),
            Seq("val" -> rng.nextInt(100).toLong))
          case 5 => tx.stageDelete("src", Some(col("id") === rng.nextInt(10)))
        }
      }
      if (tx.stagedOps("src") > 0) tx.commit(Some("src"))
      view.refreshOnce(tail)
      assert(mvRows(cat) == recompute(cat))
    }
  }

  test("end to end: streamed ingest commits feed the MV without ever re-scanning the source") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-stream")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("sum", "val", "sum_val")))
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))

    val srcDir = java.nio.file.Files.createTempDirectory("graft-mv-stream-src")
    import spark.implicits._
    Seq((1, "a", 10L), (2, "b", 5L)).toDF("id", "grp", "val")
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    Seq((3, "a", 7L)).toDF("id", "grp", "val")
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("id", IntegerType),
        StructField("grp", StringType), StructField("val", LongType))))
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv-stream-ckpt")
    val q = graft.streaming.DocumentStreams.ingestToCatalog(stream, cat, "src")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()

    assert(view.refreshOnce(tail) == 2, "two micro-batch commits, one netted window")
    assert(mvRows(cat) == Map("a" -> (2L, 17L), "b" -> (1L, 5L)))
    assert(mvRows(cat) == recompute(cat))
  }

  test("a multi-commit backlog folds in one window; seed() recovers from scratch") {
    val (cat, tx, view, tail) = fixture("window")
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(1, "a", 1L)))
    tx.commit(Some("src"))
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(2, "a", 2L)))
    tx.commit(Some("src"))
    tx.stageEdit("src", col("id") === 1, Seq("val" -> 7L))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 3, "three versions, one netted window")
    assert(mvRows(cat) == Map("a" -> (2L, 9L)))
    // seed() rebuilds identically (the recovery path)
    view.seed(tail)
    assert(mvRows(cat) == Map("a" -> (2L, 9L)))
  }

  // ---- min/max: the two-path (gain-fold vs dirty-recompute) algorithm ----

  private def fixtureMM(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-mvmm-$tag")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT"),
      "min_val" -> graft.aql.AlbaType.of("BIGINT"),
      "max_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"), Seq(
      IncrementalView.Agg("sum", "val", "sum_val"),
      IncrementalView.Agg("min", "val", "min_val"),
      IncrementalView.Agg("max", "val", "max_val")))
    (cat, new Tx(cat), view,
      new ChangeTail(cat, "src", dir.resolve("mv.ckpt")))
  }

  private def mmRows(cat: Catalog): Map[String, (Long, Long, Long, Long)] =
    cat.read("mv").collect().map(r =>
      Option(r.getString(0)).getOrElse("∅") ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  private def mmRecompute(cat: Catalog): Map[String, (Long, Long, Long, Long)] =
    cat.read("src").groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("val")), lit(0L)).as("s"),
        min(col("val")).as("mn"), max(col("val")).as("mx"))
      .collect().map(r =>
        Option(r.getString(0)).getOrElse("∅") ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("avg: sum/cnt companions fold exactly through deletes, NULLs, and group moves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-avg")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "avg_val" -> graft.aql.AlbaType.of("FLOAT"),
      "avg_val_sum" -> graft.aql.AlbaType.of("BIGINT"),
      "avg_val_cnt" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("avg", "val", "avg_val")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    def mvAvg: Map[String, (Long, Option[Double])] =
      cat.read("mv").collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    def oracle: Map[String, (Long, Option[Double])] =
      cat.read("src").groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), avg(col("val")).as("a")).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap

    // seed window: one group has a NULL val (counts toward n_rows, not cnt)
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L),
      org.apache.spark.sql.Row(2, "a", 21L),
      org.apache.spark.sql.Row(3, "b", null),
      org.apache.spark.sql.Row(4, "b", 8L)))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mvAvg == oracle && mvAvg("a")._2.contains(15.5))

    // delete one of a's rows: the ±sum/±cnt fold is exact — no dirty path
    tx.stageDelete("src", Some(col("id") === 2))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mvAvg == oracle && mvAvg("a")._2.contains(10.0))

    // delete b's only non-NULL val: the group stays (n_rows 1), avg NULL
    tx.stageDelete("src", Some(col("id") === 4))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mvAvg == oracle && mvAvg("b") == ((1L, None)))

    // a group-moving edit nets -a/+b through both companions
    tx.stageEdit("src", col("id") === 1, Seq("grp" -> "b"))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mvAvg == oracle && mvAvg("b")._2.contains(10.0) && !mvAvg.contains("a"))
  }

  test("avg random histories equal re-aggregation after every refresh") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-avgprop")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "avg_val" -> graft.aql.AlbaType.of("FLOAT"),
      "avg_val_sum" -> graft.aql.AlbaType.of("BIGINT"),
      "avg_val_cnt" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("avg", "val", "avg_val")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    val groups = Vector("x", "y", "z")
    def snap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Option[Double])] =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    (1 to 6).foreach { _ =>
      (0 until 1 + rng.nextInt(3)).foreach { _ =>
        rng.nextInt(6) match {
          case 0 | 1 | 2 => tx.stageInsert("src", Seq(org.apache.spark.sql.Row(
            rng.nextInt(10), groups(rng.nextInt(3)),
            if (rng.nextInt(5) == 0) null else rng.nextInt(100).toLong)))
          case 3 => tx.stageEdit("src", col("id") === rng.nextInt(10),
            Seq("grp" -> groups(rng.nextInt(3))))
          case 4 => tx.stageEdit("src", col("id") === rng.nextInt(10),
            Seq("val" -> rng.nextInt(100).toLong))
          case 5 => tx.stageDelete("src", Some(col("id") === rng.nextInt(10)))
        }
      }
      if (tx.stagedOps("src") > 0) tx.commit(Some("src"))
      view.refreshOnce(tail)
      assert(snap(cat.read("mv").select(col("grp"), col("n_rows"), col("avg_val"))) ==
        snap(cat.read("src").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), avg(col("val")).as("a"))))
    }
  }

  test("approx_median: insert windows union KLL sketches, deletes recompute; exact below capacity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-med")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "med_val" -> graft.aql.AlbaType.of("FLOAT"),
      "med_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_median", "val", "med_val")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    def mvMed: Map[String, (Long, Option[Double])] =
      cat.read("mv").collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap

    // KLL below capacity retains every value: the estimate IS the
    // inclusive order statistic v⌈n/2⌉ — pins are exact equalities
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L),
      org.apache.spark.sql.Row(2, "a", 20L),
      org.apache.spark.sql.Row(3, "a", 30L),
      org.apache.spark.sql.Row(4, "a", 40L),
      org.apache.spark.sql.Row(5, "b", null)))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // n=4 → v2 = 20; b has only a NULL val → NULL median, n_rows 1
    assert(mvMed == Map("a" -> (4L, Some(20.0)), "b" -> (1L, None)))

    // a second insert window UNIONS into the existing sketch — a fold
    // that re-added the old values would shift the order statistic
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(6, "a", 5L),
      org.apache.spark.sql.Row(7, "a", 50L),
      org.apache.spark.sql.Row(8, "a", 60L)))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // {5,10,20,30,40,50,60}: n=7 → v4 = 30
    assert(mvMed("a") == ((7L, Some(30.0))))

    // a delete dirties the group: recomputed from the end-version
    // snapshot (a KLL sketch cannot subtract)
    tx.stageDelete("src", Some(col("val") === 40L))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // {5,10,20,30,50,60}: n=6 → v3 = 20
    assert(mvMed("a") == ((6L, Some(20.0))))
  }

  test("approx_quantile: the maintained estimate renders at the definition's rank, not 0.5") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-q90")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "q90_val" -> graft.aql.AlbaType.of("FLOAT"),
      "q90_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_quantile", "val", "q90_val",
        q = Some(0.9))))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    def mvQ: Map[String, (Long, Option[Double])] =
      cat.read("mv").collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap

    // below capacity the KLL retains every value: the estimate IS the
    // inclusive order statistic v⌈q·n⌉ — pins are exact equalities
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L),
      org.apache.spark.sql.Row(2, "a", 20L),
      org.apache.spark.sql.Row(3, "a", 30L),
      org.apache.spark.sql.Row(4, "a", 40L)))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // n=4, q=0.9 → v⌈3.6⌉ = v4 = 40 (a 0.5 rendering would say 20)
    assert(mvQ == Map("a" -> (4L, Some(40.0))))

    // union window: the merged sketch re-renders at rank 0.9
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(5, "a", 5L),
      org.apache.spark.sql.Row(6, "a", 50L),
      org.apache.spark.sql.Row(7, "a", 60L)))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // {5,10,20,30,40,50,60}: n=7 → v⌈6.3⌉ = v7 = 60
    assert(mvQ("a") == ((7L, Some(60.0))))

    // a delete dirties the group: the recompute also renders at 0.9
    tx.stageDelete("src", Some(col("val") === 60L))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // {5,10,20,30,40,50}: n=6 → v⌈5.4⌉ = v6 = 50
    assert(mvQ("a") == ((6L, Some(50.0))))
  }

  test("approx_top_k: insert windows union freq sketches, deletes recompute; exact below capacity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-topk")
    val cat = new Catalog(spark, dir.toString)
    // TEXT item column — the shape that exposes a wrong additive fold
    // (sum over TEXT would cast to double garbage, and the rendered
    // string could never re-derive without the _sk companion)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "item" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "top_item" -> graft.aql.AlbaType.of("TEXT"),
      "top_item_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_top_k", "item", "top_item", Some(2))))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    def mvTop: Map[String, (Long, Option[String])] =
      cat.read("mv").collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getString(2)))).toMap
    // fixture distincts stay far below the 0.75×256 purge threshold, so
    // the sketch is EXACT and the rendering pins as a string equality
    // ((count DESC, item ASC) — FreqSketch.renderTopK's tie-break)
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", "x"),
      org.apache.spark.sql.Row(2, "a", "x"),
      org.apache.spark.sql.Row(3, "a", "y"),
      org.apache.spark.sql.Row(4, "a", "z"),
      org.apache.spark.sql.Row(5, "b", null)))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    // ties at count 1 break item-ASC: y beats z for the second slot
    assert(mvTop == Map("a" -> (4L, Some("x:2,y:1")), "b" -> (1L, None)))

    // a second insert window UNIONS into the existing sketch — counts
    // accumulate across windows, and the visible text re-renders from
    // the merged sketch (an estimate-only fold could never reorder x/z)
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(6, "a", "z"),
      org.apache.spark.sql.Row(7, "a", "z"),
      org.apache.spark.sql.Row(8, "a", "z")))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvTop("a") == ((7L, Some("z:4,x:2"))))

    // a delete dirties the group: recomputed from the end-version
    // snapshot (a frequent-items sketch cannot subtract)
    tx.stageDelete("src", Some(col("item") === "z"))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvTop("a") == ((3L, Some("x:2,y:1"))))

    // group-moving edit: -a/+b pair dirties a, folds into b; b's sketch
    // goes from NULL (all-NULL group) to a real one
    tx.stageEdit("src", col("id") === 3, Seq("grp" -> "b"))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvTop == Map("a" -> (2L, Some("x:2")), "b" -> (2L, Some("y:1"))))
    assert(view.refreshOnce(tail) == 0)
  }

  test("approx_top_k: two k's of one column share ONE persisted sketch (the KLL share rule)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-topk2")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "item" -> graft.aql.AlbaType.of("SMALL-STRING")))
    // the MV declares ONE _sk column — the first (owner) top-k's; the
    // k=3 rendering derives from the same sketch (k only truncates)
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "top1" -> graft.aql.AlbaType.of("TEXT"),
      "top1_sk" -> graft.aql.AlbaType.of("LARGE-BYTES"),
      "top3" -> graft.aql.AlbaType.of("TEXT")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_top_k", "item", "top1", Some(1)),
        IncrementalView.Agg("approx_top_k", "item", "top3", Some(3))))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    def mvTops: Map[String, (Option[String], Option[String])] =
      cat.read("mv").collect().map(r => r.getString(0) ->
        (Option(r.getString(2)), Option(r.getString(4)))).toMap
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", "x"), org.apache.spark.sql.Row(2, "a", "x"),
      org.apache.spark.sql.Row(3, "a", "y"), org.apache.spark.sql.Row(4, "a", "z")))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvTops("a") == ((Some("x:2"), Some("x:2,y:1,z:1"))))
    // a fold window unions ONCE into the shared sketch; both renderings
    // re-derive from the same union (z overtakes x at k=1 AND k=3)
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(5, "a", "z"), org.apache.spark.sql.Row(6, "a", "z"),
      org.apache.spark.sql.Row(7, "a", "z")))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvTops("a") == ((Some("z:4"), Some("z:4,x:2,y:1"))))
    // dirty recompute keeps the share: one sketch, both truncations
    tx.stageDelete("src", Some(col("item") === "z"))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvTops("a") == ((Some("x:2"), Some("x:2,y:1"))))
    assert(view.refreshOnce(tail) == 0)
  }

  test("min/max: gain-only windows fold; losing the extreme recomputes the group exactly") {
    val (cat, tx, view, tail) = fixtureMM("basic")
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L),
      org.apache.spark.sql.Row(2, "a", 20L),
      org.apache.spark.sql.Row(3, "b", 5L)))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mmRows(cat) == Map("a" -> (2L, 30L, 10L, 20L), "b" -> (1L, 5L, 5L, 5L)))

    // gain-only window: least/greatest fold, no recompute needed
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(4, "a", 30L)))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mmRows(cat)("a") == (3L, 60L, 10L, 30L))

    // deleting the CURRENT MAX: the runner-up must surface — only a
    // group recompute can know it
    tx.stageDelete("src", Some(col("id") === 4))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mmRows(cat)("a") == (2L, 30L, 10L, 20L))

    // in-group edit of the min (update pair: pre marks dirty)
    tx.stageEdit("src", col("id") === 1, Seq("val" -> 50L))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mmRows(cat)("a") == (2L, 70L, 20L, 50L))

    // untouched group b never recomputed away
    assert(mmRows(cat)("b") == (1L, 5L, 5L, 5L))
    assert(mmRows(cat) == mmRecompute(cat))
  }

  test("min/max random histories equal re-aggregation after every refresh") {
    val (cat, tx, view, tail) = fixtureMM("prop")
    val groups = Vector("x", "y", "z")
    (1 to 6).foreach { _ =>
      (0 until 1 + rng.nextInt(3)).foreach { _ =>
        rng.nextInt(6) match {
          case 0 | 1 | 2 => tx.stageInsert("src", Seq(org.apache.spark.sql.Row(
            rng.nextInt(10), groups(rng.nextInt(3)), rng.nextInt(100).toLong)))
          case 3 => tx.stageEdit("src", col("id") === rng.nextInt(10),
            Seq("grp" -> groups(rng.nextInt(3))))
          case 4 => tx.stageEdit("src", col("id") === rng.nextInt(10),
            Seq("val" -> rng.nextInt(100).toLong))
          case 5 => tx.stageDelete("src", Some(col("id") === rng.nextInt(10)))
        }
      }
      if (tx.stagedOps("src") > 0) tx.commit(Some("src"))
      view.refreshOnce(tail)
      assert(mmRows(cat) == mmRecompute(cat))
    }
  }

  test("sketch-family random histories: every estimate equals re-aggregation after every refresh") {
    // one view carrying the WHOLE sketch family at once — HLL distinct,
    // KLL median + p90, frequent-items top-2 — under random inserts,
    // group-moving edits, value edits, and deletes. Fixture cardinalities
    // stay in every sketch's exact regime, so the folded estimates must
    // EQUAL a from-scratch re-aggregation of the source after each
    // refresh (the property that catches a missed dirty group, a
    // double-union, or a wrong-rank rendering in any one arm).
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-skprop")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "nd_val" -> graft.aql.AlbaType.of("BIGINT"),
      "nd_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES"),
      "med_val" -> graft.aql.AlbaType.of("FLOAT"),
      // ONE KLL sketch serves both ranks over `val`: med_val owns the
      // `_sk` (first quantile agg over the column), p90_val renders
      // from it — no p90_val_sk column exists
      "med_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES"),
      "p90_val" -> graft.aql.AlbaType.of("FLOAT"),
      "top_val" -> graft.aql.AlbaType.of("TEXT"),
      "top_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"), Seq(
      IncrementalView.Agg("approx_distinct", "val", "nd_val"),
      IncrementalView.Agg("approx_median", "val", "med_val"),
      IncrementalView.Agg("approx_quantile", "val", "p90_val", q = Some(0.9)),
      IncrementalView.Agg("approx_top_k", "val", "top_val", Some(2))))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    def snap(): Map[String, (Long, Long, Option[Double], Option[Double], Option[String])] =
      cat.read("mv").select(col("grp"), col("n_rows"), col("nd_val"),
          col("med_val"), col("p90_val"), col("top_val")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.getString(5)))).toMap
    def oracle(): Map[String, (Long, Long, Option[Double], Option[Double], Option[String])] =
      cat.read("src").collect().groupBy(_.getString(1)).map { case (g, rs) =>
        val vals = rs.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Long]))
        val sorted = vals.sorted.toVector
        def orderStat(q: Double): Option[Double] =
          if (sorted.isEmpty) None
          else Some(sorted(math.ceil(q * sorted.length).toInt.max(1) - 1).toDouble)
        val top = vals.groupBy(identity).map { case (v, xs) =>
          v.toString -> xs.length.toLong }.toSeq
          .sortWith { case ((ia, na), (ib, nb)) => if (na != nb) na > nb else ia < ib }
          .take(2).map { case (i, n) => s"$i:$n" }.mkString(",")
        g -> ((rs.length.toLong, vals.distinct.length.toLong,
          orderStat(0.5), orderStat(0.9),
          if (top.isEmpty) None else Some(top)))
      }
    val groups = Vector("x", "y", "z")
    val rng2 = new scala.util.Random(71)
    (1 to 6).foreach { _ =>
      (0 until 1 + rng2.nextInt(3)).foreach { _ =>
        rng2.nextInt(6) match {
          case 0 | 1 | 2 => tx.stageInsert("src", Seq(org.apache.spark.sql.Row(
            rng2.nextInt(12), groups(rng2.nextInt(3)),
            if (rng2.nextInt(6) == 0) null else rng2.nextInt(30).toLong)))
          case 3 => tx.stageEdit("src", col("id") === rng2.nextInt(12),
            Seq("grp" -> groups(rng2.nextInt(3))))
          case 4 => tx.stageEdit("src", col("id") === rng2.nextInt(12),
            Seq("val" -> rng2.nextInt(30).toLong))
          case 5 => tx.stageDelete("src", Some(col("id") === rng2.nextInt(12)))
        }
      }
      if (tx.stagedOps("src") > 0) tx.commit(Some("src"))
      view.refreshOnce(tail)
      assert(snap() == oracle(), "folded sketch estimates diverged from re-aggregation")
    }
  }

  test("enrichment-join views: fact windows fold against the stamped dim; dim commits reseed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-dim")
    val cat = new Catalog(spark, dir.toString)
    cat.create("fact", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("dimc", List(
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "region" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "region" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT"),
      "min_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "fact", "mv", Seq("region"), Seq(
      IncrementalView.Agg("sum", "val", "sum_val"),
      IncrementalView.Agg("min", "val", "min_val")),
      dims = Seq(IncrementalView.DimJoin("dimc", "nation_id", "nation_id")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "fact", dir.resolve("mv.ckpt"))
    def mvRows: Map[String, (Long, Long, Long)] =
      cat.read("mv").collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    tx.stageInsert("dimc", Seq(
      org.apache.spark.sql.Row(1L, "EU"), org.apache.spark.sql.Row(2L, "US")))
    tx.commit(Some("dimc"))
    tx.stageInsert("fact", Seq(
      org.apache.spark.sql.Row(1, 1L, 10L),
      org.apache.spark.sql.Row(2, 1L, 20L),
      org.apache.spark.sql.Row(3, 2L, 5L),
      org.apache.spark.sql.Row(4, 99L, 7L))) // no dim match: drops (inner)
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvRows == Map("EU" -> (2L, 30L, 10L), "US" -> (1L, 5L, 5L)))

    // a fact edit that MOVES a row across dim keys folds through the
    // enrichment: -EU/+US through the update pair; dim untouched
    tx.stageEdit("fact", col("id") === 2, Seq("nation_id" -> 2L))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvRows == Map("EU" -> (1L, 10L, 10L), "US" -> (2L, 25L, 5L)))

    // deleting US's min exercises the dirty recompute — which must
    // enrich the end-version snapshot against the SAME stamped dim
    tx.stageDelete("fact", Some(col("id") === 3))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvRows == Map("EU" -> (1L, 10L, 10L), "US" -> (1L, 20L, 20L)))

    // a DIM commit (rename region US → NA) invalidates every group's
    // enrichment: the next refresh RESEEDS from both current snapshots
    tx.stageEdit("dimc", col("nation_id") === 2L, Seq("region" -> "NA"))
    tx.commit(Some("dimc"))
    view.refreshOnce(tail)
    assert(mvRows == Map("EU" -> (1L, 10L, 10L), "NA" -> (1L, 20L, 20L)))

    // and the view keeps folding fact windows after the reseed
    tx.stageInsert("fact", Seq(org.apache.spark.sql.Row(5, 2L, 3L)))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvRows == Map("EU" -> (1L, 10L, 10L), "NA" -> (2L, 23L, 3L)))
    assert(view.refreshOnce(tail) == 0)
  }

  test("enrichment: one atomic multi-container commit touching fact AND dim reseeds consistently") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-dimatomic")
    val cat = new Catalog(spark, dir.toString)
    cat.create("fact", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("dimc", List(
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "region" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "region" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "fact", "mv", Seq("region"),
      Seq(IncrementalView.Agg("sum", "val", "sum_val")),
      dims = Seq(IncrementalView.DimJoin("dimc", "nation_id", "nation_id")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "fact", dir.resolve("mv.ckpt"))
    def mvRows: Map[String, (Long, Long)] =
      cat.read("mv").collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    tx.stageInsert("dimc", Seq(
      org.apache.spark.sql.Row(1L, "EU"), org.apache.spark.sql.Row(2L, "US")))
    tx.stageInsert("fact", Seq(
      org.apache.spark.sql.Row(1, 1L, 10L), org.apache.spark.sql.Row(2, 2L, 5L)))
    tx.commit(None) // one atomic group commit seeds both sides
    assert(view.refreshOnce(tail) >= 1)
    assert(mvRows == Map("EU" -> (1L, 10L), "US" -> (1L, 5L)))
    // one atomic commit: a fact insert AND a dim rename land together —
    // the refresh must apply BOTH (the dim change forces a reseed, whose
    // snapshot already contains the fact change; nothing double-applies)
    tx.stageInsert("fact", Seq(org.apache.spark.sql.Row(3, 2L, 7L)))
    tx.stageEdit("dimc", col("nation_id") === 2L, Seq("region" -> "NA"))
    tx.commit(None)
    assert(view.refreshOnce(tail) >= 1)
    assert(mvRows == Map("EU" -> (1L, 10L), "NA" -> (2L, 12L)))
    // and the window is not re-applied afterwards
    assert(view.refreshOnce(tail) == 0)
    assert(mvRows == Map("EU" -> (1L, 10L), "NA" -> (2L, 12L)))
  }

  test("enrichment + sketches: HLL folds by union under dim grouping; deletes recompute enriched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-dimsk")
    val cat = new Catalog(spark, dir.toString)
    cat.create("fact", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("dimc", List(
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "region" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "region" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "nd_val" -> graft.aql.AlbaType.of("BIGINT"),
      "nd_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "fact", "mv", Seq("region"),
      Seq(IncrementalView.Agg("approx_distinct", "val", "nd_val")),
      dims = Seq(IncrementalView.DimJoin("dimc", "nation_id", "nation_id")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "fact", dir.resolve("mv.ckpt"))
    def exact(): Map[String, Long] = {
      val f = cat.read("fact").alias("f"); val d = cat.read("dimc").alias("d")
      f.join(d, col("f.nation_id") === col("d.nation_id"))
        .groupBy(col("region")).agg(countDistinct(col("val")).as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    def mvEst(): Map[String, Long] =
      cat.read("mv").collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    tx.stageInsert("dimc", Seq(
      org.apache.spark.sql.Row(1L, "EU"), org.apache.spark.sql.Row(2L, "EU"),
      org.apache.spark.sql.Row(3L, "US")))
    tx.commit(Some("dimc"))
    // two NATIONS in one REGION sharing values: a per-nation fold that
    // didn't group by the dim attr would double-count val=7
    tx.stageInsert("fact", (1 to 30).map(i =>
      org.apache.spark.sql.Row(i, (i % 3 + 1).toLong,
        if (i % 5 == 0) 7L else i.toLong)))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvEst() == exact())
    // an overlapping insert window UNIONS into the region sketches
    tx.stageInsert("fact", (31 to 45).map(i =>
      org.apache.spark.sql.Row(i, (i % 3 + 1).toLong, (i % 12).toLong)))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvEst() == exact(), "overlapping window must union, not re-add")
    // deletes dirty the REGION group: recompute joins the end snapshot
    // to the same stamped dim
    tx.stageDelete("fact", Some(col("val") >= 20L))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvEst() == exact(), "shrunken region must recompute enriched")
    // a dim commit MERGES two regions: reseed rebuilds the sketches from
    // scratch (a union could never un-merge them later)
    tx.stageEdit("dimc", col("nation_id") === 3L, Seq("region" -> "EU"))
    tx.commit(Some("dimc"))
    view.refreshOnce(tail)
    assert(mvEst() == exact())
    assert(mvEst().keySet == Set("EU"))
  }

  test("legacy per-rank _sk schema: conform fills a non-owner sketch from the owner's") {
    // an MV container created before sketch sharing declares one `_sk`
    // PER rank; the fold now emits only the owner's, and conform must
    // fill the legacy column (same sketch — one KLL serves any rank)
    // instead of breaking every REFRESH of a pre-sharing view
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-legacy")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "p50_val" -> graft.aql.AlbaType.of("FLOAT"),
      "p50_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES"),
      "p90_val" -> graft.aql.AlbaType.of("FLOAT"),
      "p90_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES"))) // legacy shape
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"), Seq(
      IncrementalView.Agg("approx_quantile", "val", "p50_val", q = Some(0.5)),
      IncrementalView.Agg("approx_quantile", "val", "p90_val", q = Some(0.9))))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    tx.stageInsert("src", (1 to 10).map(i =>
      org.apache.spark.sql.Row(i, "a", i.toLong * 10)))
    tx.commit(Some("src"))
    view.refreshOnce(tail) // would throw UNRESOLVED_COLUMN without the fill
    val r = cat.read("mv").collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getDouble(byName("p50_val")) == 50.0) // v⌈0.5·10⌉ = v5
    assert(r.getDouble(byName("p90_val")) == 90.0) // v⌈0.9·10⌉ = v9
    // the legacy column is FILLED with the owner's sketch, not NULL
    assert(!r.isNullAt(byName("p90_val_sk")))
    assert(java.util.Arrays.equals(
      r.getAs[Array[Byte]](byName("p90_val_sk")),
      r.getAs[Array[Byte]](byName("p50_val_sk"))))
    // ...and a second window still folds (both paths go through conform)
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(11, "a", 200L)))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
  }

  test("legacy per-k _sk schema: conform fills a non-owner frequent-items sketch from the owner's") {
    // the top-k twin of the quantile legacy case: an MV container created
    // before the freq-sketch share declares one `_sk` PER k
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-legacytk")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "item" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "top1" -> graft.aql.AlbaType.of("TEXT"),
      "top1_sk" -> graft.aql.AlbaType.of("LARGE-BYTES"),
      "top3" -> graft.aql.AlbaType.of("TEXT"),
      "top3_sk" -> graft.aql.AlbaType.of("LARGE-BYTES"))) // legacy shape
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_top_k", "item", "top1", Some(1)),
        IncrementalView.Agg("approx_top_k", "item", "top3", Some(3))))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", "x"), org.apache.spark.sql.Row(2, "a", "x"),
      org.apache.spark.sql.Row(3, "a", "y")))
    tx.commit(Some("src"))
    view.refreshOnce(tail) // would throw UNRESOLVED_COLUMN without the fill
    val r = cat.read("mv").collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getString(byName("top1")) == "x:2")
    assert(r.getString(byName("top3")) == "x:2,y:1")
    // the legacy column is FILLED with the owner's sketch, not NULL
    assert(!r.isNullAt(byName("top3_sk")))
    assert(java.util.Arrays.equals(
      r.getAs[Array[Byte]](byName("top3_sk")),
      r.getAs[Array[Byte]](byName("top1_sk"))))
    // ...and a second window still folds (both paths go through conform)
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(4, "a", "y")))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
  }

  test("legacy unqualified approx_top_k schema: conform fills the pre-rename TEXT/_sk pair") {
    // an MV container created before approx_top_k folded k into its
    // output name declares `approx_top_k_item` / `approx_top_k_item_sk`;
    // reparsing the stored definition now derives the k-qualified
    // `approx_top_k_item_k3` names — conform must fill the legacy pair
    // from the qualified agg or every REFRESH of a pre-rename view
    // throws (and the auto-refresh hook would swallow it silently)
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-legacyun")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "item" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "approx_top_k_item" -> graft.aql.AlbaType.of("TEXT"),
      "approx_top_k_item_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_top_k", "item",
        "approx_top_k_item_k3", Some(3)))) // the reparsed (qualified) out
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", "x"), org.apache.spark.sql.Row(2, "a", "x"),
      org.apache.spark.sql.Row(3, "a", "y")))
    tx.commit(Some("src"))
    view.refreshOnce(tail) // would throw UNRESOLVED_COLUMN without the fill
    val r = cat.read("mv").collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getString(byName("approx_top_k_item")) == "x:2,y:1")
    assert(!r.isNullAt(byName("approx_top_k_item_sk")))
    // ...and a second window still folds (both paths go through conform)
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(4, "a", "y")))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(cat.read("mv").collect().head.getString(
      byName("approx_top_k_item")) == "x:2,y:2")
  }

  test("legacy unqualified approx_quantile schema: conform fills the pre-rename FLOAT/_sk pair") {
    // the quantile twin of the unqualified top-k case: an MV created
    // before approx_quantile folded the rank into its output name
    // declares `approx_quantile_val` / `approx_quantile_val_sk`; the
    // reparsed definition derives `approx_quantile_val_p90`
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-legacyuq")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "approx_quantile_val" -> graft.aql.AlbaType.of("FLOAT"),
      "approx_quantile_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_quantile", "val",
        "approx_quantile_val_p90", q = Some(0.9)))) // the reparsed out
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    tx.stageInsert("src", (1 to 10).map(i =>
      org.apache.spark.sql.Row(i, "a", i.toLong * 10)))
    tx.commit(Some("src"))
    view.refreshOnce(tail) // would throw UNRESOLVED_COLUMN without the fill
    val r = cat.read("mv").collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getDouble(byName("approx_quantile_val")) == 90.0) // v⌈0.9·10⌉
    assert(!r.isNullAt(byName("approx_quantile_val_sk")))
    // ...and a second window still folds (read side aliases the legacy
    // sketch for the KLL merge; publish writes it back legacy-named)
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(11, "a", 200L)))
    tx.commit(Some("src"))
    assert(view.refreshOnce(tail) == 1)
    assert(cat.read("mv").collect().head.getDouble(
      byName("approx_quantile_val")) == 100.0) // v⌈0.9·11⌉ = v10
  }

  test("sketch views with a WHERE: rows edited across the predicate boundary fold correctly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-skwhere")
    val cat = new Catalog(spark, dir.toString)
    cat.create("src", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("mv", List(
      "grp" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "med_val" -> graft.aql.AlbaType.of("FLOAT"),
      "med_val_sk" -> graft.aql.AlbaType.of("LARGE-BYTES")))
    // WHERE val >= 10: the predicate is row-local, so an UPDATE whose
    // pre-image passes and post-image fails nets a lone -1 (dirty), and
    // the reverse nets a lone +1 (gain fold into the sketch)
    val view = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("approx_median", "val", "med_val")),
      Some(col("val") >= 10L))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "src", dir.resolve("mv.ckpt"))
    def mvMed: Map[String, (Long, Option[Double])] =
      cat.read("mv").collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap

    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L),
      org.apache.spark.sql.Row(2, "a", 20L),
      org.apache.spark.sql.Row(3, "a", 30L),
      org.apache.spark.sql.Row(4, "a", 5L))) // below the WHERE
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // in-window rows {10,20,30}: n=3 → v2 = 20
    assert(mvMed == Map("a" -> (3L, Some(20.0))))

    // edit a row INTO the predicate: 5 → 40 nets a lone +1 — a pure
    // gain, folded by sketch union (no dirty recompute needed)
    tx.stageEdit("src", col("id") === 4, Seq("val" -> 40L))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // {10,20,30,40}: n=4 → v2 = 20
    assert(mvMed("a") == ((4L, Some(20.0))))

    // edit a row OUT of the predicate: 30 → 7 nets a lone -1 — the
    // group dirties and recomputes from the filtered end snapshot
    tx.stageEdit("src", col("id") === 3, Seq("val" -> 7L))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    // {10,20,40}: n=3 → v2 = 20 with 30 gone (a stale sketch would
    // still contain it and shift any higher rank)
    assert(mvMed("a") == ((3L, Some(20.0))))

    // and deleting the remaining in-window rows drops the group
    tx.stageDelete("src", Some(col("val") >= 10L))
    tx.commit(Some("src"))
    view.refreshOnce(tail)
    assert(mvMed == Map.empty[String, (Long, Option[Double])])
  }

  test("exactly-once: a crash between the fold's commit and the checkpoint never double-folds") {
    val (cat, tx, view, tail) = fixture("xo")
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(1, "a", 10L)))
    tx.commit(Some("src")) // src v1
    view.seed(tail)
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(2, "a", 25L)))
    tx.commit(Some("src")) // src v2
    // simulate the at-least-once crash window: the fold COMMITS the MV
    // (stamped with the window end) but the process dies before the tail
    // checkpoint advances
    view.fold(cat.changes("src", tail.lastDelivered, Some(2)), 2)
    assert(tail.lastDelivered == 1, "checkpoint intentionally stale")
    assert(mvRows(cat) == Map("a" -> (2L, 35L)))
    // restart: refreshOnce must detect the stamp, realign the checkpoint,
    // and NOT fold the window again (a re-fold would double-count to 60)
    assert(view.refreshOnce(tail) == 0)
    assert(tail.lastDelivered == 2, "checkpoint realigned from the MV stamp")
    assert(mvRows(cat) == Map("a" -> (2L, 35L)))
    // and the next real window still folds normally
    tx.stageInsert("src", Seq(org.apache.spark.sql.Row(3, "b", 7L)))
    tx.commit(Some("src")) // src v3
    assert(view.refreshOnce(tail) == 1)
    assert(mvRows(cat) == Map("a" -> (2L, 35L), "b" -> (1L, 7L)))
  }

  test("multi-dim random histories: folded MV equals re-aggregation through fact DML and dim drift") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-2dimprop")
    val cat = new Catalog(spark, dir.toString)
    cat.create("fact", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "d1" -> graft.aql.AlbaType.of("BIGINT"),
      "d2" -> graft.aql.AlbaType.of("BIGINT"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("dim1", List(
      "d1" -> graft.aql.AlbaType.of("BIGINT"),
      "a1" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("dim2", List(
      "d2" -> graft.aql.AlbaType.of("BIGINT"),
      "a2" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "a1" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "a2" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT"),
      "min_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "fact", "mv", Seq("a1", "a2"),
      Seq(IncrementalView.Agg("sum", "val", "sum_val"),
        IncrementalView.Agg("min", "val", "min_val")),
      dims = Seq(IncrementalView.DimJoin("dim1", "d1", "d1"),
        IncrementalView.DimJoin("dim2", "d2", "d2")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "fact", dir.resolve("mv.ckpt"))
    def oracle(): Map[(String, String), (Long, Long, Long)] = {
      val f = cat.read("fact").alias("f")
      f.join(cat.read("dim1"), Seq("d1")).join(cat.read("dim2"), Seq("d2"))
        .groupBy(col("a1"), col("a2"))
        .agg(count(lit(1)).as("n"), sum(col("val")).as("s"), min(col("val")).as("m"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    }
    def folded(): Map[(String, String), (Long, Long, Long)] =
      cat.read("mv").collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    tx.stageInsert("dim1", (1L to 3L).map(i =>
      org.apache.spark.sql.Row(i, s"r$i")))
    tx.commit(Some("dim1"))
    tx.stageInsert("dim2", (1L to 3L).map(i =>
      org.apache.spark.sql.Row(i, s"t$i")))
    tx.commit(Some("dim2"))
    view.seed(tail)
    val rng2 = new scala.util.Random(47)
    (1 to 8).foreach { round =>
      rng2.nextInt(6) match {
        // fact DML dominates (the fold path)
        case 0 | 1 | 2 => tx.stageInsert("fact", Seq(org.apache.spark.sql.Row(
          rng2.nextInt(20), (rng2.nextInt(3) + 1).toLong,
          (rng2.nextInt(3) + 1).toLong, rng2.nextInt(50).toLong)))
        case 3 => tx.stageDelete("fact", Some(col("id") === rng2.nextInt(20)))
        // occasional dim drift on EITHER dim (the reseed path)
        case 4 => tx.stageEdit("dim1", col("d1") === (rng2.nextInt(3) + 1).toLong,
          Seq("a1" -> s"r${rng2.nextInt(9)}"))
        case 5 => tx.stageEdit("dim2", col("d2") === (rng2.nextInt(3) + 1).toLong,
          Seq("a2" -> s"t${rng2.nextInt(9)}"))
      }
      tx.commit(None)
      view.refreshOnce(tail)
      assert(folded() == oracle(),
        s"round $round: folded multi-dim MV diverged from re-aggregation")
    }
  }

  test("maintain(): a resident CDC consumer folds commits as they land, across a restart") {
    val (cat, tx, view, tail) = fixture("loop")
    view.seed(tail)
    @volatile var stop = false
    def runner() = new Thread(() => view.maintain(tail, 20L, () => stop))
    val t1 = runner(); t1.start()
    tx.stageInsert("src", Seq(
      org.apache.spark.sql.Row(1, "a", 10L), org.apache.spark.sql.Row(2, "b", 4L)))
    tx.commit(Some("src"))
    eventually(mvRows(cat) == Map("a" -> (1L, 10L), "b" -> (1L, 4L)),
      "maintainer must fold the first commit")
    stop = true; t1.join(30000)
    // restart: a FRESH tail+view over the same checkpoint resumes where
    // the old consumer stopped
    tx.stageEdit("src", col("id") === 2, Seq("val" -> 9L))
    tx.commit(Some("src"))
    stop = false
    val view2 = new IncrementalView(cat, "src", "mv", Seq("grp"),
      Seq(IncrementalView.Agg("sum", "val", "sum_val")))
    val t2 = new Thread(() => view2.maintain(tail, 20L, () => stop))
    t2.start()
    eventually(mvRows(cat) == Map("a" -> (1L, 10L), "b" -> (1L, 9L)),
      "restarted maintainer must pick up the missed window")
    stop = true; t2.join(30000)
  }

  test("multi-dim enrichment: fact windows fold through BOTH stamped dims; either dim's commit reseeds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-2dim")
    val cat = new Catalog(spark, dir.toString)
    cat.create("fact", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "src_id" -> graft.aql.AlbaType.of("BIGINT"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("dim1", List(
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "region" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("dim2", List(
      "src_id" -> graft.aql.AlbaType.of("BIGINT"),
      "tier" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "region" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "tier" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "fact", "mv", Seq("region", "tier"),
      Seq(IncrementalView.Agg("sum", "val", "sum_val")),
      dims = Seq(
        IncrementalView.DimJoin("dim1", "nation_id", "nation_id"),
        IncrementalView.DimJoin("dim2", "src_id", "src_id")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "fact", dir.resolve("mv.ckpt"))
    def mvState: Map[(String, String), (Long, Long)] =
      cat.read("mv").collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    tx.stageInsert("dim1", Seq(
      org.apache.spark.sql.Row(1L, "EU"), org.apache.spark.sql.Row(2L, "US")))
    tx.commit(Some("dim1"))
    tx.stageInsert("dim2", Seq(
      org.apache.spark.sql.Row(10L, "web"), org.apache.spark.sql.Row(20L, "book")))
    tx.commit(Some("dim2"))
    tx.stageInsert("fact", Seq(
      org.apache.spark.sql.Row(1, 1L, 10L, 5L),
      org.apache.spark.sql.Row(2, 1L, 20L, 7L),
      org.apache.spark.sql.Row(3, 2L, 10L, 11L),
      org.apache.spark.sql.Row(4, 99L, 10L, 13L), // no dim1 match: drops
      org.apache.spark.sql.Row(5, 1L, 99L, 17L))) // no dim2 match: drops
    tx.commit(Some("fact"))
    view.seed(tail)
    assert(mvState == Map(("EU", "web") -> (1L, 5L), ("EU", "book") -> (1L, 7L),
      ("US", "web") -> (1L, 11L)))
    // the stamp records BOTH dim versions positionally
    assert(IncrementalView.stampedDimVersions(cat, "mv").contains(Seq(1, 1)))

    // a fact window folds through BOTH enrichments (no reseed needed)
    tx.stageInsert("fact", Seq(org.apache.spark.sql.Row(6, 2L, 20L, 19L)))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvState(("US", "book")) == ((1L, 19L)))

    // dim2 commit (re-tier 20 book→audio): next refresh RESEEDS — groups
    // keyed by the old tier can't be rewritten by any delta
    tx.stageEdit("dim2", col("src_id") === 20L, Seq("tier" -> "audio"))
    tx.commit(Some("dim2"))
    assert(view.refreshOnce(tail) >= 1)
    assert(mvState == Map(("EU", "web") -> (1L, 5L), ("EU", "audio") -> (1L, 7L),
      ("US", "web") -> (1L, 11L), ("US", "audio") -> (1L, 19L)))
    assert(IncrementalView.stampedDimVersions(cat, "mv").contains(Seq(1, 2)))

    // dim1 commit reseeds too (the OTHER position drifts)
    tx.stageEdit("dim1", col("nation_id") === 2L, Seq("region" -> "NA"))
    tx.commit(Some("dim1"))
    assert(view.refreshOnce(tail) >= 1)
    assert(mvState == Map(("EU", "web") -> (1L, 5L), ("EU", "audio") -> (1L, 7L),
      ("NA", "web") -> (1L, 11L), ("NA", "audio") -> (1L, 19L)))
    assert(IncrementalView.stampedDimVersions(cat, "mv").contains(Seq(2, 2)))

    // and fact windows keep folding after the reseeds
    tx.stageDelete("fact", Some(col("id") === 3))
    tx.commit(Some("fact"))
    assert(view.refreshOnce(tail) == 1)
    assert(mvState == Map(("EU", "web") -> (1L, 5L), ("EU", "audio") -> (1L, 7L),
      ("NA", "audio") -> (1L, 19L)))
    assert(view.refreshOnce(tail) == 0)
  }

  test("maintain(): a dim commit mid-maintain reseeds the enrichment view without a manual REFRESH") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-dimloop")
    val cat = new Catalog(spark, dir.toString)
    cat.create("fact", List(
      "id" -> graft.aql.AlbaType.of("INT"),
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "val" -> graft.aql.AlbaType.of("BIGINT")))
    cat.create("dimc", List(
      "nation_id" -> graft.aql.AlbaType.of("BIGINT"),
      "region" -> graft.aql.AlbaType.of("SMALL-STRING")))
    cat.create("mv", List(
      "region" -> graft.aql.AlbaType.of("SMALL-STRING"),
      "n_rows" -> graft.aql.AlbaType.of("BIGINT"),
      "sum_val" -> graft.aql.AlbaType.of("BIGINT")))
    val view = new IncrementalView(cat, "fact", "mv", Seq("region"),
      Seq(IncrementalView.Agg("sum", "val", "sum_val")),
      dims = Seq(IncrementalView.DimJoin("dimc", "nation_id", "nation_id")))
    val tx = new Tx(cat)
    val tail = new ChangeTail(cat, "fact", dir.resolve("mv.ckpt"))
    def mvState: Map[String, (Long, Long)] =
      cat.read("mv").collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    tx.stageInsert("dimc", Seq(
      org.apache.spark.sql.Row(1L, "EU"), org.apache.spark.sql.Row(2L, "US")))
    tx.commit(Some("dimc"))
    tx.stageInsert("fact", Seq(
      org.apache.spark.sql.Row(1, 1L, 10L), org.apache.spark.sql.Row(2, 2L, 5L)))
    tx.commit(Some("fact"))
    view.seed(tail)
    assert(mvState == Map("EU" -> (1L, 10L), "US" -> (1L, 5L)))
    @volatile var stop = false
    val t = new Thread(() => view.maintain(tail, 20L, () => stop))
    t.start()
    try {
      // a dim commit from a SEPARATE catalog handle, while only the
      // maintainer is running: no manual REFRESH, no auto-refresh hook.
      // The resident loop's per-iteration dim check must reseed — the
      // round-10 maintain() called fold directly and pinned the stamped
      // dim version forever, serving "US" here until a manual REFRESH
      val cat2 = new Catalog(spark, dir.toString)
      val tx2 = new Tx(cat2)
      tx2.stageEdit("dimc", col("nation_id") === 2L, Seq("region" -> "NA"))
      tx2.commit(Some("dimc"))
      eventually(mvState == Map("EU" -> (1L, 10L), "NA" -> (1L, 5L)),
        "maintainer must reseed on dim drift without a manual REFRESH")
      // and fact windows keep folding after the mid-maintain reseed
      tx2.stageInsert("fact", Seq(org.apache.spark.sql.Row(3, 2L, 7L)))
      tx2.commit(Some("fact"))
      eventually(mvState == Map("EU" -> (1L, 10L), "NA" -> (2L, 12L)),
        "maintainer must fold fact windows after the reseed")
    } finally { stop = true; t.join(30000) }
  }

  private def eventually(cond: => Boolean, hint: String): Unit =
    graft.TestWait.eventually(cond, hint, timeoutSec = 30)
}
