package graft.catalog

import graft.TestSpark
import graft.aql.Engine
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZE … USING [cols] — z-order clustering: files carry tight
  * min/max on EVERY clustered column, so a predicate on the secondary
  * dimension skips files that pk-range clustering has to read. Content
  * neutral like any OPTIMIZE.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("z-order skips files on the secondary dimension; content is unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER z ['a','b'] [BIGINT, BIGINT]")
    import spark.implicits._
    // b is uniform and independent of a — the adversarial case for
    // pk-range clustering, the motivating case for z-order
    val rows = (0L until 4096L).map(a => (a, (a * 2654435761L) % 4096L))
    cat.overwrite("z", rows.toDF("a", "b")) // v1

    def filesHit(): Long =
      cat.read("z").filter(col("b") < 256L)
        .select(input_file_name()).distinct().count()

    eng.execute("OPTIMIZE z 8") // v2: pk-range clustered
    val pkClustered = filesHit()
    assert(pkClustered >= 7, s"independent b spreads over every pk file, got $pkClustered")

    eng.execute("OPTIMIZE z 8 USING [a, b]") // v3: z-ordered
    val zClustered = filesHit()
    assert(cat.versionFileCount("z", cat.currentVersion("z")) == 8)
    assert(zClustered <= 4,
      s"a b-slab predicate must prune z-ordered files, got $zClustered of 8")

    // content neutrality: the z-ordered version holds exactly the rows
    val back = cat.read("z").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == rows.toSet)
    // CDC sees the compaction as content-neutral (like any OPTIMIZE)
    assert(cat.changes("z", 2, Some(3)).isEmpty)
  }

  test("4-column z-order: the 32nd interleaved bit must not flip the sign") {
    // With 4 columns the top bucket bit of the 4th column lands at bit
    // position i*k+j = 7*4+3 = 31 — in IntegerType arithmetic that made
    // rows whose 4th column falls in the upper 128 buckets NEGATIVE
    // z-values, sorting them before all others and destroying clustering
    // for that dimension. The interleave now runs in LONG; the pin is
    // that a predicate on the 4th column's UPPER range still prunes.
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder4")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER z4 ['a','b','c','d'] [BIGINT, BIGINT, BIGINT, BIGINT]")
    import spark.implicits._
    val rows = (0L until 4096L).map { a =>
      (a, (a * 2654435761L) % 4096L, (a * 40503L) % 4096L, (a * 2654435789L) % 4096L)
    }
    cat.overwrite("z4", rows.toDF("a", "b", "c", "d"))
    eng.execute("OPTIMIZE z4 8 USING [a, b, c, d]")
    def filesHit(lo: Long): Long =
      cat.read("z4").filter(col("d") >= lo)
        .select(input_file_name()).distinct().count()
    // upper-bucket slab of the 4TH dimension (the sign-bit victims):
    // 1/8 of the domain must not need all 8 files
    assert(filesHit(4096L - 512L) <= 6,
      "a d-slab predicate in the upper buckets must prune 4-column z-ordered files")
    val back = cat.read("z4").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(back == rows.toSet)

    // The precise sign pin (slab pruning alone can't see it — a sign flip
    // only swaps the curve's halves): with the other three columns
    // constant, the z value must be MONOTONE in the 4th column across the
    // bucket-128 boundary where bit i*k+j = 31 flips. Under IntegerType
    // interleave the upper half went negative and sorted first.
    val probe = (0L until 4096L by 16L).map(d => (1L, 1L, 1L, d))
      .toDF("a", "b", "c", "d")
    val z = cat.zOrderValue(probe, Seq("a", "b", "c", "d"))
    val zs = probe.select(col("d"), z.as("z")).orderBy(col("d"))
      .collect().map(r => r.getLong(1))
    assert(zs.zip(zs.tail).forall { case (lo, hi) => lo <= hi },
      s"z must be monotone in d with a,b,c fixed: ${zs.mkString(",")}")
  }

  test("z-order guards: column count, unknown and non-numeric columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-g")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER g ['id','txt','n','ok'] [BIGINT, TEXT, BIGINT, BOOL]")
    import spark.implicits._
    cat.overwrite("g", Seq((1L, "x", 2L, true)).toDF("id", "txt", "n", "ok"))
    // single column = plain range clustering on it (legal)
    eng.execute("OPTIMIZE g USING [n]")
    assert(cat.read("g").count() == 1)
    // TEXT joins the clustering legally (rank buckets); BOOL does not
    eng.execute("OPTIMIZE g USING [id, txt]")
    assert(cat.read("g").count() == 1)
    assert(intercept[IllegalArgumentException](
      eng.execute("OPTIMIZE g USING [id, nope]")).getMessage.contains("unknown column"))
    assert(intercept[IllegalArgumentException](
      eng.execute("OPTIMIZE g USING [id, ok]")).getMessage.contains("not numeric or text"))
    assert(intercept[IllegalArgumentException](
      eng.execute("OPTIMIZE g USING [id, n, n]")).getMessage.contains("duplicate"))
  }

  test("TEXT z-order dimension: a lang-like string column prunes files via rank buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-t")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER zt ['doc_id','lang'] [BIGINT, TEXT]")
    import spark.implicits._
    // lang is uniform over 16 values and independent of the pk — the
    // motivating case: pk-range clustering scatters each lang everywhere
    val langs = (0 until 16).map(i => f"l$i%02d")
    val rows = (0L until 4096L).map(id => (id, langs(((id * 2654435761L) % 16L).toInt)))
    cat.overwrite("zt", rows.toDF("doc_id", "lang"))
    def filesHit(): Long =
      cat.read("zt").filter(col("lang") === "l03")
        .select(input_file_name()).distinct().count()
    eng.execute("OPTIMIZE zt 8") // pk clustering: every file has all langs
    assert(filesHit() >= 7, s"independent lang spreads over pk files")
    eng.execute("OPTIMIZE zt 8 USING [lang, doc_id]")
    val z = filesHit()
    // margin like the numeric pins: repartitionByRange SAMPLES its range
    // boundaries (per-run seed), so a lang's stripe can straddle one more
    // file between runs — the pin is pruning vs the 7-8 of pk clustering
    assert(z <= 5, s"a lang equality must prune rank-bucketed z files, got $z of 8")
    // content neutrality + the policy survives like any clustering
    val back = cat.read("zt").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.toSet)
  }

  test("TEXT boundaries with supplementary-plane strings stay monotone in Spark's UTF-8 order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-u8")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER zu ['doc_id','s'] [BIGINT, TEXT]")
    import spark.implicits._
    // JVM UTF-16 code-unit order and Spark's UTF-8 byte order DISAGREE
    // here: U+FFFD (EF BF BD) sorts before U+1F600 (F0 9F 98 80) in
    // UTF-8 but AFTER its lead surrogate 0xD83D in UTF-16 — boundary
    // samples sorted the JVM way would not be Spark-order quantiles
    val vals = Vector("ascii", "zz�", "😀emoji", "😀zz",
      "�tail", "midpoint", "💩x", "plain")
    val rows = (0L until 2048L).map(id => (id, vals((id % 8).toInt) + (id % 17)))
    cat.overwrite("zu", rows.toDF("doc_id", "s"))
    eng.execute("OPTIMIZE zu 8 USING [s]")
    // single z-dimension ⇒ files are contiguous rank slices; with
    // order-preserving buckets their [min,max] ranges can touch at a
    // shared boundary value but never interleave — checked under the
    // SAME UTF-8 byte order Spark compares strings with
    val utf8: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val ranges = cat.read("zu")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)(utf8)
    for (Seq((_, hi1), (lo2, _)) <- ranges.toSeq.sliding(2) if ranges.length > 1)
      assert(utf8.lteq(hi1, lo2), s"file ranges interleave: $hi1 > $lo2")
    val back = cat.read("zu").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.toSet)
  }

  test("the clustering policy persists: plain and auto OPTIMIZE keep the z-order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-p")
    val eng = new Engine(spark, dir.toString)
    val cat = eng.catalog
    eng.execute("CREATE CONTAINER p ['a','b'] [BIGINT, BIGINT]")
    import spark.implicits._
    val rows = (0L until 4096L).map(a => (a, (a * 2654435761L) % 4096L))
    cat.overwrite("p", rows.toDF("a", "b"))
    eng.execute("OPTIMIZE p 8 USING [a, b]") // sets the policy
    def filesHit(): Long =
      cat.read("p").filter(col("b") < 256L)
        .select(input_file_name()).distinct().count()
    assert(filesHit() <= 4)
    // new data lands, then a PLAIN compaction — the policy must hold
    // (this is exactly what the auto-OPTIMIZE hook calls after N commits)
    val tx = new Tx(cat)
    tx.stageInsert("p", (5000L until 5100L)
      .map(a => org.apache.spark.sql.Row(a, (a * 2654435761L) % 4096L)))
    tx.commit(Some("p"))
    eng.execute("OPTIMIZE p 8")
    // the appended tail shifts the quantile boundaries, so the b-slab
    // can straddle one more file than the first pass — the pin is that
    // the policy held (a pk-clustered rewrite would hit all 8)
    assert(filesHit() <= 5,
      "plain OPTIMIZE must re-apply the persisted clustering policy")
    // a schema ALTER invalidates the policy; plain OPTIMIZE falls back
    // to pk clustering instead of failing on a vanished column
    eng.execute("ALTER CONTAINER p RENAME COLUMN ['b','bb']")
    eng.execute("OPTIMIZE p 8")
    assert(cat.read("p").count() == 4096 + 100)
  }
}
