package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): SHOW DEDUP's funnel over random corpora with
  * PLANTED exact-duplicate families. The family structure gives an
  * independent model for every stage:
  *  - `n_docs` / `exact_dup_docs` are exact (identical texts per family);
  *  - family members share ALL band keys, so they are always candidates
  *    and always verify (Jaccard 1.0) — lower bounds on the band stages;
  *  - at THRESHOLD 1 only identical shingle SETS verify, so with
  *    distinct random base texts the verified graph IS the family
  *    partition: verified/clusters/removals are exact;
  *  - the threshold knob is monotone: tightening can only shrink the
  *    verified set.
  * Seeded draws: deterministic forever once green.
  */
class DedupFunnelPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(1618033)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi")

  test("random planted-family corpora: funnel stages match the family model") {
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ddfunnel-$trial")
      val eng = new Engine(spark, dir.toString)
      eng.execute("CREATE CONTAINER dfp ['doc_id','body'] [BIGINT, TEXT]")
      // 6 distinct base texts (≥6 tokens, so every doc shingles and
      // bands); each of 30 docs joins a random family
      val bases = (0 until 6).map(_ =>
        (0 until (6 + rng.nextInt(5)))
          .map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      assert(bases.distinct.size == bases.size,
        "seeded base texts must be distinct (re-seed if this ever fires)")
      val fam = (0L until 30L).map(i => i -> rng.nextInt(6))
      import spark.implicits._
      eng.catalog.overwrite("dfp",
        fam.map { case (i, f) => (i, bases(f)) }.toDF("doc_id", "body"))
      eng.execute("CREATE INDEX nd ON dfp ['body'] USING lsh")

      val famSizes = fam.groupBy(_._2).view.mapValues(_.size).toMap
      val multiFams = famSizes.count(_._2 > 1)
      val exactDupDocs = famSizes.values.filter(_ > 1).sum

      def funnel(stmt: String): (Long, Long, Long, Long, Long, Long) = {
        val r = eng.execute(stmt).asInstanceOf[Engine.ResultSet]
          .df.collect().head
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      }
      val (n, ex, cand, ver, cl, rm) = funnel("SHOW DEDUP dfp USING nd")
      assert(n == 30 && ex == exactDupDocs, s"trial $trial: ($n, $ex)")
      // family members always band-collide and always verify
      assert(cand >= exactDupDocs && cand <= n, s"trial $trial: cand=$cand")
      assert(ver >= exactDupDocs && ver <= cand, s"trial $trial: ver=$ver")
      assert(rm == ver - cl, s"trial $trial: removals must be ver-clusters")
      assert((cl >= 1) == (ver > 0), s"trial $trial: cluster/verified parity")

      // THRESHOLD 1: only identical shingle sets verify — the verified
      // graph IS the family partition (exact, by the distinct-bases draw)
      val (_, _, _, v1, c1, r1) = funnel("SHOW DEDUP dfp USING nd THRESHOLD 1")
      assert(v1 == exactDupDocs && c1 == multiFams && r1 == v1 - c1,
        s"trial $trial: thr=1 funnel ($v1, $c1, $r1) vs model " +
          s"($exactDupDocs, $multiFams)")
      // monotone: tightening the threshold can only shrink the verify set
      assert(v1 <= ver, s"trial $trial: threshold monotonicity")
    }
  }
}
