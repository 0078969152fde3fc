package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): FUSE's Reciprocal Rank Fusion against an
  * independent driver-side model over random corpora. The engine runs
  * each side STATEMENT separately (those paths carry their own oracle
  * rows and specs); the model then reproduces the fusion contract from
  * the collected side results alone:
  *  - per-side rank = 1-based position under (score desc, pk asc) over
  *    the LIMIT-bounded side result;
  *  - rrf = the FIXED-ORDER double sum Σ 1/(k + rank_i), absent sides
  *    contributing 0.0 first-to-last, rounded to 6 (HALF_UP);
  *  - output (pk, rrf, rank_1, rank_2) ordered (rrf desc, pk asc),
  *    LIMIT-bounded, absent ranks NULL.
  * Random vocab/terms/probe/K/limits with a fixed seed: deterministic
  * forever once green. Empty SIMILAR sides (a probe pk with no
  * near-dups) arise naturally and pin the one-sided path.
  */
class FusePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(271828)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("random corpora: FUSE output matches the RRF model over independently-run sides") {
    for (trial <- 1 to 4) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-fuse-prop-$trial")
      val eng = new Engine(spark, dir.toString)
      eng.execute("CREATE CONTAINER fp ['doc_id','body'] [BIGINT, TEXT]")
      // docs 3/10/17 form a verbatim duplicate family, so a probe pk
      // landing there gives the lsh side real candidates; other pks may
      // probe empty — both fusion paths arise across the trials
      val dupText = vocab.take(8).mkString(" ")
      val texts: Seq[(Long, String)] = (0L until 20L).map { i =>
        val body =
          if (i % 7 == 3) dupText
          else (0 until (5 + rng.nextInt(7)))
            .map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
        i -> body
      }
      import spark.implicits._
      eng.catalog.overwrite("fp", texts.toDF("doc_id", "body"))
      eng.execute("CREATE INDEX ft ON fp ['body'] USING text")
      eng.execute("CREATE INDEX nd ON fp ['body'] USING lsh")

      val t1 = vocab(rng.nextInt(vocab.size))
      val t2 = vocab(rng.nextInt(vocab.size))
      val la = 3 + rng.nextInt(6)
      val lb = 3 + rng.nextInt(6)
      val pk = rng.nextInt(20)
      val kk = Seq(1, 30, 60)(rng.nextInt(3))
      val lim = 5 + rng.nextInt(11)
      val stmtA = s"MATCH ['$t1', '$t2'] ON fp LIMIT $la"
      val stmtB = s"SIMILAR $pk ON fp USING nd LIMIT $lb SCORED"

      def side(stmt: String): Seq[(Long, Double)] =
        eng.execute(stmt).asInstanceOf[Engine.ResultSet].df.collect().toSeq
          .map(r => (r.getLong(0), r.getDouble(1)))
      def ranks(rows: Seq[(Long, Double)]): Map[Long, Long] =
        rows.sortBy { case (id, s) => (-s, id) }
          .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val ra = ranks(side(stmtA))
      val rb = ranks(side(stmtB))
      val expected = (ra.keySet ++ rb.keySet).toSeq.map { id =>
        val cA = ra.get(id).map(r => 1.0 / (kk.toDouble + r)).getOrElse(0.0)
        val cB = rb.get(id).map(r => 1.0 / (kk.toDouble + r)).getOrElse(0.0)
        (id, round6(cA + cB), ra.get(id), rb.get(id))
      }.sortBy { case (id, rrf, _, _) => (-rrf, id) }.take(lim)

      val fused = eng.execute(s"FUSE [($stmtA), ($stmtB)] K $kk LIMIT $lim")
        .asInstanceOf[Engine.ResultSet].df.collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
      assert(fused == expected,
        s"trial $trial (terms=$t1/$t2 pk=$pk k=$kk lim=$lim):\n" +
          s"  engine $fused\n  model  $expected")
    }
  }
}
