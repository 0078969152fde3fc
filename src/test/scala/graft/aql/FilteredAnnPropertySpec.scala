package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): the filtered-ANN contract over random
  * corpora. `SIMILAR … WHERE pred … SCORED` promises the predicate
  * applies BEFORE the LIMIT with probe WIDENING, which pins three
  * independently checkable facts:
  *  - every returned row satisfies the predicate;
  *  - the result size is min(limit, #matching docs) — at full probe the
  *    candidate set is the whole indexed corpus, so widening can always
  *    fill the LIMIT while matches remain;
  *  - when limit ≥ #matching the returned ID SET is exactly the
  *    matching set (nothing invented, nothing lost), ordered
  *    score-desc/pk-asc with scores in [−1, 1];
  *  - a planted verbatim copy of the query vector with a matching tag
  *    ranks FIRST at exactly 1.0 (quantization-free cosine identity).
  * Seeded draws: deterministic forever once green.
  */
class FilteredAnnPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(2718281)

  private def randVec(dims: Int): IndexedSeq[Float] =
    IndexedSeq.fill(dims)(rng.nextFloat() * 2f - 1f)

  test("random corpora: WHERE filters before LIMIT and widening fills it") {
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-fann-$trial")
      val eng = new Engine(spark, dir.toString)
      eng.execute("CREATE CONTAINER fap ['vid','tag','emb'] [BIGINT, TEXT, MEDIUM-BYTES]")
      val dims = 6
      val tags = Vector("en", "xx", "fr")
      val q = randVec(dims)
      // 40 random vectors + one planted verbatim copy of the query
      // (vid 40) carrying the predicate's tag
      val docs = (0L until 40L).map(i =>
        (i, tags(rng.nextInt(tags.size)), randVec(dims))) :+
        ((40L, "en", q))
      import spark.implicits._
      eng.catalog.overwrite("fap", docs.map { case (i, t, v) =>
        (i, t, graft.functions.Float32Unpack.pack(v)) }.toDF("vid", "tag", "emb"))
      eng.execute("CREATE INDEX ann ON fap ['emb'] USING ivf 4")

      val matching = docs.filter(_._2 == "en").map(_._1).toSet
      val qLit = q.mkString("[", ", ", "]")
      def run(limit: Int): Seq[(Long, Double)] = eng
        .execute(s"SIMILAR $qLit ON fap USING ann WHERE tag = 'en' " +
          s"LIMIT $limit SCORED")
        .asInstanceOf[Engine.ResultSet].df.collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq

      // limit past the matching count: the EXACT matching set, no more
      val all = run(matching.size + 10)
      assert(all.map(_._1).toSet == matching,
        s"trial $trial: got ${all.map(_._1).toSet} vs $matching")
      assert(all == all.sortBy { case (id, s) => (-s, id) },
        s"trial $trial: not score-desc/pk-asc: $all")
      assert(all.forall { case (_, s) => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9 })
      assert(all.head._1 == 40L && all.head._2 == 1.0,
        s"trial $trial: the planted copy must rank first at 1.0, got ${all.head}")

      // small limit: exactly `limit` rows whenever enough matches exist
      // (the widening promise), every one satisfying the predicate
      val k3 = run(3)
      assert(k3.size == 3 && k3.map(_._1).forall(matching), s"trial $trial: $k3")
      // the small-limit heads are a PREFIX of the full filtered ranking
      // at full coverage (same corpus, same scores): not guaranteed at
      // partial probe in general, but with limit ≤ matches the widened
      // probe has seen at least `limit` matching candidates and ranks
      // them by the same exact score, so the top-1 must agree
      assert(k3.head == all.head, s"trial $trial: ${k3.head} vs ${all.head}")

      // the unscored filtered form serves matching candidate pks only
      val uf = eng.execute(
        s"SIMILAR $qLit ON fap USING ann WHERE tag = 'xx' LIMIT 50")
        .asInstanceOf[Engine.ResultSet].df.collect().map(_.getLong(0)).toSet
      val xxSet = docs.filter(_._2 == "xx").map(_._1).toSet
      assert(uf == xxSet, s"trial $trial: $uf vs $xxSet")

      eng.execute("DELETE CONTAINER fap")
    }
  }
}
