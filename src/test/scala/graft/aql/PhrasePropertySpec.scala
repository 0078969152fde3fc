package graft.aql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): MATCH PHRASE against an INDEPENDENT Scala
  * adjacency model — a doc matches iff the lowercased empty-filtered
  * token sequence contains the phrase tokens consecutively in order.
  * Random corpora over a SMALL vocabulary (forced collisions: many docs
  * share terms without sharing the phrase, so conjunctive-but-not-
  * adjacent is the common case the model must separate). Also pins the
  * scoring contract: a phrase hit's bm25 equals the same doc's bm25
  * under plain MATCH over the phrase's terms (df keeps its corpus
  * meaning — the phrase gate filters, never rescores). Seeded:
  * deterministic forever once green.
  */
class PhrasePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(1414213)

  private val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox")

  test("random small-vocab corpora: phrase hits match the sliding-window model") {
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-php-$trial")
      val eng = new Engine(spark, dir.toString)
      eng.execute("CREATE CONTAINER php ['doc_id','body'] [BIGINT, TEXT]")
      val docs = (0L until 30L).map { i =>
        val n = 4 + rng.nextInt(9)
        i -> (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      import spark.implicits._
      eng.catalog.overwrite("php", docs.toDF("doc_id", "body"))
      eng.execute("CREATE INDEX ft ON php ['body'] USING text")

      // 4 random phrases of 2–3 tokens; draw half from real documents
      // so non-empty hit sets are likely
      val phrases = (0 until 4).map { p =>
        if (p % 2 == 0) {
          val tk = docs(rng.nextInt(docs.size))._2.split(" ")
          val len = 2 + rng.nextInt(2)
          val at = rng.nextInt(math.max(1, tk.length - len + 1))
          tk.slice(at, math.min(tk.length, at + len)).toSeq match {
            case s if s.size >= 2 => s
            case _ => Seq(vocab(0), vocab(1))
          }
        } else (0 until 2 + rng.nextInt(2)).map(_ => vocab(rng.nextInt(vocab.size)))
      }

      phrases.foreach { ph =>
        val model = docs.filter { case (_, t) =>
          t.split(" ").sliding(ph.size).exists(_.toSeq == ph)
        }.map(_._1).toSet
        val stmt = s"MATCH PHRASE ['${ph.mkString(" ")}'] ON php LIMIT 50"
        val hits = eng.execute(stmt).asInstanceOf[Engine.ResultSet]
          .df.collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(hits.map(_._1).toSet == model,
          s"trial $trial phrase '${ph.mkString(" ")}': " +
            s"${hits.map(_._1).toSet} vs $model")
        assert(hits.toSeq == hits.sortBy { case (id, s) => (-s, id) }.toSeq,
          s"trial $trial: not bm25-desc/pk-asc")
        // the phrase gate filters, never rescores: each hit's bm25 is
        // the plain-MATCH bm25 of the same doc over the same terms
        if (hits.nonEmpty) {
          val terms = ph.distinct.map(t => s"'$t'").mkString(", ")
          val plain = eng.execute(s"MATCH [$terms] ON php LIMIT 50")
            .asInstanceOf[Engine.ResultSet].df.collect()
            .map(r => r.getLong(0) -> r.getDouble(1)).toMap
          hits.foreach { case (id, s) =>
            // a hit can fall outside plain MATCH's top-50 only if 50+
            // docs outrank it — impossible at 30 docs
            assert(plain.get(id).contains(s),
              s"trial $trial: doc $id phrase score $s vs plain ${plain.get(id)}")
          }
        }
      }
      eng.execute("DELETE CONTAINER php")
    }
  }
}
