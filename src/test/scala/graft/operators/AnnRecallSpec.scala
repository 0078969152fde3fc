package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Recall@10 AND scan cost for the ANN index structures against exact
  * brute-force — the quality half of the ANN story (speed without
  * measured recall is not a shippable index, and recall without its
  * candidate-set size is half a benchmark).
  *
  * Fixture geometry matters for honest bounds: the synthetic embeddings
  * are near-orthogonal random vectors (cross-pair cosine ≈ 0 ± 0.1), so
  * single-probe 8-bit sign-LSH retrieves tiny near-random buckets and its
  * recall is legitimately low — the surface REPORTS that rather than
  * hiding it, and the banded 8×4-bit configuration shows the honest
  * fix: OR-amplification buys recall by scanning more candidates. The
  * learned Lloyd quantizer captures what directional structure exists
  * (probe-1 ≈ 0.55 vs ≈ 0.13 for the arbitrary label). The floors below
  * assert the ORDERINGS (learned beats arbitrary, more probes/bands beat
  * fewer, amplification's scan cost is visible) plus an absolute floor
  * for the real quantizer — what regresses when assignment or probe
  * logic breaks.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // method -> (n_queries, avg_recall, min_recall, avg_scanned)
  private lazy val rows: Map[String, (Long, Double, Double, Double)] =
    graft.operators.Advanced.annRecallDetail(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("all seven methods report over all 20 queries") {
    assert(rows.keySet == Set("int8_rerank100", "ivf_label_probe1",
      "ivf_kmeans_probe1", "ivf_kmeans_probe2", "lsh_8bit_probe1",
      "lsh_8bit_multiprobe1", "lsh_4bit_8band"))
    assert(rows.values.forall(_._1 == 20L))
  }

  test("recall is a valid probability; min never exceeds avg; scan cost is sane") {
    rows.foreach { case (m, (_, avg, mn, scanned)) =>
      assert(avg >= 0.0 && avg <= 1.0 && mn >= 0.0 && mn <= avg, s"$m: avg=$avg min=$mn")
      assert(scanned >= 0.0 && scanned < 500.0, s"$m scans the whole corpus: $scanned")
    }
  }

  test("the learned quantizer meets an absolute floor (measured ≈ 0.55)") {
    val (_, avg, _, _) = rows("ivf_kmeans_probe1")
    info(f"ivf_kmeans_probe1 avg recall@10 = $avg%.4f")
    assert(avg >= 0.40, f"learned-quantizer recall regressed: $avg%.4f < 0.40")
  }

  test("learned cells beat the arbitrary label partition by ≥ 2×") {
    val kmeans = rows("ivf_kmeans_probe1")._2
    val label = rows("ivf_label_probe1")._2
    info(f"kmeans=$kmeans%.4f label=$label%.4f")
    assert(kmeans >= 2.0 * label,
      f"Lloyd cells ($kmeans%.4f) should dominate the arbitrary label ($label%.4f)")
  }

  test("IVF probe-2 amplifies probe-1 recall (probing a superset of cells is monotone)") {
    val p2 = rows("ivf_kmeans_probe2")
    val p1 = rows("ivf_kmeans_probe1")
    info(f"probe2=${p2._2}%.4f (scan ${p2._4}%.1f) probe1=${p1._2}%.4f (scan ${p1._4}%.1f)")
    assert(p2._2 >= p1._2,
      f"scanning 2 cells (${p2._2}%.4f) cannot recall less than 1 cell (${p1._2}%.4f)")
    assert(p2._4 > p1._4, "probe-2 must report its larger candidate set")
  }

  test("multiprobe LSH amplifies single-probe recall (OR-amplification is monotone)") {
    val multi = rows("lsh_8bit_multiprobe1")._2
    val single = rows("lsh_8bit_probe1")._2
    info(f"multiprobe=$multi%.4f single=$single%.4f")
    assert(multi >= single,
      f"probing 9 buckets ($multi%.4f) cannot recall less than 1 bucket ($single%.4f)")
  }

  test("quantize-then-rerank beats IVF probe-2 recall at a lower exact-scoring cost") {
    val rr = rows("int8_rerank100")
    val p2 = rows("ivf_kmeans_probe2")
    info(f"int8_rerank100=${rr._2}%.4f (rerank depth ${rr._4}%.1f) " +
      f"probe2=${p2._2}%.4f (scan ${p2._4}%.1f)")
    // int8 reconstruction error is ≤ half a step per dimension — the
    // approximate top-100 virtually always contains the exact top-10
    assert(rr._2 >= p2._2,
      f"rerank recall (${rr._2}%.4f) regressed below probe-2 (${p2._2}%.4f)")
    assert(rr._2 >= 0.95, f"int8 top-100 should nearly always cover the exact top-10: ${rr._2}%.4f")
    assert(rr._4 <= 100.0 && rr._4 < p2._4,
      "the float-rerank depth must be bounded at 100 and below probe-2's scan")
  }

  test("banded 8×4-bit LSH trades scan cost for real recall on this geometry") {
    val banded = rows("lsh_4bit_8band")
    val multi = rows("lsh_8bit_multiprobe1")
    info(f"banded=${banded._2}%.4f (scan ${banded._4}%.1f) " +
      f"multiprobe=${multi._2}%.4f (scan ${multi._4}%.1f)")
    assert(banded._2 >= multi._2,
      "shorter bands with OR-amplification should recall at least as much")
    assert(banded._4 > multi._4,
      "the amplification's candidate-set premium must be visible in avg_scanned")
  }
}
