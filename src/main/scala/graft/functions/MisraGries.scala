package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a mergeable Spark Aggregator.
  *
  * The classic streaming algorithm (Misra & Gries 1982, "Finding repeated
  * elements") keeps at most `k` counters; the distributed merge is the
  * summary merge of Agarwal et al. 2013 ("Mergeable summaries", PODS):
  * add counters pointwise, then subtract the (k+1)-th largest count and
  * drop non-positives. The result guarantees, for a stream of n items:
  *
  *   - every token with true count > n/(k+1) is PRESENT in the summary;
  *   - each reported count c̃ satisfies  c - n/(k+1) ≤ c̃ ≤ c.
  *
  * Spark-first shape: the Aggregator runs as an ObjectHashAggregate with
  * map-side partial summaries — each partition builds its own k-counter
  * summary, and only ≤ k (token, count) pairs per partition cross the
  * exchange, never the token stream itself. That is the property that makes
  * a 100 TB token scan feasible where an exact groupBy would shuffle every
  * distinct token. (Spark's built-in count_min_sketch offers frequency
  * ESTIMATES but not the heavy-hitter candidate set itself; Misra-Gries
  * yields both at once.)
  *
  * No DuckDB oracle can express this (like x_approx_distinct's HLL); the
  * error bound above is pinned by MisraGriesSpec against the exact counts.
  */
final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "Misra-Gries needs at least one counter")

  override def zero: Map[String, Long] = Map.empty

  /** Stream step: existing token +1; free slot → new counter; full → decrement
    * all (dropping zeros) — the textbook update.
    */
  override def reduce(buf: Map[String, Long], token: String): Map[String, Long] =
    buf.get(token) match {
      case Some(c) => buf.updated(token, c + 1)
      case None if buf.size < k => buf.updated(token, 1L)
      case None => buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  /** Summary merge (Agarwal et al. 2013): pointwise sum, then subtract the
    * (k+1)-th largest count and keep positives — at most k survive.
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      summed.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  // ExpressionEncoder (not kryo): the output is a true Catalyst MapType, so
  // callers explode() the summary declaratively instead of typed flatMap
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object MisraGries {
  /** Typed column summarizing a String column's heavy hitters. */
  def summary(k: Int): TypedColumn[String, Map[String, Long]] =
    new MisraGries(k).toColumn
}
