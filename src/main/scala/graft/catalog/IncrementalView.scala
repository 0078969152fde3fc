package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance driven by the CDC feed: keep
  *
  *   mv = SELECT keys…, count(*) AS n_rows [, count(c)… , sum(c)…]
  *        FROM src [WHERE pred] GROUP BY keys…
  *
  * up to date by folding each [[ChangeTail]] window's change rows into the
  * aggregate instead of re-aggregating the source — the warehouse pattern
  * the change feed exists for. Count and sum are self-inverting under
  * insert/delete (+row / −row), so a feed window folds exactly:
  * insert/update_postimage contribute +1, delete/update_preimage −1, and
  * an update pair nets its true delta — including a row EDITed across
  * groups or across the WHERE boundary (the predicate is row-local, so
  * pre/post images filter independently). Min/max are deliberately NOT
  * offered: they are not incrementally maintainable under deletes without
  * re-reading the affected group.
  *
  * The MV container's schema contract is `keys… , n_rows, agg outs…`:
  * `n_rows` (the group's plain row count) is always maintained — it is
  * the group-existence tracker (a group leaves the MV when it reaches
  * zero, exactly as under re-aggregation) and is independently useful.
  * `count(c)` outs count non-NULL values of `c` (SQL semantics); `sum(c)`
  * outs store 0 rather than NULL for all-NULL groups, so seeding and
  * incremental folding agree (±deltas can never reconstruct NULL).
  *
  * Cost model at scale: each refresh reads one commit-sized feed window,
  * aggregates it to key-cardinality-sized deltas, and rewrites the MV —
  * which is aggregate-sized by definition, never source-sized. The MV is
  * itself a container, so it is versioned, time-travelable, and readable
  * by every query path (including AQL SEARCH).
  *
  * Delivery: the MV commit and the tail checkpoint are two steps — a
  * crash between them replays the window (the at-least-once foreachBatch
  * contract). Callers needing certainty after a crash rebuild via
  * [[seed]], which also resets the tail to the seeded version.
  */
final class IncrementalView(cat: Catalog, src: String, mv: String,
    keys: Seq[String], aggs: Seq[IncrementalView.Agg] = Nil,
    where: Option[Column] = None) {
  import IncrementalView.Agg

  require(keys.nonEmpty, "incremental view needs at least one group key")
  aggs.foreach(a => require(a.fn == "count" || a.fn == "sum",
    s"unsupported incremental aggregate '${a.fn}' (count/sum only)"))

  private def filtered(df: DataFrame): DataFrame =
    where.map(df.filter).getOrElse(df)

  /** The from-scratch aggregate of a source snapshot (also the oracle the
    * property spec compares against). */
  private def aggregate(snapshot: DataFrame): DataFrame = {
    val outs = count(lit(1)).as("n_rows") +: aggs.map {
      case Agg("count", c, out) => count(col(c)).as(out)
      case Agg(_, c, out) => coalesce(sum(col(c)), lit(0L)).as(out)
    }
    filtered(snapshot).groupBy(keys.map(col): _*).agg(outs.head, outs.tail: _*)
  }

  /** (Re)build the MV from the source's current snapshot and reset the
    * tail checkpoint to the seeded version — initial seeding, or recovery
    * when at-least-once replay ambiguity is unacceptable. */
  def seed(tail: ChangeTail): Unit = {
    val v = cat.currentVersion(src)
    cat.overwrite(mv, aggregate(
      if (v > 0) cat.readVersion(src, v) else cat.read(src)))
    tail.reset(v)
  }

  /** Fold one feed window into the MV. Change rows are weighted ±1,
    * aggregated to per-key deltas, and merged with a NULL-SAFE key join
    * (NULL group keys must merge into their group, not duplicate it).
    */
  private[catalog] def fold(feed: DataFrame): Unit = {
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltas = sum(col("_w")).as("d_n_rows") +: aggs.map {
      // count(c) counts non-NULL values: a NULL c contributes 0 either way
      case Agg("count", c, out) =>
        sum(when(col(c).isNotNull, col("_w")).otherwise(0L)).as(s"d_$out")
      // sum skips NULLs on both paths; coalesce at merge handles all-NULL
      case Agg(_, c, out) => sum(col(c) * col("_w")).as(s"d_$out")
    }
    val delta = filtered(feed).withColumn("_w", w)
      .groupBy(keys.map(col): _*).agg(deltas.head, deltas.tail: _*)
    val cur = cat.read(mv)
    val joinCond: Column = keys.map(k => cur(k) <=> delta(k)).reduce(_ && _)
    val outCols = ("n_rows" -> "d_n_rows") +: aggs.map(a => a.out -> s"d_${a.out}")
    val merged = cur.join(delta, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(cur(k), delta(k)).as(k)) ++
          outCols.map { case (o, d) =>
            (coalesce(cur(o), lit(0L)) + coalesce(delta(d), lit(0L))).as(o)
          }: _*)
      .filter(col("n_rows") > 0)
    cat.overwrite(mv, merged)
  }

  /** Consume the next outstanding feed window through `tail` and fold it
    * in. Returns the number of source versions applied (0 = up to date).
    */
  def refreshOnce(tail: ChangeTail): Int =
    tail.pollOnce((feed, _, _) => fold(feed))
}

object IncrementalView {
  /** One maintained aggregate: `fn(col) AS out`, fn ∈ count | sum. */
  final case class Agg(fn: String, col: String, out: String)
}
