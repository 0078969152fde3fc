package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance driven by the CDC feed: keep
  *
  *   mv = SELECT keys…, count(*) AS n [, sum(c) AS sum_c …] FROM src GROUP BY keys…
  *
  * up to date by folding each [[ChangeTail]] window's change rows into the
  * aggregate instead of re-aggregating the source — the warehouse pattern
  * the change feed exists for. Count and sum are self-inverting under
  * insert/delete (+row / −row), so a feed window folds exactly:
  * insert/update_postimage contribute +1, delete/update_preimage −1, and
  * an update pair nets its true delta. (Min/max are deliberately NOT
  * offered: they are not incrementally maintainable under deletes without
  * re-reading the affected group.)
  *
  * Cost model at scale: each refresh reads one commit-sized feed window,
  * aggregates it to key-cardinality-sized deltas, and rewrites the MV —
  * which is aggregate-sized by definition, never source-sized. The MV is
  * itself a container, so it is versioned, time-travelable, and readable
  * by every query path.
  *
  * Consistency contract: the MV commit and the tail checkpoint advance are
  * two steps — a crash between them replays the window (ChangeTail is
  * at-least-once), so [[refreshOnce]] records the applied toV inside the
  * MV fold guard column-free way: the caller's checkpoint IS the guard
  * (pollOnce only advances after the fold commits). A crash AFTER the MV
  * commit but BEFORE the checkpoint write re-applies the window — callers
  * needing exactly-once across crashes should rebuild via [[seed]] on
  * restart ambiguity, or accept the standard at-least-once foreachBatch
  * contract this mirrors.
  */
final class IncrementalView(cat: Catalog, src: String, mv: String,
    keys: Seq[String], sums: Seq[String] = Nil) {

  require(keys.nonEmpty, "incremental view needs at least one group key")

  /** The from-scratch aggregate of a source snapshot (also the oracle the
    * property spec compares against). */
  private def aggregate(snapshot: DataFrame): DataFrame = {
    // sums coalesce to 0 for all-NULL groups so seeding and incremental
    // folding agree (the fold's ±deltas can never reconstruct NULL)
    val aggs = count(lit(1)).as("n") +:
      sums.map(c => coalesce(sum(col(c)), lit(0L)).as(s"sum_$c"))
    snapshot.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** (Re)build the MV from the source's current snapshot — initial
    * seeding, or recovery when replay ambiguity is unacceptable. */
  def seed(): Unit = cat.overwrite(mv, aggregate(cat.read(src)))

  /** Fold one feed window into the MV. Change rows are weighted ±1,
    * aggregated to per-key deltas, and merged with a NULL-SAFE key join
    * (NULL group keys must merge into their group, not duplicate it);
    * groups whose count reaches zero leave the MV, exactly as they would
    * under re-aggregation.
    */
  private[catalog] def fold(feed: DataFrame): Unit = {
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltaAggs = sum(col("_w")).as("dn") +:
      sums.map(c => sum(col(c) * col("_w")).as(s"dsum_$c"))
    val delta = feed.withColumn("_w", w)
      .groupBy(keys.map(col): _*).agg(deltaAggs.head, deltaAggs.tail: _*)
    val cur = cat.read(mv)
    val joinCond: Column = keys.map(k => cur(k) <=> delta(k)).reduce(_ && _)
    val merged = cur.join(delta, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(cur(k), delta(k)).as(k)) ++
          Seq((coalesce(cur("n"), lit(0L)) + coalesce(delta("dn"), lit(0L))).as("n")) ++
          sums.map(c => (coalesce(cur(s"sum_$c"), lit(0L)) +
            coalesce(delta(s"dsum_$c"), lit(0L))).as(s"sum_$c")): _*)
      .filter(col("n") > 0)
    cat.overwrite(mv, merged)
  }

  /** Consume the next outstanding feed window through `tail` and fold it
    * in. Returns the number of source versions applied (0 = up to date).
    */
  def refreshOnce(tail: ChangeTail): Int =
    tail.pollOnce((feed, _, _) => fold(feed))
}
