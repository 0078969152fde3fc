package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Per-group top-k as a first-class operator — the whole-operator custom
  * path of SURVEY §7.3 (logical node → Strategy → SparkPlan, registered via
  * `SparkSessionExtensions`).
  *
  * Spark expresses "k best rows per group" as
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k`, which SORTS
  * every group in full — O(n log n) per group and a full-width shuffle of
  * all n rows. This operator keeps a bounded k-element heap per group
  * instead: a PARTIAL pass per input partition reduces each partition to
  * ≤ k rows per (partition, group) before the exchange — the same
  * partial-before-shuffle shape as an aggregation, so at 100 TB the
  * exchange carries ≤ k·groups·partitions rows, not the corpus — and a
  * FINAL pass (clustered on the group keys) merges the partials.
  * O(n log k) total, no full sort anywhere.
  *
  * The caller must supply a TOTAL order (tie-break to a unique key) for
  * deterministic results — same contract as every oracle query.
  *
  * Group-key hygiene: float/double group expressions are passed through
  * Spark's own NormalizeFloatingNumbers (`TopK.perGroup`), so NaN and
  * -0.0/0.0 land in one UnsafeRow bucket and one shuffle partition — the
  * same normalization GROUP BY and Window keys get; without it a group
  * could silently split.
  *
  * Memory envelope: the partial pass buffers (distinct groups in this
  * partition) × k rows — the same shape as a partial aggregation's hash
  * buffer. Under extreme group cardinality it degrades GRACEFULLY, not
  * unsafely: once `maxPartialBuffer` rows are held, rows of groups not
  * already tracked pass through unreduced (correct — the final pass
  * reduces them) instead of growing the map without bound, mirroring
  * HashAggregateExec's partial-agg fallback. The FINAL pass must see
  * every row of a group and cannot pass through; its input is already
  * ≤ k rows per group per upstream partition, and AQE's skew handling
  * splits the clustered exchange like any aggregation.
  */
final case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    child: LogicalPlan,
    maxPartialBuffer: Int = TopKPerGroup.DefaultPartialBuffer) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(maxPartialBuffer >= 1, s"maxPartialBuffer must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Partial-pass row-buffer cap: ~256k rows ≈ tens of MB of UnsafeRows —
    * the point where a partial reduction stops paying for itself and
    * passthrough (shuffle-then-reduce, what a plain window would do for
    * ALL rows) is the safer shape.
    */
  val DefaultPartialBuffer: Int = 1 << 18
}

/** Physical per-group top-k. `partial = true` instances run on whatever
  * partitioning the child has (the map-side reduction); the `partial =
  * false` instance declares a ClusteredDistribution on the group keys, so
  * EnsureRequirements inserts exactly one hash exchange between the two —
  * the aggregation-style two-phase shape, chosen by TopKStrategy.
  */
final case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    partial: Boolean,
    maxPartialBuffer: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val ge = groupExprs
    val so = sortOrder
    val childOutput = child.output
    val isPartial = partial
    val bufferCap = maxPartialBuffer
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(ge, childOutput)
      // compare(a,b) < 0 ⇔ a sorts first ⇔ a is better; the max-heap then
      // exposes the WORST kept row at the head for O(log k) eviction
      val ordering = RowOrdering.create(so, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var buffered = 0
      // drain the input lazily: reduced groups buffer in the heap map;
      // once the buffer cap is reached, rows of UNTRACKED groups pass
      // through unreduced (partial pass only — the final pass must see
      // every row of its groups and its input is already k-bounded)
      val passthrough = it.flatMap { row =>
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) { heap.enqueue(row.copy()); buffered += 1 }
            else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
            Iterator.empty
          case None if !isPartial || buffered < bufferCap =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
            heap.enqueue(row.copy()); buffered += 1
            heaps.put(key.copy(), heap)
            Iterator.empty
          case None => Iterator.single(row) // graceful degradation
        }
      }
      // `++` evaluates its right side only after the left is exhausted,
      // so the heap sweep sees the fully-reduced state
      passthrough ++ heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}

/** Plans the logical TopKPerGroup as partial-exec → (exchange) → final-exec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, s, child, cap) =>
      val partial = TopKPerGroupExec(k, g, s, partial = true, cap, planLater(child))
      TopKPerGroupExec(k, g, s, partial = false, cap, partial) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level surface. Columns are resolved by name against the
  * ANALYZED child, so the custom node is built from plain (serializable)
  * AttributeReferences — Spark 4's Column is an API-side node whose lazy
  * catalyst conversion does not survive a task closure. `orderCols` must
  * describe a TOTAL order (end with a unique tie-break column) for
  * deterministic output; `asc = false` sorts descending.
  *
  * Name resolution is case-insensitive and STRICT: a name matching more
  * than one child column (duplicate or case-colliding output) is an
  * error, never a silent first-match bind.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int,
      maxPartialBuffer: Int = TopKPerGroup.DefaultPartialBuffer): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.filter(_.name.equalsIgnoreCase(n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column '$n' not in ${child.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column '$n' is ambiguous: matches ${many.map(_.name).mkString(", ")}")
      }
    // float/double group keys go through the same normalization GROUP BY
    // keys get, so NaN and -0.0/0.0 cannot split a group across buckets
    // or shuffle partitions
    val groups = groupCols.map(n =>
      org.apache.spark.sql.graft.Bridge.normalizeFloats(attr(n)))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession,
      TopKPerGroup(k, groups, order, child, maxPartialBuffer))
  }
}
