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
  * Memory envelope: the partial pass holds (distinct groups in this
  * partition) × k rows — the same shape as a partial aggregation's hash
  * buffer, with k small by contract. Like Spark's own partial aggregation
  * under extreme group cardinality, the reduction degrades gracefully
  * (every row kept) rather than wrongly; unlike final aggregation the
  * FINAL pass sees at most k rows per group per upstream partition, which
  * AQE's skew handling splits like any clustered exchange.
  */
final case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
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
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(ge, childOutput)
      // compare(a,b) < 0 ⇔ a sorts first ⇔ a is better; the max-heap then
      // exposes the WORST kept row at the head for O(log k) eviction
      val ordering = RowOrdering.create(so, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val heap = heaps.getOrElseUpdate(groupProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}

/** Plans the logical TopKPerGroup as partial-exec → (exchange) → final-exec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, s, child) =>
      val partial = TopKPerGroupExec(k, g, s, partial = true, planLater(child))
      TopKPerGroupExec(k, g, s, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level surface. Columns are resolved by name against the
  * ANALYZED child, so the custom node is built from plain (serializable)
  * AttributeReferences — Spark 4's Column is an API-side node whose lazy
  * catalyst conversion does not survive a task closure. `orderCols` must
  * describe a TOTAL order (end with a unique tie-break column) for
  * deterministic output; `asc = false` sorts descending.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column '$n' not in ${child.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession,
      TopKPerGroup(k, groupCols.map(attr), order, child))
  }
}
